package graft

import org.apache.spark.storage.StorageLevel

/** Benchmark main: runs every SparkEntry query against
  * `SPARK_GRAFT_SF_DIR`, prints ONE JSON line with per-query seconds.
  *
  * Methodology (deliberately robust to a contended host — the driver's
  * number is the one the 2x-of-baseline contract binds against):
  *  - every base table is cached ONCE up front (MEMORY_AND_DISK) and
  *    materialized; the CacheManager substitutes the in-memory relation
  *    into every query by canonicalized-plan match, so parquet scan and
  *    decode cost is paid once, not per query and rep;
  *  - each query runs `SPARK_GRAFT_BENCH_REPS` times (default 2) and
  *    records the MIN — rep 1 absorbs codegen/JIT/plan warmup and any
  *    contention spike, rep 2 measures steady state;
  *  - per-query failures are NOT swallowed: the error lands in an
  *    `errors` JSON field and on stderr, and the failed attempt's elapsed
  *    time still counts (a query that dies at planning must not record a
  *    flattering ~0s).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(math.min(32, Runtime.getRuntime.availableProcessors))
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt)
    // SPARK_GRAFT_BENCH_COLD=1: skip the base-table cache so scan-side
    // I/O cost is inside the timers — a diagnostic mode; the driver's
    // comparable default (cached, identical to bench_ref methodology)
    // is unchanged when the variable is unset.
    val cold = sys.env.get("SPARK_GRAFT_BENCH_COLD").exists(_ == "1")
    val spark = GraftSession.builder(s"local[$cpus]", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    if (!cold) tables.foreach { t =>
      try {
        val df = spark.read.parquet(s"$sfDir/$t.parquet")
        df.persist(StorageLevel.MEMORY_AND_DISK)
        df.write.format("noop").mode("overwrite").save() // materialize now
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] caching $t failed: ${e.getMessage}")
      }
    }
    // warm shuffle/join/sort machinery once so exchange setup cost is paid
    // outside the timers
    try {
      import org.apache.spark.sql.functions._
      val o = spark.read.parquet(s"$sfDir/orders.parquet")
      val c = spark.read.parquet(s"$sfDir/customer.parquet")
      o.join(c, col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").count().orderBy("c_mktsegment")
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }

    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // requalification subset: SPARK_GRAFT_BENCH_ONLY=q87,q152 times just
    // those queries (the per-query minima protocol); unset = everything
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    def selected(name: String): Boolean =
      only.forall(_.exists(name.contains))
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => selected(q._1)).map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        // noop sink: forces full materialization of every output column —
        // count() would let Catalyst prune projection-only work and
        // under-report map-heavy queries.
        val ok =
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            true
          } catch {
            case e: Throwable =>
              val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
                .replaceAll("[\"\\\\\n\r\t]", " ").take(200)
              errors(name) = msg
              System.err.println(s"[bench] $name FAILED: $msg")
              false
          }
        (ok, (System.nanoTime() - t0) / 1e9)
      }
      // min over SUCCESSFUL reps only — a fast failure must not stand in
      // for a slow success (only when every rep failed does the failure
      // time count, so the query still shows up in the total)
      val good = times.filter(_._1).map(_._2)
      name -> (if (good.nonEmpty) good.min else times.map(_._2).min)
    }
    // 3-decimal per-query rounding: ms precision is already below host
    // noise, and the shorter line (~1.5 KB saved at 162 queries) keeps
    // the whole JSON inside a tail-window capture.
    def r3(v: Double): Double = math.round(v * 1000) / 1000.0
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // `errors` omitted when empty (the normal case) — same byte-budget
    // reasoning; consumers must treat a missing field as {}.
    val errsField =
      if (errors.isEmpty) ""
      else "\"errors\":" + errors.map { case (k, v) => s"\"$k\":\"$v\"" }
        .mkString("{", ",", "}") + ","
    val json =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,$errsField"reps":$reps,"sf":"$sfDir"}"""
    // Compact trailer FIRST, the full one-line JSON LAST: tail-window
    // captures keep the end of the stream, so a cut must hit the
    // preamble, never the payload (PERF r20/r21 lost per-query data to
    // the old order).
    val worst = results.sortBy(-_._2).take(5)
      .map { case (k, v) => s"""["$k",${r3(v)}]""" }
      .mkString("[", ",", "]")
    println(
      s"""BENCHSUMMARY {"total_s":${math.round(total * 10) / 10.0},"n":${results.size},"n_err":${errors.size},"worst":$worst}""")
    // also drop the raw JSON to a file: the sbt runner prefixes stdout
    // lines with [info], so give any consumer a clean copy
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_out.json"), json + "\n")
    catch { case _: Throwable => () }
    spark.stop()
    println(json)
  }
}
