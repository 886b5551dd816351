package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection tool.
  *
  *   runMain graft.Explain <query>   — full formatted physical plan
  *   runMain graft.Explain all       — one-line plan audit per query:
  *     exchanges, join strategies, scan pushdown, red flags (cartesian
  *     products, non-broadcast tiny dims)
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      // the SQL-surface queries (DML/time travel/maintenance) need the
      // graft rules, which inject at session build only
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    args.headOption match {
      case Some("all") | None =>
        SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
          try {
            val plan = fn(spark, dir).queryExecution.executedPlan.toString
            def n(pat: String) = pat.r.findAllIn(plan).length
            val flags = Seq(
              if (n("CartesianProduct") > 0) "CARTESIAN!" else "",
              if (n("BroadcastNestedLoopJoin") > 0) "BNLJ!" else "",
              // a Window over a SinglePartition exchange funnels every row
              // through one task (the q48 trap); single-row global aggs
              // legitimately use SinglePartition but have no Window
              if (n("Exchange SinglePartition") > 0 && n("Window") > 0)
                "1PART-WINDOW!" else "")
              .filter(_.nonEmpty).mkString(",")
            println(f"AUDIT $name%-28s exch=${n("Exchange")}%d " +
              f"bhj=${n("BroadcastHashJoin")}%d smj=${n("SortMergeJoin")}%d " +
              f"gen=${n("Generate")}%d sorts=${n("(?m)^\\s*\\+?-? ?\\*?\\(?\\d*\\)? ?Sort ")}%d " +
              (if (flags.nonEmpty) s" $flags" else ""))
          } catch {
            case e: Throwable =>
              println(s"AUDIT $name FAILED: ${e.getMessage.take(60)}")
          }
        }
      case Some("json") =>
        // machine-readable shape counts for tools/plan_gate.py: one JSON
        // line, keyed by query — committed as plan_ref.json, the gate
        // trips on SHAPE drift (an operator silently gaining an exchange
        // or losing a broadcast), not on this host's noisy timings
        val entries = SparkEntry.queries.toSeq.sortBy(_._1).map {
          case (name, fn) =>
            val counts =
              try {
                val plan = fn(spark, dir).queryExecution.executedPlan.toString
                def n(pat: String) = pat.r.findAllIn(plan).length
                Seq(
                  "exch" -> n("Exchange"),
                  "bhj" -> n("BroadcastHashJoin"),
                  "smj" -> n("SortMergeJoin"),
                  "scans" -> n("FileScan parquet"),
                  // scans whose predicate reached the parquet reader —
                  // a lost pushdown turns a selective scan into a full
                  // one and is invisible to every other counter
                  "pushed" -> n("PushedFilters: \\[(?!\\])"),
                  "cartesian" -> n("CartesianProduct"),
                  "bnlj" -> n("BroadcastNestedLoopJoin"),
                  "onepart_window" ->
                    (if (n("Exchange SinglePartition") > 0 && n("Window") > 0)
                      1 else 0))
                  .map { case (k, v) => s""""$k": $v""" }
                  .mkString("{", ", ", "}")
              } catch {
                case e: Throwable =>
                  val msg = Option(e.getMessage).getOrElse("null")
                    .replaceAll("[\"\\\\\n\r\t]", " ").take(80)
                  s"""{"error": "$msg"}"""
              }
            s""""$name": $counts"""
        }
        println("PLANJSON " + entries.mkString("{", ", ", "}"))
      case Some("final") =>
        // post-execution ADAPTIVE plan: AQE exchange/stage reuse only
        // appears at runtime, so the static plan under-reports reuse
        val q = args.lift(1).getOrElse {
          System.err.println("usage: graft.Explain final <query>")
          spark.stop(); return
        }
        val df = SparkEntry.queries(q)(spark, dir)
        df.collect() // execute THIS QueryExecution so AQE finalizes it
        val full = df.queryExecution.executedPlan.toString
        // AdaptiveSparkPlan.toString appends the pre-AQE "Initial Plan" —
        // count only the section that actually ran
        val plan = full.split("== Initial Plan ==").head
        println(full)
        def n(pat: String) = pat.r.findAllIn(plan).length
        println(s"FINAL $q scans=${n("FileScan parquet")} " +
          s"reused=${n("ReusedExchange")} exch=${n("Exchange")} " +
          s"stages=${n("ShuffleQueryStage")}")
      case Some("dump") =>
        // batch plan capture: write <outdir>/<query>_<suffix>.txt with
        // the formatted plan for every named query, one session — the
        // per-round plans/ deliverable without one JVM per query
        val outDir = args.lift(1).getOrElse {
          System.err.println(
            "usage: graft.Explain dump <outdir> <suffix> <q1,q2,...>")
          spark.stop(); return
        }
        val suffix = args.lift(2).getOrElse("plan")
        val qs = args.lift(3).map(_.split(',').toSeq)
          .getOrElse(SparkEntry.queries.keys.toSeq.sorted)
        java.nio.file.Files.createDirectories(
          java.nio.file.Paths.get(outDir))
        qs.foreach { q =>
          val full = SparkEntry.queries.keys
            .find(_.startsWith(q)).getOrElse(q)
          val plan =
            try SparkEntry.queries(full)(spark, dir)
              .queryExecution.explainString(
                org.apache.spark.sql.execution.FormattedMode)
            catch { case e: Throwable => s"ERROR: ${e.getMessage}" }
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(outDir, s"${full}_$suffix.txt"), plan)
          println(s"DUMPED $full")
        }
      case Some(q) =>
        SparkEntry.queries(q)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
