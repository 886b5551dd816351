package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.storage.StorageLevel

/** Measurement harness (guide §1.1/§1.2): run one or more declared
  * queries with a per-job listener and print, per query rep, every Spark
  * job's wall time + description plus the driver-side gap total — the
  * "how many actions does this verb run and where does the latency live"
  * question the optimization rounds keep asking. NOT part of the bench
  * contract; purely diagnostic.
  *
  * Usage: SPARK_GRAFT_PROFILE_ONLY=q138 sbt "runMain graft.Profile"
  */
object Profile {
  private case class Job(id: Int, desc: String, t0: Long, var t1: Long)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(math.min(32, Runtime.getRuntime.availableProcessors))
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_PROFILE_REPS", "2").toInt)
    val spark = GraftSession.builder(s"local[$cpus]", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      try {
        val df = spark.read.parquet(s"$sfDir/$t.parquet")
        df.persist(StorageLevel.MEMORY_AND_DISK)
        df.write.format("noop").mode("overwrite").save()
      } catch { case _: Throwable => () }
    }
    val jobs = new ConcurrentLinkedQueue[Job]()
    val live = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val d = e.stageInfos.lastOption.map(_.name)
          .orElse(Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        val j = Job(e.jobId, d, System.nanoTime(), 0L)
        live.put(e.jobId, j); jobs.add(j)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(live.remove(e.jobId)).foreach(_.t1 = System.nanoTime())
      }
    })
    val only = sys.env.getOrElse("SPARK_GRAFT_PROFILE_ONLY", "")
      .split(',').map(_.trim).filter(_.nonEmpty)
    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => only.isEmpty || only.exists(q._1.contains))
    qs.foreach { case (name, fn) =>
      (1 to reps).foreach { rep =>
        jobs.clear()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val t1 = System.nanoTime()
        // listener events are async; give the bus a beat
        Thread.sleep(200)
        val js = jobs.toArray(Array.empty[Job]).sortBy(_.t0)
        val jobSecs = js.map(j =>
          math.max(0L, j.t1 - j.t0) / 1e9).sum
        println(f"PROFILE $name rep=$rep total=${(t1 - t0) / 1e9}%.3f " +
          f"jobs=${js.length} job_secs=$jobSecs%.3f " +
          f"gap_secs=${(t1 - t0) / 1e9 - jobSecs}%.3f")
        if (rep == reps) js.foreach { j =>
          val d = if (j.t1 == 0) -1.0 else (j.t1 - j.t0) / 1e9
          println(f"  job ${j.id}%4d ${d}%7.3f  ${j.desc.take(110)}")
        }
      }
    }
    spark.stop()
  }
}
