package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs (one JVM-wide session — Spark
  * startup is ~5s, so suites must not each build their own).
  */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh_").toString)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the production GraftSession.builder sets the same: functions +
      // the SQL DML router inject at session build only
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // ... and the fork-free local fs (chmod via java.nio, not a
      // `chmod` subprocess per created file) — production parity
      .config("spark.hadoop.fs.file.impl",
        "graft.ingest.NioLocalFileSystem")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite {
  // stable identifier so specs can `import spark.implicits._`
  lazy val spark: SparkSession = SparkSpec.spark
  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}
