package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ingest.Ingest
import graft.model.Manifest
import graft.views.Views

/** Flagship end-to-end: the reference's whole lifecycle in one call.
  *
  * Builds the FIXTURES.md sensor CSVs in a temp dir, runs the manifest-
  * driven ingest twice (second run must be a no-op thanks to the ledger),
  * loads a wider v2 file (schema evolution right-appends a float channel),
  * and returns the `_ordered` local-time view of the destination table —
  * i.e. S2–S5, P2–P3, J1, SO2, F1, F7, ST2–ST3 in one query.
  */
object Flagship {

  val ManifestJson: String =
    """{
      "project": "graft-demo",
      "jobIdPrefix": "g__",
      "tasks": [{
        "sources": ["**/sensors/**/*.csv"],
        "dataset": "demo",
        "table": "sensors",
        "timePartitioningField": "timestamp",
        "fields": [
          {"name": "timestamp",  "type": "timestamp"},
          {"name": "utc_offset", "type": "float"},
          {"name": "location",   "type": "string"}
        ]
      }]
    }"""

  def run(spark: SparkSession): DataFrame = {
    val root = Files.createTempDirectory("graft_flagship_").toFile
    val src = new java.io.File(root, "src/sensors/2026")
    src.mkdirs()
    val wh = new java.io.File(root, "warehouse").getAbsolutePath

    def write(name: String, body: String): Unit = {
      val w = new java.io.PrintWriter(new java.io.File(src, name))
      try w.write(body) finally w.close()
    }
    write("a_v1.csv",
      """timestamp,utc_offset,location,temp_c,humidity
        |2026-08-01 00:00:00,8.0,perth,21.5,0.61
        |2026-08-01 00:05:00,8.0,perth,21.7,0.60
        |""".stripMargin)

    val manifest = Manifest.parse(ManifestJson)
    val task = manifest.tasks.head
    val srcRoot = new java.io.File(root, "src").getAbsolutePath

    val r1 = Ingest.loadTask(spark, task, srcRoot, wh)
    // replay: ledger must make this a no-op (ST2 effectively-once per file)
    val r2 = Ingest.loadTask(spark, task, srcRoot, wh)
    require(r2.loadedFiles.isEmpty, "ledger failed to dedup replayed files")

    // wider v2 file — schema evolution appends pressure_hpa as float
    write("b_v2.csv",
      """timestamp,utc_offset,location,temp_c,humidity,pressure_hpa
        |2026-08-02 00:00:00,-5.5,adelaide,19.0,0.55,1013.2
        |2026-08-02 00:05:00,5.75,kathmandu,28.1,0.72,1008.4
        |""".stripMargin)
    val r3 = Ingest.loadTask(spark, task, srcRoot, wh)
    require(r3.loadedFiles.length == 1, "evolved file not picked up")

    Views.localTimeOrdered(Ingest.readDest(spark, r1.destPath))
  }
}
