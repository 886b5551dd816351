package graft

import org.apache.spark.sql.functions._

import graft.ingest.ManifestSink

/** Regression pins for the r20 self-review findings over the
  * generic-partition / type-widening / incremental-sync surfaces.
  */
class ReviewHardeningSpec extends SparkSpec {
  import spark.implicits._

  test("overwrite of a bare-generic-partitioned table with a matching " +
      "schema is accepted (the guard strips the layout column the " +
      "frame actually derives, not p_date)") {
    val dir = tmpDir("rh_owgen_")
    val df = Seq((1, 10L, "a"), (2, 20L, "b")).toDF("shard", "id", "v")
    // bare spec on an INT column = generic layout (shard=N/ dirs)
    ManifestSink.statsAppend(df, dir, Some("shard"), Seq("id"))
    // same-shaped overwrite must pass the schema guard
    ManifestSink.overwrite(
      Seq((1, 30L, "c")).toDF("shard", "id", "v"),
      dir, Some("shard"), Seq("id"))
    val back = ManifestSink.readBack(spark, dir)
    assert(back.count() === 1L)
    assert(back.select("shard", "id", "v").as[(Int, Long, String)]
      .head() === ((1, 30L, "c")))
  }

  test("dynamic overwritePartitions with a '/' in a generic partition " +
      "value replaces that partition (no silent duplicates)") {
    val dir = tmpDir("rh_slash_")
    val base = Seq(("a/4", 1L), ("en", 2L)).toDF("lang", "id")
    ManifestSink.statsAppend(base, dir, Some("val(lang)"), Seq("id"))
    // dynamic spec: the frame's own values name the replaced partitions
    val repl = Seq(("a/4", 10L)).toDF("lang", "id")
    val replaced = ManifestSink.overwritePartitions(repl, dir,
      "val(lang)", values = Nil, statsCols = Seq("id"))
    assert(replaced >= 1L, "the a/4 partition was not replaced")
    val back = ManifestSink.readBack(spark, dir)
      .select("lang", "id").as[(String, Long)].collect().toSet
    assert(back === Set(("a/4", 10L), ("en", 2L)))
    // a derived '..' value refuses loudly instead of reaching a
    // directory name
    val evil = Seq(("..", 99L)).toDF("lang", "id")
    val e = intercept[IllegalArgumentException] {
      ManifestSink.overwritePartitions(evil, dir, "val(lang)",
        values = Nil, statsCols = Seq("id"))
    }
    assert(e.getMessage.contains(".."))
  }

  test("multi-column ALTER COLUMN TYPE is atomic: a refused later " +
      "spec leaves NO earlier widen committed") {
    val dir = tmpDir("rh_widen_")
    ManifestSink.statsAppend(
      Seq((1, 1.5f, "x")).toDF("a", "b", "c")
        .select(col("a").cast("int").as("a"), col("b"), col("c")),
      dir, None, Seq("a"))
    spark.sql("DROP TABLE IF EXISTS rh_widen_t")
    spark.sql(s"CREATE TABLE rh_widen_t USING graft LOCATION '$dir'")
    val before = ManifestSink.snapshotHandle(spark, dir).version
    intercept[Exception] {
      spark.sql("ALTER TABLE rh_widen_t ALTER COLUMN a TYPE BIGINT, " +
        "c TYPE DATE") // string -> date refuses
    }
    // NOTHING landed: same version, column a still int
    assert(ManifestSink.snapshotHandle(spark, dir).version === before)
    assert(ManifestSink.readBack(spark, dir).schema("a").dataType ===
      org.apache.spark.sql.types.IntegerType)
    // the valid multi-column form widens BOTH in one commit
    spark.sql("ALTER TABLE rh_widen_t ALTER COLUMN a TYPE BIGINT, " +
      "b TYPE DOUBLE")
    assert(ManifestSink.snapshotHandle(spark, dir).version ===
      before + 1)
    val sch = ManifestSink.readBack(spark, dir).schema
    assert(sch("a").dataType === org.apache.spark.sql.types.LongType)
    assert(sch("b").dataType === org.apache.spark.sql.types.DoubleType)
    spark.sql("DROP TABLE rh_widen_t")
  }

  test("SQL full-sync MERGE keeps bloom coverage: synced appends " +
      "carry bloom lines for the table's indexed columns") {
    val dir = tmpDir("rh_bloomsync_")
    ManifestSink.statsAppend(
      (1L to 20L).map(i => (s"k$i", i)).toDF("k", "n"),
      dir, None, Seq("n"), bloomCols = Seq("k"))
    spark.sql("DROP TABLE IF EXISTS rh_bs_t")
    spark.sql(s"CREATE TABLE rh_bs_t USING graft LOCATION '$dir'")
    // full sync: evens doubled, odds vanish, one new key
    spark.sql(
      """CREATE OR REPLACE TEMPORARY VIEW rh_bs_src AS
         SELECT k, n * 2 AS n FROM rh_bs_t WHERE n % 2 = 0
         UNION ALL SELECT 'k999', CAST(999 AS BIGINT)""")
    spark.sql(
      """MERGE INTO rh_bs_t t USING rh_bs_src s ON t.k = s.k
         WHEN MATCHED THEN UPDATE SET *
         WHEN NOT MATCHED THEN INSERT *
         WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    // every synced (appended) file has a bloom filter for k
    val handle = ManifestSink.snapshotHandle(spark, dir)
    assert(handle.bloomColumns === Seq("k"))
    val synced = handle.targets.filter(_.contains("ms"))
    assert(synced.nonEmpty, s"no sync-appended files in ${handle.targets}")
    // a point lookup on the synced content answers correctly
    assert(ManifestSink.readBackWherePred(spark, dir,
      ManifestSink.SkipPredicate.StrEq("k", "k999")).count() === 1L)
    assert(ManifestSink.readBackWherePred(spark, dir,
      ManifestSink.SkipPredicate.StrEq("k", "k4"))
      .select("n").as[Long].head() === 8L)
    spark.sql("DROP TABLE rh_bs_t")
    spark.catalog.dropTempView("rh_bs_src")
    // the FIRST sync of a fresh table threads bloom too (the early
    // statsAppend path used to drop it)
    val fresh = tmpDir("rh_bloomsync_fresh_")
    ManifestSink.mergeSync(spark, fresh,
      Seq(("a", 1L), ("b", 2L)).toDF("k", "n"), "k",
      statsCols = Seq("n"), bloomCols = Seq("k"))
    assert(ManifestSink.snapshotHandle(spark, fresh).bloomColumns ===
      Seq("k"))
  }

  test("partition-explosion guard: a batch staging more directories " +
      "than MaxStagedDirs refuses before anything commits") {
    val dir = tmpDir("rh_explode_")
    val before = ManifestSink.MaxStagedDirs
    ManifestSink.MaxStagedDirs = 5
    try {
      val df = (1L to 12L).map(i => (i, i * 1000L)).toDF("id", "ts_ms")
      val e = intercept[IllegalArgumentException] {
        // bare spec over a LongType column = generic layout, one
        // directory per distinct value — 12 dirs > cap 5
        ManifestSink.statsAppend(df, dir, Some("ts_ms"), Seq("id"))
      }
      assert(e.getMessage.contains("MaxStagedDirs"))
      // nothing committed, staging swept
      assert(ManifestSink.snapshotHandle(spark, dir).targets.isEmpty)
      val sroot = new java.io.File(
        new java.io.File(dir).getParent,
        ".staging_" + new java.io.File(dir).getName)
      assert(!sroot.exists() || sroot.listFiles().isEmpty)
      // an in-cap batch commits normally
      ManifestSink.statsAppend(
        (1L to 12L).map(i => (i, i % 3)).toDF("id", "ts_ms"),
        dir, Some("ts_ms"), Seq("id"))
      assert(ManifestSink.readBack(spark, dir).count() === 12L)
    } finally ManifestSink.MaxStagedDirs = before
  }

  test("generic partition values that don't round-trip inference " +
      "refuse at write; canonical and non-numeric values pass; " +
      "existing directories are grandfathered") {
    val dir = tmpDir("rh_roundtrip_")
    // zero-padded numeric string: would read back as the integer 1
    val e = intercept[IllegalArgumentException] {
      ManifestSink.statsAppend(
        Seq(("01", 1L)).toDF("store", "id"),
        dir, Some("val(store)"), Seq("id"))
    }
    assert(e.getMessage.contains("round"))
    assert(ManifestSink.snapshotHandle(spark, dir).targets.isEmpty)
    // scale<=0 decimals and lenient dates coerce under inference too
    intercept[IllegalArgumentException] {
      ManifestSink.statsAppend(Seq(("1e3", 1L)).toDF("store", "id"),
        dir, Some("val(store)"), Seq("id"))
    }
    intercept[IllegalArgumentException] {
      ManifestSink.statsAppend(
        Seq(("2026-1-1", 1L)).toDF("store", "id"),
        dir, Some("val(store)"), Seq("id"))
    }
    // canonical numerics, ISO dates, positive-scale decimals, and
    // non-numeric strings all pass
    ManifestSink.statsAppend(
      Seq(("7", 1L), ("en", 2L), ("2026-01-01", 3L), ("1.50", 4L))
        .toDF("store", "id"),
      dir, Some("val(store)"), Seq("id"))
    assert(ManifestSink.readBack(spark, dir).count() === 4L)
    // grandfathering: hand-create a legacy-style zero-padded dir via
    // a pre-guard layout, then verify maintenance over it still runs
    val dir2 = tmpDir("rh_roundtrip2_")
    ManifestSink.statsAppend(
      Seq(("x01", 1L), ("en", 2L)).toDF("store", "id"),
      dir2, Some("val(store)"), Seq("id"))
    // replacing an EXISTING partition re-stages the same dir: allowed
    val n = ManifestSink.overwritePartitions(
      Seq(("en", 20L)).toDF("store", "id"), dir2, "val(store)",
      values = Seq("en"), statsCols = Seq("id"))
    assert(n >= 1L)
    assert(ManifestSink.readBack(spark, dir2)
      .where(col("store") === "en").select("id").as[Long]
      .head() === 20L)
  }

  test("reliable pinning cleans up after itself: no checkpoint debris " +
      "left under checkpointDir after the commit") {
    val dir = tmpDir("rh_pin_")
    val ck = tmpDir("rh_pin_ck_")
    val base = (1L to 100L).map(i => (i, java.sql.Date.valueOf(
        if (i <= 50) "2026-02-01" else "2026-02-02")))
      .toDF("id", "day")
    ManifestSink.statsAppend(base, dir, Some("day"), Seq("id"))
    val repl = (1L to 10L).map(i => (i + 1000L,
        java.sql.Date.valueOf("2026-02-01"))).toDF("id", "day")
    val n = ManifestSink.overwritePartitions(repl, dir, "day",
      values = Seq("2026-02-01"), statsCols = Seq("id"),
      checkpointDir = Some(ck))
    assert(n >= 1L)
    assert(ManifestSink.readBack(spark, dir).count() === 60L)
    // the pin parquet was swept
    val left = new java.io.File(ck).listFiles()
    assert(left == null || left.isEmpty,
      s"pin debris left: ${Option(left).toSeq.flatten.mkString(",")}")
    // mergeSync's pins sweep too
    val src = ManifestSink.readBack(spark, dir)
      .withColumn("id", col("id") + 1L).localCheckpoint()
    ManifestSink.mergeSync(spark, dir, src, "id",
      partitionField = Some("day"), statsCols = Seq("id"),
      checkpointDir = Some(ck))
    val left2 = new java.io.File(ck).listFiles()
    assert(left2 == null || left2.isEmpty,
      s"mergeSync pin debris left: " +
        s"${Option(left2).toSeq.flatten.mkString(",")}")
  }
}
