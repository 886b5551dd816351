package graft

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

import graft.ingest.ManifestSink

/** Maintenance SQL (the wrapped parser): OPTIMIZE / VACUUM /
  * DESCRIBE HISTORY / RESTORE / REORG route to the Scala maintenance
  * API; targets are catalog tables or quoted paths; non-graft names
  * refuse loudly; everything else still parses through the delegate.
  */
class GraftSqlMaintenanceSpec extends SparkSpec {

  import spark.implicits._

  test("OPTIMIZE (incl. ZORDER BY), DESCRIBE HISTORY, RESTORE, " +
      "REORG (PURGE), VACUUM [DRY RUN] — all via SQL, catalog-table " +
      "and quoted-path targets") {
    val dest = s"${tmpDir("sqlmaint_")}/t"
    val tbl = "sqlmaint_" + java.util.UUID.randomUUID().toString
      .replace("-", "").take(8)
    (0L until 4L).foreach { i =>
      (i * 100L until (i + 1) * 100L).map(x => (x, s"v$x"))
        .toDF("id", "v").coalesce(1)
        .write.format("graft").mode("append")
        .option("statsCols", "id").save(dest)
    }
    spark.sql(s"CREATE TABLE $tbl USING graft LOCATION '$dest'")
    try {
      val hist = spark.sql(s"DESCRIBE HISTORY $tbl")
      assert(hist.columns.toSeq ==
        Seq("version", "commit_ts", "kind", "n_files", "n_rows"))
      assert(hist.count() == 4L)

      // OPTIMIZE with a z-order key: 4 files repack, content identical
      val opt = spark.sql(s"OPTIMIZE $tbl ZORDER BY (id)")
      assert(opt.columns.toSeq == Seq("files_repacked"))
      assert(opt.head.getLong(0) == 4L)
      assert(spark.table(tbl).count() == 400L)

      // RESTORE to the 2-append state (quoted-path target form)
      val res = spark.sql(
        s"RESTORE TABLE '$dest' TO VERSION AS OF 1")
      assert(res.columns.toSeq == Seq("restored_to_version"))
      assert(res.head.getLong(0) == 5L)
      // a PATH-target restore can't know which catalog entries point
      // at the dest — the fresh-read path sees it immediately, the
      // cached relation after an explicit REFRESH
      assert(ManifestSink.readBack(spark, dest).count() == 200L)
      spark.sql(s"REFRESH TABLE $tbl")
      assert(spark.table(tbl).count() == 200L)

      // gut one region with a mor delete, then REORG APPLY (PURGE):
      // only the under-threshold files rewrite, dvs materialize
      spark.sql(s"DELETE FROM $tbl WHERE id < 60")
      spark.conf.set("spark.graft.purge.minLiveFraction", "0.9")
      try {
        val reorg = spark.sql(s"REORG TABLE $tbl APPLY (PURGE)")
        assert(reorg.columns.toSeq == Seq("files_materialized"))
        assert(reorg.head.getLong(0) == 1L, reorg.head.toString)
      } finally spark.conf.unset("spark.graft.purge.minLiveFraction")
      assert(spark.table(tbl).count() == 140L)
      assert(ManifestSink.snapshotHandle(spark, dest).dvs.isEmpty)

      // VACUUM deletes only files NO surviving manifest references —
      // with the full log retained (time travel!) that's nothing, so
      // collapse history first, then the superseded files are sweepable
      assert(spark.sql(s"VACUUM $tbl RETAIN 0 HOURS DRY RUN")
        .count() == 0L)
      ManifestSink.compact(spark, dest)
      val dry = spark.sql(s"VACUUM $tbl RETAIN 0 HOURS DRY RUN")
      assert(dry.columns.toSeq == Seq("path"))
      val wouldDelete = dry.count()
      assert(wouldDelete > 0L)
      val vac = spark.sql(s"VACUUM $tbl RETAIN 0 HOURS")
      assert(vac.columns.toSeq == Seq("deleted_files"))
      assert(vac.head.getLong(0) == wouldDelete)
      assert(spark.table(tbl).count() == 140L)
      assert(spark.sql(s"VACUUM $tbl RETAIN 0 HOURS DRY RUN")
        .count() == 0L)
    } finally spark.sql(s"DROP TABLE $tbl")
  }

  test("table-valued CDC reads: graft_changes decomposes appends + " +
      "mor deletes into row-level changes, graft_appends tails the " +
      "append feed, version bounds apply") {
    val dest = s"${tmpDir("sqltvf_")}/t"
    val tbl = "sqltvf_" + java.util.UUID.randomUUID().toString
      .replace("-", "").take(8)
    ManifestSink.statsAppend(
      (0L until 10L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1),
      dest, None, Seq("id"))
    ManifestSink.statsAppend(
      (10L until 20L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1),
      dest, None, Seq("id"))
    spark.sql(s"CREATE TABLE $tbl USING graft LOCATION '$dest'")
    try {
      spark.sql(s"DELETE FROM $tbl WHERE id % 5 = 0")   // v2: mor, 4 rows
      // bounds are (since, until] — since = -1 reads from creation
      val byType = spark.sql(
        s"""SELECT _change_type, count(*) AS n
            FROM graft_changes('$tbl', -1)
            GROUP BY _change_type ORDER BY _change_type""")
        .as[(String, Long)].collect().toSeq
      assert(byType == Seq(("delete", 4L), ("insert", 20L)))
      // bounded: only the delete version
      assert(spark.sql(s"SELECT count(*) FROM graft_changes('$dest', 1, 2)")
        .head.getLong(0) == 4L)
      // append feed by PATH, just v1
      assert(spark.sql(
        s"SELECT count(*) FROM graft_appends('$dest', 0, 1)")
        .head.getLong(0) == 10L)
      // joins/filters compose like any relation
      assert(spark.sql(
        s"""SELECT count(*) FROM graft_changes('$tbl', -1) c
            JOIN $tbl t ON c.id = t.id
            WHERE c._change_type = 'insert'""").head.getLong(0) == 16L)
    } finally spark.sql(s"DROP TABLE $tbl")
  }

  test("ALTER TABLE ADD/DROP COLUMNS: metadata-only schema commits — " +
      "added columns read null on existing rows and accept INSERTs, " +
      "dropped columns vanish from reads, RESTORE below the ALTER " +
      "restores the old schema, refusals are loud") {
    val dest = s"${tmpDir("sqlalter_")}/t"
    val tbl = "sqlalter_" + java.util.UUID.randomUUID().toString
      .replace("-", "").take(8)
    ManifestSink.statsAppend(
      (0L until 10L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1),
      dest, None, Seq("id"))
    spark.sql(s"CREATE TABLE $tbl USING graft LOCATION '$dest'")
    try {
      spark.sql(s"ALTER TABLE $tbl ADD COLUMNS (score DOUBLE)")
      assert(spark.table(tbl).columns.toSeq == Seq("id", "v", "score"))
      assert(spark.table(tbl).where(col("score").isNull).count() == 10L)
      // DESCRIBE agrees (catalog synced) and history records the kind
      assert(spark.sql(s"DESCRIBE TABLE $tbl")
        .where("col_name = 'score'").count() == 1L)
      assert(ManifestSink.history(spark, dest)
        .where("kind = 'schema'").count() == 1L)
      // the new column accepts data
      spark.sql(s"INSERT INTO $tbl VALUES (100, 'x', 9.5)")
      assert(spark.table(tbl).where("score = 9.5").count() == 1L)
      assert(spark.table(tbl).agg(sum("score")).head.getDouble(0)
        == 9.5)

      // DROP: the column vanishes from reads; the data files keep it
      spark.sql(s"ALTER TABLE $tbl DROP COLUMN score")
      assert(spark.table(tbl).columns.toSeq == Seq("id", "v"))
      assert(spark.table(tbl).count() == 11L)
      // IF EXISTS tolerates a missing column; without it, loud
      spark.sql(s"ALTER TABLE $tbl DROP COLUMN IF EXISTS nope")
      val e1 = intercept[AnalysisException](
        spark.sql(s"ALTER TABLE $tbl DROP COLUMN nope"))
      assert(e1.getMessage.contains("does not exist"), e1.getMessage)
      val e2 = intercept[AnalysisException](
        spark.sql(s"ALTER TABLE $tbl ADD COLUMNS (id BIGINT)"))
      assert(e2.getMessage.contains("already exists"), e2.getMessage)

      // RESTORE below both ALTERs: the original 2-column schema and
      // the original rows come back
      spark.sql(s"RESTORE TABLE $tbl TO VERSION AS OF 0")
      assert(spark.table(tbl).columns.toSeq == Seq("id", "v"))
      assert(spark.table(tbl).count() == 10L)
    } finally spark.sql(s"DROP TABLE $tbl")
  }

  test("ALTER TABLE ALTER COLUMN TYPE (widening): a metadata-only " +
      "commit — old int files read as long, INSERT at the new type, " +
      "DML and OPTIMIZE cross the boundary, time travel and RESTORE " +
      "reach the pre-widen type, unsafe promotions refuse") {
    val dest = s"${tmpDir("sqlwiden_")}/t"
    val tbl = "sqlwiden_" + java.util.UUID.randomUUID().toString
      .replace("-", "").take(8)
    // v0: INT ids and FLOAT score in the files' physical footers
    ManifestSink.statsAppend(
      (0 until 100).map(i => (i, i.toFloat / 2, s"v$i"))
        .toDF("id", "score", "v")
        .repartitionByRange(2, col("id")),
      dest, None, Seq("id"))
    spark.sql(s"CREATE TABLE $tbl USING graft LOCATION '$dest'")
    try {
      assert(spark.table(tbl).schema("id").dataType.simpleString == "int")
      val before = spark.table(tbl).inputFiles.toSet

      spark.sql(s"ALTER TABLE $tbl ALTER COLUMN id TYPE BIGINT") // v1
      spark.sql(s"ALTER TABLE $tbl ALTER COLUMN score TYPE DOUBLE") // v2
      // metadata-only: same files, widened read schema, values intact
      assert(spark.table(tbl).inputFiles.toSet == before)
      assert(spark.table(tbl).schema("id").dataType.simpleString
        == "bigint")
      assert(spark.table(tbl).schema("score").dataType.simpleString
        == "double")
      assert(spark.table(tbl).agg(sum("id")).head.getLong(0) == 4950L)
      assert(spark.sql(s"DESCRIBE TABLE $tbl")
        .where("col_name = 'id' AND data_type = 'bigint'").count() == 1L)

      // INSERT at the widened type: a value beyond int range lands
      spark.sql(s"INSERT INTO $tbl VALUES (${1L << 40}, 1.0, 'wide')")
      assert(spark.table(tbl).where(s"id = ${1L << 40}").count() == 1L)
      // aggregate ACROSS pre- and post-widen files in one scan
      assert(spark.table(tbl).agg(sum("id")).head.getLong(0) ==
        4950L + (1L << 40))
      // skipping stats still prune across the boundary
      assert(ManifestSink.countWhere(spark, dest,
        ManifestSink.SkipPredicate.NumRange("id", 0, 9)) == 10L)

      // DML across the boundary: delete rows living in pre-widen files
      assert(spark.sql(s"DELETE FROM $tbl WHERE id < 10")
        .head.getLong(0) == 10L)
      assert(spark.table(tbl).count() == 91L)
      // OPTIMIZE materializes the widen per file and stays readable
      assert(ManifestSink.optimize(spark, dest,
        targetBytes = 1L << 30) > 0L)
      assert(spark.table(tbl).agg(sum("id")).head.getLong(0) ==
        4950L - 45L + (1L << 40))

      // time travel below the widen reads the PRE-widen type
      assert(ManifestSink.readVersion(spark, dest, 0)
        .schema("id").dataType.simpleString == "int")
      assert(ManifestSink.readVersion(spark, dest, 0).count() == 100L)

      // unsafe promotions refuse loudly
      val e1 = intercept[AnalysisException](spark.sql(
        s"ALTER TABLE $tbl ALTER COLUMN id TYPE INT"))
      assert(e1.getMessage.contains("not a safe widening"),
        e1.getMessage)
      val e2 = intercept[AnalysisException](spark.sql(
        s"ALTER TABLE $tbl ALTER COLUMN v TYPE BIGINT"))
      assert(e2.getMessage.contains("not a safe widening"),
        e2.getMessage)
      val e3 = intercept[AnalysisException](spark.sql(
        s"ALTER TABLE $tbl ALTER COLUMN nope TYPE BIGINT"))
      assert(e3.getMessage.contains("does not exist"), e3.getMessage)
    } finally spark.sql(s"DROP TABLE $tbl")

    // RESTORE below the widen: pre-widen schema AND rows come back
    val dest2 = s"${tmpDir("sqlwiden2_")}/t"
    val tbl2 = "sqlwiden2_" + java.util.UUID.randomUUID().toString
      .replace("-", "").take(8)
    ManifestSink.statsAppend(
      (0 until 10).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1),
      dest2, None, Seq("id"))
    spark.sql(s"CREATE TABLE $tbl2 USING graft LOCATION '$dest2'")
    try {
      spark.sql(s"ALTER TABLE $tbl2 ALTER COLUMN id TYPE BIGINT")
      spark.sql(s"INSERT INTO $tbl2 VALUES (${1L << 40}, 'w')")
      assert(spark.table(tbl2).count() == 11L)
      spark.sql(s"RESTORE TABLE $tbl2 TO VERSION AS OF 0")
      assert(spark.table(tbl2).schema("id").dataType.simpleString
        == "int")
      assert(spark.table(tbl2).count() == 10L)
      // a RE-widen after the restore works (the log rebases forward)
      spark.sql(s"ALTER TABLE $tbl2 ALTER COLUMN id TYPE BIGINT")
      assert(spark.table(tbl2).schema("id").dataType.simpleString
        == "bigint")
      assert(spark.table(tbl2).agg(sum("id")).head.getLong(0) == 45L)
    } finally spark.sql(s"DROP TABLE $tbl2")
  }

  test("DESCRIBE DETAIL and SHOW PARTITIONS: the log-resolved health " +
      "card and partition listing through SQL") {
    val dest = s"${tmpDir("sqlmaint_det_")}/t"
    val tbl = "sqlmaint_det_" + java.util.UUID.randomUUID().toString
      .replace("-", "").take(8)
    for (d <- Seq("2026-01-01", "2026-01-02"))
      ManifestSink.statsAppend(
        (0L until 10L).map(i => (i, java.sql.Date.valueOf(d)))
          .toDF("id", "day").coalesce(1),
        dest, Some("day"), Seq("id"), bloomCols = Seq("id"))
    spark.sql(s"CREATE TABLE $tbl USING graft LOCATION '$dest'")
    try {
      val det = spark.sql(s"DESCRIBE DETAIL $tbl")
      assert(det.columns.toSeq.take(4) ==
        Seq("version", "num_files", "size_bytes", "num_rows"))
      val r = det.head
      assert(r.getLong(0) == 1L) // head version
      assert(r.getLong(1) == 2L) // files
      assert(r.getLong(2) > 0L)
      assert(r.getLong(3) == 20L) // metadata row count
      assert(r.getSeq[String](5) == Seq("id")) // stats columns
      assert(r.getSeq[String](6) == Seq("id")) // bloom columns
      // SHOW PARTITIONS lists both day directories with counts
      val parts = spark.sql(s"SHOW PARTITIONS $tbl")
        .as[(String, Long, Option[Long])].collect()
        .map { case (p, n, r2) => p -> ((n, r2)) }.toMap
      assert(parts.keySet ==
        Set("p_date=2026-01-01", "p_date=2026-01-02"))
      assert(parts("p_date=2026-01-01") == ((1L, Some(10L))))
      // path-form targets work too
      assert(spark.sql(s"DESCRIBE DETAIL '$dest'").count() == 1L)
    } finally spark.sql(s"DROP TABLE $tbl")
  }

  test("ALTER TABLE RENAME COLUMN: a METADATA-ONLY column-mapping " +
      "commit — zero files rewritten, pre-rename rows KEEP their " +
      "values under the new name, skipping answers through the " +
      "mapping, RESTORE reaches the pre-rename state, partition and " +
      "duplicate names refuse") {
    val dest = s"${tmpDir("sqlmaint_ren_")}/t"
    val tbl = "sqlmaint_ren_" + java.util.UUID.randomUUID().toString
      .replace("-", "").take(8)
    (0L until 40L).map(i => (i, s"v$i", java.sql.Date.valueOf(
        if (i < 20) "2026-01-01" else "2026-01-02")))
      .toDF("id", "v", "day").repartition(2)
      .pipe(df => ManifestSink.statsAppend(df, dest, Some("day"),
        Seq("id")))
    spark.sql(s"CREATE TABLE $tbl USING graft LOCATION '$dest'")
    try {
      val filesBefore =
        ManifestSink.snapshotHandle(spark, dest).targets.toSet
      val r = spark.sql(s"ALTER TABLE $tbl RENAME COLUMN id TO doc_id")
      assert(r.columns.toSeq == Seq("files_rewritten"))
      assert(r.head.getLong(0) == 0L) // metadata-only: nothing rewritten
      assert(ManifestSink.snapshotHandle(spark, dest).targets.toSet ==
        filesBefore)
      // THE anti-null contract: every pre-rename row keeps its value
      // under the new name (a metadata-only rename would null them)
      val back = spark.table(tbl)
      assert(back.columns.contains("doc_id") &&
        !back.columns.contains("id"))
      assert(back.where("doc_id IS NULL").count() == 0L)
      assert(back.agg(sum("doc_id")).head.getLong(0) ==
        (0L until 40L).sum)
      // skipping stats migrated to the new name: a metadata count
      // and a pruned read still answer
      assert(ManifestSink.countWhere(spark, dest,
        ManifestSink.SkipPredicate.NumRange("doc_id", 0, 9)) == 10L)
      // partition layout survived the rewrite
      assert(back.where("p_date = '2026-01-01'").count() == 20L)
      // RESTORE reaches the pre-rename schema and rows
      spark.sql(s"RESTORE TABLE $tbl TO VERSION AS OF 0")
      assert(spark.table(tbl).columns.contains("id"))
      assert(spark.table(tbl).agg(sum("id")).head.getLong(0) ==
        (0L until 40L).sum)
      // refusals: unknown column, duplicate target, partition column
      val e1 = intercept[Exception](spark.sql(
        s"ALTER TABLE $tbl RENAME COLUMN nope TO x"))
      assert(e1.getMessage.contains("does not exist"), e1.getMessage)
      val e2 = intercept[Exception](spark.sql(
        s"ALTER TABLE $tbl RENAME COLUMN id TO v"))
      assert(e2.getMessage.contains("already exists"), e2.getMessage)
      val e3 = intercept[Exception](spark.sql(
        s"ALTER TABLE $tbl RENAME COLUMN p_date TO d2"))
      assert(e3.getMessage.contains("partition"), e3.getMessage)
    } finally spark.sql(s"DROP TABLE $tbl")
  }

  test("non-graft targets refuse loudly; ordinary SQL still parses " +
      "through the delegate") {
    val pq = s"${tmpDir("sqlmaint_plain_")}/p"
    Seq((1, "a")).toDF("id", "v").write.parquet(pq)
    val ptbl = "sqlmaint_plain_" + java.util.UUID.randomUUID().toString
      .replace("-", "").take(8)
    spark.sql(s"CREATE TABLE $ptbl USING parquet LOCATION '$pq'")
    try {
      val e = intercept[AnalysisException](
        spark.sql(s"OPTIMIZE $ptbl"))
      assert(e.getMessage.contains("not a graft table"), e.getMessage)
      // the wrapped parser must not disturb normal statements
      assert(spark.sql(s"SELECT count(*) FROM $ptbl WHERE id > 0")
        .head.getLong(0) == 1L)
      assert(spark.sql("DESCRIBE TABLE " + ptbl).count() > 0L)
    } finally spark.sql(s"DROP TABLE $ptbl")
  }

  private implicit class Piper[A](a: A) {
    def pipe[B](f: A => B): B = f(a)
  }
}
