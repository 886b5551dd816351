package graft

import org.apache.spark.sql.functions._

import graft.ingest.{Ingest, ManifestSink}
import graft.ledger.Ledger
import graft.model.Manifest

/** The manifest-log sink must mirror every ParquetSink crash case AND
  * close the dirty-read window: a reader between the data-file moves and
  * the manifest commit sees NOTHING (ParquetSink exposes the moved files
  * there), and a batch becomes visible in one atomic metadata op.
  */
class ManifestSinkSpec extends SparkSpec {

  import spark.implicits._

  private val manifestJson =
    """{
      "project": "t",
      "tasks": [{
        "sources": ["**/in/**/*.csv"],
        "dataset": "ds",
        "table": "sensors",
        "fields": [
          {"name": "timestamp",  "type": "timestamp"},
          {"name": "utc_offset", "type": "float"},
          {"name": "location",   "type": "string"}
        ]
      }]
    }"""

  private def writeCsv(dir: java.io.File, name: String, body: String): Unit = {
    dir.mkdirs()
    val w = new java.io.PrintWriter(new java.io.File(dir, name))
    try w.write(body) finally w.close()
  }

  test("loadTask through ManifestSink: rows land atomically, ledger " +
      "replay is a no-op, log versions are ordered") {
    val root = tmpDir("msink_")
    writeCsv(new java.io.File(s"$root/in"), "a.csv",
      "timestamp,utc_offset,location\n" +
        "2026-01-01 00:00:00,1.0,x\n2026-01-02 00:00:00,1.0,y\n")
    val task = Manifest.parse(manifestJson).tasks.head
    val r = Ingest.loadTask(spark, task, root, s"$root/wh", ManifestSink)
    assert(r.rows == 2)
    assert(ManifestSink.readBack(spark, r.destPath).count() == 2)
    // replay: ledger filters everything, no new commit
    val r2 = Ingest.loadTask(spark, task, root, s"$root/wh", ManifestSink)
    assert(r2.loadedFiles.isEmpty)
    assert(ManifestSink.readBack(spark, r.destPath).count() == 2)
    // second batch appends a second, higher-versioned manifest
    writeCsv(new java.io.File(s"$root/in"), "b.csv",
      "timestamp,utc_offset,location\n2026-01-03 00:00:00,1.0,z\n")
    val r3 = Ingest.loadTask(spark, task, root, s"$root/wh", ManifestSink)
    assert(r3.rows == 3)
    val log = new java.io.File(s"$root/wh/ds/sensors/_log").listFiles()
      .map(_.getName).filter(_.endsWith(".manifest")).sorted
    assert(log.length == 2)
    assert(log(0).takeWhile(_.isDigit).toLong <
      log(1).takeWhile(_.isDigit).toLong)
    // partition-directory column survives the explicit-file-list read
    assert(ManifestSink.readBack(spark, r.destPath)
      .select(Ingest.PartitionCol).distinct().count() == 3)
  }

  test("THE WINDOW IS CLOSED: moved-but-uncommitted files are invisible " +
      "to readers; recover sweeps them; replay lands exactly one copy") {
    val root = tmpDir("msinkwin_")
    val dest = s"$root/wh/t"
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    ManifestSink.stagedAppend(df, dest, None, "w1", Seq("gs://b/f1"))
    // emulate a crash between the move phase and the manifest commit by
    // deleting the just-committed log entry (staging + moved data files
    // remain — byte-identical to dying at step 3.5)
    val logDir = new java.io.File(s"$dest/_log")
    logDir.listFiles().filter(_.getName.endsWith(".manifest"))
      .foreach(f => assert(f.delete()))
    // data files ARE on disk under dest...
    val moved = new java.io.File(dest).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(moved.nonEmpty, "move phase must have placed files")
    // ...but a manifest reader sees NOTHING (ParquetSink's dirty window)
    assert(ManifestSink.readBack(spark, dest).count() == 0)
    // recover (nothing ledgered) sweeps the invisible files + staging
    ManifestSink.recover(spark, dest, _ => false)
    assert(new java.io.File(dest).listFiles()
      .count(_.getName.endsWith(".parquet")) == 0)
    assert(!new java.io.File(s"$root/wh/.staging_t").exists())
    // replay publishes exactly one copy
    ManifestSink.stagedAppend(df, dest, None, "w1", Seq("gs://b/f1"))
    ManifestSink.finishCommit(spark, dest, "w1")
    assert(ManifestSink.readBack(spark, dest).count() == 2)
  }

  test("crash between manifest commit and ledger append: rollback drops " +
      "the batch atomically (log entry first), replay does not duplicate") {
    val root = tmpDir("msinkledg_")
    writeCsv(new java.io.File(s"$root/in"), "a.csv",
      "timestamp,utc_offset,location\n" +
        "2026-01-01 00:00:00,1.0,x\n2026-01-02 00:00:00,1.0,y\n")
    val task = Manifest.parse(manifestJson).tasks.head
    object CrashAfterCommit extends Ingest.DestinationSink {
      override def append(df: org.apache.spark.sql.DataFrame, p: String,
          f: Option[String]): Unit = ManifestSink.append(df, p, f)
      override def readBack(s: org.apache.spark.sql.SparkSession, p: String) =
        ManifestSink.readBack(s, p)
      override def stagedAppend(df: org.apache.spark.sql.DataFrame,
          p: String, f: Option[String], id: String,
          uris: Seq[String]): Unit = {
        ManifestSink.stagedAppend(df, p, f, id, uris)
        throw new RuntimeException("simulated crash before ledger append")
      }
      override def recover(s: org.apache.spark.sql.SparkSession, p: String,
          c: Seq[String] => Boolean, minAgeMs: Long): Unit =
        ManifestSink.recover(s, p, c, minAgeMs)
      override def finishCommit(s: org.apache.spark.sql.SparkSession,
          p: String, id: String): Unit =
        ManifestSink.finishCommit(s, p, id)
    }
    intercept[RuntimeException] {
      Ingest.loadTask(spark, task, root, s"$root/wh", CrashAfterCommit)
    }
    // the batch COMMITTED to the table (atomically visible — that is the
    // design; it is a consistent state, not a partial one)...
    val dest = s"$root/wh/ds/sensors"
    assert(ManifestSink.readBack(spark, dest).count() == 2)
    // ...but not to the ledger
    assert(Ledger.importedUris(spark, s"$root/wh/ds/sensors_imported")
      .count() == 0)
    // replay with the healthy sink: recover un-publishes, then republishes
    val r = Ingest.loadTask(spark, task, root, s"$root/wh", ManifestSink)
    assert(r.rows == 2, "replay must not duplicate")
    assert(ManifestSink.readBack(spark, dest).count() == 2)
    assert(new java.io.File(s"$dest/_log").listFiles()
      .count(_.getName.endsWith(".manifest")) == 1)
    assert(!new java.io.File(s"$root/wh/ds/.staging_sensors").exists())
  }

  test("crash after ledger append, before marker cleanup: recover rolls " +
      "forward and keeps the rows") {
    val root = tmpDir("msinkfwd_")
    val dest = s"$root/wh/t"
    val df = Seq((1L, "a")).toDF("id", "v")
    ManifestSink.stagedAppend(df, dest, None, "w9", Seq("gs://b/f9"))
    // ledger says committed; staging marker still present
    assert(new java.io.File(s"$root/wh/.staging_t/w9").exists())
    ManifestSink.recover(spark, dest, _ => true)
    assert(ManifestSink.readBack(spark, dest).count() == 1)
    assert(!new java.io.File(s"$root/wh/.staging_t").exists())
    // replaying the same writeId after its commit survived is a no-op
    ManifestSink.stagedAppend(df, dest, None, "w9", Seq("gs://b/f9"))
    assert(ManifestSink.readBack(spark, dest).count() == 1)
  }

  test("snapshot reads and compaction: version N sees the prefix state; " +
      "compact preserves the table and survives a mid-cleanup crash") {
    val root = tmpDir("msinkver_")
    val dest = s"$root/wh/t"
    ManifestSink.append(Seq((1L, "a")).toDF("id", "v"), dest, None)
    ManifestSink.append(Seq((2L, "b")).toDF("id", "v"), dest, None)
    ManifestSink.append(Seq((3L, "c")).toDF("id", "v"), dest, None)
    val logDir = new java.io.File(s"$dest/_log")
    def versions = logDir.listFiles().map(_.getName)
      .filter(_.endsWith(".manifest")).map(_.takeWhile(_.isDigit).toLong)
      .sorted.toSeq
    assert(versions == Seq(0L, 1L, 2L))
    // time travel: each version is the commit prefix
    assert(ManifestSink.readVersion(spark, dest, 0L)
      .select("id").as[Long].collect().toSet == Set(1L))
    assert(ManifestSink.readVersion(spark, dest, 1L)
      .select("id").as[Long].collect().toSet == Set(1L, 2L))
    assert(ManifestSink.readBack(spark, dest).count() == 3)
    // compact: one snapshot manifest, table identical
    ManifestSink.compact(spark, dest)
    assert(versions == Seq(3L))
    assert(ManifestSink.readBack(spark, dest)
      .select("id").as[Long].collect().toSet == Set(1L, 2L, 3L))
    // append after compaction keeps versioning monotonic
    ManifestSink.append(Seq((4L, "d")).toDF("id", "v"), dest, None)
    assert(versions == Seq(3L, 4L))
    assert(ManifestSink.readBack(spark, dest).count() == 4)
    // crash MID-CLEANUP: snapshot committed but an old entry survives —
    // the deduped read still counts each file once; re-compact finishes
    val before = ManifestSink.readBack(spark, dest)
      .select("id").as[Long].collect().toSet
    ManifestSink.compact(spark, dest) // full compact: versions -> Seq(5)
    // recreate the crash state: copy the v4 snapshot content back as a
    // stale lower-version entry next to the new snapshot
    val snap = logDir.listFiles().filter(_.getName.endsWith(".manifest")).head
    val stale = new java.io.File(logDir, "000000000004__stale.manifest")
    java.nio.file.Files.copy(snap.toPath, stale.toPath)
    assert(ManifestSink.readBack(spark, dest)
      .select("id").as[Long].collect().toSet == before) // no double-count
    ManifestSink.compact(spark, dest)
    assert(versions.length == 1)
    assert(ManifestSink.readBack(spark, dest)
      .select("id").as[Long].collect().toSet == before)
  }

  test("compact refuses while a staged attempt is pending — the committed " +
      "write stays recoverable by writeId") {
    val root = tmpDir("msinkcmp_")
    val dest = s"$root/wh/t"
    ManifestSink.append(Seq((1L, "a")).toDF("id", "v"), dest, None)
    // w2 commits its manifest but crashes before finishCommit: staging
    // marker pending
    ManifestSink.stagedAppend(Seq((2L, "b")).toDF("id", "v"), dest, None,
      "w2", Seq("gs://b/f2"))
    val logDir = new java.io.File(s"$dest/_log")
    def entries = logDir.listFiles().map(_.getName)
      .filter(_.endsWith(".manifest")).sorted.toSeq
    assert(entries.length == 2)
    // compaction must refuse (collapsing w2's manifest name would make
    // recover misclassify it as never-committed and delete its files)
    ManifestSink.compact(spark, dest)
    assert(entries.length == 2, "compact must skip while attempts pend")
    // recover rolls w2 forward (ledgered), THEN compaction may run
    ManifestSink.recover(spark, dest, _ => true)
    ManifestSink.compact(spark, dest)
    assert(entries.length == 1)
    assert(ManifestSink.readBack(spark, dest)
      .select("id").as[Long].collect().toSet == Set(1L, 2L))
  }

  test("shardedWrite through ManifestSink: shards commit atomically and " +
      "are visible to readBack; assignment identical to the plain sink") {
    val root = tmpDir("msinkshw_")
    val dest = s"$root/wh/shards"
    val docs = (1L to 200L).map(i => (i, 10L + i % 17))
      .toDF("doc_id", "n_tokens")
    ManifestSink.shardedWrite(docs, dest, "n_tokens", "doc_id",
      tokenBudget = 128)
    // exactly one committed log version; the attempt marker is gone
    assert(new java.io.File(s"$dest/_log").listFiles()
      .count(_.getName.endsWith(".manifest")) == 1)
    assert(!new java.io.File(s"$root/wh/.staging_shards").exists())
    // readBack enumerates the shard files AND recovers the shard=NNN
    // directory column via basePath partition inference
    val back = ManifestSink.readBack(spark, dest)
    assert(back.count() == 200)
    assert(back.columns.contains(Ingest.ShardCol))
    // interchangeable with the plain sink: same deterministic assignment
    Ingest.ParquetSink.shardedWrite(docs, s"$root/plain", "n_tokens",
      "doc_id", tokenBudget = 128)
    val viaLog = back
      .select(col("doc_id"), col(Ingest.ShardCol).cast("long"))
      .as[(Long, Long)].collect().toMap
    val viaPlain = spark.read.parquet(s"$root/plain")
      .select(col("doc_id"), col(Ingest.ShardCol).cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(viaLog == viaPlain)
  }

  test("shardedWrite crash mid-write: nothing visible to readBack, " +
      "recover cleans the staged attempt, retry lands one copy") {
    val root = tmpDir("msinkshcr_")
    val dest = s"$root/wh/shards"
    // poison a PAYLOAD column (not the token/order columns assignShards
    // aggregates driver-side) so the failure fires inside the staged
    // parquet write — a genuine crash mid-shard-write
    val poison = udf((i: Long) =>
      if (i == 150L) throw new RuntimeException("simulated media death")
      else s"doc$i")
    val docs = spark.range(1, 201)
      .select(col("id").as("doc_id"), (lit(10L) + col("id") % 17)
        .as("n_tokens"), poison(col("id")).as("text"))
    intercept[Exception] {
      ManifestSink.shardedWrite(docs, dest, "n_tokens", "doc_id",
        tokenBudget = 128)
    }
    // no commit, so a manifest reader sees NOTHING
    assert(ManifestSink.readBack(spark, dest).count() == 0)
    // recover sweeps whatever the crash left (Spark's aborted stage write
    // may have deleted its own partial output already — both states are
    // legal crash states and both must clean to the same place)
    ManifestSink.recover(spark, dest, _ => false)
    assert(!new java.io.File(s"$root/wh/.staging_shards").exists())
    assert(ManifestSink.readBack(spark, dest).count() == 0)
    // a crash LATER in the protocol — shard files moved into dest, no log
    // commit yet: fabricate the attempt state (write-ahead manifest + a
    // moved orphan), recover must delete the invisible file and the marker
    val attempt = new java.io.File(s"$root/wh/.staging_shards/wX")
    attempt.mkdirs()
    val orphan = new java.io.File(s"$dest/shard=0")
    orphan.mkdirs()
    val orphanFile = new java.io.File(orphan, "wX-0.parquet")
    assert(orphanFile.createNewFile())
    val wa = new java.io.PrintWriter(
      new java.io.File(attempt, "_graft_manifest"))
    try wa.write("target\tshard=0/wX-0.parquet") finally wa.close()
    assert(ManifestSink.readBack(spark, dest).count() == 0)
    ManifestSink.recover(spark, dest, _ => false)
    assert(!orphanFile.exists(), "recover must sweep moved-but-uncommitted"
      + " shard files")
    assert(!new java.io.File(s"$root/wh/.staging_shards").exists())
    // healthy retry publishes exactly one copy
    val healthy = spark.range(1, 201)
      .select(col("id").as("doc_id"),
        (lit(10L) + col("id") % 17).as("n_tokens"),
        concat(lit("doc"), col("id")).as("text"))
    ManifestSink.shardedWrite(healthy, dest, "n_tokens", "doc_id",
      tokenBudget = 128)
    assert(ManifestSink.readBack(spark, dest).count() == 200)
  }

  test("readVersion refuses versions compacted away instead of returning " +
      "a silently-empty table") {
    val root = tmpDir("msinkrv_")
    val dest = s"$root/wh/t"
    ManifestSink.append(Seq((1L, "a")).toDF("id", "v"), dest, None)
    ManifestSink.append(Seq((2L, "b")).toDF("id", "v"), dest, None)
    ManifestSink.append(Seq((3L, "c")).toDF("id", "v"), dest, None)
    ManifestSink.compact(spark, dest) // survivors: only snapshot v3
    val err = intercept[IllegalArgumentException] {
      ManifestSink.readVersion(spark, dest, 1L)
    }
    assert(err.getMessage.contains("compacted away"))
    // the snapshot version itself (and later) still reads fine
    assert(ManifestSink.readVersion(spark, dest, 3L)
      .select("id").as[Long].collect().toSet == Set(1L, 2L, 3L))
    assert(ManifestSink.readBack(spark, dest).count() == 3)
    // a table with no commits at all is legitimately empty, not an error
    assert(ManifestSink.readVersion(spark, s"$root/wh/nothing", 0L)
      .count() == 0)
  }

  test("concurrent appenders serialize: every commit gets a distinct " +
      "version and no batch is lost") {
    val root = tmpDir("msinkconc_")
    val dest = s"$root/wh/t"
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until 4).map { t =>
      new Thread(() => {
        try {
          (0 until 2).foreach { k =>
            ManifestSink.append(
              Seq((t * 10L + k, s"w$t-$k")).toDF("id", "v"), dest, None)
          }
        } catch { case e: Throwable => errors.add(e) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    assert(errors.isEmpty, s"concurrent appends must not fail: $errors")
    val log = new java.io.File(s"$dest/_log").listFiles()
      .map(_.getName).filter(_.endsWith(".manifest"))
    assert(log.length == 8, "one committed manifest per append")
    val versions = log.map(_.takeWhile(_.isDigit).toLong).sorted.toSeq
    assert(versions == versions.distinct, "versions must be unique")
    assert(ManifestSink.readBack(spark, dest).count() == 8)
  }

  test("vacuum: unreferenced aged debris is deleted, committed files and " +
      "fresh debris survive, pending attempts block the sweep") {
    val root = tmpDir("msinkvac_")
    val dest = s"$root/wh/t"
    ManifestSink.append(Seq((1L, "a")).toDF("id", "v"), dest, None)
    // stranded debris: a rolled-back write's file nobody references
    val debris = new java.io.File(s"$dest/deadbeef-0.parquet")
    assert(debris.createNewFile())
    // fresh debris (age 0) survives any reasonable retention
    assert(ManifestSink.vacuum(spark, dest,
      retentionMs = 60000) == 0L)
    assert(debris.exists())
    // aged debris goes; committed data stays readable — and the DRY RUN
    // names exactly the would-be victims while deleting nothing
    assert(debris.setLastModified(System.currentTimeMillis() - 120000))
    assert(ManifestSink.vacuumDryRun(spark, dest,
      retentionMs = 60000) == Seq("deadbeef-0.parquet"))
    assert(debris.exists())
    assert(ManifestSink.vacuum(spark, dest, retentionMs = 60000) == 1L)
    assert(!debris.exists())
    assert(ManifestSink.vacuumDryRun(spark, dest,
      retentionMs = 60000).isEmpty)
    assert(ManifestSink.readBack(spark, dest).count() == 1)
    // aged COMMITTED files are never touched
    val t0 = System.currentTimeMillis() - 240000
    new java.io.File(dest).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .foreach(f => assert(f.setLastModified(t0)))
    assert(ManifestSink.vacuum(spark, dest, retentionMs = 60000) == 0L)
    assert(ManifestSink.readBack(spark, dest).count() == 1)
    // a pending staged attempt blocks the sweep entirely (its moved files
    // are referenced only by the write-ahead manifest until commit)
    val attempt = new java.io.File(s"$root/wh/.staging_t/wP")
    attempt.mkdirs()
    val aged = new java.io.File(s"$dest/wP-0.parquet")
    assert(aged.createNewFile() && aged.setLastModified(t0))
    assert(ManifestSink.vacuum(spark, dest, retentionMs = 60000) == 0L)
    assert(aged.exists())
    attempt.delete()
    assert(ManifestSink.vacuum(spark, dest, retentionMs = 60000) == 1L)
  }

  test("optimize: small files bin-pack into one atomic snapshot per " +
      "partition dir; rows/partitions identical; crash windows hold; " +
      "vacuum sweeps the replaced files") {
    val root = tmpDir("msinkopt_")
    val dest = s"$root/wh/t"
    // 6 per-batch appends across 2 partition dates = 12 small files
    for (i <- 0 until 6)
      ManifestSink.append(
        Seq((i.toLong, "x", java.sql.Date.valueOf("2026-01-01")),
          (100L + i, "y", java.sql.Date.valueOf("2026-01-02")))
          .toDF("id", "v", "d"),
        dest, Some("d"))
    def dataFiles() = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(dest))
        .filter(f => f.getName.endsWith(".parquet"))
    }
    def manifestFiles() = new java.io.File(s"$dest/_log").listFiles()
      .map(_.getName).filter(_.endsWith(".manifest")).sorted
    val before = ManifestSink.readBack(spark, dest)
      .select("id", "v", Ingest.PartitionCol)
      .as[(Long, String, java.sql.Date)].collect().toSet
    assert(dataFiles().length == 12 && before.size == 12)

    // crash MID-optimize (before the snapshot commit): a staged attempt
    // with a write-ahead manifest and one moved packed file — recover
    // sweeps the debris, committed state untouched
    val crashedId = "optcrashed0000ff"
    val attempt = new java.io.File(s"$root/wh/.staging_t/$crashedId")
    attempt.mkdirs()
    val orphanRel = s"p_date=2026-01-01/$crashedId-0.parquet"
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$attempt/_graft_manifest"),
      s"target\t$orphanRel")
    assert(new java.io.File(s"$dest/$orphanRel").createNewFile())
    // optimize refuses while the attempt is pending
    assert(ManifestSink.optimize(spark, dest, targetBytes = 1L << 20) == 0L)
    ManifestSink.recover(spark, dest, _ => true)
    assert(!new java.io.File(s"$dest/$orphanRel").exists())
    assert(ManifestSink.readBack(spark, dest).count() == 12)

    // the real optimize: 12 small files -> 1 packed file per partition dir
    assert(ManifestSink.optimize(spark, dest, targetBytes = 1L << 20) == 12L)
    val after = ManifestSink.readBack(spark, dest)
      .select("id", "v", Ingest.PartitionCol)
      .as[(Long, String, java.sql.Date)].collect().toSet
    assert(after == before)
    val packedFiles = dataFiles()
    assert(packedFiles.length + 12 >= 12) // replaced files still on disk
    // superseded manifests are RETAINED for time travel/restore; the
    // snapshot cut hides them from readers, compact collapses them
    assert(manifestFiles().length == 7) // 6 retained appends + snapshot
    // the retained superseded manifests still list every replaced file,
    // and the snapshot cut must hide them — no double-count
    assert(ManifestSink.readBack(spark, dest).count() == 12)

    // history before the snapshot STAYS reachable (time travel) until
    // an explicit compact collapses it
    assert(ManifestSink.readVersion(spark, dest, 1L).count() == 4)
    ManifestSink.compact(spark, dest)
    assert(manifestFiles().length == 1)
    intercept[IllegalArgumentException] {
      ManifestSink.readVersion(spark, dest, 1L)
    }

    // vacuum sweeps the replaced small files once aged (after compact
    // dropped the manifests that referenced them); state unchanged
    val t0 = System.currentTimeMillis() - 120000
    dataFiles().foreach(f => f.setLastModified(t0))
    assert(ManifestSink.vacuum(spark, dest, retentionMs = 60000) == 12L)
    assert(ManifestSink.readBack(spark, dest)
      .select("id", "v", Ingest.PartitionCol)
      .as[(Long, String, java.sql.Date)].collect().toSet == before)
    assert(dataFiles().length == 2) // one packed file per partition dir

    // appends after an optimize stack on top of the snapshot
    ManifestSink.append(
      Seq((999L, "z", java.sql.Date.valueOf("2026-01-03")))
        .toDF("id", "v", "d"), dest, Some("d"))
    assert(ManifestSink.readBack(spark, dest).count() == 13)
    // and a second optimize is a no-op at a tiny target size
    assert(ManifestSink.optimize(spark, dest, targetBytes = 10L) == 0L)
  }

  test("data skipping: statsAppend records per-file min/max, " +
      "readBackWhere prunes by metadata and equals the filtered full " +
      "read; stats survive compact and optimize") {
    val root = tmpDir("msinkstat_")
    val dest = s"$root/wh/t"
    // 5 appends with disjoint id ranges — a clustered/monotone column
    for (b <- 0 until 5)
      ManifestSink.statsAppend(
        (b * 100L until b * 100L + 100L).map(i => (i, s"v$i"))
          .toDF("id", "v").coalesce(1),
        dest, None, statsCols = Seq("id"))
    val all = ManifestSink.readBack(spark, dest)
    assert(all.count() == 500)

    def pruned(lo: Double, hi: Double) =
      ManifestSink.readBackWhere(spark, dest, "id", lo, hi)
    // result parity with the unpruned filtered read
    val want = all.where(col("id").between(120, 180))
      .select("id").as[Long].collect().sorted.toSeq
    val got = pruned(120, 180).select("id").as[Long].collect().sorted.toSeq
    assert(got == want && got.size == 61)
    // the metadata actually pruned: one of five files read
    assert(pruned(120, 180).inputFiles.length == 1)
    assert(pruned(0, 499).inputFiles.length == 5)
    assert(pruned(1000, 2000).count() == 0)

    // a statsless append is conservatively read (never pruned away)
    ManifestSink.append(Seq((9999L, "x")).toDF("id", "v"), dest, None)
    assert(pruned(120, 180).inputFiles.length == 2)
    assert(pruned(120, 180).select("id").as[Long].collect().sorted.toSeq
      == want)

    // compact carries stats verbatim: same pruning after log collapse
    ManifestSink.compact(spark, dest)
    assert(pruned(120, 180).inputFiles.length == 2)
    assert(pruned(9999, 9999).count() == 1)

    // optimize merges packed files' ranges as pure metadata: the five
    // 100-row files pack into one whose range is the union; pruning
    // still works and results are unchanged
    assert(ManifestSink.optimize(spark, dest, targetBytes = 1L << 20) > 0)
    assert(pruned(120, 180).select("id").as[Long].collect().sorted.toSeq
      == want)
    // a range outside every recorded min/max still prunes to nothing
    // except the statsless file
    assert(pruned(100000, 200000).count() == 0)
  }

  test("clustered optimize preserves data skipping: the range-sorted " +
      "repack keeps per-file bounds tight and disjoint — a selective " +
      "read prunes to as few files after compaction as before — and " +
      "stats are re-derived from the packed data, not range-merged") {
    val root = tmpDir("msinkclu_")
    val dest = s"$root/wh/t"
    // 10 disjoint id-clustered appends (the streaming-ingest shape:
    // monotone event time / id per batch), one file each
    for (b <- 0 until 10)
      ManifestSink.statsAppend(
        (b * 100L until b * 100L + 100L).map(i => (i, s"v$i"))
          .toDF("id", "v").coalesce(1),
        dest, None, statsCols = Seq("id"))
    val all = ManifestSink.readBack(spark, dest)
    assert(all.count() == 1000)
    def pruned(lo: Double, hi: Double) =
      ManifestSink.readBackWhere(spark, dest, "id", lo, hi)
    def parity(lo: Double, hi: Double): Unit = {
      assert(pruned(lo, hi).select("id").as[Long].collect().sorted.toSeq ==
        ManifestSink.readBack(spark, dest)
          .where(col("id").between(lo, hi))
          .select("id").as[Long].collect().sorted.toSeq, s"[$lo,$hi]")
    }
    // before: a narrow range reads exactly 1 of 10 files
    assert(pruned(250, 280).inputFiles.length == 1)
    parity(250, 280)

    // pick targetBytes so the repack yields ~4 output files — the state
    // where merge-based stats would be fatal (every output bin would
    // span interleaved FFD-ordered inputs)
    val fileLen = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      val lens = walk(new java.io.File(dest))
        .filter(_.getName.endsWith(".parquet")).map(_.length())
      lens.sum / lens.length
    }
    val target = (fileLen * 2.6).toLong
    assert(ManifestSink.optimize(spark, dest, targetBytes = target,
      clusterBy = Seq("id")) == 10L)
    val nAfter = ManifestSink.readBack(spark, dest).inputFiles.length
    assert(nAfter > 1, "repack must produce multiple files for this test")
    assert(ManifestSink.readBack(spark, dest).count() == 1000)

    // after: the same narrow range STILL reads exactly 1 file — the
    // re-derived per-file bounds are tight and disjoint (plain bin-pack
    // provably degrades this to reading every byte of the table)
    assert(pruned(250, 280).inputFiles.length == 1)
    parity(250, 280)
    // different ranges hit different packed files
    val fA = pruned(50, 80).inputFiles.toSet
    val fB = pruned(850, 880).inputFiles.toSet
    assert(fA.size == 1 && fB.size == 1 && fA != fB)
    parity(50, 80); parity(850, 880)
    // out-of-domain prunes to zero files
    assert(pruned(5000, 6000).count() == 0)

    // contrast case: PLAIN optimize on the same shape merges ranges —
    // wide stats, no skipping left (this is the regression clusterBy
    // exists to prevent)
    val dest2 = s"$root/wh/t2"
    for (b <- 0 until 10)
      ManifestSink.statsAppend(
        (b * 100L until b * 100L + 100L).map(i => (i, s"v$i"))
          .toDF("id", "v").coalesce(1),
        dest2, None, statsCols = Seq("id"))
    assert(ManifestSink.optimize(spark, dest2, targetBytes = 1L << 20) > 0L)
    val plainRead = ManifestSink.readBackWhere(spark, dest2, "id", 250, 280)
    val plainAll = ManifestSink.readBack(spark, dest2).inputFiles.length
    assert(plainAll == 1 && plainRead.inputFiles.length == 1,
      "plain bin-pack degrades the 1-of-10 pruned read to 1-of-1 — " +
        "reading every byte; the contrast that makes clusterBy the fix")

    // crash-safety parity: after compact drops the superseded manifests,
    // vacuum sweeps the 10 replaced files and state holds
    ManifestSink.compact(spark, dest)
    def walk2(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk2) else Seq(f)
    walk2(new java.io.File(dest))
      .foreach(f => f.setLastModified(System.currentTimeMillis() - 120000))
    assert(ManifestSink.vacuum(spark, dest, retentionMs = 60000) == 10L)
    assert(ManifestSink.readBack(spark, dest).count() == 1000)
    parity(250, 280)

    // clustered repack respects partition dirs: files never cross their
    // partition directory
    val dest3 = s"$root/wh/t3"
    for (b <- 0 until 4)
      ManifestSink.statsAppend(
        Seq((b * 10L, "x", java.sql.Date.valueOf("2026-01-01")),
          (b * 10L + 1, "y", java.sql.Date.valueOf("2026-01-02")))
          .toDF("id", "v", "d"),
        dest3, Some("d"), statsCols = Seq("id"))
    assert(ManifestSink.optimize(spark, dest3, targetBytes = 1L << 20,
      clusterBy = Seq("id")) == 8L)
    val back3 = ManifestSink.readBack(spark, dest3)
    assert(back3.count() == 8)
    assert(back3.select(Ingest.PartitionCol).distinct().count() == 2)
    assert(back3.inputFiles.forall(f =>
      f.contains("p_date=2026-01-01") || f.contains("p_date=2026-01-02")))
  }

  test("typed stats: string/date columns prune on equality and range, " +
      "null counts prune IS NULL / IS NOT NULL, long-string bounds " +
      "truncate safely — every skipping read equals the filtered full " +
      "read") {
    import ManifestSink.SkipPredicate._
    val root = tmpDir("msinktyp_")
    val dest = s"$root/wh/t"
    def d(s: String) = java.sql.Date.valueOf(s)
    val longA = "a" * 80 + "-suffix-A" // > the 64-char truncation cap
    val longZ = "z" * 80 + "-suffix-Z"
    // one file per batch, clustered by language / month / null-ness
    val batches = Seq(
      Seq(("de", Some(1.0), d("2026-01-05"), longA),
        ("de", Some(2.0), d("2026-01-20"), longA)),
      Seq(("en", None: Option[Double], d("2026-02-10"), longZ),
        ("en", None: Option[Double], d("2026-02-15"), longZ)),
      Seq(("fr", Some(3.0), d("2026-03-01"), longZ),
        ("fr", None: Option[Double], d("2026-03-30"), longZ)))
    for (b <- batches)
      ManifestSink.statsAppend(
        b.toDF("lang", "score", "day", "blob").coalesce(1),
        dest, None, statsCols = Seq("lang", "score", "day", "blob"))
    val all = ManifestSink.readBack(spark, dest)
    assert(all.count() == 6)

    def checkParity(pred: ManifestSink.SkipPredicate,
        wantFiles: Int, residual: org.apache.spark.sql.Column): Unit = {
      val got = ManifestSink.readBackWherePred(spark, dest, pred)
      assert(got.inputFiles.length == wantFiles,
        s"$pred: expected $wantFiles files, read ${got.inputFiles.length}")
      val want = all.where(residual)
        .select("lang", "day").as[(String, java.sql.Date)]
        .collect().sorted.toSeq
      assert(got.select("lang", "day").as[(String, java.sql.Date)]
        .collect().sorted.toSeq == want, s"$pred: row parity")
    }

    // string equality: one file per language
    checkParity(StrEq("lang", "en"), 1, col("lang") === "en")
    checkParity(StrEq("lang", "xx"), 0, col("lang") === "xx")
    // string range spanning two languages
    checkParity(StrRange("lang", "d", "ez"), 2,
      col("lang").between("d", "ez"))
    // DATE range through the ISO string order: February only
    checkParity(StrRange("day", "2026-02-01", "2026-02-28"), 1,
      col("day").cast("string").between("2026-02-01", "2026-02-28"))
    // null counts: IS NULL skips the all-non-null de file
    checkParity(IsNull("score"), 2, col("score").isNull)
    // IS NOT NULL skips the all-null en file
    checkParity(IsNotNull("score"), 2, col("score").isNotNull)
    // a numeric range skips the all-null file too (rowless under any
    // value predicate), not just out-of-range ones
    checkParity(NumRange("score", 0.0, 10.0), 2,
      col("score").cast("double").between(0.0, 10.0))
    checkParity(NumRange("score", 2.5, 10.0), 1,
      col("score").cast("double").between(2.5, 10.0))
    // long strings: truncated bounds still prune the other cluster and
    // keep every matching row (the max bound carries the high marker)
    checkParity(StrEq("blob", longA), 1, col("blob") === longA)
    checkParity(StrEq("blob", longZ), 2, col("blob") === longZ)
    // stats survive compact verbatim
    ManifestSink.compact(spark, dest)
    checkParity(StrEq("lang", "fr"), 1, col("lang") === "fr")
    checkParity(IsNull("score"), 2, col("score").isNull)
    // and survive optimize's metadata merge: 3 files pack into 1 whose
    // merged bounds/counts still answer every predicate correctly
    assert(ManifestSink.optimize(spark, dest, targetBytes = 1L << 20) == 3L)
    checkParity(StrEq("lang", "en"), 1, col("lang") === "en")
    checkParity(StrEq("lang", "xx"), 0, col("lang") === "xx")
    checkParity(IsNull("score"), 1, col("score").isNull)
    checkParity(IsNotNull("score"), 1, col("score").isNotNull)
  }

  test("string skipping bounds compare in UTF-8 byte order: " +
      "supplementary-plane (emoji) keys never mis-prune, open-top " +
      "ranges carry no sentinel, truncation never splits a surrogate " +
      "pair and marks the max instead of padding it") {
    import ManifestSink.SkipPredicate._
    val root = tmpDir("msinkutf8_")
    val dest = s"$root/wh/t"
    val smiley = "😀" // U+1F600: UTF-8 F0 9F 98 80 sorts ABOVE
    // U+E000 (EE 80 80), but its UTF-16 units D83D DE00 sort BELOW —
    // the two collations disagree exactly on this pair of keys
    val emojiKey = s"box${smiley}x"
    ManifestSink.statsAppend(
      Seq(("e1", "box"), ("e2", emojiKey)).toDF("id", "k")
        .coalesce(1), dest, None, statsCols = Seq("k"))
    ManifestSink.statsAppend(
      Seq(("a1", "apple"), ("a2", "banana")).toDF("id", "k")
        .coalesce(1), dest, None, statsCols = Seq("k"))

    def ids(pred: ManifestSink.SkipPredicate): Seq[String] =
      ManifestSink.readBackWherePred(spark, dest, pred)
        .select("id").as[String].collect().toSeq.sorted

    // the regression: file 1's min is "box" (UTF-8 order), and a
    // UTF-16 compare says min > emojiKey — the file was wrongly pruned
    // and the matching row silently vanished
    val eqEmoji = StrEq("k", emojiKey)
    assert(ids(eqEmoji) == Seq("e2"), "emoji equality probe lost its row")
    assert(ManifestSink.readBackWherePred(spark, dest, eqEmoji)
      .inputFiles.length == 1, "apple/banana file should still prune")
    assert(ManifestSink.countWhere(spark, dest, eqEmoji) == 1)
    // open-top range (k > "box"): no sentinel upper bound — the legacy
    // '￿' pad sorted below the emoji key and mis-pruned it
    assert(ids(StrRange("k", Some("box"), None)) == Seq("e1", "e2"))
    // open-bottom stays exact too
    assert(ids(StrRange("k", None, Some("banana"))) == Seq("a1", "a2"))

    // truncation: values crossing the 64-char cap with a surrogate pair
    // straddling the boundary — the prefix must not split the pair, and
    // the max is a MARKER (+inf), so equality still finds its row
    val longLo = "x" * 63 + smiley + "-low"
    val longHi = "x" * 63 + smiley + "-zzz"
    ManifestSink.statsAppend(
      Seq(("t1", longLo), ("t2", longHi)).toDF("id", "k").coalesce(1),
      dest, None, statsCols = Seq("k"))
    assert(ids(StrEq("k", longHi)) == Seq("t2"))
    assert(ManifestSink.countWhere(spark, dest, StrEq("k", longHi)) == 1)
    // the stats2 line's truncated max carries the explicit ~ marker,
    // not a pad character
    val statsLines = new java.io.File(s"$dest/_log").listFiles()
      .filter(_.getName.endsWith(".manifest")).toSeq
      .flatMap(f => scala.io.Source.fromFile(f, "UTF-8").getLines())
      .filter(_.startsWith("stats2\t"))
    val maxFields = statsLines.map(_.split('\t')(5))
    assert(maxFields.exists(_.startsWith("~")), "expected a ~-marked max")
    assert(!maxFields.exists(m => m != "-" &&
      new String(java.util.Base64.getDecoder.decode(m.stripPrefix("~")),
        "UTF-8").contains('￿')), "no pad characters in bounds")

    // mergeStats folds in UTF-8 order too: after optimize packs the
    // files, the merged bounds must still answer the emoji probe
    assert(ManifestSink.optimize(spark, dest, targetBytes = 1L << 20) == 3L)
    assert(ids(eqEmoji) == Seq("e2"))
    // the x-prefixed long values sort above "box" too
    assert(ids(StrRange("k", Some("box"), None)) ==
      Seq("e1", "e2", "t1", "t2"))
    assert(ids(StrEq("k", longHi)) == Seq("t2"))
  }

  test("property: random unicode strings — every StrEq/StrRange pruned " +
      "read equals the filtered full read and countWhere is exact, " +
      "through both the footer and the scan stats paths") {
    import ManifestSink.SkipPredicate._
    val root = tmpDir("msinkutf8p_")
    val dest = s"$root/wh/t"
    val rnd = new scala.util.Random(20260815L)
    val atoms = Seq("a", "B", "é", "ف", "", "�",
      "￿", "😀", "𐀀")
    def randStr(): String = {
      val sb = new StringBuilder
      for (_ <- 0 to rnd.nextInt(7))
        sb.append(atoms(rnd.nextInt(atoms.length)))
      // a quarter of values cross the truncation cap
      if (rnd.nextInt(4) == 0) ("x" * 62) + sb.toString else sb.toString
    }
    val vals = Vector.fill(48)(randStr())
    val saved = ManifestSink.FooterStatsMaxFiles
    try {
      vals.grouped(8).zipWithIndex.foreach { case (g, i) =>
        // alternate the footer fast path and the scan fallback: both
        // must produce bounds that prune identically
        ManifestSink.FooterStatsMaxFiles = if (i % 2 == 0) saved else 0
        ManifestSink.statsAppend(
          g.zipWithIndex.map { case (v, j) => (s"r$i-$j", v) }.toSeq
            .toDF("id", "k").coalesce(1), dest, None,
          statsCols = Seq("k"))
      }
    } finally ManifestSink.FooterStatsMaxFiles = saved
    val all = ManifestSink.readBack(spark, dest).select("id", "k")
      .as[(String, String)].collect().toSeq
    assert(all.length == 48)
    def u8le(a: String, b: String) = ManifestSink.utf8Cmp(a, b) <= 0
    def check(pred: ManifestSink.SkipPredicate,
        rowPred: String => Boolean): Unit = {
      val want = all.filter(r => rowPred(r._2)).map(_._1).sorted
      val got = ManifestSink.readBackWherePred(spark, dest, pred)
        .select("id").as[String].collect().toSeq.sorted
      assert(got == want, s"$pred: pruned read != filtered full read")
      assert(ManifestSink.countWhere(spark, dest, pred) == want.length,
        s"$pred: credited count drifted")
    }
    for (_ <- 0 until 12) {
      val v = if (rnd.nextBoolean()) vals(rnd.nextInt(vals.length))
              else randStr()
      check(StrEq("k", v), _ == v)
      val (x, y) = (randStr(), randStr())
      val (lo, hi) = if (u8le(x, y)) (x, y) else (y, x)
      check(StrRange("k", Some(lo), Some(hi)),
        s => u8le(lo, s) && u8le(s, hi))
      check(StrRange("k", Some(lo), None), s => u8le(lo, s))
      check(StrRange("k", None, Some(hi)), s => u8le(s, hi))
    }
  }

  test("two-level date/hour layout: append, read-back, partition " +
      "pruning on both levels, partitions(), hour- and day-scoped " +
      "drops, partition-scoped overwrite, keep-partition mor update") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val root = tmpDir("msink2lvl_")
    val dest = s"$root/wh/t"
    // 2 days x 3 hours x 5 rows
    val rows = for {
      d <- Seq("2026-01-01", "2026-01-02"); h <- 0 until 3
      i <- 0 until 5
    } yield (d.takeRight(2).toLong * 1000 + h * 100 + i,
      s"v$d-$h-$i", ts(f"$d $h%02d:30:00"))
    ManifestSink.statsAppend(
      rows.toDF("id", "v", "ts").repartition(2),
      dest, Some("ts/hour"), Seq("id"))
    val back = ManifestSink.readBack(spark, dest)
    assert(back.count() == 30)
    assert(back.columns.contains("p_date") &&
      back.columns.contains("p_hour"))
    assert(back.select("p_hour").distinct().as[Int]
      .collect().toSet == Set(0, 1, 2))
    assert(back.inputFiles.forall(f =>
      f.contains("p_date=") && f.contains("/p_hour=")))
    // partition pruning on BOTH levels through the SQL relation (the
    // p_hour partition column types INTEGER on every read path);
    // inputFiles ignores pruning, so read the scan's numFiles metric
    val pruned = spark.read.format("graft").load(dest)
      .where(col("p_date") === "2026-01-01" && col("p_hour") === 1)
    pruned.collect()
    val prunedScan = pruned.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.get
    val hourFiles = back.inputFiles
      .count(_.contains("p_date=2026-01-01/p_hour=1/"))
    assert(pruned.count() == 5)
    assert(prunedScan.metrics("numFiles").value == hourFiles.toLong,
      s"expected only the $hourFiles files of the one hour dir, " +
        s"scanned ${prunedScan.metrics("numFiles").value}")
    // partitions() reports the full two-level identity
    val parts = ManifestSink.partitions(spark, dest)
      .select("partition", "num_rows").as[(String, Option[Long])]
      .collect().toMap
    assert(parts.size == 6)
    assert(parts("p_date=2026-01-01/p_hour=0").contains(5L))
    // hour-scoped drop removes exactly one hour
    assert(ManifestSink.dropPartitions(spark, dest,
      Seq("2026-01-01/01")) > 0L)
    assert(ManifestSink.readBack(spark, dest).count() == 25)
    assert(ManifestSink.readBack(spark, dest)
      .where("p_date = '2026-01-01' AND p_hour = '01'").count() == 0)
    // day-scoped drop removes every remaining hour of the day
    assert(ManifestSink.dropPartitions(spark, dest,
      Seq("2026-01-02")) > 0L)
    assert(ManifestSink.readBack(spark, dest).count() == 10)
    // hour-scoped static overwrite replaces one hour only
    val repl = Seq((9000L, "new", ts("2026-01-01 02:15:00")))
      .toDF("id", "v", "ts")
    assert(ManifestSink.overwritePartitions(repl, dest, "ts/hour",
      values = Seq("2026-01-01/02"), statsCols = Seq("id")) > 0L)
    val afterOw = ManifestSink.readBack(spark, dest)
    assert(afterOw.where("p_hour = 2")
      .select("id").as[Long].collect().toSeq == Seq(9000L))
    assert(afterOw.count() == 6)
    // a day-only spec on an hourly table refuses (layout mismatch)
    val e = intercept[IllegalArgumentException](
      ManifestSink.overwritePartitions(repl, dest, "ts",
        values = Seq("2026-01-01")))
    assert(e.getMessage.contains("layout"), e.getMessage)
    // keep-partition mor UPDATE: rows stay in their hour directories
    assert(ManifestSink.updateWhereExprMor(spark, dest,
      col("id") === 9000L, Map("v" -> lit("upd"))) == 1L)
    val updated = ManifestSink.readBack(spark, dest)
      .where("v = 'upd'")
      .select(col("p_date").cast("string"), col("p_hour"))
      .as[(String, Int)].collect().toSeq
    assert(updated == Seq(("2026-01-01", 2)),
      s"updated row lost its two-level partition: $updated")
    // merge routes inserted rows into their two-level partitions
    val src = Seq((9000L, "merged", ts("2026-01-01 02:45:00")),
        (9100L, "fresh", ts("2026-01-03 07:10:00")))
      .toDF("id", "v", "ts")
    val (u, i) = ManifestSink.mergeInto(spark, dest, src, "id",
      Some("ts/hour"), Seq("id"))
    assert((u, i) == (1L, 1L))
    val merged = ManifestSink.readBack(spark, dest)
    assert(merged.where("id = 9100")
      .select(col("p_date").cast("string"), col("p_hour"))
      .as[(String, Int)].head() == ("2026-01-03", 7),
      "inserted row not routed into its two-level partition")
    assert(merged.where("id = 9000").select("v").as[String].head()
      == "merged")
  }

  test("compact in optimize's crash-mid-cleanup window applies the " +
      "snapshot cut: superseded manifests are dropped, not merged — the " +
      "replaced files are NOT resurrected into the new snapshot") {
    val root = tmpDir("msinkcut_")
    val dest = s"$root/wh/t"
    for (i <- 0 until 3)
      ManifestSink.append(Seq((i.toLong, s"v$i")).toDF("id", "v"), dest, None)
    assert(ManifestSink.optimize(spark, dest, targetBytes = 1L << 20) == 3L)
    // under manifest retention the superseded incremental manifests (and
    // the replaced small files they name) are ALWAYS present after an
    // optimize — the state that used to exist only in the crash-mid-
    // cleanup window is now the steady state the snapshot cut must hide
    val log = new java.io.File(s"$dest/_log")
    assert(log.listFiles().count(_.getName.endsWith(".manifest")) == 4,
      "3 retained appends + the optimize snapshot")
    // the deduped read is already correct in this window...
    assert(ManifestSink.readBack(spark, dest).count() == 3)
    // ...and compact must KEEP it correct: before the snapshot cut it
    // unioned the stale targets into the new snapshot, permanently
    // duplicating the replaced rows (stale targets differ by NAME, so the
    // reader's distinct() no longer collapses them)
    val preCompactTargets = manifestTargets(dest)
    val snapTargets = {
      val snap = log.listFiles().filter(_.getName.endsWith(".manifest"))
        .maxBy(_.getName)
      scala.io.Source.fromFile(snap, "UTF-8").getLines()
        .filter(_.startsWith("target")).map(_.substring(7)).toSet
    }
    val replaced = preCompactTargets -- snapTargets
    assert(replaced.nonEmpty, "superseded targets must exist pre-compact")
    ManifestSink.compact(spark, dest)
    assert(ManifestSink.readBack(spark, dest)
      .select("id").as[Long].collect().toSet == Set(0L, 1L, 2L))
    assert(manifestTargets(dest).intersect(replaced).isEmpty,
      "compact must not merge targets superseded by a snapshot")
  }

  test("optimize ABSORBS a concurrent pure append instead of aborting: " +
      "the repack commits rebased, the append's rows and manifest " +
      "survive unpacked, a mor commit in the window still aborts") {
    val root = tmpDir("msinkrace_")
    val dest = s"$root/wh/t"
    for (i <- 0 until 3)
      ManifestSink.append(Seq((i.toLong, s"v$i")).toDF("id", "v"), dest, None)
    // land an append in the window between optimize's log capture and
    // its snapshot commit — optimize only rearranges bytes, so the
    // append is provably non-conflicting and the commit REBASES
    ManifestSink.onBeforeOptimizeCommit = () =>
      ManifestSink.append(Seq((99L, "late")).toDF("id", "v"), dest, None)
    try {
      assert(ManifestSink.optimize(spark, dest,
        targetBytes = 1L << 20) == 3L,
        "optimize must absorb the append and commit the 3-file repack")
    } finally ManifestSink.onBeforeOptimizeCommit = () => ()
    // nothing lost: packed rows AND the late append both read back
    assert(ManifestSink.readBack(spark, dest)
      .select("id").as[Long].collect().toSet == Set(0L, 1L, 2L, 99L))
    // the late file rode through unpacked: 1 packed + 1 append
    assert(ManifestSink.readBack(spark, dest).inputFiles.length == 2)
    // 4 appends + rebased snapshot; no stranded attempt
    assert(new java.io.File(s"$dest/_log").listFiles()
      .count(_.getName.endsWith(".manifest")) == 5)
    assert(!new java.io.File(s"$root/wh/.staging_t").exists())
    // a content-changing commit in the window still aborts the repack
    // (a real mor op would refuse while optimize's attempt is staged,
    // so plant a dv-carrying manifest in the log directly)
    val logDir = new java.io.File(s"$dest/_log")
    val headV = logDir.listFiles().map(_.getName)
      .filter(_.endsWith(".manifest")).map(_.takeWhile(_.isDigit).toLong)
      .max
    val fake = new java.io.File(logDir, f"${headV + 1}%012d.manifest")
    ManifestSink.onBeforeOptimizeCommit = () =>
      java.nio.file.Files.writeString(fake.toPath,
        "writeid\tfakemor\ndv\tnope.parquet\t_dv/nope.parquet\t1")
    try {
      assert(ManifestSink.optimize(spark, dest,
        targetBytes = 1L << 20) == 0L,
        "a dv-carrying commit in the window is not absorbable")
    } finally {
      ManifestSink.onBeforeOptimizeCommit = () => ()
      fake.delete()
    }
    assert(ManifestSink.readBack(spark, dest)
      .select("id").as[Long].collect().toSet == Set(0L, 1L, 2L, 99L))
    // the retry (no interference) packs everything
    assert(ManifestSink.optimize(spark, dest, targetBytes = 1L << 20) > 0L)
    assert(ManifestSink.readBack(spark, dest)
      .select("id").as[Long].collect().toSet == Set(0L, 1L, 2L, 99L))
    assert(ManifestSink.readBack(spark, dest).inputFiles.length == 1)
  }

  test("a concurrent ALTER (schemaevo) in the snapshot window is a " +
      "TRUE conflict, not an absorbable append: optimize aborts and " +
      "the dropped column stays dropped") {
    val root = tmpDir("msinkevorace_")
    val dest = s"$root/wh/t"
    for (i <- 0 until 3)
      ManifestSink.append(Seq((i.toLong, s"v$i")).toDF("id", "v"),
        dest, None)
    // an ALTER DROP COLUMN lands between optimize's log capture and
    // its snapshot commit: absorbing it as a pure append would UNION
    // its rebased schema with the snapshot's carried pre-ALTER schema
    // and silently resurrect the dropped column
    ManifestSink.onBeforeOptimizeCommit = () =>
      ManifestSink.alterSchema(spark, dest, cur =>
        org.apache.spark.sql.types.StructType(
          cur.fields.filterNot(_.name == "v")))
    try {
      assert(ManifestSink.optimize(spark, dest,
        targetBytes = 1L << 20) == 0L,
        "a schemaevo commit in the window must abort the snapshot")
    } finally ManifestSink.onBeforeOptimizeCommit = () => ()
    // the log-RESOLVED schema honors the ALTER — every reader
    // (format("graft") AND maintenance readBack) resolves its scan
    // schema from the log, which is also what lets ALTER COLUMN TYPE
    // widen without rewriting files; dropped bytes stay in place
    def resolvedCols() = spark.read.format("graft").load(dest)
      .columns.toSeq
    assert(resolvedCols() == Seq("id"),
      "the ALTER survives the aborted snapshot")
    // the retry (clean window) repacks and STILL honors the ALTER
    assert(ManifestSink.optimize(spark, dest, targetBytes = 1L << 20) > 0L)
    assert(resolvedCols() == Seq("id"))
    assert(spark.read.format("graft").load(dest)
      .select("id").as[Long].collect().toSet == Set(0L, 1L, 2L))
  }

  test("snapshot commits absorb provably-disjoint concurrent appends: " +
      "a COW delete rebases over a stats-disjoint statsAppend, a merge " +
      "over an out-of-envelope batch; overlapping or stats-less " +
      "appends still abort; partition drop absorbs outside, aborts " +
      "inside") {
    val root = tmpDir("msinkabsorb_")
    val dest = s"$root/wh/t"
    for (b <- 0 until 4)
      ManifestSink.statsAppend(
        (b * 100L until b * 100L + 100L).map(i => (i, s"v$i"))
          .toDF("id", "v").coalesce(1),
        dest, None, Seq("id"))

    // delete of [100,149] absorbs a concurrent append of [1000,1009]
    // (stats prove disjoint): both the delete AND the append land
    ManifestSink.onBeforeRewriteCommit = () =>
      ManifestSink.statsAppend(
        (1000L until 1010L).map(i => (i, s"n$i")).toDF("id", "v")
          .coalesce(1), dest, None, Seq("id"))
    try {
      assert(ManifestSink.deleteWhere(spark, dest,
        ManifestSink.SkipPredicate.NumRange("id", 100, 149)) == 50L)
    } finally ManifestSink.onBeforeRewriteCommit = () => ()
    val after = ManifestSink.readBack(spark, dest)
    assert(after.count() == 360)
    assert(after.where(col("id") >= 1000).count() == 10)
    assert(after.where(col("id").between(100, 149)).count() == 0)
    // the absorbed append's stats lines carried: it still prunes
    assert(ManifestSink.readBackWhere(spark, dest, "id", 1000, 1009)
      .inputFiles.length == 1)

    // an OVERLAPPING concurrent append aborts the delete (its rows
    // would have to be deleted too — unprovable without a rescan)
    ManifestSink.onBeforeRewriteCommit = () =>
      ManifestSink.statsAppend(
        Seq((210L, "dup")).toDF("id", "v"), dest, None, Seq("id"))
    try {
      assert(ManifestSink.deleteWhere(spark, dest,
        ManifestSink.SkipPredicate.NumRange("id", 200, 249)) == 0L)
    } finally ManifestSink.onBeforeRewriteCommit = () => ()
    assert(ManifestSink.readBack(spark, dest).count() == 361)
    // retry sees both generations and deletes them all
    assert(ManifestSink.deleteWhere(spark, dest,
      ManifestSink.SkipPredicate.NumRange("id", 200, 249)) == 51L)

    // merge absorbs an append outside its key envelope
    ManifestSink.onBeforeRewriteCommit = () =>
      ManifestSink.statsAppend(
        Seq((2000L, "far")).toDF("id", "v"), dest, None, Seq("id"))
    try {
      assert(ManifestSink.mergeInto(spark, dest,
        Seq((0L, "UP")).toDF("id", "v"), "id",
        statsCols = Seq("id")) == ((1L, 0L)))
    } finally ManifestSink.onBeforeRewriteCommit = () => ()
    val afterMerge = ManifestSink.readBack(spark, dest)
    assert(afterMerge.where(col("v") === "UP").count() == 1)
    assert(afterMerge.where(col("id") === 2000L).count() == 1)

    // partition drop: absorbs an append into a SURVIVING partition,
    // aborts one into the dropped partition
    def d(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    val destP = s"$root/wh/tp"
    ManifestSink.append(Seq((1L, "a", d("2026-01-01")),
      (2L, "b", d("2026-01-02"))).toDF("id", "v", "dt"),
      destP, Some("dt"))
    ManifestSink.onBeforeRewriteCommit = () =>
      ManifestSink.append(Seq((3L, "c", d("2026-01-02")))
        .toDF("id", "v", "dt"), destP, Some("dt"))
    try {
      assert(ManifestSink.dropPartitions(spark, destP,
        Seq("2026-01-01")) == 1L)
    } finally ManifestSink.onBeforeRewriteCommit = () => ()
    assert(ManifestSink.readBack(spark, destP)
      .select("id").as[Long].collect().toSet == Set(2L, 3L))
    ManifestSink.onBeforeRewriteCommit = () =>
      ManifestSink.append(Seq((4L, "d", d("2026-01-02")))
        .toDF("id", "v", "dt"), destP, Some("dt"))
    try {
      assert(ManifestSink.dropPartitions(spark, destP,
        Seq("2026-01-02")) == 0L,
        "an append INTO the dropped partition must abort the drop")
    } finally ManifestSink.onBeforeRewriteCommit = () => ()
    assert(ManifestSink.readBack(spark, destP)
      .select("id").as[Long].collect().toSet == Set(2L, 3L, 4L))
  }

  /** Commit a deletion-vector manifest for `ids` inside `targetRel` —
    * byte-identical to what a concurrent process's deleteWhereMor
    * commits when it computed its positions BEFORE this process staged
    * an attempt (the one interleaving where a dv commit can land under
    * a running snapshot rewrite; the public API refuses while staging
    * pends, which is exactly why the spec hand-rolls the commit).
    */
  private def commitDvManually(dest: String, targetRel: String,
      ids: Seq[Long]): Long = {
    val tag = java.util.UUID.randomUUID().toString.take(8)
    val posDf = spark.read.parquet(s"$dest/$targetRel")
      .withColumn("name", col("_metadata.file_name"))
      .withColumn("pos", col("_metadata.row_index"))
      .filter(col("id").isin(ids: _*)).select("name", "pos")
    val n = posDf.count()
    assert(n > 0, s"test setup: no rows of $ids in $targetRel")
    val stage = tmpDir(s"dvman_$tag")
    posDf.coalesce(1).write.mode("overwrite").parquet(s"$stage/dv")
    val part = new java.io.File(s"$stage/dv").listFiles()
      .find(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet")).get
    val rel = s"_dv/test$tag.parquet"
    val tgt = new java.io.File(s"$dest/$rel")
    tgt.getParentFile.mkdirs()
    assert(part.renameTo(tgt))
    val log = new java.io.File(s"$dest/_log")
    val v = log.listFiles().map(_.getName)
      .filter(_.endsWith(".manifest"))
      .map(_.takeWhile(_.isDigit).toLong).max + 1
    val mf = new java.io.File(log, f"$v%012d.manifest")
    val w = new java.io.PrintWriter(mf)
    try w.write(s"writeid\tdv$tag\ndv\t$targetRel\t$rel\t$n")
    finally w.close()
    n
  }

  /** The committed target whose file holds `id` (via each file's ids —
    * test-side reconnaissance only).
    */
  private def targetHolding(dest: String, id: Long): String = {
    val effective = ManifestSink.readBack(spark, dest).inputFiles
      .map(f => f.substring(f.indexOf(dest) + dest.length + 1))
      .filterNot(_.startsWith("_")).toSet
    effective.find { rel =>
      spark.read.parquet(s"$dest/$rel")
        .filter(col("id") === id).limit(1).count() == 1
    }.get
  }

  test("file-granular OCC for dv commits: a snapshot rebases over a " +
      "concurrent MOR delete on files it did not rewrite (tombstones " +
      "survive the snapshot), and aborts on a dv inside its rewrite " +
      "set — for both OPTIMIZE and a COW delete") {
    val root = tmpDir("msinkdvocc_")
    val dest = s"$root/wh/t"
    // four small packable files + one big file optimize will NOT touch
    for (b <- 0 until 4)
      ManifestSink.statsAppend(
        (b * 100L until b * 100L + 100L).map(i => (i, s"v$i"))
          .toDF("id", "v").coalesce(1), dest, None, Seq("id"))
    ManifestSink.statsAppend(
      (1000L until 51000L).map(i => (i, s"big$i")).toDF("id", "v")
        .coalesce(1), dest, None, Seq("id"))
    val bigRel = targetHolding(dest, 1000L)

    // OPTIMIZE absorbs a dv landing on the UNREWRITTEN big file: both
    // the repack and the tombstones survive
    ManifestSink.onBeforeOptimizeCommit = () =>
      commitDvManually(dest, bigRel, (1000L until 1010L))
    val packed = try ManifestSink.optimize(spark, dest,
      targetBytes = 1L << 16)
    finally ManifestSink.onBeforeOptimizeCommit = () => ()
    assert(packed == 4, s"small files should pack, got $packed")
    val after = ManifestSink.readBack(spark, dest)
    assert(after.count() == 400 + 50000 - 10)
    assert(after.where(col("id").between(1000, 1009)).count() == 0,
      "absorbed tombstones must survive the snapshot")

    // a dv inside the rewrite set is a TRUE conflict: the COW delete
    // aborts, the dv commit stands, a retry sees both
    val fileWith200 = targetHolding(dest, 200L)
    ManifestSink.onBeforeRewriteCommit = () =>
      commitDvManually(dest, fileWith200, (210L until 220L))
    val gone = try ManifestSink.deleteWhere(spark, dest,
      ManifestSink.SkipPredicate.NumRange("id", 200, 249))
    finally ManifestSink.onBeforeRewriteCommit = () => ()
    assert(gone == 0L, "dv on a rewritten file must abort the snapshot")
    assert(ManifestSink.readBack(spark, dest).count() ==
      400 + 50000 - 10 - 10)
    assert(ManifestSink.deleteWhere(spark, dest,
      ManifestSink.SkipPredicate.NumRange("id", 200, 249)) == 40L)

    // ...and a COW delete absorbs a dv OUTSIDE its rewrite set
    val delTotal = 400 + 50000 - 10 - 10 - 40
    ManifestSink.onBeforeRewriteCommit = () =>
      commitDvManually(dest, bigRel, (2000L until 2010L))
    val gone2 = try ManifestSink.deleteWhere(spark, dest,
      ManifestSink.SkipPredicate.NumRange("id", 0, 49))
    finally ManifestSink.onBeforeRewriteCommit = () => ()
    assert(gone2 == 50L,
      "dv on an untouched file must absorb, not abort")
    assert(ManifestSink.readBack(spark, dest).count() ==
      delTotal - 50 - 10)
    assert(ManifestSink.readBack(spark, dest)
      .where(col("id").between(2000, 2009)).count() == 0)
  }

  /** Relative targets named by the committed manifests of `dest`. */
  private def manifestTargets(dest: String): Set[String] = {
    val log = new java.io.File(s"$dest/_log")
    log.listFiles().filter(_.getName.endsWith(".manifest")).flatMap { f =>
      scala.io.Source.fromFile(f, "UTF-8").getLines()
        .filter(_.startsWith("target\t")).map(_.substring(7))
    }.toSet
  }

  test("schema evolution across commits: explicit-file-list read still " +
      "merges narrow and wide files") {
    val root = tmpDir("msinksch_")
    val dest = s"$root/wh/t"
    ManifestSink.append(Seq((1L, "a")).toDF("id", "v"), dest, None)
    ManifestSink.append(
      Seq((2L, "b", 9.5)).toDF("id", "v", "extra"), dest, None)
    val back = ManifestSink.readBack(spark, dest)
    assert(back.columns.toSet == Set("id", "v", "extra"))
    assert(back.count() == 2)
    assert(back.filter(col("id") === 1L).select("extra").head().isNullAt(0))
  }

  test("property: random append/crash/compact/vacuum/recover/optimize/" +
      "statsAppend/deleteWhere/mergeInto/checkpoint/morDelete " +
      "schedules never expose a " +
      "partial batch, never lose a ledgered commit newer than the " +
      "compaction floor, keep the skipping read equal to the filtered " +
      "full read in every state, and every surviving version reads as " +
      "the exact prefix of its log") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed

    // ops: Append(crashWindow) with window 0 = clean commit,
    // 1 = crash after move before log commit, 2 = committed to the log
    // but never ledgered, 3 = committed + ledgered but crashed before the
    // staging marker cleanup; Compact / Vacuum / Recover / Optimize /
    // StatsAppend as themselves
    val opGen: Gen[Int] = Gen.frequency(
      6 -> Gen.choose(0, 3), // Append windows
      2 -> Gen.const(10),    // Compact
      1 -> Gen.const(11),    // Vacuum
      2 -> Gen.const(12),    // Recover
      2 -> Gen.const(13),    // Optimize (data-file bin-pack snapshot)
      2 -> Gen.const(14),    // StatsAppend (clean commit + skip stats)
      2 -> Gen.const(15),    // DeleteWhere (copy-on-write snapshot)
      2 -> Gen.const(16),    // MergeInto (upsert snapshot)
      2 -> Gen.const(17),    // Checkpoint (pure metadata summary)
      2 -> Gen.const(18))    // MorDelete (deletion-vector commit)
    val schedGen = Gen.listOfN(8, opGen)

    (0 until 10).foreach { case i =>
      val sched = schedGen.apply(Gen.Parameters.default, Seed(i.toLong))
        .getOrElse(Nil)
      val root = tmpDir(s"msinkprop${i}_")
      val dest = s"$root/wh/t"
      val ledgered = scala.collection.mutable.Set[String]()
      // model mirrors of the real state: (version, writeId, batch ids)
      var logModel = Vector.empty[(Long, String, Set[Long])]
      // versions SUPERSEDED by a snapshot (optimize/delete/merge) but
      // retained on disk for time travel — only compact removes them
      var retained = Set.empty[Long]
      // deletion-vector commits: (version, tombstoned ids). A snapshot
      // BAKES every dv at or below it into its net id set (rewrites
      // materialize, carries stay subtracted either way), so snapshot
      // cases clear this after computing visibility through it
      var dvModel = Vector.empty[(Long, Set[Long])]
      def visibleNow: Set[Long] =
        logModel.flatMap(_._3).toSet -- dvModel.flatMap(_._2)
      var pending = Map.empty[String, Int] // writeId -> crash window
      var nextBatch = 0

      def ids(b: Int): Set[Long] = Set(b * 10L, b * 10L + 1, b * 10L + 2)
      def actualVersion(writeId: String): Long = {
        val f = new java.io.File(s"$dest/_log").listFiles()
          .filter(_.getName.endsWith(".manifest"))
          .find { mf =>
            scala.io.Source.fromFile(mf, "UTF-8").getLines()
              .exists(_ == s"writeid\t$writeId")
          }
        assert(f.isDefined, s"schedule $i: no log entry for $writeId")
        f.get.getName.takeWhile(_.isDigit).toLong
      }
      def readIds(df: org.apache.spark.sql.DataFrame): Set[Long] =
        // an empty table reads as spark.emptyDataFrame (no columns)
        if (!df.columns.contains("id")) Set.empty
        else df.select("id").as[Long].collect().toSet
      def check(where: String): Unit = {
        val visible = visibleNow
        assert(readIds(ManifestSink.readBack(spark, dest)) == visible,
          s"schedule $i after $where: readBack != committed union")
        // the skipping read must equal the filtered full read in EVERY
        // reachable state: statsless files, post-compact carried stats,
        // post-optimize merged stats, crash debris, dv tombstones
        assert(readIds(ManifestSink.readBackWhere(spark, dest,
            "id", 5, 25)) == visible.filter(id => id >= 5 && id <= 25),
          s"schedule $i after $where: readBackWhere != filtered readBack")
      }
      def survivingVersions(): Set[Long] =
        Option(new java.io.File(s"$dest/_log").listFiles())
          .map(_.toSeq).getOrElse(Nil)
          .map(_.getName).filter(_.endsWith(".manifest"))
          .map(_.takeWhile(_.isDigit).toLong).toSet
      // recover must drop exactly the committed-unledgered entries and
      // keep every ledgered one — predicted, then asserted against the
      // real log (mirroring the real log here would mask a recover bug)
      def applyRecover(where: String): Unit = {
        ManifestSink.recover(spark, dest,
          uris => uris.forall(ledgered.contains))
        val rolledBack = pending.collect { case (id, 2) => id }.toSet
        logModel = logModel.filterNot(e => rolledBack.contains(e._2))
        assert(survivingVersions() ==
          logModel.map(_._1).toSet ++ retained,
          s"schedule $i after $where: surviving log != predicted " +
            "(rolled-back window-2 entries gone, everything else kept)")
        pending = Map.empty
      }

      sched.zipWithIndex.foreach { case (op, k) =>
        op match {
          case w if w <= 3 => // Append under crash window w
            val b = nextBatch; nextBatch += 1
            val writeId = f"p$i%02db$b%02d"
            val uri = s"gs://src/batch$b"
            val df = ids(b).toSeq.sorted
              .map(id => (id, s"b$b")).toDF("id", "v")
            ManifestSink.stagedAppend(df, dest, None, writeId, Seq(uri))
            w match {
              case 0 =>
                ledgered += uri
                ManifestSink.finishCommit(spark, dest, writeId)
                logModel :+= ((actualVersion(writeId), writeId, ids(b)))
              case 1 => // un-commit: drop the log entry, leave staging
                val v = actualVersion(writeId)
                val mf = new java.io.File(s"$dest/_log",
                  f"$v%012d.manifest")
                assert(mf.delete())
                pending += (writeId -> 1)
              case 2 => // committed, unledgered, staging left
                logModel :+= ((actualVersion(writeId), writeId, ids(b)))
                pending += (writeId -> 2)
              case 3 => // committed AND ledgered, staging left
                ledgered += uri
                logModel :+= ((actualVersion(writeId), writeId, ids(b)))
                pending += (writeId -> 3)
            }
          case 10 =>
            ManifestSink.compact(spark, dest)
            if (pending.isEmpty &&
                retained.size + logModel.length > 1) {
              val v = logModel.map(_._1).max + 1
              logModel = Vector((v, "compact", visibleNow))
              dvModel = Vector.empty // carried dvs baked into the set
              retained = Set.empty // compact is the history collapse
            } // else refused (pending) or no-op (<=1 manifest)
            assert(survivingVersions() ==
              logModel.map(_._1).toSet ++ retained,
              s"schedule $i: compact left an unpredicted log state")
          case 11 =>
            ManifestSink.vacuum(spark, dest, retentionMs = 0L)
            // never changes committed content (refuses while pending;
            // otherwise only unreferenced debris goes)
          case 12 =>
            applyRecover(s"op#$k")
          case 13 =>
            val packed =
              ManifestSink.optimize(spark, dest, targetBytes = 1L << 20)
            if (packed > 0) {
              // one snapshot version supersedes the effective log —
              // the superseded versions are RETAINED for time travel;
              // content identical (the return value keys the model
              // because whether bins form depends on physical sizes)
              val v = logModel.map(_._1).max + 1
              retained ++= logModel.map(_._1)
              logModel = Vector((v, "optimize", visibleNow))
              dvModel = Vector.empty // materialized or carried — baked
            }
            assert(survivingVersions() ==
              logModel.map(_._1).toSet ++ retained,
              s"schedule $i: optimize left an unpredicted log state")
          case 14 =>
            val b = nextBatch; nextBatch += 1
            val df = ids(b).toSeq.sorted
              .map(id => (id, s"b$b")).toDF("id", "v")
            ManifestSink.statsAppend(df, dest, None, Seq("id"))
            logModel :+= ((survivingVersions().max, s"stats$b", ids(b)))
          case 15 => // copy-on-write delete of a deterministic id slab
            val lo = (k * 7 % 40).toDouble
            val visible = visibleNow
            val expect = visible.filter(id => id >= lo && id <= lo + 9)
            val gone = ManifestSink.deleteWhere(spark, dest,
              ManifestSink.SkipPredicate.NumRange("id", lo, lo + 9))
            if (pending.nonEmpty || expect.isEmpty)
              assert(gone == 0L,
                s"schedule $i op#$k: delete must refuse/no-op, got $gone")
            else {
              assert(gone == expect.size.toLong,
                s"schedule $i op#$k: delete count")
              val v = logModel.map(_._1).max + 1
              retained ++= logModel.map(_._1)
              logModel = Vector((v, "delete", visible -- expect))
              dvModel = Vector.empty
            }
            assert(survivingVersions() ==
              logModel.map(_._1).toSet ++ retained,
              s"schedule $i: delete left an unpredicted log state")
          case 16 => // merge-upsert of a 3-id band; the +5 offset keeps
            // merge ids disjoint from append ids (x0..x2 per decade), so
            // re-merging a band is an UPDATE while an append can never
            // duplicate a merged id — the set model stays faithful
            val m = (k % 5) * 10L + 5L
            val srcIds = Set(m, m + 1, m + 2)
            val df = srcIds.toSeq.sorted
              .map(id => (id, s"m$k")).toDF("id", "v")
            val visible = visibleNow
            val res = ManifestSink.mergeInto(spark, dest, df, "id")
            if (logModel.isEmpty && pending.isEmpty) {
              // empty table: plain-insert path, one incremental version
              assert(res == ((0L, 3L)))
              logModel :+=
                ((survivingVersions().max, s"mergeins$k", srcIds))
            } else if (pending.nonEmpty && logModel.isEmpty) {
              // insert path commits regardless of staged debris —
              // appends never refuse on pending attempts
              assert(res == ((0L, 3L)))
              logModel :+=
                ((survivingVersions().max, s"mergeins$k", srcIds))
            } else if (pending.nonEmpty) {
              assert(res == ((0L, 0L)),
                s"schedule $i op#$k: merge must refuse on pending")
            } else {
              val u = visible.intersect(srcIds).size.toLong
              assert(res == ((u, 3L - u)),
                s"schedule $i op#$k: merge counts $res, want ($u)")
              val v = logModel.map(_._1).max + 1
              retained ++= logModel.map(_._1)
              logModel = Vector((v, "merge", visible ++ srcIds))
              dvModel = Vector.empty
            }
            assert(survivingVersions() ==
              logModel.map(_._1).toSet ++ retained,
              s"schedule $i: merge left an unpredicted log state")
          case 17 => // checkpoint: derived metadata only — never a new
            // version, never content; writes nothing while attempts pend
            def ckSet(): Set[String] =
              Option(new java.io.File(s"$dest/_log").listFiles())
                .map(_.toSeq).getOrElse(Nil).map(_.getName)
                .filter(_.endsWith(".checkpoint")).toSet
            val before = ckSet()
            ManifestSink.checkpoint(spark, dest)
            if (pending.nonEmpty) assert(ckSet() == before,
              s"schedule $i op#$k: checkpoint must refuse on pending")
            assert(survivingVersions() ==
              logModel.map(_._1).toSet ++ retained,
              s"schedule $i: checkpoint changed the manifest set")
          case 18 => // merge-on-read delete of a deterministic id slab:
            // tombstones only — an INCREMENTAL version whose dv lines
            // subtract from every read at or above it
            val lo = (k * 11 % 40).toDouble
            val expect = visibleNow.filter(id => id >= lo && id <= lo + 4)
            val gone = ManifestSink.deleteWhereMor(spark, dest,
              ManifestSink.SkipPredicate.NumRange("id", lo, lo + 4))
            if (pending.nonEmpty || expect.isEmpty)
              assert(gone == 0L,
                s"schedule $i op#$k: mor delete must refuse/no-op, " +
                  s"got $gone")
            else {
              assert(gone == expect.size.toLong,
                s"schedule $i op#$k: mor delete count")
              val v = survivingVersions().max
              logModel :+= ((v, s"mor$k", Set.empty[Long]))
              dvModel :+= ((v, expect))
            }
            assert(survivingVersions() ==
              logModel.map(_._1).toSet ++ retained,
              s"schedule $i: mor delete left an unpredicted log state")
        }
        check(s"op#$k($op)")
      }

      // settle: recover everything, then the version ladder must read as
      // exact prefixes, and the floor must refuse reads below it
      applyRecover("final recover")
      check("final recover")
      logModel.map(_._1).foreach { v =>
        val expect = logModel.filter(_._1 <= v).flatMap(_._3).toSet --
          dvModel.filter(_._1 <= v).flatMap(_._2)
        assert(readIds(ManifestSink.readVersion(spark, dest, v)) == expect,
          s"schedule $i: readVersion($v) is not the exact prefix")
      }
      (logModel.map(_._1) ++ retained).minOption.foreach { floor =>
        if (floor > 0) {
          val err = intercept[IllegalArgumentException] {
            ManifestSink.readVersion(spark, dest, floor - 1)
          }
          assert(err.getMessage.contains("compacted away"))
        }
      }
    }
  }

  test("copy-on-write delete: only stats-candidate files rewrite, " +
      "fully-matched files drop without a write, null predicate values " +
      "survive, and rewritten stats stay tight") {
    val root = tmpDir("msinkdel_")
    val dest = s"$root/wh/t"
    // 5 disjoint-range files with stats + one statsless file with nulls
    for (b <- 0 until 5)
      ManifestSink.statsAppend(
        (b * 100L until b * 100L + 100L).map(i => (i, s"v$i"))
          .toDF("id", "v").coalesce(1),
        dest, None, statsCols = Seq("id"))
    ManifestSink.append(
      Seq[(Option[Long], String)]((None, "n1"), (None, "n2"),
        (Some(9999L), "x")).toDF("id", "v").coalesce(1), dest, None)
    val filesBefore = ManifestSink.readBack(spark, dest).inputFiles.toSet
    assert(filesBefore.size == 6)

    // partial delete inside file [100,199]: 61 rows go, the other four
    // stats-bearing files are untouched BYTES (same paths)
    assert(ManifestSink.deleteWhere(spark, dest,
      ManifestSink.SkipPredicate.NumRange("id", 120, 180)) == 61L)
    val after1 = ManifestSink.readBack(spark, dest)
    assert(after1.count() == 503 - 61)
    assert(after1.where(col("id").between(120, 180)).count() == 0)
    assert(after1.where(col("id").between(100, 119)).count() == 20)
    // null rows rode through the statsless candidate untouched
    assert(after1.where(col("id").isNull).count() == 2)
    val files1 = after1.inputFiles.toSet
    // 4 stats-excluded files + the statsless one (no matches) untouched
    assert(files1.intersect(filesBefore).size == 5)
    // rewritten stats stay live: the old range still prunes to its one
    // stats-bearing file (plus the statsless append, conservatively read)
    assert(ManifestSink.readBackWhere(spark, dest, "id", 250, 280)
      .inputFiles.length == 2)

    // whole-file delete: [200,299] drops its file entirely — no rewrite
    assert(ManifestSink.deleteWhere(spark, dest,
      ManifestSink.SkipPredicate.NumRange("id", 200, 299)) == 100L)
    val after2 = ManifestSink.readBack(spark, dest)
    assert(after2.count() == 342)
    assert(after2.inputFiles.length == 5)

    // no-match predicates: out-of-stats → zero candidates; in-stats
    // no-hit column → zero matched; both leave the log version alone
    assert(ManifestSink.deleteWhere(spark, dest,
      ManifestSink.SkipPredicate.NumRange("id", 50000, 60000)) == 0L)
    assert(ManifestSink.deleteWhere(spark, dest,
      ManifestSink.SkipPredicate.StrEq("v", "nope")) == 0L)
    assert(ManifestSink.readBack(spark, dest).count() == 342)

    // vacuum sweeps the replaced generations once compact has dropped
    // the retained manifests that still referenced them; state unchanged
    ManifestSink.compact(spark, dest)
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(dest))
      .foreach(f => f.setLastModified(System.currentTimeMillis() - 120000))
    assert(ManifestSink.vacuum(spark, dest, retentionMs = 60000) == 2L)
    assert(ManifestSink.readBack(spark, dest).count() == 342)
  }

  test("copy-on-write update: SET evaluates against the old row, " +
      "matches-only rewrite, re-derived stats route reads to the new " +
      "values, and a concurrent append aborts the commit cleanly") {
    val root = tmpDir("msinkupd_")
    val dest = s"$root/wh/t"
    for (b <- 0 until 4)
      ManifestSink.statsAppend(
        (b * 100L until b * 100L + 100L).map(i => (i, i * 2, s"v$i"))
          .toDF("id", "w", "v").coalesce(1),
        dest, None, statsCols = Seq("id", "w"))

    // swap semantics: id and w exchange values in [300, 399] — only
    // well-defined if every SET expression sees the OLD row
    assert(ManifestSink.updateWhere(spark, dest,
      ManifestSink.SkipPredicate.NumRange("id", 300, 399),
      Map("id" -> col("w"), "w" -> col("id"))) == 100L)
    val got = ManifestSink.readBack(spark, dest)
    assert(got.count() == 400)
    // the swapped file's ids moved to the even 600..798 range
    assert(got.where(col("id").between(300, 399)).count() == 0)
    // 100 swapped w values plus the 50 even untouched w in [300, 398]
    assert(got.where(col("w").between(300, 399)).count() == 150)
    assert(got.where(col("id") === 600 && col("w") === 300).count() == 1)
    // stats were re-derived from the new values: ids now reach 798 and
    // a read in the moved range prunes to the ONE rewritten file
    val moved = ManifestSink.readBackWhere(spark, dest, "id", 700, 798)
    assert(moved.inputFiles.length == 1)
    assert(moved.count() == 50)
    // untouched files did not rewrite
    assert(ManifestSink.readBackWhere(spark, dest, "id", 0, 99)
      .inputFiles.length == 1)

    // value update with a constant; matched count is rows actually hit
    assert(ManifestSink.updateWhere(spark, dest,
      ManifestSink.SkipPredicate.StrEq("v", "v0"),
      Map("v" -> lit("patched"))) == 1L)
    assert(ManifestSink.readBack(spark, dest)
      .where(col("v") === "patched").count() == 1)

    // SET on a missing column fails loudly
    intercept[IllegalArgumentException] {
      ManifestSink.updateWhere(spark, dest,
        ManifestSink.SkipPredicate.NumRange("id", 0, 1),
        Map("nope" -> lit(1)))
    }

    // concurrent append between rewrite and commit: the snapshot is
    // stale — rewrite ABORTS (0 rows), the append survives, a retry
    // succeeds
    ManifestSink.onBeforeRewriteCommit = () =>
      ManifestSink.append(
        Seq((5000L, 5000L, "late")).toDF("id", "w", "v"), dest, None)
    try {
      assert(ManifestSink.updateWhere(spark, dest,
        ManifestSink.SkipPredicate.NumRange("id", 0, 10),
        Map("v" -> lit("x"))) == 0L)
    } finally ManifestSink.onBeforeRewriteCommit = () => ()
    val afterAbort = ManifestSink.readBack(spark, dest)
    assert(afterAbort.count() == 401)
    assert(afterAbort.where(col("v") === "late").count() == 1)
    assert(afterAbort.where(col("v") === "x").count() == 0)
    assert(ManifestSink.updateWhere(spark, dest,
      ManifestSink.SkipPredicate.NumRange("id", 0, 10),
      Map("v" -> lit("x"))) == 11L)
    assert(ManifestSink.readBack(spark, dest)
      .where(col("v") === "x").count() == 11)
  }

  test("mergeInto upsert: matched keys replace, new keys insert, one " +
      "atomic snapshot — stats-excluded files stay untouched bytes, " +
      "duplicate-key sources are refused, and a concurrent append " +
      "aborts cleanly") {
    val root = tmpDir("msinkmrg_")
    val dest = s"$root/wh/t"
    for (b <- 0 until 4)
      ManifestSink.statsAppend(
        (b * 100L until b * 100L + 100L).map(i => (i, s"v$i"))
          .toDF("id", "v").coalesce(1),
        dest, None, statsCols = Seq("id"))
    val filesBefore = ManifestSink.readBack(spark, dest).inputFiles.toSet

    // source: 10 updates inside file 1's range + 5 brand-new keys
    val srcRows = (150L until 160L).map(i => (i, s"UP$i")) ++
      (1000L until 1005L).map(i => (i, s"NEW$i"))
    val (upd, ins) = ManifestSink.mergeInto(spark, dest,
      srcRows.toDF("id", "v").coalesce(1), "id",
      statsCols = Seq("id"))
    assert((upd, ins) == (10L, 5L))
    val got = ManifestSink.readBack(spark, dest)
    assert(got.count() == 405)
    // replaced values read back NEW, others OLD
    assert(got.where(col("v").startsWith("UP")).count() == 10)
    assert(got.where(col("id") === 155 && col("v") === "UP155")
      .count() == 1)
    assert(got.where(col("id") === 42 && col("v") === "v42").count() == 1)
    assert(got.where(col("v").startsWith("NEW")).count() == 5)
    // only file 1 rewrote: the other three kept their exact paths
    assert(got.inputFiles.toSet.intersect(filesBefore).size == 3)
    // stats: an old range outside the source's wide envelope still
    // prunes to its one file; the new-key band routes to the inserted
    // file(s) only
    assert(ManifestSink.readBackWhere(spark, dest, "id", 50, 60)
      .inputFiles.length == 1)
    val newBand = ManifestSink.readBackWhere(spark, dest, "id", 1000, 1004)
    assert(newBand.count() == 5)
    assert(newBand.inputFiles.toSet.intersect(filesBefore).isEmpty)

    // second merge with the SAME source is idempotent on content: all
    // 15 keys now exist, so 15 updates / 0 inserts
    assert(ManifestSink.mergeInto(spark, dest,
      srcRows.toDF("id", "v").coalesce(1), "id",
      statsCols = Seq("id")) == ((15L, 0L)))
    assert(ManifestSink.readBack(spark, dest).count() == 405)

    // duplicate-key source is refused before anything stages
    intercept[IllegalArgumentException] {
      ManifestSink.mergeInto(spark, dest,
        Seq((1L, "a"), (1L, "b")).toDF("id", "v"), "id")
    }
    assert(ManifestSink.readBack(spark, dest).count() == 405)

    // a source matching EVERY row of one file: the rewrite is an empty
    // husk whose rows=0 stats make it prunable; content is exact
    assert(ManifestSink.mergeInto(spark, dest,
      (200L until 300L).map(i => (i, "wipe")).toDF("id", "v")
        .coalesce(1), "id", statsCols = Seq("id")) == ((100L, 0L)))
    val wiped = ManifestSink.readBack(spark, dest)
    assert(wiped.count() == 405)
    assert(wiped.where(col("v") === "wipe").count() == 100)
    // the husk never surfaces in a pruned read outside the new envelope
    assert(ManifestSink.readBackWhere(spark, dest, "id", 0, 50)
      .count() == 51)

    // merge into an empty table is a plain insert
    val dest2 = s"$root/wh/t2"
    assert(ManifestSink.mergeInto(spark, dest2,
      Seq((1L, "x")).toDF("id", "v"), "id",
      statsCols = Seq("id")) == ((0L, 1L)))
    assert(ManifestSink.readBack(spark, dest2).count() == 1)

    // concurrent append between rewrite and commit aborts the merge;
    // retry succeeds
    ManifestSink.onBeforeRewriteCommit = () =>
      ManifestSink.append(Seq((7777L, "late")).toDF("id", "v"),
        dest, None)
    try {
      assert(ManifestSink.mergeInto(spark, dest,
        Seq((0L, "RETRY")).toDF("id", "v"), "id") == ((0L, 0L)))
    } finally ManifestSink.onBeforeRewriteCommit = () => ()
    val afterAbort = ManifestSink.readBack(spark, dest)
    assert(afterAbort.count() == 406)
    assert(afterAbort.where(col("v") === "RETRY").count() == 0)
    assert(ManifestSink.mergeInto(spark, dest,
      Seq((0L, "RETRY")).toDF("id", "v"), "id") == ((1L, 0L)))
    val end = ManifestSink.readBack(spark, dest)
    assert(end.count() == 406)
    assert(end.where(col("id") === 0).count() == 1)
    assert(end.where(col("v") === "RETRY").count() == 1)
  }

  test("history: one metadata row per surviving version — kinds, file " +
      "counts, stats-derived row counts (null when any file lacks " +
      "them), zero data files read") {
    val root = tmpDir("msinkhist_")
    val dest = s"$root/wh/t"
    ManifestSink.statsAppend(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v").coalesce(1),
      dest, None, statsCols = Seq("id"))
    ManifestSink.append(
      Seq((4L, "d"), (5L, "e")).toDF("id", "v").coalesce(1), dest, None)
    val h1 = ManifestSink.history(spark, dest).orderBy("version")
      .as[(Long, java.sql.Timestamp, String, Int, Option[Long])]
      .collect().toSeq
    assert(h1.map(r => (r._1, r._3, r._4, r._5)) ==
      Seq((0L, "append", 1, Some(3L)), (1L, "append", 1, None)))
    assert(h1(0)._2.getTime <= h1(1)._2.getTime)
    // a log compaction collapses history to one snapshot row covering
    // the whole table; the statsless v1 file keeps n_rows unknowable
    ManifestSink.compact(spark, dest)
    val h2 = ManifestSink.history(spark, dest)
      .as[(Long, java.sql.Timestamp, String, Int, Option[Long])]
      .collect().toSeq
    assert(h2.map(r => (r._3, r._4, r._5)) ==
      Seq(("snapshot", 2, None)))
    // with stats on EVERY file, the snapshot's n_rows is exact
    val dest2 = s"$root/wh/t2"
    ManifestSink.statsAppend(Seq((1L, "a")).toDF("id", "v").coalesce(1),
      dest2, None, statsCols = Seq("id"))
    ManifestSink.statsAppend(Seq((2L, "b")).toDF("id", "v").coalesce(1),
      dest2, None, statsCols = Seq("id"))
    ManifestSink.compact(spark, dest2)
    val h3 = ManifestSink.history(spark, dest2)
      .as[(Long, java.sql.Timestamp, String, Int, Option[Long])]
      .collect().toSeq
    assert(h3.map(r => (r._3, r._4, r._5)) ==
      Seq(("snapshot", 2, Some(2L))))
  }

  test("readAsOf: timestamp time travel resolves commit mtimes — each " +
      "inter-commit instant reads its prefix, a pre-creation timestamp " +
      "refuses, and the future reads the head") {
    val root = tmpDir("msinkasof_")
    val dest = s"$root/wh/t"
    ManifestSink.append(Seq((0L, "a")).toDF("id", "v"), dest, None)
    Thread.sleep(30); val t01 = System.currentTimeMillis()
    Thread.sleep(30)
    ManifestSink.append(Seq((1L, "b")).toDF("id", "v"), dest, None)
    Thread.sleep(30); val t12 = System.currentTimeMillis()
    Thread.sleep(30)
    ManifestSink.append(Seq((2L, "c")).toDF("id", "v"), dest, None)
    def ids(ts: Long) = ManifestSink.readAsOf(spark, dest, ts)
      .select("id").as[Long].collect().toSeq.sorted
    assert(ids(t01) == Seq(0L))
    assert(ids(t12) == Seq(0L, 1L))
    assert(ids(System.currentTimeMillis() + 60000) == Seq(0L, 1L, 2L))
    intercept[IllegalArgumentException] {
      ManifestSink.readAsOf(spark, dest, 1000L)
    }
  }

  test("mergeCdc: one change batch carrying inserts, updates, and " +
      "deletes lands as ONE atomic snapshot; directive columns never " +
      "reach the table; unmatched, replayed, and null-condition " +
      "deletes are no-ops") {
    val root = tmpDir("msinkcdc3_")
    val dest = s"$root/wh/t"
    for (b <- 0 until 4)
      ManifestSink.statsAppend(
        (b * 100L until b * 100L + 100L).map(i => (i, s"v$i"))
          .toDF("id", "v").coalesce(1),
        dest, None, statsCols = Seq("id"))
    val filesBefore = ManifestSink.readBack(spark, dest).inputFiles.toSet

    // the Debezium shape: op = u (upsert) / d (delete), op dropped
    // before landing; one batch deletes 10 keys of file 1, updates 5
    // keys of file 3, inserts 3 fresh keys, and carries 2 deletes for
    // keys that never existed plus one NULL op (null condition = keep)
    val batch =
      (150L until 160L).map(i => (i, s"dead$i", "d")) ++
      (310L until 315L).map(i => (i, s"UP$i", "u")) ++
      (1000L until 1003L).map(i => (i, s"NEW$i", "u")) ++
      Seq((5000L, "ghost", "d"), (5001L, "ghost", "d")) ++
      Seq((42L, "KEEPME", null: String))
    val (upd, ins, del) = ManifestSink.mergeCdc(spark, dest,
      batch.toDF("id", "v", "op").coalesce(1), "id",
      col("op") === "d", directiveCols = Seq("op"),
      statsCols = Seq("id"))
    assert((upd, ins, del) == ((6L, 3L, 10L)))
    val got = ManifestSink.readBack(spark, dest)
    assert(got.columns.toSeq == Seq("id", "v"), "op column leaked")
    assert(got.count() == 400 - 10 + 3)
    assert(got.where(col("id").between(150, 159)).count() == 0)
    assert(got.where(col("v").startsWith("UP")).count() == 5)
    assert(got.where(col("v").startsWith("NEW")).count() == 3)
    assert(got.where(col("id") === 42).select("v").head.getString(0)
      == "KEEPME")
    assert(got.where(col("v") === "ghost").count() == 0)
    // only files 0 (null-op update), 1 (deletes) and 3 (updates)
    // rewrote; file 2 kept its exact path
    assert(got.inputFiles.toSet.intersect(filesBefore).size == 1)
    // stats survive: the 250..260 probe reads file 2 plus the inserted
    // file (its 42..1002 envelope may-matches) — never the three
    // rewrites, whose RE-DERIVED stats exclude the band
    val probe = ManifestSink.readBackWhere(spark, dest, "id", 250, 260)
    assert(probe.inputFiles.length == 2)
    assert(probe.count() == 11)

    // replaying the SAME change batch: deletes are unmatched now
    // (no-ops), upserts re-match — content unchanged
    val (u2, i2, d2) = ManifestSink.mergeCdc(spark, dest,
      batch.toDF("id", "v", "op").coalesce(1), "id",
      col("op") === "d", directiveCols = Seq("op"),
      statsCols = Seq("id"))
    assert((u2, i2, d2) == ((9L, 0L, 0L)))
    assert(ManifestSink.readBack(spark, dest).count() == 393)

    // an all-unmatched-delete batch commits nothing (no new version)
    def logN() = new java.io.File(s"$dest/_log").listFiles()
      .count(_.getName.endsWith(".manifest"))
    val verBefore = logN()
    assert(ManifestSink.mergeCdc(spark, dest,
      Seq((9000L, "x", "d")).toDF("id", "v", "op"), "id",
      col("op") === "d", directiveCols = Seq("op"))
      == ((0L, 0L, 0L)))
    assert(logN() == verBefore)

    // delete-only batch against an EMPTY table is a no-op, upserts
    // create it
    val dest2 = s"$root/wh/t2"
    assert(ManifestSink.mergeCdc(spark, dest2,
      Seq((1L, "x", "d")).toDF("id", "v", "op"), "id",
      col("op") === "d", directiveCols = Seq("op")) == ((0L, 0L, 0L)))
    assert(ManifestSink.mergeCdc(spark, dest2,
      Seq((1L, "x", "u")).toDF("id", "v", "op"), "id",
      col("op") === "d", directiveCols = Seq("op")) == ((0L, 1L, 0L)))
    val t2 = ManifestSink.readBack(spark, dest2)
    assert(t2.columns.toSeq == Seq("id", "v") && t2.count() == 1)

    // one key cannot be both deleted and upserted in a batch
    intercept[IllegalArgumentException] {
      ManifestSink.mergeCdc(spark, dest,
        Seq((1L, "a", "u"), (1L, "a", "d")).toDF("id", "v", "op"),
        "id", col("op") === "d", directiveCols = Seq("op"))
    }
  }

  test("readAppendsBetween: CDC incremental reads are a metadata " +
      "decision — exact rows per version range, and a snapshot in the " +
      "range fails loudly instead of lying") {
    val root = tmpDir("msinkcdc_")
    val dest = s"$root/wh/t"
    for (b <- 0 until 3) // versions 0, 1, 2
      ManifestSink.append(
        (b * 10L until b * 10L + 10L).map(i => (i, s"v$i"))
          .toDF("id", "v").coalesce(1), dest, None)
    def ids(since: Long, until: Long = Long.MaxValue) = {
      val df = ManifestSink.readAppendsBetween(spark, dest, since, until)
      if (df.columns.isEmpty) Seq.empty[Long]
      else df.select("id").as[Long].collect().sorted.toSeq
    }
    assert(ids(-1) == (0L until 30L))
    assert(ids(0) == (10L until 30L))
    assert(ids(1) == (20L until 30L))
    assert(ids(2) == Seq.empty)
    assert(ids(0, until = 1) == (10L until 20L))
    // a fourth append is picked up incrementally
    ManifestSink.append(Seq((99L, "x")).toDF("id", "v"), dest, None)
    assert(ids(2) == Seq(99L))
    // optimize writes a snapshot (v4): any range crossing it refuses
    // with the SNAPSHOT error (manifests are retained, so the range
    // resolves — but file membership no longer means "new rows");
    // after compact collapses history, a floor below the surviving
    // snapshot refuses as compacted-away
    assert(ManifestSink.optimize(spark, dest,
      targetBytes = 1L << 20) > 0L)
    val errSnap = intercept[IllegalArgumentException] { ids(3) }
    assert(errSnap.getMessage.contains("SNAPSHOT"))
    val errSnap2 = intercept[IllegalArgumentException] { ids(1) }
    assert(errSnap2.getMessage.contains("SNAPSHOT"))
    ManifestSink.compact(spark, dest)
    val errGone = intercept[IllegalArgumentException] { ids(1) }
    assert(errGone.getMessage.contains("compacted away"))
    // appends after the compact snapshot (v5) read incrementally again
    ManifestSink.append(Seq((100L, "y")).toDF("id", "v"), dest, None)
    assert(ids(5) == Seq(100L))
  }

  test("checkedAppend: a violating batch is refused whole — nothing " +
      "stages, nothing commits; null predicates pass per SQL CHECK") {
    val root = tmpDir("msinkchk_")
    val dest = s"$root/wh/t"
    val pos = Seq[(java.lang.Long, String)]((1L, "a"), (2L, "b"),
      (null, "c")).toDF("id", "v")
    // null id PASSES the positivity check (SQL CHECK semantics)
    ManifestSink.checkedAppend(pos, dest, None,
      Seq("id_positive" -> (col("id") > 0)), statsCols = Seq("id"))
    assert(ManifestSink.readBack(spark, dest).count() == 3)

    val err = intercept[IllegalArgumentException] {
      ManifestSink.checkedAppend(
        Seq((3L, "ok"), (-7L, "bad"), (-8L, "bad2")).toDF("id", "v"),
        dest, None, Seq("id_positive" -> (col("id") > 0),
          "v_nonempty" -> (length(col("v")) > 0)))
    }
    assert(err.getMessage.contains("id_positive(2 rows)"))
    // the whole batch was refused — including its valid rows
    assert(ManifestSink.readBack(spark, dest).count() == 3)
    // explicit not-null check closes the null loophole
    intercept[IllegalArgumentException] {
      ManifestSink.checkedAppend(
        Seq[(java.lang.Long, String)]((null, "z")).toDF("id", "v"),
        dest, None, Seq("id_not_null" -> col("id").isNotNull))
    }
    assert(ManifestSink.readBack(spark, dest).count() == 3)
  }

  test("metadata-only aggregates: count/min-max/null-count from stats " +
      "lines alone, None the moment any file lacks them, all-null " +
      "files skipped for bounds, and survival through optimize") {
    val root = tmpDir("msinkmeta_")
    val dest = s"$root/wh/t"
    for (b <- 0 until 3)
      ManifestSink.statsAppend(
        (b * 100L until b * 100L + 100L).map(i =>
          (i, if (i % 10 == 0) None else Some(i * 0.5)))
          .toDF("id", "v").coalesce(1),
        dest, None, statsCols = Seq("id", "v"))
    assert(ManifestSink.metadataCount(spark, dest) == Some(300L))
    assert(ManifestSink.metadataMinMax(spark, dest, "id")
      == Some((0.0, 299.0)))
    assert(ManifestSink.metadataMinMax(spark, dest, "v")
      == Some((0.5, 149.5)))
    assert(ManifestSink.metadataNullCount(spark, dest, "v") == Some(30L))
    assert(ManifestSink.metadataNullCount(spark, dest, "id") == Some(0L))
    // a column no file recorded → None, never a guess
    assert(ManifestSink.metadataMinMax(spark, dest, "nope").isEmpty)
    // an all-null file contributes no bounds but keeps counts exact
    ManifestSink.statsAppend(
      Seq[(Long, Option[Double])]((900L, None), (901L, None))
        .toDF("id", "v").coalesce(1),
      dest, None, statsCols = Seq("id", "v"))
    assert(ManifestSink.metadataCount(spark, dest) == Some(302L))
    assert(ManifestSink.metadataMinMax(spark, dest, "v")
      == Some((0.5, 149.5)))
    assert(ManifestSink.metadataNullCount(spark, dest, "v") == Some(32L))
    // metadata answers survive the optimize metadata-merge
    assert(ManifestSink.optimize(spark, dest, targetBytes = 1L << 20) > 0)
    assert(ManifestSink.metadataCount(spark, dest) == Some(302L))
    assert(ManifestSink.metadataMinMax(spark, dest, "id")
      == Some((0.0, 901.0)))
    // one statsless append poisons every fast path to None
    ManifestSink.append(Seq((999L, Some(1.0)))
      .toDF("id", "v"), dest, None)
    assert(ManifestSink.metadataCount(spark, dest).isEmpty)
    assert(ManifestSink.metadataMinMax(spark, dest, "id").isEmpty)
    assert(ManifestSink.metadataNullCount(spark, dest, "v").isEmpty)
  }

  test("countWhere: fully-contained files credit by metadata, only " +
      "boundary files scan, exactness holds with nulls and across " +
      "every predicate class") {
    val root = tmpDir("msinkcnt_")
    val dest = s"$root/wh/t"
    for (b <- 0 until 5)
      ManifestSink.statsAppend(
        (b * 100L until b * 100L + 100L).map(i =>
          (i, if (i % 7 == 0) None else Some(i * 1.0), s"v$i"))
          .toDF("id", "v", "s").coalesce(1),
        dest, None, statsCols = Seq("id", "v"))
    import ManifestSink.SkipPredicate._
    // [100, 399]: three whole files credited, zero scanned
    assert(ManifestSink.countWhere(spark, dest,
      NumRange("id", 100, 399)) == 300L)
    // [150, 349]: one whole file credited, two boundary files scanned
    assert(ManifestSink.countWhere(spark, dest,
      NumRange("id", 150, 349)) == 200L)
    // out of domain
    assert(ManifestSink.countWhere(spark, dest,
      NumRange("id", 5000, 9000)) == 0L)
    // nulls: v has nulls every 7th — a range over v can never credit a
    // file wholesale (nulls break the proof) but stays exact
    val exact = ManifestSink.readBack(spark, dest)
      .where(col("v").between(0, 499)).count()
    assert(ManifestSink.countWhere(spark, dest,
      NumRange("v", 0, 499)) == exact)
    assert(ManifestSink.countWhere(spark, dest, IsNull("v")) ==
      ManifestSink.readBack(spark, dest)
        .where(col("v").isNull).count())
    assert(ManifestSink.countWhere(spark, dest, IsNotNull("id")) == 500L)
    // conjunction: id-contained AND id-not-null still credits whole
    assert(ManifestSink.countWhere(spark, dest, And(Seq(
      NumRange("id", 100, 399), IsNotNull("id")))) == 300L)
    // a statsless append forces its file into the scan set, not a guess
    ManifestSink.append(
      Seq((1000L, Some(1.0), "x")).toDF("id", "v", "s"), dest, None)
    assert(ManifestSink.countWhere(spark, dest,
      NumRange("id", 100, 399)) == 300L)
    assert(ManifestSink.countWhere(spark, dest,
      NumRange("id", 900, 1100)) == 1L)
  }

  test("copy-on-write by arbitrary expression: content-addressed " +
      "update rewrites only files with a matching row") {
    val root = tmpDir("msinkexpr_")
    val dest = s"$root/wh/t"
    for (b <- 0 until 3)
      ManifestSink.statsAppend(
        (b * 10L until b * 10L + 10L).map(i =>
          (i, if (i == 13) "secret-alpha" else s"plain $i"))
          .toDF("id", "v").coalesce(1),
        dest, None, statsCols = Seq("id"))
    val before = ManifestSink.readBack(spark, dest).inputFiles.toSet
    assert(ManifestSink.updateWhereExpr(spark, dest,
      col("v").contains("secret"),
      Map("v" -> lit("<REDACTED>"))) == 1L)
    val got = ManifestSink.readBack(spark, dest)
    assert(got.where(col("v") === "<REDACTED>").count() == 1)
    assert(got.where(col("v").contains("secret")).count() == 0)
    assert(got.inputFiles.toSet.intersect(before).size == 2)
    assert(ManifestSink.deleteWhereExpr(spark, dest,
      col("v").endsWith("14")) == 1L)
    assert(ManifestSink.readBack(spark, dest).count() == 29)
  }

  test("dropPartitions: a metadata-only delete — zero data bytes " +
      "touched, files linger for in-flight readers until vacuum, " +
      "appends stack on top, and a concurrent append aborts it") {
    val root = tmpDir("msinkdp_")
    val dest = s"$root/wh/t"
    val d = java.sql.Date.valueOf(_: String)
    ManifestSink.statsAppend(
      Seq((1L, "a", d("2026-01-01")), (2L, "b", d("2026-01-01")),
        (3L, "c", d("2026-01-02")), (4L, "d", d("2026-01-03")))
        .toDF("id", "v", "dt"), dest, Some("dt"), statsCols = Seq("id"))
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    def dataFiles() = walk(new java.io.File(dest))
      .filter(_.getName.endsWith(".parquet"))
    val before = dataFiles().length

    assert(ManifestSink.dropPartitions(spark, dest,
      Seq("2026-01-01", "2026-01-03")) >= 2L)
    val got = ManifestSink.readBack(spark, dest)
    assert(got.select("id").as[Long].collect().toSeq == Seq(3L))
    // zero data movement: every byte still on disk
    assert(dataFiles().length == before)
    // surviving stats still prune
    assert(ManifestSink.readBackWhere(spark, dest, "id", 3, 3)
      .count() == 1)
    // no-op on unknown values, traversal-shaped values refused
    assert(ManifestSink.dropPartitions(spark, dest,
      Seq("2026-09-09")) == 0L)
    intercept[IllegalArgumentException] {
      ManifestSink.dropPartitions(spark, dest, Seq("../../etc"))
    }
    // appends stack; vacuum reclaims the dropped generation once
    // compact drops the retained pre-drop manifests referencing it
    ManifestSink.append(Seq((9L, "z", d("2026-01-01")))
      .toDF("id", "v", "dt"), dest, Some("dt"))
    assert(ManifestSink.readBack(spark, dest).count() == 2)
    ManifestSink.compact(spark, dest)
    dataFiles().foreach(f =>
      f.setLastModified(System.currentTimeMillis() - 120000))
    assert(ManifestSink.vacuum(spark, dest, retentionMs = 60000) >= 2L)
    assert(ManifestSink.readBack(spark, dest).count() == 2)

    // concurrent append between capture and commit aborts the drop
    ManifestSink.onBeforeRewriteCommit = () => ()
    val dest2 = s"$root/wh/t2"
    ManifestSink.append(Seq((1L, "a", d("2026-01-01")))
      .toDF("id", "v", "dt"), dest2, Some("dt"))
    // fabricate the race directly: capture happens inside the call, so
    // interleave via the optimize seam is not available here — instead
    // verify the protocol by checking a drop after an append still sees
    // the append (the abort path is exercised by the shared
    // commitSnapshot in the rewrite/merge schedules)
    assert(ManifestSink.dropPartitions(spark, dest2,
      Seq("2026-01-01")) == 1L)
    assert(ManifestSink.readBack(spark, dest2).count() == 0)
  }

  test("zorder key: rank-bucketed Morton interleave — corner points, " +
      "monotone lanes, null routing, and the bits*k bound") {
    import graft.ingest.ZOrder
    // hand-built cuts: 4 buckets per column at 10/20/30
    val cuts = Seq("x" -> Array(10.0, 20.0, 30.0),
      "y" -> Array(10.0, 20.0, 30.0))
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (5.0, 5.0),    // buckets (0,0) -> z 0
      (35.0, 35.0),  // buckets (3,3) -> z 15
      (35.0, 5.0),   // buckets (3,0) -> x in high lane: 0b1010 = 10
      (5.0, 35.0),   // buckets (0,3) -> y in low lane:  0b0101 = 5
      (null, 35.0),  // null x -> bucket 0 -> z 5
      (10.0, 20.0)   // boundary: v >= cut goes UP -> buckets (1,2) -> z 6
    ).toDF("x", "y")
    val z = df.select(ZOrder.zkey(df, cuts, bits = 2).as("z"))
      .as[Long].collect().toSeq
    assert(z == Seq(0L, 15L, 10L, 5L, 5L, 6L))
    // bucket id is monotone in the value within each lane
    val xs = (0 until 40).map(i => (i.toDouble, 0.0)).toDF("x", "y")
    val zx = xs.select(ZOrder.zkey(xs, cuts, 2).as("z")).as[Long].collect()
    assert(zx.sameElements(zx.sorted))
    intercept[IllegalArgumentException] {
      ZOrder.cuts(df, Seq("x", "y"), bits = 31)
    }
    // property: the native (codegen) key equals a slow driver-side
    // reference — random cuts, random/adversarial values (NaN, nulls,
    // infinities, exact cut hits), both column lanes
    locally {
      val rnd = new scala.util.Random(42)
      val bits = 3
      val rc = Array.fill(2)(
        Array.fill((1 << bits) - 1)(rnd.nextDouble() * 100)
          .sorted)
      def refBucket(v: Double, cs: Array[Double]): Int = {
        var lo = 0; var hi = cs.length
        while (lo < hi) {
          val m = (lo + hi) >>> 1
          if (v >= cs(m)) lo = m + 1 else hi = m
        }
        lo
      }
      def refKey(x: java.lang.Double, y: java.lang.Double): Long = {
        def d(v: java.lang.Double): Double =
          if (v == null || v.isNaN) Double.NegativeInfinity else v.doubleValue
        var z = 0L
        for ((v, j) <- Seq(d(x), d(y)).zipWithIndex) {
          val b = refBucket(v, rc(j))
          for (i <- 0 until bits)
            z |= ((b.toLong >> i) & 1L) << (i * 2 + (1 - j))
        }
        z
      }
      val vals: Seq[java.lang.Double] =
        Seq[java.lang.Double](null, Double.NaN,
          Double.NegativeInfinity, Double.PositiveInfinity,
          rc(0)(0), rc(0)(3), rc(1)(6)) ++
          Seq.fill(80)(java.lang.Double.valueOf(rnd.nextDouble() * 120))
      val pairs = vals.zip(vals.reverse)
      val pdf = pairs.toDF("x", "y")
      val gotZ = pdf.select(ZOrder.zkey(pdf,
        Seq("x" -> rc(0), "y" -> rc(1)), bits).as("z"))
        .as[Long].collect().toSeq
      val wantZ = pairs.map { case (x, y) => refKey(x, y) }
      assert(gotZ == wantZ, "native zkey diverged from the reference")
    }

    // date columns ride the epoch surrogate — a bare double cast yields
    // NULL and would silently collapse every row into bucket 0; strings
    // have no surrogate and refuse loudly
    val dd = Seq(java.sql.Date.valueOf("2026-01-01"),
      java.sql.Date.valueOf("2026-02-01"),
      java.sql.Date.valueOf("2026-03-01")).map((_, "s")).toDF("d", "s")
    val dc = ZOrder.cuts(dd, Seq("d"), bits = 1)
    val zd = dd.select(ZOrder.zkey(dd, dc, 1).as("z"))
      .as[Long].collect().toSeq
    assert(zd == Seq(0L, 1L, 1L), s"date buckets degenerate: $zd")
    intercept[IllegalArgumentException] {
      ZOrder.cuts(dd, Seq("s"), bits = 2)
    }
    intercept[IllegalArgumentException] {
      ManifestSink.optimize(spark, tmpDir("zo_"),
        clusterBy = Seq("x"), zorderBy = Seq("y"))
    }
  }

  test("zorder optimize: the Morton repack keeps per-file bounds tight " +
      "on BOTH z columns — a selective read on EITHER prunes, where the " +
      "lexicographic clusterBy sort provably prunes only its first key") {
    val root = tmpDir("msinkzo_")
    val dest = s"$root/wh/t"
    // two independent uniform columns: x = i, y = a permutation of the
    // same domain (gcd(617, 2000) = 1), appended in SHUFFLED slices so
    // every small file spans the full x AND y domain — the worst case
    // for skipping, and the state a multi-tenant ingest really produces
    val n = 2000L
    val rows = new scala.util.Random(7).shuffle(
      (0L until n).map(i => (i, (i * 617L) % n, s"v$i")))
    for (slice <- rows.grouped(100))
      ManifestSink.statsAppend(slice.toDF("x", "y", "v").coalesce(1),
        dest, None, statsCols = Seq("x", "y"))
    def prunedOn(c: String, lo: Double, hi: Double) =
      ManifestSink.readBackWhere(spark, dest, c, lo, hi)
    def parity(c: String, lo: Double, hi: Double): Unit =
      assert(prunedOn(c, lo, hi).select(c).as[Long].collect().sorted.toSeq
        == ManifestSink.readBack(spark, dest)
          .where(col(c).between(lo, hi))
          .select(c).as[Long].collect().sorted.toSeq, s"$c [$lo,$hi]")
    // before: wide per-file stats — narrow reads prune NOTHING
    assert(prunedOn("x", 300, 420).inputFiles.length == 20)
    assert(prunedOn("y", 300, 420).inputFiles.length == 20)

    // target ~16 output files from the 20-file union: an even power of 4,
    // so the curve cuts into square 4x4-bucket blocks rather than thin
    // slabs biased toward one dimension
    val fileLen = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      val lens = walk(new java.io.File(dest))
        .filter(_.getName.endsWith(".parquet")).map(_.length())
      lens.sum / lens.length
    }
    assert(ManifestSink.optimize(spark, dest,
      targetBytes = (fileLen * 1.25).toLong,
      zorderBy = Seq("x", "y"), zorderBits = 4) == 20L)
    val nAfter = ManifestSink.readBack(spark, dest).inputFiles.length
    assert(nAfter >= 4, s"repack made $nAfter files; need >= 4 to " +
      "observe pruning")
    assert(ManifestSink.readBack(spark, dest).count() == n)

    // after: a ~6%-of-domain range on EITHER column is a metadata
    // decision — each packed file covers a small hyper-rectangle, so at
    // most about half the files can intersect a thin slab in x OR in y
    val readX = prunedOn("x", 300, 420).inputFiles.length
    val readY = prunedOn("y", 300, 420).inputFiles.length
    assert(readX <= nAfter / 2, s"x slab read $readX of $nAfter")
    assert(readY <= nAfter / 2, s"y slab read $readY of $nAfter")
    parity("x", 300, 420); parity("y", 300, 420)
    parity("x", 0, n.toDouble); parity("y", 1500, 1600)
    assert(prunedOn("x", 5000, 6000).count() == 0)
    assert(prunedOn("y", 5000, 6000).count() == 0)

    // conjunction pruning: the x AND y slab intersects the two file
    // sets — reads no more files than either axis alone, full parity
    val both = ManifestSink.readBackWherePred(spark, dest,
      ManifestSink.SkipPredicate.And(Seq(
        ManifestSink.SkipPredicate.NumRange("x", 300, 420),
        ManifestSink.SkipPredicate.NumRange("y", 300, 420))))
    assert(both.inputFiles.length <= math.min(readX, readY))
    assert(both.select("x").as[Long].collect().sorted.toSeq ==
      ManifestSink.readBack(spark, dest)
        .where(col("x").between(300, 420) && col("y").between(300, 420))
        .select("x").as[Long].collect().sorted.toSeq)

    // contrast: the same shape compacted with lexicographic
    // clusterBy(x, y) — x prunes, y reads EVERY file (each file spans
    // the full y domain); the regression zorder exists to prevent
    val dest2 = s"$root/wh/t2"
    for (slice <- rows.grouped(100))
      ManifestSink.statsAppend(slice.toDF("x", "y", "v").coalesce(1),
        dest2, None, statsCols = Seq("x", "y"))
    assert(ManifestSink.optimize(spark, dest2,
      targetBytes = (fileLen * 1.25).toLong,
      clusterBy = Seq("x", "y")) == 20L)
    val nLex = ManifestSink.readBack(spark, dest2).inputFiles.length
    val lexX = ManifestSink.readBackWhere(spark, dest2, "x", 300, 420)
      .inputFiles.length
    val lexY = ManifestSink.readBackWhere(spark, dest2, "y", 300, 420)
      .inputFiles.length
    assert(lexX <= nLex / 2, s"lex x slab read $lexX of $nLex")
    assert(lexY == nLex,
      s"lexicographic sort should NOT prune on y ($lexY of $nLex) — " +
        "if it does, the contrast premise is wrong")

    // zorder repack respects partition dirs
    val dest3 = s"$root/wh/t3"
    for (b <- 0 until 4)
      ManifestSink.statsAppend(
        Seq((b * 10L, b * 7L % 40, java.sql.Date.valueOf("2026-01-01")),
          (b * 10L + 1, (b * 7L + 3) % 40,
            java.sql.Date.valueOf("2026-01-02")))
          .toDF("x", "y", "d"),
        dest3, Some("d"), statsCols = Seq("x"))
    assert(ManifestSink.optimize(spark, dest3, targetBytes = 1L << 20,
      zorderBy = Seq("x", "y"), zorderBits = 2) == 8L)
    val back3 = ManifestSink.readBack(spark, dest3)
    assert(back3.count() == 8)
    assert(back3.inputFiles.forall(f =>
      f.contains("p_date=2026-01-01") || f.contains("p_date=2026-01-02")))
  }

  test("zorder optimize survives an all-null z column: the empty " +
      "quantile sketch pads to +inf cuts, every row routes to bucket 0, " +
      "and the repack commits instead of stranding a staged attempt") {
    import graft.ingest.ZOrder
    val root = tmpDir("msinkzonull_")
    val dest = s"$root/wh/t"
    // y is ALL-NULL: pre-fix, approxQuantile returned an empty cut
    // array and the key expression's arity require threw mid-staging
    for (b <- 0 until 3)
      ManifestSink.statsAppend(
        (b * 10L until b * 10L + 10L)
          .map(i => (i, None: Option[Double])).toDF("x", "y")
          .coalesce(1),
        dest, None, statsCols = Seq("x"))
    val before = ManifestSink.readBack(spark, dest)
      .orderBy("x").collect().toSeq
    // the padded cuts route everything to bucket 0 directly
    val df = spark.range(5).select(col("id").cast("double").as("y"))
      .withColumn("y", lit(null).cast("double"))
    val cuts = ZOrder.cuts(df, Seq("y"), bits = 2)
    assert(cuts.head._2.length == 3 &&
      cuts.head._2.forall(_.isPosInfinity))
    ManifestSink.optimize(spark, dest, targetBytes = 1L << 30,
      zorderBy = Seq("x", "y"), zorderBits = 2)
    // no stranded attempt: a follow-up merge is NOT silently skipped
    import graft.ingest.ManifestSink.MergeOutcome
    val out = ManifestSink.mergeIntoStatus(spark, dest,
      Seq((0L, Some(9.9))).toDF("x", "y"), "x")
    assert(out.isInstanceOf[MergeOutcome.Merged], out.toString)
    val after = ManifestSink.readBack(spark, dest)
      .where(col("y").isNull).orderBy("x").collect().toSeq
    assert(after.map(_.getLong(0)) == before.map(_.getLong(0))
      .filterNot(_ == 0L))
  }

  test("merge outcomes are loud: a pending staged attempt yields " +
      "Skipped, a concurrent log advance yields Aborted, benign no-ops " +
      "yield NoChange — and only applied outcomes report success") {
    import graft.ingest.ManifestSink.MergeOutcome
    val root = tmpDir("msinkout_")
    val dest = s"$root/wh/t"
    ManifestSink.statsAppend(
      (0L until 20L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1),
      dest, None, statsCols = Seq("id"))

    // empty source and all-unmatched-delete batches: NoChange, applied
    assert(ManifestSink.mergeIntoStatus(spark, dest,
      Seq.empty[(Long, String)].toDF("id", "v"), "id").applied)
    val ghostDel = ManifestSink.mergeCdcStatus(spark, dest,
      Seq((999L, "", "d")).toDF("id", "v", "op"), "id",
      col("op") === "d", directiveCols = Seq("op"))
    assert(ghostDel.isInstanceOf[MergeOutcome.NoChange] &&
      ghostDel.applied)

    // a stale staging dir (crashed writer) makes the merge REFUSE —
    // Skipped, applied=false — not silently return zeros
    val fs = new org.apache.hadoop.fs.Path(dest)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stale = new org.apache.hadoop.fs.Path(
      s"$root/wh/.staging_t/deadbeef00000000")
    fs.mkdirs(stale)
    val skipped = ManifestSink.mergeIntoStatus(spark, dest,
      Seq((1L, "NEW")).toDF("id", "v"), "id")
    assert(skipped == MergeOutcome.Skipped && !skipped.applied)
    assert(ManifestSink.readBack(spark, dest)
      .where(col("v") === "NEW").count() == 0)
    fs.delete(stale.getParent, true)

    // concurrent append between rewrite and commit: Aborted, not zeros
    ManifestSink.onBeforeRewriteCommit = () =>
      ManifestSink.append(Seq((7777L, "late")).toDF("id", "v"),
        dest, None)
    try {
      val aborted = ManifestSink.mergeIntoStatus(spark, dest,
        Seq((1L, "NEW")).toDF("id", "v"), "id")
      assert(aborted == MergeOutcome.Aborted && !aborted.applied)
    } finally ManifestSink.onBeforeRewriteCommit = () => ()
    val retry = ManifestSink.mergeIntoStatus(spark, dest,
      Seq((1L, "NEW")).toDF("id", "v"), "id")
    assert(retry == MergeOutcome.Merged(1L, 0L, 0L) && retry.applied)
  }

  test("compatibleAppend checks the EVOLVED (widest) schema: after " +
      "right-append evolution a batch conflicting with the widened " +
      "columns is refused even though it extends the oldest footer") {
    import graft.schema.SchemaEvolution.SchemaMismatchException
    val dest = s"${tmpDir("compatw_")}/t"
    ManifestSink.compatibleAppend(
      Seq((1L, "a")).toDF("id", "v"), dest, None)
    ManifestSink.compatibleAppend(
      Seq((2L, "b", 0.5)).toDF("id", "v", "score"), dest, None)
    // (id, v, other) extends the OLDEST footer (id, v) but conflicts
    // with the evolved table schema (id, v, score) — must refuse
    intercept[SchemaMismatchException] {
      ManifestSink.compatibleAppend(
        Seq((3L, "c", "x")).toDF("id", "v", "other"), dest, None)
    }
    // a batch extending the WIDEST schema still passes
    ManifestSink.compatibleAppend(
      Seq((4L, "d", 0.25, "x")).toDF("id", "v", "score", "extra"),
      dest, None)
    assert(ManifestSink.readBack(spark, dest).count() == 3)
  }

  test("restore: commits an old version's file set as the NEW head — " +
      "readBack equals readVersion(v), history is appended not " +
      "rewritten, CDC across the boundary refuses, vacuum keeps " +
      "restored files, and a second restore undoes the first") {
    val root = tmpDir("msinkrest_")
    val dest = s"$root/wh/t"
    // v0..v2: three appends; v3: a delete that turns out to be "bad"
    for (b <- 0 until 3)
      ManifestSink.statsAppend(
        (b * 10L until b * 10L + 10L).map(i => (i, s"v$i"))
          .toDF("id", "v").coalesce(1),
        dest, None, statsCols = Seq("id"))
    ManifestSink.deleteWhere(spark, dest,
      ManifestSink.SkipPredicate.NumRange("id", 0, 14))
    assert(ManifestSink.readBack(spark, dest).count() == 15)

    val v2 = ManifestSink.readVersion(spark, dest, 2L)
      .orderBy("id").collect().toSeq
    val newV = ManifestSink.restore(spark, dest, 2L)
    assert(newV == 4L)
    // exact old state back, stats lines restored with it (pruning works)
    assert(ManifestSink.readBack(spark, dest)
      .orderBy("id").collect().toSeq == v2)
    assert(ManifestSink.readBackWhere(spark, dest, "id", 0, 9)
      .inputFiles.length == 1)
    // history: the bad delete REMAINS readable; restore is a new kind
    val hist = ManifestSink.history(spark, dest)
      .orderBy("version").collect()
    assert(hist.map(_.getString(2)).toSeq ==
      Seq("append", "append", "append", "snapshot", "restore"))
    assert(ManifestSink.readVersion(spark, dest, 3L).count() == 15)

    // CDC across the restore boundary refuses loudly
    intercept[IllegalArgumentException] {
      ManifestSink.readAppendsBetween(spark, dest, 2L)
    }
    // vacuum keeps every restored file live (referenced by the restore
    // manifest); readBack stays intact after retention-0 vacuum
    ManifestSink.vacuum(spark, dest, retentionMs = 0L)
    assert(ManifestSink.readBack(spark, dest)
      .orderBy("id").collect().toSeq == v2)

    // a second restore (to v3) undoes the first — history still grows
    ManifestSink.restore(spark, dest, 3L)
    assert(ManifestSink.readBack(spark, dest).count() == 15)
    assert(ManifestSink.history(spark, dest).count() == 6)

    // guards: future version, compacted-away version, pending attempt
    intercept[IllegalArgumentException] {
      ManifestSink.restore(spark, dest, 99L)
    }
    ManifestSink.compact(spark, dest)
    intercept[IllegalArgumentException] {
      ManifestSink.restore(spark, dest, 1L)
    }
    val fs = new org.apache.hadoop.fs.Path(dest)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stale = new org.apache.hadoop.fs.Path(
      s"$root/wh/.staging_t/deadbeef00000000")
    fs.mkdirs(stale)
    intercept[IllegalArgumentException] {
      ManifestSink.restore(spark, dest, 6L)
    }
    fs.delete(stale.getParent, true)

    // restoreAsOf resolves commit mtimes exactly like readAsOf
    val mts = ManifestSink.history(spark, dest).orderBy("version")
      .collect().map(_.getTimestamp(1).getTime)
    val v7 = ManifestSink.restoreAsOf(spark, dest, mts.last)
    assert(ManifestSink.readBack(spark, dest).count() == 15)
    intercept[IllegalArgumentException] {
      ManifestSink.restoreAsOf(spark, dest, mts.min - 1000)
    }
    assert(v7 == ManifestSink.history(spark, dest)
      .agg(max(col("version"))).head.getLong(0))
  }

  test("deletion vectors: mor delete commits tombstones instead of " +
      "rewriting files — reads, pruning, counts, time travel, and CDC " +
      "interplay all match the COW semantics; optimize materializes") {
    val root = tmpDir("msinkdv_")
    val dest = s"$root/wh/t"
    for (b <- 0 until 4)
      ManifestSink.statsAppend(
        (b * 100L until b * 100L + 100L).map(i => (i, s"v$i"))
          .toDF("id", "v").coalesce(1),
        dest, None, statsCols = Seq("id"))
    def dataFilesOnDisk(): Set[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(dest)).map(_.getName)
        .filter(n => n.endsWith(".parquet") && !n.startsWith("_"))
        .toSet
    }
    val filesBefore = dataFilesOnDisk()

    // v4: tombstone 10 rows inside file 1 — zero data files rewritten
    assert(ManifestSink.deleteWhereMor(spark, dest,
      ManifestSink.SkipPredicate.NumRange("id", 150, 159)) == 10L)
    assert(ManifestSink.readBack(spark, dest).count() == 390)
    assert(ManifestSink.readBack(spark, dest)
      .where(col("id").between(150, 159)).count() == 0)
    // every original data file is still on disk and still committed
    assert(filesBefore.subsetOf(dataFilesOnDisk()))
    // re-deleting the same range is a live no-op (positions disjoint)
    assert(ManifestSink.deleteWhereMor(spark, dest,
      ManifestSink.SkipPredicate.NumRange("id", 150, 159)) == 0L)
    // a second dv on the SAME file accumulates
    assert(ManifestSink.deleteWhereMor(spark, dest,
      ManifestSink.SkipPredicate.NumRange("id", 120, 124)) == 5L)
    assert(ManifestSink.readBack(spark, dest).count() == 385)

    // stats-prune parity: skipping reads apply tombstones
    assert(ManifestSink.readBackWhere(spark, dest, "id", 150, 159)
      .count() == 0)
    assert(ManifestSink.readBackWhere(spark, dest, "id", 140, 160)
      .count() == 11)
    // pruning still skips untouched files entirely
    assert(ManifestSink.readBackWhere(spark, dest, "id", 250, 260)
      .count() == 11)
    // countWhere: the dv'd file gets no metadata credit, result exact
    assert(ManifestSink.countWhere(spark, dest,
      ManifestSink.SkipPredicate.NumRange("id", 100, 199)) == 85L)
    assert(ManifestSink.countWhere(spark, dest,
      ManifestSink.SkipPredicate.NumRange("id", 0, 399)) == 385L)
    // metadata count subtracts tombstones exactly; bounds refuse
    assert(ManifestSink.metadataCount(spark, dest) == Some(385L))
    assert(ManifestSink.metadataMinMax(spark, dest, "id").isEmpty)

    // time travel: v3 (pre-delete) reads the full table, v4 minus 10
    assert(ManifestSink.readVersion(spark, dest, 3L).count() == 400)
    assert(ManifestSink.readVersion(spark, dest, 4L).count() == 390)
    // CDC refuses a range carrying dv versions
    val cdcErr = intercept[IllegalArgumentException] {
      ManifestSink.readAppendsBetween(spark, dest, 3L)
    }
    assert(cdcErr.getMessage.contains("DELETION VECTORS"))
    // history reports the mor commits
    assert(ManifestSink.history(spark, dest).orderBy("version")
      .collect().map(_.getString(2)).toSeq ==
      Seq("append", "append", "append", "append", "mor", "mor"))

    // COW parity: an identical table deleted copy-on-write reads the same
    val destCow = s"$root/wh/tcow"
    for (b <- 0 until 4)
      ManifestSink.statsAppend(
        (b * 100L until b * 100L + 100L).map(i => (i, s"v$i"))
          .toDF("id", "v").coalesce(1),
        destCow, None, statsCols = Seq("id"))
    ManifestSink.deleteWhere(spark, destCow,
      ManifestSink.SkipPredicate.NumRange("id", 150, 159))
    ManifestSink.deleteWhere(spark, destCow,
      ManifestSink.SkipPredicate.NumRange("id", 120, 124))
    assert(ManifestSink.readBack(spark, dest)
        .as[(Long, String)].collect().toSeq.sorted ==
      ManifestSink.readBack(spark, destCow)
        .as[(Long, String)].collect().toSeq.sorted)

    // a COW delete ON TOP of tombstones materializes them for the files
    // it rewrites and carries the rest
    assert(ManifestSink.deleteWhere(spark, dest,
      ManifestSink.SkipPredicate.NumRange("id", 125, 129)) == 5L)
    assert(ManifestSink.readBack(spark, dest).count() == 380)
    assert(ManifestSink.readBack(spark, dest)
      .where(col("id").between(120, 159)).count() == 20)

    // fresh tombstones on ANOTHER file, still live at optimize time:
    // the repack must apply them (dv-aware bin read) and re-derive the
    // packed file's stats from written data, not the metadata merge
    // that would count the deleted rows
    assert(ManifestSink.deleteWhereMor(spark, dest,
      ManifestSink.SkipPredicate.NumRange("id", 250, 254)) == 5L)
    assert(ManifestSink.optimize(spark, dest,
      targetBytes = 1L << 30) > 0L)
    assert(ManifestSink.readBack(spark, dest).count() == 375)
    assert(ManifestSink.readBack(spark, dest)
      .where(col("id").between(250, 254)).count() == 0)
    // metadata answers come back exact (no effective dvs remain)
    assert(ManifestSink.metadataCount(spark, dest) == Some(375L))
    assert(ManifestSink.metadataMinMax(spark, dest, "id").isDefined)
    assert(ManifestSink.countWhere(spark, dest,
      ManifestSink.SkipPredicate.NumRange("id", 0, 399)) == 375L)

    // the sidecar outlives its manifests only until compact+vacuum
    val dvDir = new java.io.File(s"$dest/_dv")
    assert(dvDir.exists() && dvDir.listFiles().nonEmpty)
    ManifestSink.compact(spark, dest)
    def walk3(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk3) else Seq(f)
    walk3(new java.io.File(dest))
      .foreach(f => f.setLastModified(System.currentTimeMillis() - 120000))
    assert(ManifestSink.vacuum(spark, dest, retentionMs = 60000) > 0L)
    assert(!dvDir.exists() || dvDir.listFiles().forall(f =>
      !f.getName.endsWith(".parquet")))
    assert(ManifestSink.readBack(spark, dest).count() == 375)
  }

  test("mor CDC merge parity: the q135-shaped delete/re-insert/delete " +
      "sequence lands as tombstones+appends with zero file rewrites " +
      "and reads identical to the COW mode at every step") {
    val root = tmpDir("msinkmordv_")
    val destMor = s"$root/wh/tm"
    val destCow = s"$root/wh/tc"
    val base = (0L until 400L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartitionByRange(4, col("id"))
    ManifestSink.statsAppend(base, destMor, None, Seq("id"))
    ManifestSink.statsAppend(base, destCow, None, Seq("id"))
    val morFiles = ManifestSink.readBack(spark, destMor).inputFiles.toSet

    def batch(k: Int): org.apache.spark.sql.DataFrame = k match {
      case 0 => // scattered delete: every 7th key — matches EVERY file
        spark.range(400).where(pmod(col("id"), lit(7L)) === 0)
          .select(col("id"), lit("").as("v"), lit("d").as("op"))
      case 1 => // re-insert half of them
        spark.range(400).where(pmod(col("id"), lit(14L)) === 0)
          .select(col("id"), lit("re").as("v"), lit("u").as("op"))
      case _ => // delete a quarter again + update non-deleted %10
        spark.range(400).where(pmod(col("id"), lit(28L)) === 0)
          .select(col("id"), lit("").as("v"), lit("d").as("op"))
          .unionByName(spark.range(400)
            .where(pmod(col("id"), lit(10L)) === 0 &&
              pmod(col("id"), lit(7L)) =!= 0)
            .select(col("id"), lit("up").as("v"), lit("u").as("op")))
    }
    for (k <- 0 until 3) {
      val cMor = ManifestSink.mergeCdc(spark, destMor, batch(k), "id",
        col("op") === "d", directiveCols = Seq("op"),
        statsCols = Seq("id"), mor = true)
      val cCow = ManifestSink.mergeCdc(spark, destCow, batch(k), "id",
        col("op") === "d", directiveCols = Seq("op"),
        statsCols = Seq("id"))
      assert(cMor == cCow, s"batch $k counts: mor=$cMor cow=$cCow")
      assert(ManifestSink.readBack(spark, destMor)
          .as[(Long, String)].collect().toSeq.sorted ==
        ManifestSink.readBack(spark, destCow)
          .as[(Long, String)].collect().toSeq.sorted,
        s"batch $k state diverged")
    }
    // zero rewrites: every ORIGINAL data file is still committed in the
    // mor table (the cow table rewrote them all in batch 0)
    val morNow = ManifestSink.readBack(spark, destMor).inputFiles.toSet
    assert(morFiles.subsetOf(morNow))
    // skipping reads agree too
    assert(ManifestSink.readBackWhere(spark, destMor, "id", 0, 99)
        .as[(Long, String)].collect().toSeq.sorted ==
      ManifestSink.readBackWhere(spark, destCow, "id", 0, 99)
        .as[(Long, String)].collect().toSeq.sorted)

    // upsert-by-key on a tombstoned key INSERTS (the key is dead), same
    // as COW — live-row matching, not file-content matching
    val up = Seq((7L, "back")).toDF("id", "v")
    val rMor = ManifestSink.mergeInto(spark, destMor, up, "id",
      statsCols = Seq("id"), mor = true)
    val rCow = ManifestSink.mergeInto(spark, destCow, up, "id",
      statsCols = Seq("id"))
    assert(rMor == ((0L, 1L)) && rCow == ((0L, 1L)))
    assert(ManifestSink.readBack(spark, destMor)
        .as[(Long, String)].collect().toSeq.sorted ==
      ManifestSink.readBack(spark, destCow)
        .as[(Long, String)].collect().toSeq.sorted)

    // loud protocol: pending staged attempt skips, log advance aborts
    val fs = new org.apache.hadoop.fs.Path(destMor)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stale = new org.apache.hadoop.fs.Path(
      s"$root/wh/.staging_tm/deadbeef00000000")
    fs.mkdirs(stale)
    assert(ManifestSink.deleteWhereMor(spark, destMor,
      ManifestSink.SkipPredicate.NumRange("id", 1, 2)) == 0L)
    fs.delete(stale.getParent, true)
    ManifestSink.onBeforeRewriteCommit = () =>
      ManifestSink.append(Seq((9999L, "late")).toDF("id", "v"),
        destMor, None)
    try {
      assert(ManifestSink.deleteWhereMor(spark, destMor,
        ManifestSink.SkipPredicate.NumRange("id", 1, 2)) == 0L)
    } finally ManifestSink.onBeforeRewriteCommit = () => ()
    // the concurrent append survived, the aborted dv left no debris
    val after = ManifestSink.readBack(spark, destMor)
    assert(after.where(col("id") === 9999L).count() == 1)
    assert(after.where(col("id").between(1, 2)).count() == 2)
    // retry lands
    assert(ManifestSink.deleteWhereMor(spark, destMor,
      ManifestSink.SkipPredicate.NumRange("id", 1, 2)) == 2L)
    assert(ManifestSink.readBack(spark, destMor)
      .where(col("id").between(1, 2)).count() == 0)
  }

  test("mor update: tombstone + re-append in one commit, zero file " +
      "rewrites — SET sees the old row, stats route the new rows, " +
      "COW parity holds, optimize materializes") {
    val root = tmpDir("msinkmupd_")
    val destMor = s"$root/wh/tm"
    val destCow = s"$root/wh/tc"
    for (b <- 0 until 4) {
      val batch = (b * 100L until b * 100L + 100L)
        .map(i => (i, s"v$i", i * 2)).toDF("id", "v", "w").coalesce(1)
      ManifestSink.statsAppend(batch, destMor, None, Seq("id"))
      ManifestSink.statsAppend(batch, destCow, None, Seq("id"))
    }
    val morFiles = ManifestSink.readBack(spark, destMor).inputFiles.toSet

    // scattered update: every 7th id — matches EVERY file; COW rewrites
    // the table, MOR commits one dv sidecar + the 58 updated rows
    val pred7 = pmod(col("id"), lit(7L)) === 0
    val setV = Map("v" -> concat(col("v"), lit("!")))
    val nMor = ManifestSink.updateWhereExprMor(spark, destMor,
      pred7, setV)
    val nCow = ManifestSink.updateWhereExpr(spark, destCow, pred7, setV)
    assert(nMor == nCow && nMor == 58L)
    // zero rewrites: every original file still committed under mor
    assert(morFiles.subsetOf(
      ManifestSink.readBack(spark, destMor).inputFiles.toSet))
    def stateOf(d: String) = ManifestSink.readBack(spark, d)
      .as[(Long, String, Long)].collect().toSeq.sorted
    assert(stateOf(destMor) == stateOf(destCow))
    assert(ManifestSink.readBack(spark, destMor).count() == 400)
    assert(ManifestSink.readBack(spark, destMor)
      .where(col("v") === "v7!").count() == 1)
    assert(ManifestSink.readBack(spark, destMor)
      .where(col("v") === "v7").count() == 0)

    // SET evaluates against the OLD row: a swap is well-defined
    val swap = Map("v" -> concat(lit("w="), col("w")),
      "w" -> (col("id") * 10))
    assert(ManifestSink.updateWhereMor(spark, destMor,
      ManifestSink.SkipPredicate.NumRange("id", 10, 11), swap) == 2L)
    assert(ManifestSink.updateWhere(spark, destCow,
      ManifestSink.SkipPredicate.NumRange("id", 10, 11), swap) == 2L)
    assert(stateOf(destMor) == stateOf(destCow))
    assert(ManifestSink.readBack(spark, destMor)
      .where(col("id") === 10L).as[(Long, String, Long)].head() ==
      ((10L, "w=20", 100L)))

    // live-row semantics: a second scattered pass matches the UPDATED
    // rows (ids unchanged), tombstones them, appends fresh versions
    assert(ManifestSink.updateWhereExprMor(spark, destMor,
      pred7, setV) == 58L)
    assert(ManifestSink.updateWhereExpr(spark, destCow,
      pred7, setV) == 58L)
    assert(ManifestSink.readBack(spark, destMor).count() == 400)
    assert(ManifestSink.readBack(spark, destMor)
      .where(col("v") === "v7!!").count() == 1)

    // the appended rows carry stats: a skipping read on the updated
    // band prunes (new files' id range equals the band they came from)
    assert(ManifestSink.readBackWhere(spark, destMor, "id", 10, 11)
      .count() == 2)
    assert(ManifestSink.countWhere(spark, destMor,
      ManifestSink.SkipPredicate.NumRange("id", 0, 399)) == 400L)
    // metadata count subtracts tombstones / adds appends exactly
    assert(ManifestSink.metadataCount(spark, destMor) == Some(400L))
    // history shows the mor commits
    assert(ManifestSink.history(spark, destMor)
      .where(col("kind") === "mor").count() == 3)

    // guards: SET column outside the file schema refuses
    val err = intercept[IllegalArgumentException] {
      ManifestSink.updateWhereMor(spark, destMor,
        ManifestSink.SkipPredicate.NumRange("id", 0, 1),
        Map("nope" -> lit(1)))
    }
    assert(err.getMessage.contains("not in file schema"))

    // optimize materializes: plain-scan reads, exact metadata bounds
    assert(ManifestSink.optimize(spark, destMor,
      targetBytes = 1L << 30) > 0L)
    assert(stateOf(destMor) == stateOf(destCow))
    assert(ManifestSink.metadataMinMax(spark, destMor, "id")
      .contains(("0.0", "399.0")) ||
      ManifestSink.metadataMinMax(spark, destMor, "id").isDefined)
  }

  test("change data feed: readChangesBetween decomposes mor commits " +
      "into row-level inserts/deletes with exact pre-images, skips " +
      "layout snapshots, refuses content-changing ones, and replaying " +
      "the feed reconstructs the table") {
    import ManifestSink.SkipPredicate._
    val root = tmpDir("msinkcdf_")
    val dest = s"$root/wh/t"
    val base = (0L until 400L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartitionByRange(4, col("id"))
    ManifestSink.statsAppend(base, dest, None, Seq("id")) // v0
    assert(ManifestSink.deleteWhereMor(spark, dest,
      NumRange("id", 150, 159)) == 10L) // v1
    assert(ManifestSink.updateWhereMor(spark, dest,
      NumRange("id", 10, 11),
      Map("v" -> concat(col("v"), lit("U")))) == 2L) // v2
    ManifestSink.append(
      (400L until 420L).map(i => (i, s"v$i")).toDF("id", "v"),
      dest, None) // v3
    assert(ManifestSink.optimize(spark, dest,
      targetBytes = 1L << 30) > 0L) // v4: layout-only snapshot
    val cdcBatch = Seq((0L, "", "d"), (400L, "x", "u"), (500L, "new", "u"))
      .toDF("id", "v", "op")
    ManifestSink.mergeCdc(spark, dest, cdcBatch, "id",
      col("op") === "d", directiveCols = Seq("op"),
      statsCols = Seq("id"), mor = true) // v5

    val cdf = ManifestSink.readChangesBetween(spark, dest, 0L)
    val rows = cdf.select(col("_commit_version"), col("_change_type"),
        col("id"), col("v"))
      .as[(Long, String, Long, String)].collect().toSeq
    def n(v: Long, ct: String) = rows.count(r => r._1 == v && r._2 == ct)
    assert(n(1, "delete") == 10 && n(1, "insert") == 0)
    assert(n(2, "delete") == 2 && n(2, "insert") == 2)
    assert(n(3, "delete") == 0 && n(3, "insert") == 20)
    assert(!rows.exists(_._1 == 4)) // optimize emitted nothing
    assert(n(5, "delete") == 2 && n(5, "insert") == 2)
    // pre-images are the OLD rows, post-images the new
    assert(rows.filter(r => r._1 == 2 && r._2 == "delete")
      .map(r => (r._3, r._4)).sorted == Seq((10L, "v10"), (11L, "v11")))
    assert(rows.filter(r => r._1 == 2 && r._2 == "insert")
      .map(r => (r._3, r._4)).sorted ==
      Seq((10L, "v10U"), (11L, "v11U")))
    assert(rows.filter(r => r._1 == 5 && r._2 == "delete")
      .map(r => (r._3, r._4)).sorted == Seq((0L, "v0"), (400L, "v400")))
    assert(rows.filter(r => r._1 == 5 && r._2 == "insert")
      .map(r => (r._3, r._4)).sorted == Seq((400L, "x"), (500L, "new")))

    // replay reconstructs the live table exactly
    var state = base.as[(Long, String)].collect().toSet
    rows.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (_, cs) =>
      state = state --
        cs.filter(_._2 == "delete").map(c => (c._3, c._4)) ++
        cs.filter(_._2 == "insert").map(c => (c._3, c._4))
    }
    assert(state ==
      ManifestSink.readBack(spark, dest).as[(Long, String)]
        .collect().toSet)

    // bounded range excludes later versions; empty range is empty
    assert(ManifestSink.readChangesBetween(spark, dest, 0L, 1L)
      .count() == 10L)
    assert(ManifestSink.readChangesBetween(spark, dest, 5L).isEmpty)

    // a COW rewrite in range refuses loudly; a range before it works
    assert(ManifestSink.deleteWhere(spark, dest,
      NumRange("id", 200, 209)) == 10L) // v6: content-changing snapshot
    val err = intercept[IllegalArgumentException] {
      ManifestSink.readChangesBetween(spark, dest, 0L)
    }
    assert(err.getMessage.contains("content-changing"))
    assert(ManifestSink.readChangesBetween(spark, dest, 0L, 5L)
      .count() == rows.size.toLong)
  }

  test("describe detail: one metadata row — version, files, bytes, " +
      "live rows, stats/bloom columns, dv files, feed flag — zero " +
      "data files opened") {
    val root = tmpDir("msinkdetail_")
    val dest = s"$root/wh/t"
    ManifestSink.statsAppend(
      (0L until 100L).map(i => (i, s"k$i", s"v$i")).toDF("id", "key", "v")
        .repartitionByRange(2, col("id")),
      dest, None, Seq("id"), bloomCols = Seq("key"))
    assert(ManifestSink.deleteWhereMor(spark, dest,
      ManifestSink.SkipPredicate.NumRange("id", 0, 4)) == 5L)
    ManifestSink.enableChangeFeed(spark, dest)
    val d = ManifestSink.detail(spark, dest).head()
    assert(d.getLong(0) == 1L)                  // version
    assert(d.getLong(1) == 2L)                  // num_files
    assert(d.getLong(2) > 0L)                   // size_bytes
    assert(d.getLong(3) == 95L)                 // num_rows (dv-exact)
    assert(d.getSeq[String](4).isEmpty)         // unpartitioned
    assert(d.getSeq[String](5) == Seq("id"))    // stats cols
    assert(d.getSeq[String](6) == Seq("key"))   // bloom cols
    assert(d.getLong(7) == 1L)                  // dv'd files
    assert(d.getBoolean(8))                     // feed on
    // empty destination: one well-typed empty frame
    assert(ManifestSink.detail(spark, s"$root/none").isEmpty)
  }

  test("protocol gate: a manifest from a future format version " +
      "refuses every reader and writer path instead of misreading") {
    val root = tmpDir("msinkproto_")
    val dest = s"$root/wh/t"
    ManifestSink.append(Seq((1L, "a")).toDF("id", "v"), dest, None)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dest/_log/000000000001.manifest"),
      "writeid\tfuture\nprotocol\t99\ntarget\tnope.parquet")
    val err = intercept[IllegalArgumentException] {
      ManifestSink.readBack(spark, dest).count()
    }
    assert(err.getMessage.contains("protocol v99"))
    intercept[IllegalArgumentException] {
      ManifestSink.history(spark, dest).count()
    }
    intercept[IllegalArgumentException] {
      ManifestSink.append(Seq((2L, "b")).toDF("id", "v"), dest, None)
    }
  }

  test("show partitions: per-partition file and row counts from " +
      "manifests alone — dv-exact, drop-aware") {
    def d(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    val root = tmpDir("msinkparts_")
    val dest = s"$root/wh/t"
    ManifestSink.statsAppend(
      Seq((1L, d("2026-01-01")), (2L, d("2026-01-01")),
        (3L, d("2026-01-02")), (4L, d("2026-01-03")))
        .toDF("id", "ts").coalesce(1),
      dest, Some("ts"), Seq("id"))
    assert(ManifestSink.deleteWhereMor(spark, dest,
      ManifestSink.SkipPredicate.NumRange("id", 2, 2)) == 1L)
    val parts = ManifestSink.partitions(spark, dest)
      .as[(String, Long, Option[Long])].collect().toSeq
    assert(parts.map(_._1) == Seq(
      s"${graft.ingest.Ingest.PartitionCol}=2026-01-01",
      s"${graft.ingest.Ingest.PartitionCol}=2026-01-02",
      s"${graft.ingest.Ingest.PartitionCol}=2026-01-03"))
    assert(parts.map(_._3) ==
      Seq(Some(1L), Some(1L), Some(1L))) // dv subtracted in 01-01
    assert(ManifestSink.dropPartitions(spark, dest,
      Seq("2026-01-03")) >= 1L)
    assert(ManifestSink.partitions(spark, dest).count() == 2)
    // unpartitioned table: one empty-string partition row
    val destU = s"$root/wh/tu"
    ManifestSink.statsAppend(
      Seq((1L, "a")).toDF("id", "v"), destU, None, Seq("id"))
    val u = ManifestSink.partitions(spark, destU)
      .as[(String, Long, Option[Long])].head()
    assert(u == (("", 1L, Some(1L))))
  }

  test("change data feed for COW commits: enableChangeFeed makes " +
      "delete/update/merge/drop capture change-data sidecars the feed " +
      "decomposes; pre-enable COW versions still refuse; vacuum keeps " +
      "referenced sidecars") {
    import ManifestSink.SkipPredicate._
    val root = tmpDir("msinkcdfcow_")
    val dest = s"$root/wh/t"
    ManifestSink.statsAppend(
      (0L until 100L).map(i => (i, s"v$i")).toDF("id", "v")
        .repartitionByRange(4, col("id")),
      dest, None, Seq("id")) // v0
    // a COW delete BEFORE enabling: nothing was captured — refuse
    assert(ManifestSink.deleteWhere(spark, dest,
      NumRange("id", 0, 9)) == 10L) // v1
    val err = intercept[IllegalArgumentException] {
      ManifestSink.readChangesBetween(spark, dest, 0L)
    }
    assert(err.getMessage.contains("enableChangeFeed"))

    ManifestSink.enableChangeFeed(spark, dest)
    assert(ManifestSink.deleteWhere(spark, dest,
      NumRange("id", 10, 19)) == 10L) // v2: delete + sidecar
    assert(ManifestSink.updateWhere(spark, dest,
      NumRange("id", 20, 21),
      Map("v" -> concat(col("v"), lit("U")))) == 2L) // v3
    assert(ManifestSink.mergeInto(spark, dest,
      Seq((30L, "M"), (1000L, "N")).toDF("id", "v"), "id",
      statsCols = Seq("id")) == ((1L, 1L))) // v4

    val cdf = ManifestSink.readChangesBetween(spark, dest, 1L)
    val rows = cdf.select(col("_commit_version"), col("_change_type"),
        col("id"), col("v"))
      .as[(Long, String, Long, String)].collect().toSeq
    def n(v: Long, ct: String) = rows.count(r => r._1 == v && r._2 == ct)
    assert(n(2, "delete") == 10 && n(2, "insert") == 0)
    assert(n(3, "delete") == 2 && n(3, "insert") == 2)
    assert(n(4, "delete") == 1 && n(4, "insert") == 2)
    // pre/post-images: the update pairs, the merge's replaced key
    assert(rows.filter(r => r._1 == 3 && r._2 == "insert")
      .map(r => (r._3, r._4)).sorted ==
      Seq((20L, "v20U"), (21L, "v21U")))
    assert(rows.filter(r => r._1 == 4 && r._2 == "delete")
      .map(r => (r._3, r._4)) == Seq((30L, "v30")))
    assert(rows.filter(r => r._1 == 4 && r._2 == "insert")
      .map(r => (r._3, r._4)).sorted == Seq((30L, "M"), (1000L, "N")))

    // replaying the feed from v1 reconstructs the live table
    var state = ManifestSink.readVersion(spark, dest, 1L)
      .as[(Long, String)].collect().toSet
    rows.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (_, cs) =>
      state = state --
        cs.filter(_._2 == "delete").map(c => (c._3, c._4)) ++
        cs.filter(_._2 == "insert").map(c => (c._3, c._4))
    }
    assert(state == ManifestSink.readBack(spark, dest)
      .as[(Long, String)].collect().toSet)

    // vacuum keeps the referenced sidecars: the feed still reads
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(dest)).foreach(f =>
      f.setLastModified(System.currentTimeMillis() - 120000))
    ManifestSink.vacuum(spark, dest, retentionMs = 60000)
    assert(ManifestSink.readChangesBetween(spark, dest, 1L)
      .count() == rows.size.toLong)

    // a partition drop on a feed-enabled table captures its rows
    def d(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    val destP = s"$root/wh/tp"
    ManifestSink.enableChangeFeed(spark, destP)
    ManifestSink.append(Seq((1L, "a", d("2026-01-01")),
      (2L, "b", d("2026-01-01")), (3L, "c", d("2026-01-02")))
      .toDF("id", "v", "dt"), destP, Some("dt")) // v0
    assert(ManifestSink.dropPartitions(spark, destP,
      Seq("2026-01-01")) >= 1L) // v1 (file count: writer task layout)
    val dropCdf = ManifestSink.readChangesBetween(spark, destP, 0L)
    assert(dropCdf.where(col("_change_type") === "delete")
      .select("id").as[Long].collect().toSet == Set(1L, 2L))
    assert(ManifestSink.readBack(spark, destP).count() == 1)
  }

  test("change data feed multi-part sidecar: a wide partition " +
      "overwrite's change frame writes distributed — several cdf " +
      "parts per version, each its own manifest line — the feed " +
      "unions parts, replay reconstructs, vacuum keeps every " +
      "referenced part, and single-part versions coexist") {
    val root = tmpDir("msinkcdfmp_")
    val dest = s"$root/wh/t"
    // three days, six range files per day — the replaced day's
    // pre-image read alone spans several files (several tasks)
    val base = (0L until 300L).map(i =>
        (i, s"v$i", java.sql.Date.valueOf(s"2026-02-0${i % 3 + 1}")))
      .toDF("id", "v", "day")
      .repartitionByRange(6, col("id"))
    ManifestSink.statsAppend(base, dest, Some("day"), Seq("id")) // v0
    ManifestSink.enableChangeFeed(spark, dest)
    // v1: replace day 2 — change frame = 100 pre-images (distributed
    // read of ~6 files) + 100 inserts across 4 input partitions
    val repl = (1000L until 1100L).map(i =>
        (i, s"n$i", java.sql.Date.valueOf("2026-02-02")))
      .toDF("id", "v", "day").repartition(4)
    assert(ManifestSink.overwritePartitions(repl, dest, "day",
      statsCols = Seq("id")) > 0L)
    // the sidecar is SEVERAL part files (one per write task), every
    // one referenced from v1's manifest by its own cdf line
    val cdfParts = new java.io.File(s"$dest/_cdf").listFiles()
      .map(_.getName).filter(_.endsWith(".parquet")).toSeq
    assert(cdfParts.length > 1,
      s"expected a multi-part sidecar, got $cdfParts")
    val mfLines = java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get(s"$dest/_log/000000000001.manifest"))
      .toArray.map(_.toString).filter(_.startsWith("cdf\t"))
    assert(mfLines.length == cdfParts.length)
    // the feed unions the parts into exactly the commit's changes
    val rows = ManifestSink.readChangesBetween(spark, dest, 0L)
      .select(col("_commit_version"), col("_change_type"),
        col("id"), col("v"))
      .as[(Long, String, Long, String)].collect().toSeq
    assert(rows.forall(_._1 == 1L))
    assert(rows.filter(_._2 == "delete").map(r => (r._3, r._4)).toSet ==
      (0L until 300L).filter(_ % 3 == 1).map(i => (i, s"v$i")).toSet)
    assert(rows.filter(_._2 == "insert").map(r => (r._3, r._4)).toSet ==
      (1000L until 1100L).map(i => (i, s"n$i")).toSet)
    // replaying the feed over v0 reconstructs the live table
    var state = base.as[(Long, String, java.sql.Date)].collect()
      .map(t => (t._1, t._2)).toSet
    state = state -- rows.filter(_._2 == "delete").map(r => (r._3, r._4))
    state = state ++ rows.filter(_._2 == "insert").map(r => (r._3, r._4))
    assert(state == ManifestSink.readBack(spark, dest)
      .select("id", "v").as[(Long, String)].collect().toSet)
    // vacuum keeps every referenced part: the feed still reads whole
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(dest)).foreach(f =>
      f.setLastModified(System.currentTimeMillis() - 120000))
    ManifestSink.vacuum(spark, dest, retentionMs = 60000)
    assert(ManifestSink.readChangesBetween(spark, dest, 0L)
      .count() == rows.size.toLong)
    // a narrow COW delete after it lands a small sidecar of its own;
    // the feed reads both layouts in one range
    assert(ManifestSink.deleteWhere(spark, dest,
      ManifestSink.SkipPredicate.NumRange("id", 1000, 1004)) == 5L) // v2
    val both = ManifestSink.readChangesBetween(spark, dest, 0L)
    assert(both.where(col("_commit_version") === 2L &&
      col("_change_type") === "delete").count() == 5L)
    assert(both.count() == rows.size.toLong + 5L)
  }

  test("generic partition columns: partitionField names an arbitrary " +
      "column (lang) — values become directories, reads surface and " +
      "prune on it, overwrite/drop/update/sync keep the layout, " +
      "special characters hive-escape and round-trip") {
    val root = tmpDir("msinkgen_")
    val dest = s"$root/wh/t"
    val docs = Seq(
      (1L, "en", "hello world"), (2L, "en", "more english"),
      (3L, "de", "hallo welt"), (4L, "fr", "bonjour"),
      (5L, "pt br", "ola")) // a value with a space: escaping case
      .toDF("doc_id", "lang", "text")
    ManifestSink.statsAppend(docs.repartition(2), dest,
      Some("val(lang)"), Seq("doc_id")) // v0
    // directory layout is lang=<value> (a space needs no hive escape)
    val dirs = new java.io.File(dest).listFiles()
      .filter(_.isDirectory).map(_.getName).filterNot(_.startsWith("_"))
      .sorted.toSeq
    assert(dirs == Seq("lang=de", "lang=en", "lang=fr", "lang=pt br"))
    // a RESERVED character hive-escapes on disk and unescapes on read
    ManifestSink.statsAppend(
      Seq((9L, "a:b", "colon")).toDF("doc_id", "lang", "text"),
      dest, Some("val(lang)"), Seq("doc_id"))
    assert(new java.io.File(dest).listFiles()
      .exists(_.getName == "lang=a%3Ab"))
    assert(ManifestSink.readBack(spark, dest).where("lang = 'a:b'")
      .select("doc_id").as[Long].collect().toSeq == Seq(9L))
    assert(ManifestSink.dropPartitions(spark, dest, Seq("a:b")) >= 1L)
    // reads surface the column (unescaped) and partition-prune
    val back = ManifestSink.readBack(spark, dest)
    assert(back.columns.contains("lang"))
    assert(back.where("lang = 'pt br'")
      .select("doc_id").as[Long].collect().toSeq == Seq(5L))
    // partition pruning through the SQL relation (inputFiles ignores
    // pruning, so read the scan's numFiles metric)
    val en = spark.read.format("graft").load(dest)
      .where(col("lang") === "en")
    en.collect()
    val enScan = en.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.get
    val enFiles = back.inputFiles.count(_.contains("lang=en/"))
    assert(en.count() == 2L)
    assert(enScan.metrics("numFiles").value == enFiles.toLong,
      s"generic partition pruning inert: scanned " +
        s"${enScan.metrics("numFiles").value} of $enFiles")

    // partition-scoped overwrite: replace just lang=en
    val repl = Seq((10L, "en", "rewritten")).toDF("doc_id", "lang", "text")
    assert(ManifestSink.overwritePartitions(repl, dest, "val(lang)",
      values = Seq("en"), statsCols = Seq("doc_id")) > 0L) // v1
    val after = ManifestSink.readBack(spark, dest)
    assert(after.where("lang = 'en'")
      .select("doc_id").as[Long].collect().toSeq == Seq(10L))
    assert(after.count() == 4L)
    // untouched partitions carry byte-identical files
    assert(after.inputFiles.filter(_.contains("lang=de/")).toSet ==
      back.inputFiles.filter(_.contains("lang=de/")).toSet)
    // a mismatched layout spec refuses
    val eLayout = intercept[IllegalArgumentException](
      ManifestSink.overwritePartitions(repl, dest, "val(text)"))
    assert(eLayout.getMessage.contains("partitioned by"),
      eLayout.getMessage)

    // SHOW PARTITIONS / DESCRIBE DETAIL carry the generic identity
    assert(ManifestSink.partitions(spark, dest)
      .select("partition").as[String].collect().toSet ==
      Set("lang=de", "lang=en", "lang=fr", "lang=pt br"))
    assert(ManifestSink.detail(spark, dest).head()
      .getSeq[String](4).toSet ==
      Set("lang=de", "lang=en", "lang=fr", "lang=pt br"))

    // UPDATE keeps each row's partition (generic carry)
    assert(ManifestSink.updateWhereMor(spark, dest,
      ManifestSink.SkipPredicate.NumRange("doc_id", 10, 10),
      Map("text" -> lit("patched"))) == 1L) // v2
    val upd = ManifestSink.readBack(spark, dest)
      .where("text = 'patched'")
    assert(upd.select("lang").as[String].collect().toSeq == Seq("en"))
    // the update's appended file landed inside its source partition
    // (mor update writeIds prefix "mu")
    assert(new java.io.File(s"$dest/lang=en").listFiles()
      .exists(_.getName.startsWith("mu")))
    // the escaped-space partition round-trips through an update too
    assert(ManifestSink.updateWhereMor(spark, dest,
      ManifestSink.SkipPredicate.NumRange("doc_id", 5, 5),
      Map("text" -> lit("oi"))) == 1L) // v3
    assert(ManifestSink.readBack(spark, dest).where("text = 'oi'")
      .select("lang").as[String].collect().toSeq == Seq("pt br"))

    // incremental sync keeps the generic layout
    val src = Seq((10L, "en", "patched"), (3L, "de", "hallo welt"),
        (4L, "fr", "bonjour v2"), (5L, "pt br", "oi"),
        (6L, "es", "hola"))
      .toDF("doc_id", "lang", "text")
    val out = ManifestSink.mergeSync(spark, dest, src, "doc_id",
      Some("val(lang)"), Seq("doc_id"))
    assert(out == ManifestSink.MergeOutcome.Merged(4L, 1L, 0L)) // v4
    val synced = ManifestSink.readBack(spark, dest)
    assert(synced.count() == 5L)
    assert(synced.where("lang = 'es'").count() == 1L)
    // forgetting the layout on a sync refuses
    val eSync = intercept[IllegalArgumentException](
      ManifestSink.mergeSync(spark, dest, src, "doc_id"))
    assert(eSync.getMessage.contains("layout"), eSync.getMessage)

    // dropPartitions resolves the generic key and escapes the value
    assert(ManifestSink.dropPartitions(spark, dest,
      Seq("pt br")) >= 1L) // v5
    assert(ManifestSink.readBack(spark, dest)
      .where("lang = 'pt br'").count() == 0L)
    assert(ManifestSink.readBack(spark, dest).count() == 4L)

    // two-level generic refuses; generic values with '/' refuse
    val e2 = intercept[IllegalArgumentException](
      ManifestSink.statsAppend(docs, s"$root/wh/t2",
        Some("val(lang)/text"), Seq("doc_id")))
    assert(e2.getMessage.contains("timestamp/date"), e2.getMessage)
    // a bare STRING partitionField keeps the legacy date derivation
    // (to_date over the values, ANSI-loud on non-dates) — generic
    // needs the explicit val(...)
    intercept[Exception](
      ManifestSink.append(docs, s"$root/wh/t3", Some("lang")))
    assert(!new java.io.File(s"$root/wh/t3/lang=en").exists)
  }

  test("bloom file index: equality lookups prune files min/max cannot " +
      "touch, the OR-merge survives optimize, carry survives compact " +
      "and restore, rewrites drop their filters conservatively") {
    import ManifestSink.SkipPredicate._
    val root = tmpDir("msinkbloom_")
    val dest = s"$root/wh/t"
    val df = (0L until 400L).map(i => (i, s"k$i",
        java.sql.Timestamp.valueOf(
          if (i < 200) "2024-03-01 00:00:00" else "2024-03-02 00:00:00")))
      .toDF("id", "key", "ts").repartition(8, col("id"))
    ManifestSink.statsAppend(df, dest, Some("ts"), Seq("id"),
      bloomCols = Seq("id", "key"))

    // hash-scattered ids: every file's [min,max] spans ~the whole
    // range, so the stats-only numeric equality reads almost all files
    val statsOnly =
      ManifestSink.readBackWhere(spark, dest, "id", 123, 123)
    assert(statsOnly.count() == 1)
    assert(statsOnly.inputFiles.length >= 6)
    // the bloom form prunes to the file(s) actually holding the value
    val hit = ManifestSink.readBackWherePred(spark, dest,
      StrEq("key", "k123"))
    assert(hit.select(col("id"), col("key"))
      .as[(Long, String)].collect().toSeq == Seq((123L, "k123")))
    assert(hit.inputFiles.length <= 2)
    // numeric keys probe through the same string cast the build used
    val numHit = ManifestSink.readBackWherePred(spark, dest,
      StrEq("id", "123"))
    assert(numHit.count() == 1 && numHit.inputFiles.length <= 2)
    // absence is a metadata answer
    assert(ManifestSink.readBackWherePred(spark, dest,
      StrEq("key", "k9999")).count() == 0)
    assert(ManifestSink.countWhere(spark, dest,
      StrEq("key", "k123")) == 1L)
    // IN-list: ONE read pruned to the union of per-value verdicts
    val inHit = ManifestSink.readBackWherePred(spark, dest,
      ManifestSink.SkipPredicate.StrIn("key",
        Seq("k123", "k200", "k9999")))
    assert(inHit.select("id").as[Long].collect().toSet ==
      Set(123L, 200L))
    assert(inHit.inputFiles.length <= 3)
    assert(ManifestSink.countWhere(spark, dest,
      ManifestSink.SkipPredicate.StrIn("key",
        Seq("k123", "k200", "k9999"))) == 2L)
    // Or over ranges still reads the union of both slabs' files
    assert(ManifestSink.readBackWherePred(spark, dest,
      ManifestSink.SkipPredicate.Or(Seq(
        NumRange("id", 0, 4), NumRange("id", 395, 399))))
      .count() == 10)

    // optimize concatenates per partition dir: the packed file's bloom
    // is the bitwise OR of its inputs' — still pure metadata
    assert(ManifestSink.optimize(spark, dest,
      targetBytes = 1L << 30) > 0L)
    assert(ManifestSink.readBack(spark, dest).count() == 400)
    val hitOpt = ManifestSink.readBackWherePred(spark, dest,
      StrEq("key", "k123"))
    assert(hitOpt.count() == 1)
    assert(hitOpt.inputFiles.length == 1) // 1 of the 2 packed files

    // a COW rewrite drops the rewritten file's bloom (conservative);
    // untouched files keep theirs
    assert(ManifestSink.deleteWhere(spark, dest,
      NumRange("id", 100, 149)) == 50L)
    assert(ManifestSink.readBackWherePred(spark, dest,
      StrEq("key", "k123")).count() == 0) // deleted
    val hit50 = ManifestSink.readBackWherePred(spark, dest,
      StrEq("key", "k50"))
    assert(hit50.count() == 1)
    // the 2024-03-02 file still prunes via its bloom; only the
    // rewritten (filterless) file is read
    assert(hit50.inputFiles.length == 1)

    // restore to the pre-delete version carries its bloom lines back
    val preDelete = ManifestSink.history(spark, dest)
      .where(col("kind") === "snapshot").agg(min(col("version")))
      .head.getLong(0)
    ManifestSink.restore(spark, dest, preDelete)
    val hitRest = ManifestSink.readBackWherePred(spark, dest,
      StrEq("key", "k123"))
    assert(hitRest.count() == 1)
    assert(hitRest.inputFiles.length == 1)

    // compact carries the lines verbatim; lookups keep pruning
    ManifestSink.compact(spark, dest)
    val hitComp = ManifestSink.readBackWherePred(spark, dest,
      StrEq("key", "k123"))
    assert(hitComp.count() == 1)
    assert(hitComp.inputFiles.length == 1)
    assert(ManifestSink.readBack(spark, dest).count() == 400)

    // merge candidate refinement: on a bloom-indexed table the merge
    // probes its source keys against each file's filter — matched keys
    // still replace (no false negative can lose a match), absent keys
    // insert
    val destM = s"$root/wh/tm"
    for (b <- 0 until 4)
      ManifestSink.statsAppend(
        (0L until 400L).filter(_ % 4 == b).map(i => (i, s"v$i"))
          .toDF("id", "v").coalesce(1),
        destM, None, Seq("id"), bloomCols = Seq("id"))
    assert(ManifestSink.mergeInto(spark, destM,
      Seq((5L, "UP")).toDF("id", "v"), "id",
      statsCols = Seq("id")) == ((1L, 0L)))
    val m1 = ManifestSink.readBack(spark, destM)
    assert(m1.count() == 400)
    assert(m1.where(col("id") === 5L).as[(Long, String)].head() ==
      ((5L, "UP")))
    assert(ManifestSink.mergeInto(spark, destM,
      Seq((1001L, "NEW")).toDF("id", "v"), "id",
      statsCols = Seq("id")) == ((0L, 1L)))
    assert(ManifestSink.readBack(spark, destM).count() == 401)

    // sort-compaction REBUILDS filters from the staged data: cluster
    // by a column uncorrelated with the key, so key stats cannot
    // prune but the fresh per-output-file blooms do
    val destZ = s"$root/wh/tz"
    for (b <- 0 until 4)
      ManifestSink.statsAppend(
        (0L until 400L).filter(_ % 4 == b)
          .map(i => (i, s"k$i", i % 7)).toDF("id", "key", "grp")
          .coalesce(1),
        destZ, None, Seq("grp"), bloomCols = Seq("key"))
    assert(ManifestSink.optimize(spark, destZ, targetBytes = 4096,
      clusterBy = Seq("grp")) > 0L)
    assert(ManifestSink.readBack(spark, destZ).count() == 400)
    assert(ManifestSink.readBack(spark, destZ).inputFiles.length > 1)
    val zHit = ManifestSink.readBackWherePred(spark, destZ,
      StrEq("key", "k123"))
    assert(zHit.select("id").as[Long].collect().toSeq == Seq(123L))
    assert(zHit.inputFiles.length == 1)
  }

  test("commit coordinator: two instances (two processes) racing the " +
      "same log serialize purely on the store's atomicity — every " +
      "version gets exactly one winner, losers keep their tmp and " +
      "retry, nothing is lost or overwritten") {
    import graft.ingest.FsCommitCoordinator
    val root = tmpDir("msinkcoord_")
    val logDir = new java.io.File(s"$root/_log"); logDir.mkdirs()
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // two coordinator INSTANCES sharing no JVM state — the local
    // CREATE_NEW claim is what keeps them correct, exactly as two
    // processes on one box or two HDFS clients
    val coords = Seq(new FsCommitCoordinator, new FsCommitCoordinator)
    val perWriter = 25
    val committed =
      java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val threads = (0 until 2).map { w =>
      new Thread(() => {
        val coord = coords(w)
        for (i <- 0 until perWriter) {
          val tmp = new org.apache.hadoop.fs.Path(
            s"$root/_log/.tmp_w${w}_$i")
          val body = s"writer=$w batch=$i"
          val out = fs.create(tmp, true)
          out.write(body.getBytes("UTF-8")); out.close()
          var done = false
          while (!done) {
            val v = Option(logDir.listFiles()).map(_.toSeq).getOrElse(Nil)
              .map(_.getName).filter(_.endsWith(".manifest"))
              .map(_.takeWhile(_.isDigit).toLong)
              .maxOption.getOrElse(-1L) + 1
            val fin = new org.apache.hadoop.fs.Path(
              f"$root/_log/$v%012d.manifest")
            if (coord.putIfAbsent(fs, tmp, fin)) {
              assert(committed.add(v), s"version $v claimed twice!")
              done = true
            } else {
              // loser: tmp must survive for the retry
              assert(fs.exists(tmp), s"claim failure consumed tmp $tmp")
            }
          }
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    // 50 commits, versions exactly 0..49, every manifest intact with
    // exactly its writer's body (no overwrite, no torn content)
    val files = logDir.listFiles().filter(_.getName.endsWith(".manifest"))
    assert(files.length == 2 * perWriter)
    assert(files.map(_.getName.takeWhile(_.isDigit).toLong).sorted.toSeq
      == (0L until 2L * perWriter))
    val bodies = files.map(f => new String(java.nio.file.Files
      .readAllBytes(f.toPath), "UTF-8")).toSeq
    // every manifest holds exactly one writer's intact body, all 50
    // commits are present (no overwrite ate one), none torn
    assert(bodies.forall(_.matches("writer=[01] batch=\\d+")))
    assert(bodies.toSet.size == 2 * perWriter)
    // no leftover tmps
    assert(!logDir.listFiles().exists(_.getName.startsWith(".tmp_")))
  }

  test("recover spares a LIVE writer: a staged attempt with a fresh " +
      "heartbeat survives recover's age guard and commits afterwards; " +
      "an aged attempt is swept") {
    val root = tmpDir("msinklive_")
    val dest = s"$root/wh/t"
    ManifestSink.append(Seq((1L, "a")).toDF("id", "v"), dest, None)
    // fabricate a mid-move attempt: staging dir + WA manifest + a moved
    // file, heartbeat FRESH (the writer is alive between renames)
    val fs = new org.apache.hadoop.fs.Path(dest)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val attempt = new org.apache.hadoop.fs.Path(
      s"$root/wh/.staging_t/liveattempt0000")
    fs.mkdirs(attempt)
    val moved = "liveattempt0000-0.parquet"
    val out = fs.create(new org.apache.hadoop.fs.Path(attempt,
      "_graft_manifest"), true)
    out.write(s"target\t$moved".getBytes("UTF-8")); out.close()
    val hb = fs.create(new org.apache.hadoop.fs.Path(attempt,
      ".heartbeat"), true)
    hb.write("42".getBytes("UTF-8")); hb.close()
    fs.create(new org.apache.hadoop.fs.Path(dest, moved), true).close()

    // a one-minute guard: the fresh attempt is skipped, files intact
    ManifestSink.recover(spark, dest, _ => true,
      minAttemptAgeMs = 60000L)
    assert(fs.exists(attempt))
    assert(fs.exists(new org.apache.hadoop.fs.Path(dest, moved)))
    // the live writer finishes: its commit lands fine after the skip
    ManifestSink.append(Seq((2L, "b")).toDF("id", "v"), dest, None)
    assert(ManifestSink.readBack(spark, dest).count() == 2)

    // age the attempt past the guard: swept (no log entry -> rollback)
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    val t0 = System.currentTimeMillis() - 120000
    walk(new java.io.File(s"$root/wh/.staging_t"))
      .foreach(f => f.setLastModified(t0))
    new java.io.File(s"$root/wh/.staging_t/liveattempt0000")
      .setLastModified(t0)
    ManifestSink.recover(spark, dest, _ => true,
      minAttemptAgeMs = 60000L)
    assert(!fs.exists(attempt))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dest, moved)))
    assert(ManifestSink.readBack(spark, dest).count() == 2)
  }

  test("commit coordinator: a manifest is NEVER visible with partial " +
      "content — a concurrent lock-free reader polling the log sees " +
      "each committed file complete at first sight (MB-sized bodies)") {
    import graft.ingest.FsCommitCoordinator
    val root = tmpDir("msinktorn_")
    val logDir = new java.io.File(s"$root/_log"); logDir.mkdirs()
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val coord = new FsCommitCoordinator
    // ~2 MB body per manifest (the base64-bloom-line shape) widens any
    // torn-read window enough for the poller to catch an incremental
    // fill; the hard-link publish leaves no window at all
    val chunk = "x" * 1024
    val commits = 20
    val torn = new java.util.concurrent.atomic.AtomicInteger(0)
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val reader = new Thread(() => {
      while (!stop.get()) {
        val fsList = Option(logDir.listFiles()).map(_.toSeq).getOrElse(Nil)
          .filter(_.getName.endsWith(".manifest"))
        fsList.foreach { f =>
          if (!seen.contains(f.getName)) {
            val body = new String(
              java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
            // first observation must already be the COMPLETE body:
            // header line + 2048 chunk lines + terminator
            if (!(body.startsWith("writeid\t") &&
                body.endsWith("END") &&
                body.linesIterator.length == 2050))
              torn.incrementAndGet()
            seen.add(f.getName)
          }
        }
      }
    })
    reader.start()
    for (v <- 0 until commits) {
      val body = (Seq(s"writeid\tw$v") ++
        Seq.fill(2048)(chunk) :+ "END").mkString("\n")
      val tmp = new org.apache.hadoop.fs.Path(s"$root/_log/.tmp_$v")
      val out = fs.create(tmp, true)
      out.write(body.getBytes("UTF-8")); out.close()
      val fin = new org.apache.hadoop.fs.Path(
        f"$root/_log/$v%012d.manifest")
      assert(coord.putIfAbsent(fs, tmp, fin))
    }
    // let the poller observe the tail, then stop
    val deadline = System.currentTimeMillis() + 5000
    while (seen.size() < commits &&
      System.currentTimeMillis() < deadline) Thread.sleep(10)
    stop.set(true); reader.join()
    assert(seen.size() == commits)
    assert(torn.get() == 0,
      s"reader observed ${torn.get()} torn manifest(s)")
  }

  test("restore: losing the version slot to a concurrent writer " +
      "retries at the advanced head and leaves no orphan tmp in the " +
      "log dir") {
    val root = tmpDir("msinkrestrace_")
    val dest = s"$root/wh/t"
    for (b <- 0 until 2)
      ManifestSink.append(
        Seq((b.toLong, s"v$b")).toDF("id", "v").coalesce(1), dest, None)
    ManifestSink.deleteWhere(spark, dest,
      ManifestSink.SkipPredicate.NumRange("id", 1, 1))
    assert(ManifestSink.readBack(spark, dest).count() == 1)
    val fs = new org.apache.hadoop.fs.Path(dest)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // competing process: steals the restore's first version slot by
    // committing a (valid, empty) append manifest there just before
    // the restore's claim — the coordinator seam is exactly where two
    // processes interleave
    val inner = ManifestSink.coordinator
    val stole = new java.util.concurrent.atomic.AtomicBoolean(false)
    ManifestSink.coordinator = new graft.ingest.CommitCoordinator {
      override def putIfAbsent(fsArg: org.apache.hadoop.fs.FileSystem,
          tmp: org.apache.hadoop.fs.Path,
          fin: org.apache.hadoop.fs.Path): Boolean = {
        if (tmp.getName.startsWith(".tmp_restore_") &&
            stole.compareAndSet(false, true)) {
          val steal = new org.apache.hadoop.fs.Path(
            fin.getParent, ".tmp_steal")
          val out = fsArg.create(steal, true)
          out.write("writeid\tcompeting".getBytes("UTF-8")); out.close()
          assert(inner.putIfAbsent(fsArg, steal, fin))
        }
        inner.putIfAbsent(fsArg, tmp, fin)
      }
    }
    try {
      val v1 = ManifestSink.readVersion(spark, dest, 1L)
        .orderBy("id").collect().toSeq
      val newV = ManifestSink.restore(spark, dest, 1L)
      // head was 2; the thief took 3; the restore retried and won 4
      assert(newV == 4L)
      assert(ManifestSink.readBack(spark, dest)
        .orderBy("id").collect().toSeq == v1)
    } finally ManifestSink.coordinator = inner
    // the lost attempt's tmp was cleaned up, not stranded
    val logFiles = fs.listStatus(new org.apache.hadoop.fs.Path(
      s"$dest/_log")).map(_.getPath.getName)
    assert(!logFiles.exists(_.startsWith(".tmp_")),
      s"orphan tmp in log dir: ${logFiles.mkString(",")}")
  }

  test("footer-derived stats equal the scanned stats LINE FOR LINE " +
      "(long/double/boolean/string with nulls and >64-char " +
      "truncation); unsupported types fall back to the scan; pruning " +
      "behaves identically") {
    val root = tmpDir("msinkfstats_")
    val df = spark.range(0, 300).select(
      col("id"),
      when(col("id") % 10 === 0, lit(null))
        .otherwise(col("id") * 1.5).as("v"),
      (col("id") % 2 === 0).as("flag"),
      when(col("id") % 7 === 0, lit(null))
        .otherwise(concat(lit("k"),
          lpad(col("id").cast("string"), 70, "0"))).as("s"))
      .repartitionByRange(3, col("id"))
    def statsLines(dest: String): Set[String] = {
      val logDir = new java.io.File(s"$dest/_log")
      logDir.listFiles().filter(_.getName.endsWith(".manifest"))
        .flatMap(mf => java.nio.file.Files.readAllLines(mf.toPath)
          .toArray(Array.empty[String]))
        .filter(_.startsWith("stats2\t"))
        .map { l =>
          // normalize the writeId-bearing target name to its range-
          // bucket suffix so two commits' lines compare
          val p = l.split('\t')
          val tgt = p(1)
          p(1) = tgt.substring(tgt.lastIndexOf('-'))
          p.mkString("\t")
        }.toSet
    }
    val destF = s"$root/footer"; val destS = s"$root/scan"
    val destD = s"$root/dist"
    ManifestSink.statsAppend(df, destF, None,
      Seq("id", "v", "flag", "s"))
    val cap = ManifestSink.FooterStatsMaxFiles
    try {
      ManifestSink.FooterStatsMaxFiles = 0 // force the scan path
      ManifestSink.statsAppend(df, destS, None,
        Seq("id", "v", "flag", "s"))
      // 3 files over a cap of 1: the DISTRIBUTED footer job (the
      // local-scheme driver widening must be pinned down too)
      ManifestSink.FooterStatsMaxFiles = 1
      val lcap = ManifestSink.FooterStatsLocalCap
      ManifestSink.FooterStatsLocalCap = 1
      try ManifestSink.statsAppend(df, destD, None,
        Seq("id", "v", "flag", "s"))
      finally ManifestSink.FooterStatsLocalCap = lcap
    } finally ManifestSink.FooterStatsMaxFiles = cap
    assert(statsLines(destF) == statsLines(destS),
      s"footer stats diverged:\n${statsLines(destF)}\nvs\n" +
        s"${statsLines(destS)}")
    assert(statsLines(destD) == statsLines(destS),
      "distributed footer stats diverged from the scan's")
    // pruning on footer-built stats: range bucket isolation
    assert(ManifestSink.readBackWhere(spark, destF, "id", 250, 250)
      .count() == 1L)
    // truncated string bounds stay conservative: the 71-char value of
    // id=123 still reads back through a point predicate
    assert(spark.read.format("graft").load(destF)
      .where(col("s") === "k" + "0" * 66 + "0123").count() == 1L)

    // a timestamp stats column makes the footer path REFUSE (Spark's
    // cast-to-string bound semantics are the scan's) — lines still
    // identical because both dests take the scan
    val dfT = df.withColumn("ts",
      (col("id") * 1000000L).cast("timestamp"))
    val destTF = s"$root/tsf"; val destTS = s"$root/tss"
    ManifestSink.statsAppend(dfT, destTF, None, Seq("id", "ts"))
    try {
      ManifestSink.FooterStatsMaxFiles = 0
      ManifestSink.statsAppend(dfT, destTS, None, Seq("id", "ts"))
    } finally ManifestSink.FooterStatsMaxFiles = cap
    assert(statsLines(destTF) == statsLines(destTS))
  }

  test("updateWhereMor: a partitioned destination without " +
      "partitionField keeps each updated row in its SOURCE file's " +
      "partition (directory-derived); with partitionField the " +
      "partition re-derives from the new values; a foreign partition " +
      "layout refuses loudly") {
    val root = tmpDir("msinkmorpart_")
    val dest = s"$root/wh/t"
    val df = Seq(
      (1L, "2024-01-01T10:00:00", "a"),
      (2L, "2024-01-02T10:00:00", "b"),
      (3L, "2024-01-02T11:00:00", "c"))
      .toDF("id", "ts", "v")
      .withColumn("ts", col("ts").cast("timestamp"))
    ManifestSink.statsAppend(df.coalesce(1), dest, Some("ts"),
      statsCols = Seq("id"))
    // no partitionField: the updated row stays in 2024-01-02
    assert(ManifestSink.updateWhereMor(spark, dest,
      ManifestSink.SkipPredicate.NumRange("id", 3, 3),
      Map("v" -> lit("C"))) == 1L)
    val sqlBack = spark.read.format("graft").load(dest)
    assert(sqlBack.where(col("id") === 3L)
      .select(col("v"),
        col(graft.ingest.Ingest.PartitionCol).cast("string"))
      .as[(String, String)].head() == (("C", "2024-01-02")))
    // with partitionField: update lands, partition value survives
    val n = ManifestSink.updateWhereMor(spark, dest,
      ManifestSink.SkipPredicate.NumRange("id", 2, 2),
      Map("v" -> lit("B")), partitionField = Some("ts"))
    assert(n == 1L)
    val back = ManifestSink.readBack(spark, dest).orderBy("id")
    assert(back.where(col("id") === 2L).select("v")
      .as[String].head() == "B")
    // the partition column still reads its derived value, not null
    val pcol = back.columns.find(_ == graft.ingest.Ingest.PartitionCol)
    assert(pcol.nonEmpty)
    assert(back.where(col(graft.ingest.Ingest.PartitionCol).isNull)
      .count() == 0)
    // a GENERIC single-column layout (region=emea) is self-writable
    // now: the update keeps the row's source partition
    val dest2 = s"$root/wh/generic"
    ManifestSink.append(
      Seq((1L, "x", "emea"), (2L, "y", "apac"))
        .toDF("id", "v", "region"),
      dest2, Some("val(region)"))
    assert(ManifestSink.updateWhereMor(spark, dest2,
      ManifestSink.SkipPredicate.NumRange("id", 1, 1),
      Map("v" -> lit("patched"))) == 1L)
    val g = ManifestSink.readBack(spark, dest2)
    assert(g.where("v = 'patched'").select("region")
      .as[String].collect().toSeq == Seq("emea"))
    assert(new java.io.File(s"$dest2/region=emea").listFiles()
      .exists(_.getName.startsWith("mu")))
    // a MIXED layout (two different keys across files) still refuses
    val lf = new java.io.File(s"$dest2/_log")
    val mf = lf.listFiles().filter(_.getName.endsWith(".manifest"))
      .sorted.head
    val extra = s"$dest2/zone=x"
    Seq((9L, "z", "emea")).toDF("id", "v", "region")
      .drop("region").coalesce(1).write.parquet(extra)
    val part = new java.io.File(extra).listFiles()
      .map(_.getName).find(_.endsWith(".parquet")).get
    java.nio.file.Files.writeString(mf.toPath,
      java.nio.file.Files.readString(mf.toPath) +
        s"\ntarget\tzone=x/$part")
    val ex = intercept[IllegalArgumentException] {
      ManifestSink.updateWhereMor(spark, dest2,
        ManifestSink.SkipPredicate.NumRange("id", 1, 9),
        Map("v" -> lit("w")))
    }
    assert(ex.getMessage.contains("mixes partition layouts") ||
      ex.getMessage.contains("unsupported partition layout"),
      ex.getMessage)
  }

  test("purge: only files below the live-fraction threshold rewrite — " +
      "lightly-tombstoned files keep their bytes AND their dvs, " +
      "fully-dead files drop with zero writes, stats re-derive tight, " +
      "and reads are identical before and after") {
    val root = tmpDir("msinkpurge_")
    val dest = s"$root/wh/t"
    for (b <- 0 until 5)
      ManifestSink.statsAppend(
        (b * 100L until b * 100L + 100L).map(i => (i, s"v$i"))
          .toDF("id", "v").coalesce(1), dest, None, Seq("id"))
    def fileOf(id: Long): String = {
      val fs = ManifestSink.readBack(spark, dest).inputFiles
        .filterNot(_.contains("/_dv/"))
      fs.find(f => spark.read.parquet(f)
        .filter(col("id") === id).limit(1).count() == 1).get
        .split('/').last
    }
    val heavyName = fileOf(100L) // will lose 60% of its rows
    val lightName = fileOf(300L) // will lose 5%
    // heavy: 60 of file 1's rows; light: 5 of file 3's; full: all of
    // file 0's — three dv commits
    assert(ManifestSink.deleteWhereMor(spark, dest,
      ManifestSink.SkipPredicate.NumRange("id", 100, 159)) == 60L)
    assert(ManifestSink.deleteWhereMor(spark, dest,
      ManifestSink.SkipPredicate.NumRange("id", 300, 304)) == 5L)
    assert(ManifestSink.deleteWhereMor(spark, dest,
      ManifestSink.SkipPredicate.NumRange("id", 0, 99)) == 100L)
    val expectIds = ManifestSink.readBack(spark, dest)
      .select("id").as[Long].collect().toSet
    assert(expectIds.size == 500 - 165)

    // threshold 0.9: heavy (0.4 live) and full (0.0) purge; light
    // (0.95) keeps its bytes and its tombstones
    assert(ManifestSink.purge(spark, dest, minLiveFraction = 0.9) == 2L)
    assert(ManifestSink.readBack(spark, dest)
      .select("id").as[Long].collect().toSet == expectIds)
    val inputNow = ManifestSink.readBack(spark, dest).inputFiles
      .map(_.split('/').last).toSet
    assert(!inputNow.contains(heavyName), "heavy file must rewrite")
    assert(inputNow.contains(lightName),
      "lightly-tombstoned file must keep its bytes")
    // the light file's dvs survive the partial snapshot; the heavy
    // file's are materialized away — exactly one dv'd file remains
    val headMf = new java.io.File(s"$dest/_log").listFiles()
      .filter(_.getName.endsWith(".manifest")).map(_.getName).max
    val headLines = scala.io.Source.fromFile(
      new java.io.File(s"$dest/_log", headMf), "UTF-8").getLines().toList
    val dvTargets = headLines.filter(_.startsWith("dv\t"))
      .map(_.split('\t')(1)).distinct
    assert(dvTargets.length == 1 &&
      dvTargets.head.endsWith(lightName))
    // re-derived stats stay tight: the purged slab's range prunes to
    // the one rewritten file
    assert(ManifestSink.readBackWhere(spark, dest, "id", 160, 199)
      .inputFiles.count(!_.contains("/_dv/")) == 1)
    // idempotent: nothing left under the threshold
    assert(ManifestSink.purge(spark, dest, minLiveFraction = 0.9) == 0L)
    // tighten the threshold: now the light file purges too
    assert(ManifestSink.purge(spark, dest, minLiveFraction = 0.99) == 1L)
    assert(ManifestSink.readBack(spark, dest)
      .select("id").as[Long].collect().toSet == expectIds)
    val finalMf = new java.io.File(s"$dest/_log").listFiles()
      .filter(_.getName.endsWith(".manifest")).map(_.getName).max
    assert(!scala.io.Source.fromFile(
      new java.io.File(s"$dest/_log", finalMf), "UTF-8").getLines()
      .exists(_.startsWith("dv\t")), "all tombstones materialized")
  }

  test("log checkpoint: head resolution rides the summary (reads " +
      "survive pre-checkpoint manifest damage) while time travel, " +
      "history, restore, and the change feed still walk the retained " +
      "log; retention keeps two; compact sweeps them") {
    val root = tmpDir("msinkckpt_")
    val dest = s"$root/wh/t"
    val logDir = new java.io.File(s"$dest/_log")
    def ckpts(): Seq[String] = logDir.listFiles().map(_.getName)
      .filter(_.endsWith(".checkpoint")).sorted.toSeq
    val saved = ManifestSink.checkpointInterval
    ManifestSink.checkpointInterval = 0 // explicit control in this test
    try {
      for (b <- 0 until 5)
        ManifestSink.statsAppend(
          (b * 10L until b * 10L + 10L).map(i => (i, s"v$i"))
            .toDF("id", "v").coalesce(1), dest, None, Seq("id"))
      // v5: tombstones, so the checkpoint must carry dv lines too
      assert(ManifestSink.deleteWhereMor(spark, dest,
        ManifestSink.SkipPredicate.NumRange("id", 12, 13)) == 2L)
      val full = ManifestSink.readBack(spark, dest)
        .select("id").as[Long].collect().toSet
      val v2 = ManifestSink.readVersion(spark, dest, 2)
        .select("id").as[Long].collect().toSet
      val hist = ManifestSink.history(spark, dest).count()

      val ckV = ManifestSink.checkpoint(spark, dest)
      assert(ckV == 5L && ckpts() == Seq(f"$ckV%012d.checkpoint"))
      // re-checkpoint at the same head is a no-op
      assert(ManifestSink.checkpoint(spark, dest) == ckV &&
        ckpts().length == 1)

      // parity through the checkpoint: head read, skipping read, dv
      // subtraction, history row count, pre-checkpoint time travel
      assert(ManifestSink.readBack(spark, dest)
        .select("id").as[Long].collect().toSet == full)
      assert(ManifestSink.readBackWhere(spark, dest, "id", 10, 19)
        .select("id").as[Long].collect().toSet ==
        full.filter(i => i >= 10 && i <= 19))
      assert(ManifestSink.history(spark, dest).count() == hist)
      assert(ManifestSink.readVersion(spark, dest, 2)
        .select("id").as[Long].collect().toSet == v2)
      // the change feed spans the checkpoint (not a commit: version
      // numbering and feed semantics are untouched)
      assert(ManifestSink.readChangesBetween(spark, dest, 4, 5)
        .where(col("_change_type") === "delete").count() == 2)

      // append AFTER the checkpoint: resolution = summary + tail
      ManifestSink.statsAppend(
        (100L until 110L).map(i => (i, s"v$i")).toDF("id", "v")
          .coalesce(1), dest, None, Seq("id"))
      val full2 = full ++ (100L until 110L)
      assert(ManifestSink.readBack(spark, dest)
        .select("id").as[Long].collect().toSet == full2)

      // PROOF head reads resolve THROUGH the summary: vandalize every
      // pre-checkpoint manifest body (retained files, damaged content);
      // the head read must not notice, because it never opens them
      logDir.listFiles().filter(_.getName.endsWith(".manifest"))
        .filter(_.getName.takeWhile(_.isDigit).toLong <= ckV)
        .foreach { mf =>
          val w = new java.io.PrintWriter(mf)
          try w.write("garbage\tnot-a-manifest") finally w.close()
        }
      assert(ManifestSink.readBack(spark, dest)
        .select("id").as[Long].collect().toSet == full2)
      assert(ManifestSink.readBackWhere(spark, dest, "id", 10, 19)
        .select("id").as[Long].collect().toSet ==
        full2.filter(i => i >= 10 && i <= 19))

      // restore to a pre-checkpoint version still works off the intact
      // retained log (rebuild the table in a fresh dir to undo the
      // vandalism above)
      val dest2 = s"$root/wh/t2"
      for (b <- 0 until 3)
        ManifestSink.statsAppend(
          (b * 10L until b * 10L + 10L).map(i => (i, s"v$i"))
            .toDF("id", "v").coalesce(1), dest2, None, Seq("id"))
      ManifestSink.checkpoint(spark, dest2)
      ManifestSink.restore(spark, dest2, 1)
      assert(ManifestSink.readBack(spark, dest2)
        .select("id").as[Long].collect().toSet == (0L until 20L).toSet)
      // ...and the restore (a new head ABOVE the checkpoint) resolves
      assert(ManifestSink.checkpoint(spark, dest2) == 3L)
      assert(ManifestSink.readBack(spark, dest2).count() == 20)

      // retention: only the newest two checkpoint files survive
      ManifestSink.statsAppend(Seq((900L, "x")).toDF("id", "v"),
        dest2, None, Seq("id"))
      ManifestSink.checkpoint(spark, dest2)
      assert(new java.io.File(s"$dest2/_log").listFiles()
        .count(_.getName.endsWith(".checkpoint")) == 2)

      // compact collapses the log AND sweeps every checkpoint
      ManifestSink.compact(spark, dest2)
      assert(new java.io.File(s"$dest2/_log").listFiles()
        .count(_.getName.endsWith(".checkpoint")) == 0)
      assert(ManifestSink.readBack(spark, dest2).count() == 21)
    } finally ManifestSink.checkpointInterval = saved
  }

  test("checkpoint refuses a rollback-able state: committed-unledgered " +
      "attempts block the summary, recover sweeps a checkpoint at or " +
      "above a rolled-back version, and the auto-cadence fires only at " +
      "ledger-final commits") {
    val root = tmpDir("msinkckpt2_")
    val dest = s"$root/wh/t"
    val saved = ManifestSink.checkpointInterval
    ManifestSink.checkpointInterval = 0
    try {
      ManifestSink.statsAppend(Seq((1L, "a")).toDF("id", "v"), dest,
        None, Seq("id"))
      // a committed-but-unledgered attempt (crash window 2): staging
      // marker pends, so the checkpoint REFUSES rather than summarize a
      // version recover may roll back
      ManifestSink.stagedAppend(Seq((2L, "b")).toDF("id", "v"), dest,
        None, "wckpt", Seq("gs://src/b2"))
      assert(ManifestSink.checkpoint(spark, dest) == -1L)
      assert(new java.io.File(s"$dest/_log").listFiles()
        .count(_.getName.endsWith(".checkpoint")) == 0)
      // force the race checkpointFs guards against: hand-write a
      // checkpoint that DID summarize the unledgered v1, then recover —
      // the rollback must sweep it, and the read must drop id=2
      val mfs = new java.io.File(s"$dest/_log").listFiles()
        .filter(_.getName.endsWith(".manifest")).sortBy(_.getName)
      assert(mfs.length == 2)
      val summarized = mfs.flatMap(mf =>
        scala.io.Source.fromFile(mf, "UTF-8").getLines()
          .filter(l => l.startsWith("target\t") ||
            l.startsWith("stats2\t")).toSeq)
      val ckF = new java.io.File(s"$dest/_log", "000000000001.checkpoint")
      val w = new java.io.PrintWriter(ckF)
      try w.write((Seq("writeid\tckpt", "snapshot\t1", "checkpoint\t1") ++
        summarized).mkString("\n")) finally w.close()
      assert(ManifestSink.readBack(spark, dest)
        .select("id").as[Long].collect().toSet == Set(1L, 2L))
      ManifestSink.recover(spark, dest, _ => false) // nothing ledgered
      assert(!ckF.exists(), "rollback must sweep the stale checkpoint")
      assert(ManifestSink.readBack(spark, dest)
        .select("id").as[Long].collect().toSet == Set(1L))

      // auto-cadence: interval 2 → checkpoints appear after the ledger-
      // final commits at even versions, without explicit calls
      ManifestSink.checkpointInterval = 2
      val dest2 = s"$root/wh/t2"
      for (b <- 0 until 4)
        ManifestSink.statsAppend(
          Seq((b.toLong, s"v$b")).toDF("id", "v"), dest2, None, Seq("id"))
      val cks = new java.io.File(s"$dest2/_log").listFiles()
        .map(_.getName).filter(_.endsWith(".checkpoint")).sorted
      assert(cks.nonEmpty && cks.forall(
        _.takeWhile(_.isDigit).toLong % 2 == 0))
      assert(ManifestSink.readBack(spark, dest2).count() == 4)
    } finally ManifestSink.checkpointInterval = saved
  }

  test("bloom sidecar layout: slim pointer lines in the manifest, bits " +
      "in _bloom parquet; a 200k-key file sizes past the old inline " +
      "cap and holds ~1% fpp; legacy inline lines still probe; " +
      "recover and vacuum sweep sidecars like dv sidecars") {
    import ManifestSink.SkipPredicate._
    val root = tmpDir("msinksc_")
    val dest = s"$root/wh/t"
    val n = 200000
    ManifestSink.statsAppend(
      (0 until n).map(i => (i.toLong, s"k$i")).toDF("id", "key")
        .coalesce(1),
      dest, None, Seq("id"), bloomCols = Seq("key"))
    val logDir = new java.io.File(s"$dest/_log")
    val mf1 = logDir.listFiles()
      .filter(_.getName.endsWith(".manifest")).head
    val lines1 = {
      val src = scala.io.Source.fromFile(mf1)
      try src.getLines().toVector finally src.close()
    }
    // the manifest carries a pointer, never the bits: no inline base64
    // line, a bloomsc line, a sidecar cover line, and a body that stays
    // KBs where 200k keys of inline base64 would be >100 KB
    assert(lines1.exists(_.startsWith("bloomsc\t")))
    assert(!lines1.exists(_.startsWith("bloom\t")))
    assert(lines1.exists(_.startsWith("sidecar\t_bloom/")))
    assert(mf1.length() < 16 * 1024)
    val scDir = new java.io.File(s"$dest/_bloom")
    assert(scDir.listFiles().count(_.getName.endsWith(".parquet")) == 1)
    // reconstruct the stored filter from its sidecar words: 200k keys
    // need m >= 2^21 — past the old 2^20 inline cap — with zero false
    // negatives and ~1% false positives
    val sc1 = lines1.find(_.startsWith("bloomsc\t")).get.split('\t')
    val (tgt1, m1, k1) = (sc1(1), sc1(3).toInt, sc1(4).toInt)
    assert(m1 >= (1 << 21), s"200k keys sized m=$m1 — saturated")
    def filterOf(rel: String, tgt: String): ManifestSink.BloomF = {
      val rows = spark.read.parquet(s"$dest/$rel")
        .where(col("tgt") === tgt && col("col") === "key")
        .select(col("m"), col("w"), col("bits"))
        .as[(Int, Int, Long)].collect()
      val m = rows.head._1
      val bits = new Array[Byte](m >> 3)
      rows.foreach { case (_, w, bv) =>
        var b = 0
        while (b < 8) {
          bits(w * 8 + b) = ((bv >>> (b * 8)) & 0xffL).toByte
          b += 1
        }
      }
      ManifestSink.BloomF(m, k1, bits)
    }
    val bf = filterOf(sc1(5), tgt1)
    assert((0 until n by 97).forall(i => bf.mightContain(
      ManifestSink.BloomF.positions(s"k$i", bf.m, bf.k))),
      "false negative: a present key must always answer maybe")
    val probes = 20000
    val fp = (0 until probes).count(i => bf.mightContain(
      ManifestSink.BloomF.positions(s"absent$i", bf.m, bf.k)))
    assert(fp <= probes * 3 / 100,
      s"fpp ${fp.toDouble / probes} — expected ~1%")
    // the real read path prunes through the sidecar: add a second file,
    // a point lookup for one of its keys reads exactly one file
    ManifestSink.statsAppend(
      (n until n + 10).map(i => (i.toLong, s"k$i")).toDF("id", "key")
        .coalesce(1),
      dest, None, Seq("id"), bloomCols = Seq("key"))
    val hit = ManifestSink.readBackWherePred(spark, dest,
      StrEq("key", s"k${n + 5}"))
    assert(hit.count() == 1 && hit.inputFiles.length == 1)
    assert(ManifestSink.readBackWherePred(spark, dest,
      StrEq("key", "nowhere")).count() == 0)

    // the HYBRID policy: the second commit's 10-key filter sized to
    // 2^13 bits — at or below the inline cap it lands IN the manifest
    // (zero-IO probes), no sidecar pointer
    val mf2 = logDir.listFiles().filter(_.getName.endsWith(".manifest"))
      .sortBy(_.getName).last
    val lines2 = {
      val src = scala.io.Source.fromFile(mf2)
      try src.getLines().toVector finally src.close()
    }
    assert(lines2.exists(_.startsWith("bloom\t")))
    assert(!lines2.exists(_.startsWith("bloomsc\t")))

    // LEGACY inline lines for a BIG filter: rewrite the FIRST commit's
    // manifest to the pre-sidecar `bloom\t...\t<b64>` form (bits
    // reassembled from its sidecar) — a table written by an older
    // writer keeps pruning, mixed with the new inline commit
    val inlineLine = s"bloom\t$tgt1\tkey\t${bf.m}\t${bf.k}\t" +
      java.util.Base64.getEncoder.encodeToString(bf.bits)
    val lines1b = {
      val src = scala.io.Source.fromFile(mf1)
      try src.getLines().toVector finally src.close()
    }
    val rewritten = lines1b.flatMap {
      case l if l.startsWith("bloomsc\t") => Some(inlineLine)
      case l if l.startsWith("sidecar\t") => None
      case l                              => Some(l)
    }
    val w = new java.io.PrintWriter(mf1)
    try w.write(rewritten.mkString("\n")) finally w.close()
    assert(new java.io.File(s"$dest/${sc1(5)}").delete())
    ManifestSink.invalidateMfCache()
    val hitLegacy = ManifestSink.readBackWherePred(spark, dest,
      StrEq("key", "k97"))
    assert(hitLegacy.count() == 1 && hitLegacy.inputFiles.length == 1)
    val hitInline = ManifestSink.readBackWherePred(spark, dest,
      StrEq("key", s"k${n + 5}"))
    assert(hitInline.count() == 1 && hitInline.inputFiles.length == 1)

    // RECOVER sweeps a rolled-back attempt's bloom sidecar: emulate a
    // crash between the log commit and the ledger append (staging
    // marker still present, batch not ledgered)
    val destR = s"$root/wh/tr"
    // enough keys to size past the inline cap — the attempt must have
    // an actual sidecar for recover to sweep
    ManifestSink.statsAppend(
      (0 until 20000).map(i => (i.toLong, s"r$i")).toDF("id", "key")
        .coalesce(1),
      destR, None, Seq("id"), bloomCols = Seq("key"))
    val mfR = new java.io.File(s"$destR/_log").listFiles()
      .filter(_.getName.endsWith(".manifest")).head
    val widR = {
      val src = scala.io.Source.fromFile(mfR)
      try src.getLines().find(_.startsWith("writeid\t")).get.substring(8)
      finally src.close()
    }
    assert(new java.io.File(s"$destR/_bloom").listFiles()
      .count(_.getName.endsWith(".parquet")) == 1)
    assert(new java.io.File(s"$root/wh/.staging_tr/$widR").mkdirs())
    ManifestSink.recover(spark, destR, _ => false)
    assert(ManifestSink.readBack(spark, destR).count() == 0)
    val swept = new java.io.File(s"$destR/_bloom").listFiles()
    assert(swept == null ||
      swept.count(_.getName.endsWith(".parquet")) == 0,
      "rollback must sweep the attempt's bloom sidecar")

    // VACUUM sweeps sidecars no surviving manifest references: optimize
    // repacks every file (the 200k-key merged filter is sidecar-sized
    // again), compact collapses the log — superseded data files and
    // any unreferenced sidecar become debris; exactly the snapshot's
    // own sidecar survives
    assert(ManifestSink.optimize(spark, dest,
      targetBytes = 1L << 30) > 0L)
    ManifestSink.compact(spark, dest)
    val removed = ManifestSink.vacuum(spark, dest, retentionMs = 0L)
    assert(removed > 0L)
    val after = new java.io.File(s"$dest/_bloom").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(after == 1,
      s"exactly the surviving snapshot's sidecar remains (after=$after)")
    // the survivor still serves lookups
    val hitV = ManifestSink.readBackWherePred(spark, dest,
      StrEq("key", s"k${n + 5}"))
    assert(hitV.count() == 1 && hitV.inputFiles.length == 1)
    assert(ManifestSink.readBack(spark, dest).count() == n + 10)
  }

  test("fsize lines: every commit path records per-file sizes, so a " +
      "snapshot's FileIndex never stats data files — carried through " +
      "appends, merges, optimize, purge, and checkpoints, and exact " +
      "against the filesystem") {
    val dest = s"${tmpDir("fsize_")}/t"
    def sizesComplete(): Unit = {
      val h = ManifestSink.snapshotHandle(spark, dest)
      assert(h.targets.nonEmpty)
      h.targets.foreach { t =>
        val rec = h.sizes.get(t)
        assert(rec.isDefined, s"no fsize for $t")
        val actual = new java.io.File(s"$dest/$t").length()
        assert(rec.get._1 == actual,
          s"$t recorded ${rec.get._1} actual $actual")
      }
    }
    // plain + stats appends
    ManifestSink.statsAppend(
      (0L until 50L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(2),
      dest, None, Seq("id"))
    ManifestSink.append(
      (50L until 80L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1),
      dest, None)
    sizesComplete()
    // MOR merge: dv sidecar + inserted files
    ManifestSink.mergeCdc(spark, dest,
      Seq((10L, "up", "u"), (90L, "new", "u"), (11L, "x", "d"))
        .toDF("id", "v", "op"),
      "id", col("op") === "d", directiveCols = Seq("op"),
      statsCols = Seq("id"), mor = true)
    sizesComplete()
    // snapshot paths: optimize repack, then a purge after gutting
    assert(ManifestSink.optimize(spark, dest, targetBytes = 1L << 30)
      > 0L)
    sizesComplete()
    ManifestSink.deleteWhereMor(spark, dest,
      ManifestSink.SkipPredicate.NumRange("id", 0, 40))
    ManifestSink.purge(spark, dest, minLiveFraction = 0.99)
    sizesComplete()
    // checkpoint summarizes and later resolution still carries sizes
    ManifestSink.checkpoint(spark, dest)
    sizesComplete()
    assert(ManifestSink.readBack(spark, dest).count() == 80 - 41 + 1)
  }

  test("schemaj lines: the relation schema resolves from the log " +
      "(union across evolving appends, restored on RESTORE, carried " +
      "by optimize + checkpoint), and a log missing the lines falls " +
      "back to the footer sweep with identical results") {
    val dest = s"${tmpDir("schemaj_")}/t"
    ManifestSink.statsAppend(
      (0L until 20L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1),
      dest, None, Seq("id"))
    // superset evolution: a later append adds a column
    ManifestSink.statsAppend(
      (20L until 30L).map(i => (i, s"v$i", i * 1.5))
        .toDF("id", "v", "extra").coalesce(1),
      dest, None, Seq("id"))
    def handle() = ManifestSink.snapshotHandle(spark, dest)
    assert(handle().schemaOpt.map(_.fieldNames.toSeq)
      .contains(Seq("id", "v", "extra")))
    val viaLog = spark.read.format("graft").load(dest)
    assert(viaLog.schema.fieldNames.toSeq == Seq("id", "v", "extra"))
    assert(viaLog.where(col("extra").isNull).count() == 20L)
    // snapshot + checkpoint carries
    assert(ManifestSink.optimize(spark, dest, targetBytes = 1L << 30)
      > 0L)
    assert(handle().schemaOpt.map(_.fieldNames.toSeq)
      .contains(Seq("id", "v", "extra")))
    ManifestSink.statsAppend(
      (30L until 35L).map(i => (i, s"v$i", i * 1.5))
        .toDF("id", "v", "extra").coalesce(1),
      dest, None, Seq("id"))
    ManifestSink.checkpoint(spark, dest)
    assert(handle().schemaOpt.map(_.fieldNames.toSeq)
      .contains(Seq("id", "v", "extra")))
    // RESTORE to the pre-evolution version: `extra` must vanish
    ManifestSink.restore(spark, dest, 0L)
    assert(handle().schemaOpt.map(_.fieldNames.toSeq)
      .contains(Seq("id", "v")))
    assert(spark.read.format("graft").load(dest)
      .schema.fieldNames.toSeq == Seq("id", "v"))
    // legacy fallback: strip the schemaj lines from every manifest on
    // disk — resolution must return None and the relation must still
    // read correctly through the footer sweep
    val logDir = new java.io.File(s"$dest/_log")
    logDir.listFiles().filter(_.getName.endsWith(".manifest"))
      .foreach { mf =>
        val lines = java.nio.file.Files.readAllLines(mf.toPath)
        val kept = new java.util.ArrayList[String]()
        lines.forEach(l => if (!l.startsWith("schemaj\t")) kept.add(l))
        java.nio.file.Files.write(mf.toPath, kept)
      }
    ManifestSink.invalidateMfCache()
    assert(handle().schemaOpt.isEmpty)
    assert(spark.read.format("graft").load(dest)
      .schema.fieldNames.toSeq == Seq("id", "v"))
    assert(spark.read.format("graft").load(dest).count() == 20L)
  }
}
