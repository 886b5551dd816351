package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.Corpus

class CorpusSpec extends SparkSpec {

  import spark.implicits._

  test("packContexts: two-phase prefix sum equals the sequential pack") {
    // 9 docs, irregular lengths, contextLen 8 — spans single and multiple
    // chunks, exact-boundary fits, and an empty doc that must vanish
    val lens = Seq(3L, 8L, 1L, 0L, 13L, 5L, 2L, 16L, 4L)
    val docsDf = lens.zipWithIndex.map { case (n, i) =>
      (i.toLong, Seq.fill(n.toInt)("w").mkString(" "))
    }.toDF("doc_id", "text")
    val got = Corpus.packContexts(docsDf, contextLen = 8)
      .as[(Long, Long, Long)].collect().toSeq
    // sequential reference: walk docs in id order, fill chunks of 8
    var off = 0L
    val want = lens.zipWithIndex.filter(_._1 > 0).flatMap { case (n, i) =>
      val start = off; off += n
      (start / 8 to (start + n - 1) / 8).map { c =>
        (c, i.toLong,
          math.min((c + 1) * 8, start + n) - math.max(c * 8, start))
      }
    }.sortBy(r => (r._1, r._2))
    assert(got == want)
    // conservation: every token lands in exactly one chunk slot
    assert(got.map(_._3).sum == lens.sum)
    // no chunk over capacity
    val perChunk = got.groupBy(_._1).view.mapValues(_.map(_._3).sum)
    assert(perChunk.values.forall(_ <= 8))
    // all chunks except the last are exactly full
    val lastChunk = perChunk.keys.max
    assert(perChunk.filter(_._1 != lastChunk).values.forall(_ == 8))
  }

  test("property: packContexts conserves tokens and fills chunks for " +
      "random corpora") {
    val lensGen = Gen.listOfN(30, Gen.choose(0L, 20L))
    for (seed <- 0 until 10) {
      val lens = lensGen(Gen.Parameters.default, Seed(seed.toLong)).get
      val docsDf = lens.zipWithIndex.map { case (n, i) =>
        (i.toLong, Seq.fill(n.toInt)("x").mkString(" "))
      }.toDF("doc_id", "text")
      val got = Corpus.packContexts(docsDf, contextLen = 7)
        .as[(Long, Long, Long)].collect().toSeq
      assert(got.map(_._3).sum == lens.sum, s"seed=$seed lost tokens")
      val perChunk = got.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
      if (perChunk.nonEmpty) {
        val last = perChunk.keys.max
        assert(perChunk.filter(_._1 != last).values.forall(_ == 7),
          s"seed=$seed has an underfull non-final chunk")
        assert(perChunk.values.forall(_ <= 7), s"seed=$seed overfull chunk")
        assert(perChunk.keys.min == 0L)
      }
    }
  }

  test("materializeContexts emits the exact sequential packing: id " +
      "stream order, full contexts, short tail, empty docs skipped") {
    val docsDf = Seq(
      (1L, "a b c d e"), (2L, ""), (3L, "f g h"), (4L, "i j k l"),
      (5L, "   "), (6L, "m n")).toDF("doc_id", "text")
    val got = Corpus.materializeContexts(docsDf, contextLen = 4)
      .as[(Long, Long, String)].collect().toSeq
    // sequential reference: concat hashed tokens in doc order, chunk by 4
    def h(tok: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(tok.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val stream = Seq("a b c d e", "f g h", "i j k l", "m n")
      .flatMap(_.split("\\s+")).map(h)
    val want = stream.grouped(4).zipWithIndex.map { case (ids, i) =>
      (i.toLong, ids.size.toLong, ids.mkString(","))
    }.toSeq
    assert(got == want)
    assert(got.dropRight(1).forall(_._2 == 4) && got.last._2 == 2)
    // repartitioning must not change the stream (offsets are global)
    val re = Corpus.materializeContexts(docsDf.repartition(7), 4)
      .as[(Long, Long, String)].collect().toSeq
    assert(re == want)
  }

  test("mixtureSample keeps exactly the md5-threshold rows per stratum") {
    val docsDf = (0L until 400L)
      .map(i => (i, s"text $i", Seq("en", "fr", "zh", "de")(
        (i % 4).toInt), s"src${i % 3}"))
      .toDF("doc_id", "text", "lang", "source")
    val rates = Map("en" -> 0.9, "fr" -> 0.5, "zh" -> 0.25)
    val got = Corpus.mixtureSample(docsDf, rates, defaultRate = 0.1)
      .select("doc_id").as[Long].collect().toSet
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 1000000L
    }
    val want = (0L until 400L).filter { i =>
      val lang = Seq("en", "fr", "zh", "de")((i % 4).toInt)
      bucket(i) < math.round(rates.getOrElse(lang, 0.1) * 1e6)
    }.toSet
    assert(got == want)
    // rate ordering sanity: en keeps more than zh, de (default 0.1) least
    val byLang = docsDf.join(got.toSeq.toDF("doc_id"), Seq("doc_id"))
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byLang("en") > byLang("zh"))
    assert(byLang.getOrElse("de", 0L) <= byLang("zh"))
  }

  test("epochReplicate: floor(w) copies + md5-threshold extra; weight " +
      "< 1 degenerates to sampling; epochs are dense from 0") {
    val docsDf = (0L until 300L)
      .map(i => (i, s"text $i", Seq("en", "fr", "zh", "de")(
        (i % 4).toInt), "s"))
      .toDF("doc_id", "text", "lang", "source")
    val weights = Map("en" -> 2.5, "fr" -> 1.25, "zh" -> 0.5)
    val got = Corpus.epochReplicate(docsDf, weights)
      .select("doc_id", "epoch").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (id, rs) => id -> rs.map(_._2).sorted.toSeq }
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 1000000L
    }
    for (i <- 0L until 300L) {
      val lang = Seq("en", "fr", "zh", "de")((i % 4).toInt)
      val w = weights.getOrElse(lang, 1.0)
      val n = math.floor(w).toLong +
        (if (bucket(i) < math.round((w - math.floor(w)) * 1e6)) 1 else 0)
      if (n == 0) assert(!got.contains(i), s"doc $i should be dropped")
      else assert(got(i) == (0L until n), s"doc $i epochs")
    }
    // stable under repartitioning, like mixtureSample
    val a = Corpus.epochReplicate(docsDf, weights)
      .select("doc_id", "epoch").as[(Long, Long)].collect().toSet
    val b = Corpus.epochReplicate(docsDf.repartition(11), weights)
      .select("doc_id", "epoch").as[(Long, Long)].collect().toSet
    assert(a == b)
  }

  test("temperatureSample: alpha=1 keeps everything; alpha=0.5 keeps the " +
      "smallest group whole and thresholds match the sqrt formula exactly") {
    // skewed strata: 300/80/20
    val docsDf = ((0L until 300L).map(i => (i, "big")) ++
      (300L until 380L).map(i => (i, "mid")) ++
      (380L until 400L).map(i => (i, "small")))
      .toDF("doc_id", "lang")
    assert(Corpus.temperatureSample(docsDf, alpha = 1.0).count() == 400L)

    val got = Corpus.temperatureSample(docsDf, alpha = 0.5)
      .select("doc_id").as[Long].collect().toSet
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 1000000L
    }
    def thr(n: Long): Long =
      math.round(math.sqrt(20.0) / math.sqrt(n.toDouble) * 1e6)
    val want = (0L until 400L).filter { i =>
      val n = if (i < 300) 300L else if (i < 380) 80L else 20L
      bucket(i) < thr(n)
    }.toSet
    assert(got == want)
    // the smallest group keeps every doc (rate exactly 1.0)
    assert((380L until 400L).toSet.subsetOf(got))
    // expected-count ordering: kept counts scale ~ n^0.5 — big keeps
    // MORE docs than mid in absolute terms but a smaller fraction
    val keptBig = got.count(_ < 300L).toDouble / 300
    val keptMid = got.count(i => i >= 300 && i < 380).toDouble / 80
    assert(keptBig < keptMid)
    // deterministic and repartition-stable
    val again = Corpus.temperatureSample(docsDf.repartition(7), alpha = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(again == got)
    intercept[IllegalArgumentException] {
      Corpus.temperatureSample(docsDf, alpha = 0.0)
    }
  }

  test("mixtureSample is stable under repartitioning (no RNG state)") {
    val docsDf = (0L until 100L)
      .map(i => (i, "t", if (i % 2 == 0) "en" else "fr", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val a = Corpus.mixtureSample(docsDf, Map("en" -> 0.5), 0.3)
      .select("doc_id").as[Long].collect().toSet
    val b = Corpus.mixtureSample(docsDf.repartition(13), Map("en" -> 0.5), 0.3)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b)
  }

  test("weightedSample (A-ES): matches the exact reference selection " +
      "and order, favors heavy weights, excludes non-positive weights, " +
      "and is repartition-stable") {
    import org.apache.spark.sql.functions._
    def refU(id: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      ((java.lang.Long.parseLong(hex.substring(0, 15), 16) % 1000000L)
        + 0.5) / 1000000.0
    }
    // 500 light docs + 10 heavy ones; weight drives inclusion
    val rows = (0L until 500L).map(i => (i, 1.0)) ++
      (500L until 510L).map(i => (i, 5000.0)) ++
      Seq((900L, 0.0), (901L, -3.0)) // excluded
    val df = rows.toDF("doc_id", "w")
    val got = Corpus.weightedSample(df, "w", 25)
      .as[(Long, Long)].collect().toSeq
    val want = rows.filter(_._2 > 0)
      .map { case (id, w) => (math.log(refU(id)) / w, id) }
      .sortBy { case (key, id) => (-key, id) }
      .take(25).zipWithIndex
      .map { case ((_, id), i) => (i + 1L, id) }
    assert(got == want)
    // all 10 heavy docs made the top 25
    assert((500L until 510L).forall(id => got.exists(_._2 == id)))
    assert(!got.exists(r => r._2 == 900L || r._2 == 901L))
    // stable under repartitioning
    val again = Corpus.weightedSample(df.repartition(7), "w", 25)
      .as[(Long, Long)].collect().toSeq
    assert(again == got)
  }

  test("domainOf: registrable-domain cut — www and deep subdomains fall " +
      "away, multi-part ccTLD suffixes keep three labels, single-label " +
      "hosts pass through, garbage is null") {
    import org.apache.spark.sql.functions._
    val cases = Seq(
      ("https://www.example.com/a/b?q=1", "example.com"),
      ("http://example.com", "example.com"),
      ("https://news.bbc.co.uk/story", "bbc.co.uk"),
      ("https://www.news.bbc.co.uk/story", "bbc.co.uk"),
      ("https://a.b.c.example.com.au/x", "example.com.au"),
      ("https://EXAMPLE.Org/x", "example.org"),
      ("http://localhost:8080/x", "localhost"),
      ("https://co.uk/", "co.uk"),
      ("not a url at all", null),
      ("", null))
    val got = cases.map(_._1).toDF("url")
      .select(Corpus.domainOf(col("url")).as("d"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(got.toSeq == cases.map(_._2),
      got.toSeq.zip(cases).mkString("\n"))
  }

  test("perDomainCap equals the window-rank idiom; domainNotBlocked " +
      "gates by eTLD+1 and drops unparseable URLs by default") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // 60 docs over 7 domains incl. a hot one (0) with half the docs
    val rows = (0L until 60L).map { i =>
      val site = if (i % 2 == 0) 0L else 1L + (i % 7L) % 6L
      val sfx = Seq("com", "co.uk", "org")((i % 3L).toInt)
      (i, s"https://www.site$site.$sfx/p/$i", (i * 13L) % 41L)
    }
    val df = rows.toDF("doc_id", "url", "prio")
    val got = Corpus.perDomainCap(df, "url", cap = 3,
      priority = col("prio"))
      .select("domain", "rank", "doc_id")
      .as[(String, Long, Long)].collect().toSet
    val want = df
      .withColumn("domain", Corpus.domainOf(col("url")))
      .withColumn("rank", row_number().over(Window
        .partitionBy(col("domain"))
        .orderBy(col("prio").desc, col("doc_id"))).cast("long"))
      .where(col("rank") <= 3)
      .select("domain", "rank", "doc_id")
      .as[(String, Long, Long)].collect().toSet
    assert(got == want)

    val gated = df
      .unionByName(Seq((999L, "garbage", 0L))
        .toDF("doc_id", "url", "prio"))
      .where(Corpus.domainNotBlocked(col("url"),
        Seq("site0.com", "site0.co.uk", "site0.org")))
    val doms = gated.select(Corpus.domainOf(col("url"))).distinct()
      .as[String].collect().toSet
    assert(!doms.exists(_.startsWith("site0.")))
    assert(gated.where(col("doc_id") === 999L).count() == 0)
    // keepUnparseable admits the garbage row
    assert(df.unionByName(Seq((999L, "garbage", 0L))
        .toDF("doc_id", "url", "prio"))
      .where(Corpus.domainNotBlocked(col("url"), Seq("site0.com"),
        keepUnparseable = true))
      .where(col("doc_id") === 999L).count() == 1)
  }

  test("curateDocBatch(gate = domain blocklist): blocked-domain docs " +
      "never reach the corpus, and a replayed blocked doc stays out") {
    import org.apache.spark.sql.functions._
    import graft.streaming.StreamingIngest
    val root = tmpDir("corpusdom_")
    val corpusDir = s"$root/corpus"
    def batchDf(ids: Seq[Long]) = ids.map { i =>
      (i, s"unique document body number $i with enough words " +
        s"to never collide ${i * 7} ${i * 13}",
        s"https://www.site${i % 3}.co.uk/p/$i")
    }.toDF("doc_id", "text", "url")
    val gate = Corpus.domainNotBlocked(col("url"), Seq("site0.co.uk"))
    StreamingIngest.curateDocBatch(spark, batchDf(0L until 9L),
      corpusDir, None, gate = Some(gate))
    val kept = spark.read.parquet(corpusDir)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == (0L until 9L).filter(_ % 3 != 0).toSet)
    // replay of the same batch (at-least-once): content no-op
    StreamingIngest.curateDocBatch(spark, batchDf(0L until 9L),
      corpusDir, None, gate = Some(gate))
    assert(spark.read.parquet(corpusDir).count() == 6)
  }
}
