package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

class DedupSpec extends SparkSpec {

  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"),  // near-dup of 0
    (2L, "THE  quick   brown fox jumps over the lazy dog"), // exact dup of 0 (normalized)
    (3L, "completely different text about spark engines and parquet files"),
    (4L, "ab")                                             // shorter than shingle width
  ).toDF("doc_id", "text")

  test("exact dedup groups by normalized fingerprint") {
    val groups = Dedup.exactDupGroups(docs).collect()
    assert(groups.length == 4) // 0 and 2 collapse
    val dupGroup = groups.find(_.getLong(2) == 2).get
    assert(dupGroup.getLong(1) == 0L) // keep_id = min
  }

  test("minhash signature is deterministic and NumHashes wide") {
    val sigs = Dedup.signatures(docs).select("doc_id", "sig")
      .as[(Long, Seq[Long])].collect().toMap
    assert(sigs(0L).length == Dedup.NumHashes)
    assert(sigs(0L) == sigs(2L)) // identical shingle sets → identical sig
    assert(sigs(0L) != sigs(3L))
  }

  test("LSH banding finds near-dups without all-pairs compare") {
    val pairs = Dedup.minhashDupPairs(docs, 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L))) // near-dup pair surfaces
    assert(pairs.contains((0L, 2L))) // exact dup too
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L)) // unrelated doc: no pair
  }

  test("exact jaccard confirms near-dup and scores identical docs 1.0") {
    val j = Dedup.jaccardDupPairs(docs, 0.1)
      .select("a_id", "b_id", "jaccard")
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(j((0L, 2L)) == 1.0)
    assert(j((0L, 1L)) > 0.5 && j((0L, 1L)) < 1.0)
  }

  test("simhash: identical docs distance 0, near-dups close, others far") {
    val sh = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("sh"))
      .as[(Long, Long)].collect().toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sh(0L), sh(2L)) == 0)
    assert(hamming(sh(0L), sh(1L)) < hamming(sh(0L), sh(3L)))
  }

  test("simhash block join returns pairs under the hamming cap") {
    val pairs = Dedup.simhashDupPairs(docs, maxHamming = 3)
      .select("a_id", "b_id", "hamming")
      .as[(Long, Long, Int)].collect()
    assert(pairs.exists(p => p._1 == 0L && p._2 == 2L && p._3 == 0))
  }

  test("wide 120-bit simhash: exact dups distance 0; 4x30-bit blocking is " +
      "COMPLETE for hamming <= 3 (equals brute force on a random fixture)") {
    val words = Array("red", "green", "blue", "cyan", "teal", "plum",
      "gold", "gray", "jade", "rust")
    val rnd = new scala.util.Random(9)
    // heavy word reuse drives simhashes close together -> real candidates
    val rdocs = (0L until 20L).map { i =>
      (i, Array.fill(8 + rnd.nextInt(5))(words(rnd.nextInt(4))).mkString(" "))
    } :+ (100L -> "the quick brown fox jumps over the lazy dog") :+
      (101L -> "THE  quick  brown fox jumps over the lazy dog")
    val df = rdocs.toDF("doc_id", "text")
    val got = Dedup.simhashWideDupPairs(df, maxHamming = 3)
      .select("a_id", "b_id", "hamming")
      .as[(Long, Long, Int)].collect()
    // normalized-identical docs agree on all 120 bits
    assert(got.exists(p => p._1 == 100L && p._2 == 101L && p._3 == 0))
    // completeness: blocked pairs == brute-force pairs at hamming <= 3
    val hashes = Dedup.simhashedWide(df)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val brute = (for {
      (ai, a1, a2) <- hashes; (bi, b1, b2) <- hashes if ai < bi
      d = java.lang.Long.bitCount(a1 ^ b1) + java.lang.Long.bitCount(a2 ^ b2)
      if d <= 3
    } yield (ai, bi, d)).toSet
    assert(got.toSet == brute)
    assert(brute.size >= 2) // fixture actually exercises the join
  }

  test("hammingDupPairs pigeonhole blocking is COMPLETE for every " +
      "nBlocks, incl. the formerly-degenerate counts (9, 12, 23, ...)") {
    // random 64-bit fingerprints plus planted near pairs at several
    // distances; completeness = blocked pairs equal brute force at every
    // tested maxHamming (these nBlocks values used to produce zero-width
    // trailing blocks under ceil-division offsets)
    val rnd = new scala.util.Random(17)
    def flip(h: Long, bits: Seq[Int]): Long =
      bits.foldLeft(h)((acc, b) => acc ^ (1L << b))
    val base = Seq.fill(12)(rnd.nextLong()).zipWithIndex
      .map { case (h, i) => (i.toLong, h) }
    val planted = base.take(4).flatMap { case (i, h) =>
      Seq((100L + i, flip(h, Seq.fill(8)(rnd.nextInt(64)).distinct)),
        (200L + i, flip(h, Seq.fill(22)(rnd.nextInt(64)).distinct)))
    }
    val all = base ++ planted
    val df = all.toDF("doc_id", "hash")
    for (maxH <- Seq(8, 11, 22, 30, 63)) {
      val got = Dedup.hammingDupPairs(df, maxHamming = maxH,
        hashCol = "hash")
        .select("a_id", "b_id", "hamming")
        .as[(Long, Long, Int)].collect().toSet
      val brute = (for {
        (ai, ah) <- all; (bi, bh) <- all if ai < bi
        d = java.lang.Long.bitCount(ah ^ bh) if d <= maxH
      } yield (ai, bi, d)).toSet
      assert(got == brute, s"maxHamming=$maxH (nBlocks=${maxH + 1})")
      assert(brute.nonEmpty, s"fixture must plant pairs at maxH=$maxH")
    }
  }

  test("representatives collapses exact-dup clusters to the min id") {
    val reps = Dedup.representatives(docs)
      .select("doc_id").as[Long].collect().toSet
    assert(reps == Set(0L, 1L, 3L, 4L)) // doc 2 collapses into doc 0
  }

  test("maxBucketSize drops degenerate buckets") {
    val cloned = docs.union(docs.withColumn("doc_id", col("doc_id") + 100))
      .union(docs.withColumn("doc_id", col("doc_id") + 200))
    val sigs = Dedup.signatures(cloned)
    val unbounded = Dedup.lshCandidatePairs(sigs).count()
    val capped = Dedup.lshCandidatePairs(sigs, maxBucketSize = 2).count()
    assert(capped < unbounded) // 3x-cloned docs exceed the cap and drop
  }

  test("short docs fall back to whole-text shingle") {
    val sigs = Dedup.signatures(docs).filter(col("doc_id") === 4L)
      .select("shingles").as[Seq[String]].head()
    assert(sigs == Seq("ab"))
  }

  test("sharedSpans finds the boilerplate window shared across distinct " +
      "docs; windowed hash matches the whole-doc rolling hash") {
    import graft.plans.TextHashExprs
    val boiler = "this license text is identical in every single document here"
    val spanDocs = Seq(
      (1L, s"$boiler plus unique tail alpha beta"),
      (2L, s"different head gamma delta $boiler"),
      (3L, "completely unrelated text with no shared spans at all in it " +
        "whatsoever today")
    ).toDF("doc_id", "text")
    val spans = Dedup.sharedSpans(spanDocs, w = 8, minDocs = 2)
      .select("span_hash", "n_docs", "n_occ")
      .as[(Long, Long, Long)].collect()
    // the 10-token boilerplate yields 3 shared 8-token windows, each in
    // docs 1 and 2 exactly once
    assert(spans.length == 3)
    assert(spans.forall { case (_, nd, no) => nd == 2 && no == 2 })
    // a w-window hash over the FULL token array equals RollingHashExpr of
    // exactly that slice (same seed/mod conventions)
    val th = spanDocs.filter(col("doc_id") === 3L)
      .select(TextHashExprs.md5Prefix60Array(
        graft.functions.TextAnalysis.tokens(col("text"))).as("th"))
    val windowed = th.select(
      TextHashExprs.windowedRollingHash(col("th"), 5).as("wh"),
      TextHashExprs.rollingHash(slice(col("th"), 1, 5)).as("first5"),
      size(col("th")).as("n"))
      .head()
    assert(windowed.getSeq[Long](0).length == windowed.getInt(2) - 4)
    assert(windowed.getSeq[Long](0).head == windowed.getLong(1))
    // sub-window docs produce no spans
    val tiny = Seq((1L, "a b c")).toDF("doc_id", "text")
    assert(Dedup.sharedSpans(tiny, w = 8).count() == 0)
  }

  test("contaminatedDocs flags corpus docs sharing a span with the probe " +
      "set, counts distinct shared spans once") {
    val bench = "what is the capital of france the answer is paris obviously"
    val corpus = Seq(
      (1L, s"some training document that quotes: $bench and continues on"),
      (2L, "a perfectly clean training document with original content only"),
      (3L, s"$bench $bench") // contaminated doc repeating the span
    ).toDF("doc_id", "text")
    val probes = Seq((100L, bench)).toDF("doc_id", "text")
    val got = Dedup.contaminatedDocs(corpus, probes, w = 8)
      .as[(Long, Long)].collect().toMap
    assert(got.keySet == Set(1L, 3L)) // doc 2 is clean
    // 11-token probe -> 4 distinct 8-token windows; doc 3's repetition
    // must not double-count (distinct spans per doc)
    assert(got(1L) == 4)
    assert(got(3L) >= 4)
  }

  test("contaminationFraction grades every spanned doc: shared/total, " +
      "clean docs report 0.0, short docs produce no row") {
    val bench = "what is the capital of france the answer is paris obviously"
    val corpus = Seq(
      (1L, s"some training document that quotes: $bench and continues on"),
      (2L, "a perfectly clean training document with original content only"),
      (4L, "too short for spans") // < 8 tokens -> no spans, no row
    ).toDF("doc_id", "text")
    val probes = Seq((100L, bench)).toDF("doc_id", "text")
    val got = Dedup.contaminationFraction(corpus, probes, w = 8)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got.keySet == Set(1L, 2L)) // doc 4 has no spans
    val (n1, s1, f1) = got(1L)
    assert(s1 == 4 && f1 == math.rint(4.0 / n1 * 1e6) / 1e6)
    assert(got(2L)._2 == 0L && got(2L)._3 == 0.0) // clean -> 0.0, present
    // the binary operator and the graded one agree on who is contaminated
    val flagged = Dedup.contaminatedDocs(corpus, probes, w = 8)
      .as[(Long, Long)].collect().toMap
    assert(got.filter(_._2._2 > 0).keySet == flagged.keySet)
    assert(got(1L)._2 == flagged(1L))
  }

  test("bloomContaminatedDocs is exactly contaminatedDocs (the confirm " +
      "join removes every bloom false positive)") {
    val bench = "what is the capital of france the answer is paris obviously"
    val corpus = Seq(
      (1L, s"some training document that quotes: $bench and continues on"),
      (2L, "a perfectly clean training document with original content only"),
      (3L, s"$bench $bench"),
      (4L, "another clean doc whose spans must survive a sloppy bloom " +
        "filter because the exact confirm join rejects false positives")
    ).toDF("doc_id", "text")
    val probes = Seq((100L, bench)).toDF("doc_id", "text")
    val exact = Dedup.contaminatedDocs(corpus, probes, w = 8)
      .as[(Long, Long)].collect().toMap
    // fpp = 0.4 makes false positives near-certain on the clean docs'
    // spans; output must still equal the exact operator bit-for-bit
    val bloom = Dedup.bloomContaminatedDocs(corpus, probes, w = 8,
      fpp = 0.4).as[(Long, Long)].collect().toMap
    assert(bloom == exact)
    assert(exact.keySet == Set(1L, 3L))
  }

  test("dupClusters: chain A~B, B~C merges into one cluster with min rep") {
    // the case greedy pair-drop gets wrong: A≁C directly, yet all three are
    // one component
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a_id", "b_id")
    val got = Dedup.dupClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("dupClusters: reliable checkpointDir gives the same clusters and " +
      "actually writes per-iteration checkpoints to the directory") {
    val dir = java.nio.file.Files.createTempDirectory("dupcc").toString
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("a_id", "b_id")
    // maxDriverEdges = 0 forces the distributed star iteration — the
    // checkpoint barrier is what this case tests
    val got = Dedup.dupClusters(pairs, checkpointDir = Some(dir),
        maxDriverEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
    // the barrier really used reliable storage, not executor blocks
    def rddFiles(p: java.io.File): Seq[java.io.File] =
      Option(p.listFiles()).toSeq.flatten
        .flatMap(f => if (f.isDirectory) rddFiles(f) else Seq(f))
    assert(rddFiles(new java.io.File(dir)).nonEmpty)
  }

  test("dupClusters: empty pair set yields empty assignment") {
    val empty = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    assert(Dedup.dupClusters(empty).isEmpty)
    assert(Dedup.dupClusters(empty).columns.toSeq ==
      Seq("doc_id", "cluster_rep"))
  }

  test("property: dupClusters matches union-find and is invariant under " +
      "edge order, direction, and duplication") {
    def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      parent.keys.map(k => k -> find(k)).toMap
    }
    (1 to 4).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      // sparse random graph over 40 nodes: many multi-node chains/components
      val edges = Seq.fill(30)(
        (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter(e => e._1 != e._2)
      val expected = unionFind(edges)
      // permute order, flip direction randomly, duplicate some edges
      val mangled = rnd.shuffle(edges ++ edges.take(8))
        .map(e => if (rnd.nextBoolean()) e.swap else e)
      // both execution paths must agree with union-find: the bounded
      // driver fast path (default cap) and the distributed star
      // iteration (cap 0)
      val gotFast = Dedup.dupClusters(mangled.toDF("a_id", "b_id"))
        .as[(Long, Long)].collect().toMap
      assert(gotFast == expected, s"seed=$seed (driver path)")
      val gotDist = Dedup.dupClusters(mangled.toDF("a_id", "b_id"),
          maxDriverEdges = 0L)
        .as[(Long, Long)].collect().toMap
      assert(gotDist == expected, s"seed=$seed (distributed path)")
    }
  }

  test("dupClusters iteration shuffles are (u, v)-slim: star steps emit " +
      "exactly the two long edge columns and exchange nothing wider") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("u", "v")
    Seq(Dedup.largeStar(edges), Dedup.smallStar(edges)).foreach { step =>
      // schema IS the shuffle payload: a frame of two longs cannot
      // exchange anything wider
      assert(step.schema.map(f => (f.name, f.dataType.simpleString)) ==
        Seq("u" -> "bigint", "v" -> "bigint"))
      val plan = step.queryExecution.executedPlan.toString
      // every hashpartitioning key in the plan is one of the two edge
      // endpoints — no payload column ever becomes a shuffle key either
      "hashpartitioning\\(([a-z]+)#".r.findAllMatchIn(plan).foreach(mm =>
        assert(Set("u", "v", "m", "mn").contains(mm.group(1)), plan))
    }
  }

  test("clusterSurvivors keeps exactly one doc per near-dup cluster") {
    // docs 0, 1, 2 chain into one cluster (0~1 near, 0~2 exact); survivor
    // must be the min id only — greedy pair-drop would also keep nothing
    // extra here, but the cluster path additionally names the rep
    val pairs = Dedup.jaccardDupPairs(docs, 0.5)
    val kept = Dedup.clusterSurvivors(docs, pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(0L, 3L, 4L))
  }

  test("property: incremental == restricted full recompute over random " +
      "corpora and random batch splits") {
    val words = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      // 24 docs with heavy phrase overlap so band collisions are plentiful
      val all = (0L until 24L).map { i =>
        val base = Array.fill(6 + rnd.nextInt(6))(words(rnd.nextInt(4)))
        val tail = Array.fill(rnd.nextInt(4))(words(rnd.nextInt(words.length)))
        (i, (base ++ tail).mkString(" "))
      }
      val isNew = all.map { case (id, _) => id -> rnd.nextBoolean() }.toMap
      val corpus = all.filterNot(d => isNew(d._1)).toDF("doc_id", "text")
      val batch = all.filter(d => isNew(d._1)).toDF("doc_id", "text")
      if (batch.count() > 0 && corpus.count() > 0) {
        val full = Dedup.lshCandidatePairs(
          Dedup.signatures(all.toDF("doc_id", "text")))
          .as[(Long, Long)].collect().toSet
        val expected = full.filter(p => isNew(p._1) || isNew(p._2))
        val inc = Dedup.incrementalCandidatePairs(
          Dedup.signatures(batch), Dedup.signatures(corpus))
          .as[(Long, Long)].collect().toSet
        assert(inc == expected, s"seed=$seed")
      }
    }
  }

  test("incremental candidate pairs == full recompute restricted to the " +
      "new batch (the per-ingest near-dedup contract)") {
    val corpus = docs // ids 0-4
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog today"), // near 0/1/2
      (11L, "entirely novel content with no relatives anywhere here at all"),
      (12L, "completely different text about spark engines and parquet files")
    ).toDF("doc_id", "text") // 12 is an exact dup of 3

    val full = Dedup.lshCandidatePairs(
      Dedup.signatures(corpus.unionByName(batch)))
      .as[(Long, Long)].collect().toSet
    val newIds = Set(10L, 11L, 12L)
    val touching = full.filter(p => newIds(p._1) || newIds(p._2))

    val inc = Dedup.incrementalCandidatePairs(
      Dedup.signatures(batch), Dedup.signatures(corpus))
      .as[(Long, Long)].collect().toSet
    assert(inc == touching)
    assert(inc.nonEmpty) // 12<->3 must collide at minimum

    // the verified-Jaccard form agrees with the batch recompute too
    val incJ = Dedup.incrementalJaccardDupPairs(batch, corpus, 0.8)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val fullJ = Dedup.jaccardDupPairs(corpus.unionByName(batch), 0.8)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
      .filter(p => newIds(p._1) || newIds(p._2))
    assert(incJ == fullJ)
    assert(incJ.contains((3L, 12L)))

    // the PERSISTED-INDEX form agrees as well, under its contract
    // corpusIndex == bandIndexRows(corpus) — and with pairs + jaccard
    // values, not just ids
    val idxJ = Dedup.incrementalJaccardDupPairsIndexed(
      batch, corpus, Dedup.bandIndexRows(corpus), 0.8)
      .select(col("a_id"), col("b_id"), round(col("jaccard"), 9))
      .as[(Long, Long, Double)].collect().toSet
    val incJFull = Dedup.incrementalJaccardDupPairs(batch, corpus, 0.8)
      .select(col("a_id"), col("b_id"), round(col("jaccard"), 9))
      .as[(Long, Long, Double)].collect().toSet
    assert(idxJ == incJFull)
    // index rows with extra docs NOT in the corpus payload (the
    // crash-between-index-and-corpus window) must not produce pairs that
    // fail verification — they drop at the payload join
    val idxWithOrphan = Dedup.bandIndexRows(corpus)
      .unionByName(Dedup.bandIndexRows(batch))
    val idxJ2 = Dedup.incrementalJaccardDupPairsIndexed(
      batch, corpus, idxWithOrphan, 0.8)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(idxJ2 == incJ)
  }

  test("segment dedup: first-wins keep/drop, remainder, NULL and empty text") {
    val segDocs = Seq(
      (0L, "a b c d e"),   // 3 segs at k=2: "a b", "c d", remainder "e"
      (1L, "a b x y"),     // "a b" is a cross-doc dup of (0,0) → removed
      (2L, "a b a b"),     // within-doc dup: BOTH copies lose to (0,0)
      (3L, null.asInstanceOf[String]), // NULL text → one "" segment, kept
      (4L, "")             // "" segment again → loses to (3,0)
    ).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSegments(segDocs, segTokens = 2,
      emitCleaned = true)
      .select("doc_id", "n_segs", "n_kept", "n_removed", "cleaned")
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(0L) == ((0L, 3L, 3L, 0L, "a b c d e")))
    assert(out(1L) == ((1L, 2L, 1L, 1L, "x y")))
    assert(out(2L) == ((2L, 2L, 0L, 2L, "")))  // all segments removed
    assert(out(3L) == ((3L, 1L, 1L, 0L, "")))  // NULL text: ONE phantom-free seg
    assert(out(4L) == ((4L, 1L, 0L, 1L, "")))
    // slim variant hashes the same reassembly it would have emitted
    val md5s = Dedup.removeDuplicateSegments(segDocs, segTokens = 2)
      .select("doc_id", "cleaned_md5").as[(Long, String)].collect().toMap
    import java.security.MessageDigest
    def md5hex(s: String) = MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(md5s(1L) == md5hex("x y"))
    assert(md5s(2L) == md5hex(""))
    // broadcast path is behavior-identical
    val bc = Dedup.removeDuplicateSegments(segDocs, segTokens = 2,
      broadcastDups = true)
      .select("doc_id", "n_kept").as[(Long, Long)].collect().toMap
    assert(bc == out.map { case (k, v) => k -> v._3 })
    intercept[IllegalArgumentException] {
      Dedup.segmentRows(segDocs, segTokens = 0)
    }
  }

  test("within-doc repetition removal: first occurrence survives, other " +
      "docs' segments are irrelevant, NULL text safe") {
    val segDocs = Seq(
      (0L, "a b c d a b"),  // k=2: [a b][c d][a b] → third seg removed
      (1L, "a b x y"),      // "a b" seen in doc 0 — IRRELEVANT here: kept
      (2L, "a b a b a b"),  // two repeats removed
      (3L, null.asInstanceOf[String]) // one "" segment, kept
    ).toDF("doc_id", "text")
    val out = Dedup.removeRepeatedSegments(segDocs, segTokens = 2)
      .select("doc_id", "n_segs", "n_kept", "n_removed", "cleaned_md5")
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    import java.security.MessageDigest
    def md5hex(s: String) = MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(0L) == ((0L, 3L, 2L, 1L, md5hex("a b c d"))))
    assert(out(1L) == ((1L, 2L, 2L, 0L, md5hex("a b x y"))))
    assert(out(2L) == ((2L, 3L, 1L, 2L, md5hex("a b"))))
    assert(out(3L) == ((3L, 1L, 1L, 0L, md5hex(""))))
    intercept[IllegalArgumentException] {
      Dedup.removeRepeatedSegments(segDocs, segTokens = -1)
    }
  }
}
