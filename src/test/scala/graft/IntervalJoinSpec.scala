package graft

import org.apache.spark.sql.functions._

import graft.operators.IntervalJoin

/** The bucketed overlap join must return EXACTLY the pairs the naive
  * theta-join returns — once each — across boundary-touching, nested,
  * zero-width, negative, and bucket-straddling intervals, at every
  * bucket width. The brute-force crossJoin is the oracle.
  */
class IntervalJoinSpec extends SparkSpec {

  import spark.implicits._

  // deterministic adversarial mix: random spans at several scales,
  // negatives, zero-width points, exact-boundary touches
  private def mkIntervals(seed: Int, n: Int, prefix: String) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val s = rnd.nextInt(4000) - 500L
      val w = rnd.nextInt(4) match {
        case 0 => 0L                    // point
        case 1 => rnd.nextInt(8).toLong // short
        case 2 => rnd.nextInt(100).toLong
        case _ => rnd.nextInt(700).toLong // multi-bucket straddler
      }
      (i.toLong, s, s + w)
    }.toDF(s"${prefix}id", s"${prefix}s", s"${prefix}e")
  }

  test("overlap join == brute force, each pair exactly once, across " +
      "bucket widths") {
    val l = mkIntervals(11, 400, "l")
    val r = mkIntervals(23, 300, "r")
    val want = l.crossJoin(r)
      .where(col("ls") <= col("re") && col("rs") <= col("le"))
      .select("lid", "rid").as[(Long, Long)].collect().toSeq.sorted
    assert(want.nonEmpty && want.size < 400L * 300L)
    for (w <- Seq(16L, 64L, 1024L)) {
      val got = IntervalJoin.overlapJoin(l, "ls", "le", r, "rs", "re", w)
        .select("lid", "rid").as[(Long, Long)].collect().toSeq
      assert(got.sorted == want, s"width $w")
      assert(got.distinct.size == got.size, s"width $w emitted dupes")
    }
  }

  test("inclusive bounds: end-touches-start IS an overlap; disjoint by " +
      "one is not; start > end rows are empty intervals and drop out") {
    val l = Seq((1L, 0L, 10L), (2L, 50L, 40L)).toDF("lid", "ls", "le")
    val r = Seq((1L, 10L, 20L), (2L, 11L, 20L), (3L, -5L, 0L),
      (4L, 45L, 60L)).toDF("rid", "rs", "re")
    val got = IntervalJoin.overlapJoin(l, "ls", "le", r, "rs", "re", 8L)
      .select("lid", "rid").as[(Long, Long)].collect().toSeq.sorted
    // lid=1 touches rid=1 at 10 and rid=3 at 0; rid=2 misses by one;
    // lid=2 is inverted (empty) so never matches rid=4
    assert(got == Seq((1L, 1L), (1L, 3L)))
  }

  test("guards: non-power-of-two width, column collision, and the " +
      "pathological-interval explode cap fail loudly") {
    val l = Seq((1L, 0L, 10L)).toDF("lid", "ls", "le")
    val r = Seq((1L, 0L, 10L)).toDF("rid", "rs", "re")
    intercept[IllegalArgumentException] {
      IntervalJoin.overlapJoin(l, "ls", "le", r, "rs", "re", 48L)
    }
    intercept[IllegalArgumentException] {
      IntervalJoin.overlapJoin(l, "ls", "le",
        r.withColumnRenamed("rid", "lid"), "rs", "re", 64L)
    }
    val giant = Seq((1L, 0L, 1L << 40)).toDF("lid", "ls", "le")
    val err = intercept[Exception] {
      IntervalJoin.overlapJoin(giant, "ls", "le", r, "rs", "re", 64L,
        maxBucketsPerInterval = 1000).count()
    }
    assert(err.getMessage != null)
  }
}
