package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXACT distributed quantiles over an integer-valued column without a
  * global sort and without any task ever buffering the group's values.
  *
  * Why not the built-ins: Spark's exact `percentile` aggregate
  * accumulates EVERY value of the group into one aggregation buffer — a
  * corpus-wide p99 funnels n values through a single task (the
  * straggler/OOM shape [[TopK.TopKAgg]] exists to kill for top-k);
  * `approx_percentile` is estimate-only, so it can never hash-match a
  * cross-engine oracle. Sorting the column distributes fine but
  * shuffles the full value column to rank one element.
  *
  * This operator narrows by VALUE-DOMAIN HISTOGRAMS instead:
  *
  *   1. one slim aggregate for (count, min, max);
  *   2. histogram passes: each row maps to `(interval, (v - lo) >> k)`
  *      — power-of-two bucket widths keep the arithmetic exact integer
  *      and codegen-friendly — and a groupBy counts the ≤ intervals·B
  *      cells (partial map-side aggregation: the exchange carries cell
  *      counts, never rows). Each pass divides every unresolved rank's
  *      interval width by B = 2^14;
  *   3. one refine pass: exact per-value counts inside the final
  *      (≤ 2^16-wide) intervals — ≤ intervals · 2^16 slim rows, from
  *      which the ranked element is read off.
  *
  * Every pass is a full scan that shuffles kilobytes; for typical
  * curation columns (token counts, document lengths, byte sizes) the
  * range fits one histogram pass, so the whole computation is THREE
  * slim aggregates at any corpus size. Rank semantics are DuckDB
  * `quantile_disc`: the sorted multiset's 1-based element
  * `max(1, ceil(q·n))` — an actual input value, never an interpolation.
  *
  * Reference context: the reference delegates all analytics to its
  * warehouse (buzzware/bucket-to-bigquery readme.md:46); length-cutoff
  * selection over a 100 TB corpus is exactly where a sort-free exact
  * quantile earns its place.
  */
object Quantile {

  private val NBuckets = 1 << 14
  private val MaxRefineWidth = 1L << 16

  /** One interval of the narrowing state: values in [lo, hi], `below` =
    * exact count of input values < lo, `ranks` = the (q, 1-based global
    * rank) targets known to land inside. Intervals descend from one
    * shared bucket tree, so distinct intervals are always disjoint.
    */
  private final case class Iv(lo: Long, hi: Long, below: Long,
      ranks: List[(Double, Long)])

  /** Exact discrete quantiles of `valueCol` (cast to long, nulls
    * ignored) at the given fractions. Returns `(q, value)` in input
    * order of `qs`. Three-ish jobs total (see object doc); driver state
    * is bounded by `intervals × 2^14` histogram cells — never rows.
    */
  def quantilesDisc(df: DataFrame, valueCol: String,
      qs: Seq[Double]): Seq[(Double, Long)] = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      "quantile fractions must be in [0, 1]")
    // materialization barrier: the narrowing runs SEVERAL jobs over this
    // frame, and the rank bookkeeping (counts below each interval) is
    // only sound if every pass sees the same multiset — plus the
    // upstream plan (e.g. q105's corpus tokenize) evaluates once, not
    // once per pass. The frame is one long per row — slim at any scale.
    val base = df.select(col(valueCol).cast("long").as("v"))
      .where(col("v").isNotNull)
      .localCheckpoint(false)
    val h = base.agg(count(lit(1)), min(col("v")), max(col("v")),
      count(when(col("v") < 0, lit(1)))).head()
    val n = h.getLong(0)
    require(n > 0, "quantilesDisc over an empty input")
    val (mn, mx) = (h.getLong(1), h.getLong(2))

    def rankOf(q: Double): Long = math.max(1L, math.ceil(q * n).toLong)
    val allRanks = qs.map(q => (q, rankOf(q))).sortBy(_._2).toList
    // seed intervals: split at 0 when the data spans both signs, so every
    // interval's width stays < 2^63 and the hi - lo / shift arithmetic
    // can never overflow — the FULL long domain is supported. The
    // negative count rode the stats aggregate above (no extra scan).
    var ivs =
      if (mn < 0 && mx >= 0) {
        val nNeg = h.getLong(3)
        val (negR, posR) = allRanks.partition(_._2 <= nNeg)
        List(Iv(mn, -1L, 0L, negR), Iv(0L, mx, nNeg, posR))
          .filter(_.ranks.nonEmpty)
      } else List(Iv(mn, mx, 0L, allRanks))

    // CASE chain tagging each row with its (disjoint) interval index
    def iidExpr(intervals: List[Iv]): Column =
      intervals.zipWithIndex.foldLeft(lit(-1)) { case (e, (iv, i)) =>
        when(col("v").between(iv.lo, iv.hi), lit(i)).otherwise(e)
      }

    while (ivs.exists(iv => iv.hi - iv.lo >= MaxRefineWidth)) {
      // per-interval shift: smallest k with ≤ NBuckets buckets
      val shifts = ivs.map { iv =>
        var k = 0
        while (((iv.hi - iv.lo) >>> k) >= NBuckets) k += 1
        k
      }
      val bktExpr = ivs.zip(shifts).foldLeft(lit(-1L)) {
        case (e, (iv, k)) =>
          when(col("v").between(iv.lo, iv.hi),
            shiftright(col("v") - iv.lo, k)).otherwise(e)
      }
      val cells = base
        .select(iidExpr(ivs).as("iid"), bktExpr.as("b"))
        .where(col("iid") >= 0)
        .groupBy(col("iid"), col("b")).agg(count(lit(1)).as("c"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      ivs = ivs.zipWithIndex.flatMap { case (iv, i) =>
        val k = shifts(i)
        val hist = cells.iterator.filter(_._1 == i)
          .map(t => t._2 -> t._3).toMap
        var cum = iv.below
        var remaining = iv.ranks
        val children = List.newBuilder[Iv]
        for (b <- hist.keys.toSeq.sorted if remaining.nonEmpty) {
          val c = hist(b)
          val (inB, rest) = remaining.partition(_._2 <= cum + c)
          if (inB.nonEmpty) {
            val childLo = iv.lo + (b << k) // ≤ hi, cannot overflow
            // the +2^k upper edge CAN overflow on the last bucket of a
            // near-2^63-wide interval; a wrapped value lands below
            // childLo and means "clamp to the parent's hi"
            val rawHi = iv.lo + ((b + 1) << k) - 1
            val childHi =
              if (rawHi < childLo) iv.hi else math.min(iv.hi, rawHi)
            children += Iv(childLo, childHi, cum, inB)
          }
          cum += c
          remaining = rest
        }
        require(remaining.isEmpty,
          s"rank beyond histogram mass in [${iv.lo}, ${iv.hi}]")
        children.result()
      }
    }

    // refine: exact value counts inside the narrow intervals
    val vals = base
      .select(iidExpr(ivs).as("iid"), col("v"))
      .where(col("iid") >= 0)
      .groupBy(col("iid"), col("v")).agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val resolved = ivs.zipWithIndex.flatMap { case (iv, i) =>
      val counts = vals.filter(_._1 == i).map(t => (t._2, t._3))
        .sortBy(_._1)
      var cum = iv.below
      var remaining = iv.ranks
      val out = List.newBuilder[(Double, Long)]
      for ((v, c) <- counts if remaining.nonEmpty) {
        val (here, rest) = remaining.partition(_._2 <= cum + c)
        here.foreach { case (q, _) => out += ((q, v)) }
        cum += c
        remaining = rest
      }
      require(remaining.isEmpty,
        s"rank beyond refine mass in [${iv.lo}, ${iv.hi}]")
      out.result()
    }.toMap
    qs.map(q => (q, resolved(q)))
  }

  /** [[quantilesDisc]] as a `(q, value)` DataFrame — the `queries()`
    * surface (the collect inside is the bounded quantile set itself,
    * not data).
    */
  def quantileFrame(df: DataFrame, valueCol: String,
      qs: Seq[Double]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    quantilesDisc(df, valueCol, qs).toDF("q", "value")
  }

  /** [[quantilesDisc]] for DOUBLE-valued columns: values pass through
    * the order-preserving IEEE-754 bijection ([[TopK.sortableBits]] as
    * a codegen'd expression), the integer histogram narrowing runs
    * unchanged (≤ 4 passes over the full double domain — the sign-split
    * seed handles the bijection's full-range longs), and the chosen
    * element maps back BIT-EXACTLY — the result is an actual input
    * value, no epsilon, no interpolation. NaNs are excluded (no
    * portable cross-engine rank for them); ±0.0 keep IEEE bit order.
    */
  def quantilesDiscDouble(df: DataFrame, valueCol: String,
      qs: Seq[Double]): Seq[(Double, Double)] = {
    val base = df.select(col(valueCol).cast("double").as("d"))
      .where(col("d").isNotNull && !isnan(col("d")))
      .select(TopK.sortableBitsCol(col("d")).as("v"))
    quantilesDisc(base, "v", qs)
      .map { case (q, s) => (q, TopK.fromSortableBits(s)) }
  }

  /** PER-GROUP exact discrete quantiles (the per-language length-cutoff
    * shape), fully declarative — no driver loop, one plan:
    *
    *   1. `(group, value) → count` aggregation — the only row-bearing
    *      shuffle, carrying ≤ groups·|value domain| cells;
    *   2. cumulative-count window over each group's VALUE HISTOGRAM —
    *      the window partition holds a group's distinct values, never
    *      its rows, so a billion-row language costs its token-count
    *      domain (~10⁴ values) through one task, not 10⁹ rows (compare
    *      `percentile`, whose buffer holds every row's value);
    *   3. explode the quantile fractions and keep, per (group, q), the
    *      first histogram cell whose cumulative count reaches rank
    *      `max(1, ceil(q·n))` — same DuckDB `quantile_disc` semantics
    *      as [[quantilesDisc]].
    *
    * Returns one `(group, q, value)` row per group × fraction. Suits
    * bounded integer domains (lengths, counts, sizes); for unbounded
    * domains use [[quantilesDisc]] per partition of interest.
    */
  // -------------------------------------------------- grouped narrowing

  private val NBucketsG = 1 << 12
  private val MaxRefineWidthG = 1L << 12

  /** [[Iv]] with its group key (groups narrow independently but share
    * every scan — one job per pass covers ALL groups' intervals).
    */
  private final case class GIv(gs: String, lo: Long, hi: Long, below: Long,
      ranks: List[(Double, Long)])

  /** The shared grouped-narrowing engine: per-group exact discrete
    * quantiles over the FULL long domain, returning one
    * `(original group value, q, selected long)` row per group×fraction.
    *
    * Same histogram narrowing as [[quantilesDisc]], generalized so the
    * interval state is keyed by group:
    *   - stats and every histogram pass are `(group, cell)` aggregations
    *     — map-side partial combine, the exchange carries cell counts,
    *     never rows, and NO task ever holds a group's values (compare
    *     [[groupedQuantilesDisc]], whose cumulative window puts a
    *     group's whole distinct-value set through one task — fine for
    *     bounded integer domains, degenerate for continuous ones where
    *     distinct ≈ n);
    *   - rows find their interval through a BROADCAST equi-join on the
    *     group plus a range filter (the interval table is at most
    *     groups × fractions rows — KBs);
    *   - driver state is bounded by groups × fractions × 2^12 cells per
    *     pass. Group cardinality must be bounded (languages, sources,
    *     event types — not user ids); guarded at 2^16 groups.
    */
  private def groupedNarrow(df: DataFrame, groupCol: String,
      valueCol: String, qs: Seq[Double]): Seq[(Any, Double, Long)] = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      "quantile fractions must be in [0, 1]")
    val spark = df.sparkSession
    import spark.implicits._

    val base = df
      .select(col(groupCol).cast("string").as("gs"), col(groupCol).as("g"),
        col(valueCol).cast("long").as("v"))
      .where(col("gs").isNotNull && col("v").isNotNull)
      .localCheckpoint(false)

    val stats = base.groupBy(col("gs"))
      .agg(first(col("g")).as("g"), count(lit(1)).as("n"),
        min(col("v")).as("mn"), max(col("v")).as("mx"),
        count(when(col("v") < 0, lit(1))).as("neg"))
      .collect()
    if (stats.isEmpty) return Seq.empty
    require(stats.length <= (1 << 16),
      s"groupedNarrow: ${stats.length} groups — driver interval state is " +
        "per-group; use a bounded-cardinality group column")
    val gOrig: Map[String, Any] =
      stats.map(r => r.getString(0) -> r.get(1)).toMap

    var ivs: List[GIv] = stats.toList.flatMap { r =>
      val gs = r.getString(0)
      val n = r.getLong(2)
      val (mn, mx) = (r.getLong(3), r.getLong(4))
      val ranks = qs.map(q => (q, math.max(1L, math.ceil(q * n).toLong)))
        .sortBy(_._2).toList
      // sign-split seed: keeps every interval narrower than 2^63 so the
      // width/shift arithmetic cannot overflow (full long domain OK)
      if (mn < 0 && mx >= 0) {
        val nNeg = r.getLong(5)
        val (negR, posR) = ranks.partition(_._2 <= nNeg)
        List(GIv(gs, mn, -1L, 0L, negR), GIv(gs, 0L, mx, nNeg, posR))
          .filter(_.ranks.nonEmpty)
      } else List(GIv(gs, mn, mx, 0L, ranks))
    }

    // one job covering every listed interval: broadcast the interval
    // table, route rows by (group equi-join + disjoint range filter),
    // count (interval, cell) pairs
    def cellCounts(spec: Seq[(String, Int, Long, Long, Long)],
        cell: Column): Array[(Int, Long, Long)] = {
      val specDf = spec.toDF("gs", "iid", "lo", "hi", "w")
      base.join(broadcast(specDf), Seq("gs"))
        .where(col("v").between(col("lo"), col("hi")))
        .select(col("iid"), cell.as("b"))
        .groupBy(col("iid"), col("b")).agg(count(lit(1)).as("c"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    }

    while (ivs.exists(iv => iv.hi - iv.lo >= MaxRefineWidthG)) {
      val (active, settled) =
        ivs.partition(iv => iv.hi - iv.lo >= MaxRefineWidthG)
      val shifts = active.map { iv =>
        var k = 0
        while (((iv.hi - iv.lo) >>> k) >= NBucketsG) k += 1
        k
      }
      val spec = active.zipWithIndex.map { case (iv, i) =>
        (iv.gs, i, iv.lo, iv.hi, 1L << shifts(i))
      }
      // (v - lo) div w == (v - lo) >> k: exact nonneg integer arithmetic
      val byIid = cellCounts(spec, expr("(v - lo) div w"))
        .groupBy(_._1)
      val children = active.zipWithIndex.flatMap { case (iv, i) =>
        val k = shifts(i)
        val hist = byIid.getOrElse(i, Array.empty)
          .map(t => t._2 -> t._3).toMap
        var cum = iv.below
        var remaining = iv.ranks
        val out = List.newBuilder[GIv]
        for (b <- hist.keys.toSeq.sorted if remaining.nonEmpty) {
          val c = hist(b)
          val (inB, rest) = remaining.partition(_._2 <= cum + c)
          if (inB.nonEmpty) {
            val childLo = iv.lo + (b << k)
            // +2^k upper edge can wrap on a near-2^63 interval's last
            // bucket; a wrapped value means "clamp to the parent's hi"
            val rawHi = iv.lo + ((b + 1) << k) - 1
            val childHi =
              if (rawHi < childLo) iv.hi else math.min(iv.hi, rawHi)
            out += GIv(iv.gs, childLo, childHi, cum, inB)
          }
          cum += c
          remaining = rest
        }
        require(remaining.isEmpty,
          s"rank beyond histogram mass (group ${iv.gs})")
        out.result()
      }
      ivs = settled ++ children
    }

    // refine: exact per-value counts inside the (narrow) intervals
    val spec = ivs.zipWithIndex.map { case (iv, i) =>
      (iv.gs, i, iv.lo, iv.hi, 1L)
    }
    val byIid = cellCounts(spec, col("v")).groupBy(_._1)
    ivs.zipWithIndex.flatMap { case (iv, i) =>
      val counts = byIid.getOrElse(i, Array.empty)
        .map(t => (t._2, t._3)).sortBy(_._1)
      var cum = iv.below
      var remaining = iv.ranks
      val out = List.newBuilder[(Any, Double, Long)]
      for ((v, c) <- counts if remaining.nonEmpty) {
        val (here, rest) = remaining.partition(_._2 <= cum + c)
        here.foreach { case (q, _) => out += ((gOrig(iv.gs), q, v)) }
        cum += c
        remaining = rest
      }
      require(remaining.isEmpty,
        s"rank beyond refine mass (group ${iv.gs})")
      out.result()
    }
  }

  private def groupedFrame(spark: org.apache.spark.sql.SparkSession,
      gField: org.apache.spark.sql.types.StructField,
      valueType: org.apache.spark.sql.types.DataType,
      rows: Seq[org.apache.spark.sql.Row])
      : DataFrame = {
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    // the value type is declared by the CALLER (long-domain vs mapped-back
    // double), never sniffed from the first row: sniffing made an
    // empty/all-null input come back LongType from the double variant —
    // schema-inconsistent with the non-empty case, breaking downstream
    // unions
    spark.createDataFrame(rows.asJava, StructType(Seq(
      gField, StructField("q", DoubleType, nullable = false),
      StructField("value", valueType, nullable = false))))
  }

  /** PER-GROUP [[quantilesDisc]] over the full long domain — the
    * continuous/unbounded-domain grouped shape (see [[groupedNarrow]]).
    * Returns `(group, q, value)`, group in its original type.
    */
  def groupedQuantilesDiscLong(df: DataFrame, groupCol: String,
      valueCol: String, qs: Seq[Double]): DataFrame =
    groupedFrame(df.sparkSession, df.schema(groupCol).copy(name = groupCol),
      org.apache.spark.sql.types.LongType,
      groupedNarrow(df, groupCol, valueCol, qs)
        .map(t => org.apache.spark.sql.Row(t._1, t._2, t._3)))

  /** PER-GROUP [[quantilesDiscDouble]]: doubles ride the
    * order-preserving IEEE-754 bijection through [[groupedNarrow]] and
    * map back BIT-EXACTLY — each result is an actual input value of its
    * group, no interpolation (DuckDB `quantile_disc … GROUP BY`
    * semantics). NaNs excluded, nulls ignored.
    */
  def groupedQuantilesDiscDouble(df: DataFrame, groupCol: String,
      valueCol: String, qs: Seq[Double]): DataFrame = {
    val d = col(valueCol).cast("double")
    val base = df
      .where(d.isNotNull && !isnan(d))
      .select(col(groupCol), TopK.sortableBitsCol(d).as("__bits"))
    groupedFrame(df.sparkSession, df.schema(groupCol).copy(name = groupCol),
      org.apache.spark.sql.types.DoubleType,
      groupedNarrow(base, groupCol, "__bits", qs)
        .map(t => org.apache.spark.sql.Row(
          t._1, t._2, TopK.fromSortableBits(t._3))))
  }

  def groupedQuantilesDisc(df: DataFrame, groupCol: String,
      valueCol: String, qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      "quantile fractions must be in [0, 1]")
    import org.apache.spark.sql.expressions.Window
    val counts = df
      .select(col(groupCol).as("g"), col(valueCol).cast("long").as("v"))
      .where(col("v").isNotNull)
      .groupBy(col("g"), col("v")).agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("g"))
    counts
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n", sum(col("c")).over(wAll))
      .select(col("g"), col("v"), col("cum"), col("n"),
        explode(array(qs.map(lit(_)): _*)).as("q"))
      .withColumn("rank",
        greatest(lit(1L), ceil(col("q") * col("n"))))
      .where(col("cum") >= col("rank"))
      .groupBy(col("g"), col("q")).agg(min(col("v")).as("value"))
      .select(col("g").as(groupCol), col("q"), col("value"))
  }
}
