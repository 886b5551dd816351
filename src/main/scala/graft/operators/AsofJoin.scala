package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the most recent right row with
  * `right.ts <= left.ts` within the same key group — the canonical
  * time-series alignment operator (sensor channels, trades/quotes), which
  * Spark has no native join type for (SURVEY §2.3).
  *
  * Implementation is the union+window pattern rather than an inequality
  * join: tag both sides, union, sort within key groups by (ts, side), and
  * carry the last-seen right-side values forward with
  * `last_value(..., ignoreNulls)`. One shuffle on the key columns, one
  * sort — no range explosion, no per-row binary search, and skew is
  * handled by AQE like any other keyed shuffle. At 100 TB this is the
  * plan you want: the alternative inequality-join forms either
  * cross-product within key groups or need interval bucketing.
  *
  * Right-side ties on ts: pre-aggregate the right side to unique
  * (key, ts) rows first (callers own that choice of aggregate) — then the
  * result is deterministic and matches DuckDB's native ASOF JOIN, which
  * the oracle uses.
  */
object AsofJoin {

  /** @param left      left frame
    * @param right     right frame, unique per (keyCols, tsCol)
    * @param keyCols   equality keys
    * @param tsCol     event-time column name (same name both sides)
    * @param valueCols right columns to carry (exposed as-is; right ts is
    *                  exposed as `asof_ts`)
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // side marker: right rows sort BEFORE left rows at equal ts, so a
    // right row at exactly left.ts is visible to it (<= semantics)
    val l = left
      .withColumn("_side", lit(1))
      .withColumn("_r_ts", lit(null).cast(left.schema(tsCol).dataType))
      .select((leftCols.map(col) ++
        Seq(col("_side"), col("_r_ts")) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"_rv_$c"))): _*)
    val r = right
      .withColumn("_side", lit(0))
      .withColumn("_r_ts", col(tsCol))
      .select((leftCols.map(c =>
        if (c == tsCol || keyCols.contains(c)) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col("_side"), col("_r_ts")) ++
        valueCols.map(c => col(c).as(s"_rv_$c"))): _*)
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    require(valueCols.forall(!leftCols.contains(_)),
      "valueCols must not collide with left column names")
    val carried = valueCols.foldLeft(
      l.unionByName(r)
        .withColumn("asof_ts", last(col("_r_ts"), ignoreNulls = true).over(w))
    ) { (df, c) =>
      df.withColumn(c, last(col(s"_rv_$c"), ignoreNulls = true).over(w))
    }
    carried
      .filter(col("_side") === 1)
      .select((leftCols :+ "asof_ts") ++ valueCols map col: _*)
  }
}
