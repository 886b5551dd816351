package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual key-salting for joins whose skew exceeds what AQE's skew-join
  * splitting handles (AQE splits oversized partitions of sort-merge joins,
  * but a single hot KEY still lands in one task's hash bucket).
  *
  * The big side gets a deterministic per-row salt in [0, k); the small
  * side is replicated k times, once per salt value. The join key becomes
  * (key, salt), spreading a hot key over k tasks at the cost of k-fold
  * duplication of the small side — the classic trade.
  */
object SkewJoin {

  /** Inner equi-join of `big` and `small` on `key`, salted k ways.
    * Result columns = big.* ++ small.* minus the duplicate key (same as
    * `big.join(small, Seq(key))`).
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      k: Int): DataFrame = {
    require(k > 0, "salt factor must be positive")
    require(!big.columns.contains("_salt") && !small.columns.contains("_salt"),
      "inputs must not already have a _salt column")
    // The salt must spread a hot key's rows even when they are full
    // duplicates (hashing row content alone would give them all one salt),
    // and must stay stable across task retries (rand() would not):
    // monotonically_increasing_id is partition-offset based, so retries of
    // a deterministic input recompute the same ids.
    val salt = pmod(
      xxhash64(big.col(s"`$key`"), monotonically_increasing_id()),
      lit(k.toLong)).cast("int")
    val b = big.withColumn("_salt", salt)
    val s = small.withColumn("_salt",
      explode(sequence(lit(0), lit(k - 1))))
    b.join(s, Seq(key, "_salt")).drop("_salt")
  }
}
