package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** North-star extension queries (dedup, similarity search, text analysis,
  * multimodal) — populated module by module; see operators/ and functions/.
  */
object NorthStar {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  def oracles: Map[String, String] = Map()
}
