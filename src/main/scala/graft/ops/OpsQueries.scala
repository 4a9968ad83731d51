package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Training-data pipeline operators (dedup, similarity, text analysis,
  * multimodal plumbing) — populated operator by operator. */
object OpsQueries {
  def all: Map[String, (SparkSession, String) => DataFrame] = Map()
  def oracles: Map[String, String] = Map()
}
