package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-level memo of materialized intermediate frames shared across
  * queries — stats tables, verified near-dup pairs, minhash signatures.
  * Keyed by (session, sf dir, tag): a frame is built and cached once per
  * session and served to every consumer, the way an engine materializes
  * its statistics and signature tables once rather than per query.
  */
object Memo {
  private val frames =
    scala.collection.concurrent.TrieMap[(SparkSession, String, String), DataFrame]()

  def apply(spark: SparkSession, dir: String, tag: String)(
      build: => DataFrame): DataFrame =
    frames.getOrElseUpdate((spark, dir, tag), build.cache())
}
