package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the TESTDATA.md layout: one parquet per table
  * under an sf directory. At cluster scale the same API points at a
  * partitioned table root; nothing here assumes single-file inputs.
  */
object Tables {
  val tpch: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val all: Seq[String] = tpch ++ Seq("events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
