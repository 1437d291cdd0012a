package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface mirroring the reference's dataset IO
  * (reference: scardina/datasets.py:90 pd.read_csv per table,
  * :115/:221 pickle caches of prepared intermediates).
  *
  * Spark-first: CSV reads take an EXPLICIT schema (no inferSchema scan —
  * at 100 TB a schema-inference pass is a full extra read), and the
  * pickle-cache pattern becomes materialize-to-parquet: columnar,
  * splittable, predicate-pushdown-friendly.
  */
object Sources {

  /** Schema'd CSV read: header respected, no inference pass. */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      .schema(schema)
      .csv(path)

  /** Parquet table (file or partitioned directory root). */
  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Schema'd JSON-lines read — the de-facto interchange format of
    * training-data pipelines. Explicit schema for the same reason as CSV:
    * inference is a full extra pass, and a drifting inferred type (a
    * numeric field that is sometimes a string) silently corrupts
    * downstream plans at scale.
    */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** JSON-lines write (one object per line, splittable downstream). */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** ORC table read — the other columnar interchange format Spark ships
    * natively (predicate pushdown + column pruning like parquet).
    */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** ORC write. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Write a parquet table, optionally hive-partitioned by low-cardinality
    * columns so downstream filters prune whole directories.
    */
  def writeParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** Bucketed parquet table: co-locates rows by hash(bucketCol) at WRITE
    * time, so equi-joins and aggregations on that column need no shuffle
    * at read time — the co-located-join scale path for repeated big-table
    * joins (e.g. orders⋈customer on custkey at 100 TB).
    */
  def writeBucketed(
      df: DataFrame,
      tableName: String,
      path: String,
      bucketCol: String,
      numBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .option("path", path)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(tableName)

  /** The reference's prepare-once/cache pattern (datasets.py:207-221):
    * build `df` only if `path` does not already hold a materialized copy,
    * then always read back from parquet so downstream plans scan the
    * columnar cache instead of recomputing the pipeline.
    */
  def materialized(spark: SparkSession, path: String)(build: => DataFrame): DataFrame = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path).resolve("/"), spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(path)
    if (!fs.exists(p)) build.write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
  }
}
