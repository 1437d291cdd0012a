package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-column statistics — the DataFrame-stats substitute for the
  * reference's learned density models (BASELINE "spark_approach": MLlib +
  * DataFrame stats; reference per-column metadata lives in
  * scardina/common.py:85 set_dist / datasets.py:223-253).
  *
  * All of these are single-pass `groupBy`-free or one-shuffle aggregations
  * with map-side partial agg; stats outputs are tiny (O(columns) or
  * O(ndv)) and are meant to be broadcast to estimators at scale.
  */
object Stats {

  /** count / nulls / exact ndv / min / max for one column. Numeric min/max
    * surface as doubles, string min/max as strings — never cross-cast
    * (engine-specific float formatting would break oracle parity).
    */
  def colStats(df: DataFrame, colName: String, isNumeric: Boolean, label: String): DataFrame = {
    val c = col(colName)
    val base = df.agg(
      count(lit(1)).as("cnt"),
      sum(when(c.isNull, 1L).otherwise(0L)).as("nulls"),
      count_distinct(c).as("ndv"),
      min(c).as("__min"),
      max(c).as("__max"))
    val (minNum, maxNum, minStr, maxStr) =
      if (isNumeric)
        (col("__min").cast("double"), col("__max").cast("double"),
          lit(null).cast("string"), lit(null).cast("string"))
      else
        (lit(null).cast("double"), lit(null).cast("double"),
          col("__min").cast("string"), col("__max").cast("string"))
    base.select(
      lit(label).as("col_name"), col("cnt"), col("nulls"), col("ndv"),
      minNum.as("min_num"), maxNum.as("max_num"),
      minStr.as("min_str"), maxStr.as("max_str"))
  }

  /** Distribution-skew profile of one column — the Spark-exact stand-in
    * for the reference's entropy profiling hook (run.py:45 calc_entropy).
    * Shannon entropy needs float logs whose last-ulp behavior is
    * engine-specific, so the profile reports exact-rational skew
    * statistics instead: collision probability Σc(c−1)/(n(n−1))
    * (the Rényi-2 / Simpson index — 1/ndv for uniform, →1 for
    * single-value) and the modal share max(c)/n. One keyed count plus a
    * tiny aggregation; the pair sum runs in DECIMAL(38,0) so it cannot
    * overflow at any corpus size.
    */
  def skewProfile(df: DataFrame, colName: String, label: String): DataFrame = {
    val counts = df
      .filter(col(colName).isNotNull)
      .groupBy(col(colName))
      .agg(count(lit(1)).as("__c"))
    counts
      .agg(
        sum(col("__c")).as("n"),
        count(lit(1)).as("ndv"),
        max(col("__c")).as("__mx"),
        sum((col("__c") * (col("__c") - 1L)).cast("decimal(38,0)")).as("__pairs"))
      .select(
        lit(label).as("col_name"), col("n"), col("ndv"),
        (col("__pairs").cast("double") / col("n").cast("double") /
          (col("n") - 1L).cast("double")).as("collision_prob"),
        (col("__mx").cast("double") / col("n").cast("double")).as("top_share"))
  }

  /** Equi-width histogram with `bins` buckets; the top edge closes into
    * the last bucket (LEAST(..., bins-1)), mirroring the SQL oracle
    * expression exactly so double arithmetic matches bit-for-bit.
    */
  def histogram(df: DataFrame, colName: String, bins: Int, label: String): DataFrame = {
    val c = col(colName).cast("double")
    val stats = df.agg(
      min(c).cast("double").as("__mn"),
      max(c).cast("double").as("__mx"))
    df.select(c.as("__v"))
      .crossJoin(broadcast(stats))
      .withColumn(
        "bucket",
        least(
          floor((col("__v") - col("__mn")) * lit(bins.toDouble) / (col("__mx") - col("__mn"))),
          lit((bins - 1).toLong)))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .select(lit(label).as("col_name"), col("bucket"), col("cnt"))
  }

  /** Top-k most common values with a deterministic tie-break on the value
    * itself (cnt desc, value asc) — ties otherwise make MCV lists
    * engine-dependent.
    */
  def mcv(df: DataFrame, colName: String, k: Int, label: String): DataFrame = {
    val counted = df
      .filter(col(colName).isNotNull)
      .groupBy(col(colName).cast("string").as("val"))
      .agg(count(lit(1)).as("cnt"))
    // orderBy+limit compiles to TakeOrderedAndProject — a distributed
    // per-partition top-k + tiny driver merge. A row_number window here
    // would funnel ALL ndv rows through one partition; ranking only runs
    // over the k survivors.
    val top = counted.orderBy(col("cnt").desc, col("val")).limit(k)
    top
      .withColumn("rnk", row_number().over(Window.orderBy(col("cnt").desc, col("val"))))
      .select(lit(label).as("col_name"), col("val"), col("cnt"), col("rnk"))
  }

  /** Bucket of value v in count-min-sketch row d: the first two hex
    * digits of md5("d:v"), i.e. a uniform value in [0, 256). md5 is the
    * portable hash family — DuckDB computes the identical hex, so the
    * oracle rebuilds the exact same sketch.
    */
  def cmsBucket(d: Int, v: Column): Column =
    conv(substring(md5(concat(lit(s"$d:"), v.cast("string"))), 1, 2), 16, 10).cast("long")

  /** The same bucket computed driver-side for probe literals. */
  def cmsBucketOf(d: Int, v: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$d:$v".getBytes("UTF-8")).take(1).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex, 16)
  }

  /** Count-min-sketch counters (d, bucket, cnt) for one column: one
    * posexplode pass (depth rows per input row) + one groupBy that
    * map-side-combines down to at most depth×256 cells per partition
    * before the shuffle — the sketch build stays one bounded-output
    * shuffle no matter the input size.
    */
  def cmsCounters(df: DataFrame, colName: String, depth: Int): DataFrame =
    df.select(
        posexplode(array((0 until depth).map(d => cmsBucket(d, col(colName))): _*))
          .as(Seq("d", "bucket")))
      .groupBy(col("d"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** HLL++ approximate ndv next to the exact count (impl-specific sketch →
    * rows-only oracle).
    */
  def hllNdv(df: DataFrame, colName: String, label: String): DataFrame =
    df.agg(
        approx_count_distinct(col(colName)).as("approx_ndv"),
        count_distinct(col(colName)).as("exact_ndv"))
      .select(
        lit(label).as("col_name"), col("approx_ndv"), col("exact_ndv"),
        (abs(col("approx_ndv") - col("exact_ndv")).cast("double") /
          col("exact_ndv").cast("double")).as("rel_err"))
}
