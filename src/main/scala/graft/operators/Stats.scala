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

  /** Joint equi-width histogram over two numeric columns — the
    * correlation-aware statistic the per-column histograms cannot give
    * an estimator (the reference's learned models capture exactly this
    * joint structure). Same LEAST/floor bucket expression as the 1-D
    * histogram on each axis; one scan + one keyed count.
    */
  def hist2d(df: DataFrame, colA: String, colB: String, bins: Int, label: String): DataFrame = {
    val (a, b) = (col(colA).cast("double"), col(colB).cast("double"))
    val stats = df.agg(
      min(a).as("__mna"), max(a).as("__mxa"),
      min(b).as("__mnb"), max(b).as("__mxb"))
    def bucket(v: Column, mn: Column, mx: Column): Column =
      least(floor((v - mn) * lit(bins.toDouble) / (mx - mn)), lit((bins - 1).toLong))
    df.select(a.as("__a"), b.as("__b"))
      .crossJoin(broadcast(stats))
      .groupBy(
        bucket(col("__a"), col("__mna"), col("__mxa")).as("bucket_a"),
        bucket(col("__b"), col("__mnb"), col("__mxb")).as("bucket_b"))
      .agg(count(lit(1)).as("cnt"))
      .select(lit(label).as("col_pair"), col("bucket_a"), col("bucket_b"), col("cnt"))
  }

  /** Pearson correlation of column pairs with EXACT integer moment sums:
    * values are quantized once to integer units (⌊v·scale + 0.5⌋ — the
    * same double op in every engine), so Σx, Σxy, Σx² are exact integers
    * (associative — partition order cannot perturb them) and the final
    * fixed-order double formula matches the oracle bit-for-bit. Pearson
    * correlation is invariant under the positive scaling. One scan
    * computes every pair's moments at once; element products stay within
    * BIGINT while the sums accumulate in DECIMAL(38,0).
    */
  def corrMatrix(df: DataFrame, cols: Seq[String], scale: Long, label: String): DataFrame = {
    def ic(c: String) =
      floor(col(c).cast("double") * lit(scale.toDouble) + lit(0.5)).cast("long")
    def dec(c: Column) = c.cast("decimal(38,0)")
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    val moments =
      count(lit(1)).as("__n") +:
        (cols.map(c => sum(dec(ic(c))).as(s"__s_$c")) ++
          cols.map(c => sum(dec(ic(c) * ic(c))).as(s"__q_$c")) ++
          pairs.map { case (x, y) => sum(dec(ic(x) * ic(y))).as(s"__p_${x}_$y") })
    val m = df.agg(moments.head, moments.tail: _*)
    // covariance/variance numerators stay EXACT integers (decimal
    // arithmetic) until the very last cast: subtracting two separately
    // rounded ~1e25 doubles would amplify their last-ulp rounding into
    // the visible digits (classic cancellation), and the oracle's
    // independently computed doubles would drift
    def nd = col("__n").cast("decimal(38,0)")
    def cov(p: Column, sa: Column, sb: Column): Column =
      (nd * p - sa * sb).cast("double")
    pairs
      .map { case (x, y) =>
        val num = cov(col(s"__p_${x}_$y"), col(s"__s_$x"), col(s"__s_$y"))
        val den = sqrt(cov(col(s"__q_$x"), col(s"__s_$x"), col(s"__s_$x"))) *
          sqrt(cov(col(s"__q_$y"), col(s"__s_$y"), col(s"__s_$y")))
        m.select(
          lit(s"$label.$x:$y").as("col_pair"), col("__n").as("n"),
          (num / den).as("corr"))
      }
      .reduce(_.unionAll(_))
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
  /** HLL++ ndv vs exact, graded as a bounded-error verdict. The sketch
    * estimate itself is implementation-specific (register layout differs
    * engine to engine), so the SQL-checkable output is `within_bound`:
    * |approx − exact| / exact ≤ `bound`, with rsd tightened to 0.01 so
    * the bound holds with wide margin at any scale. The oracle asserts
    * the verdict (TRUE), making a sketch regression a hash failure
    * instead of an invisible rows-only pass.
    */
  def hllNdv(df: DataFrame, colName: String, label: String, bound: Double): DataFrame =
    df.agg(
        approx_count_distinct(col(colName), 0.01).as("approx_ndv"),
        count_distinct(col(colName)).as("exact_ndv"))
      .select(
        lit(label).as("col_name"), col("exact_ndv"),
        (abs(col("approx_ndv") - col("exact_ndv")).cast("double") /
          col("exact_ndv").cast("double") <= lit(bound)).as("within_bound"))
}
