package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Evaluation metrics (reference: scardina/run.py:60-67 q-error,
  * :967-973 quantiles [0.5, 0.9, 0.95, 0.99, 1.0] with "nearest"
  * interpolation + mean latency).
  */
object Metrics {

  val quantiles: Seq[Double] = Seq(0.5, 0.9, 0.95, 0.99, 1.0)

  /** q-error column: max(est/true, true/est), both sides as doubles. */
  def qError(est: Column, truth: Column): Column =
    greatest(est.cast("double") / truth.cast("double"), truth.cast("double") / est.cast("double"))

  /** Exact "nearest"-interpolation quantiles of `valueCol`, matching
    * pandas quantile(interpolation="nearest"): value at index
    * round(q·(n−1)) in the sorted sequence. One distributed sort, then a
    * tiny rank filter — no driver-side collect of the data.
    */
  def quantilesNearest(df: DataFrame, valueCol: String, qs: Seq[Double] = quantiles): DataFrame = {
    // Rank and count come from windows over the slim (value) projection so
    // the input subtree is scanned ONCE; each row then tests the 5 target
    // ranks from an exploded quantile list. The single-partition windows
    // run over metric rows (one per benchmark query), not data.
    df.select(col(valueCol).cast("double").as("__v"))
      .withColumn("__rn", row_number().over(Window.orderBy(col("__v"))))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy()))
      .withColumn("quantile", explode(array(qs.map(lit): _*)))
      // pandas 'nearest' uses round-half-even on q*(n-1)
      .filter(col("__rn") === expr("CAST(bround(quantile * (__n - 1), 0) AS BIGINT) + 1"))
      .select(col("quantile"), col("__v").as("value"))
      .orderBy(col("quantile"))
  }

  /** Per-group nearest-interpolation quantiles — the reference's
    * per-estimator report shape (one quantile row set per model).
    */
  def quantilesNearestBy(
      df: DataFrame, group: String, valueCol: String,
      qs: Seq[Double] = quantiles): DataFrame =
    df.select(col(group), col(valueCol).cast("double").as("__v"))
      .withColumn("__rn",
        row_number().over(Window.partitionBy(col(group)).orderBy(col("__v"))))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col(group))))
      .withColumn("quantile", explode(array(qs.map(lit): _*)))
      .filter(col("__rn") === expr("CAST(bround(quantile * (__n - 1), 0) AS BIGINT) + 1"))
      .select(col(group), col("quantile"), col("__v").as("value"))
      .orderBy(col(group), col("quantile"))

  /** EXACT per-group quantiles without a per-group global sort — the
    * scale formulation of [[quantilesNearestBy]] (identical output).
    *
    * A global sort puts each group on ONE reducer; at 100 TB that
    * reducer is the job. Instead: (1) one scan for count/min/max,
    * (2) one scan for 256 equi-width bucket counts, whose running sum
    * locates the bucket holding each target rank and the exact number
    * of rows below it, (3) one scan keeps only rows in located buckets
    * (~n/256 each) — the final rank pick sorts only those. Three cheap
    * codegen'd scans replace the sort; no sketch error bounds involved,
    * so the result is exact by construction.
    */
  def quantilesNearestBucketed(
      df: DataFrame, group: String, valueCol: String,
      qs: Seq[Double] = quantiles, buckets: Int = 256): DataFrame =
    quantilesNearestBucketedFrom(
      df, bucketCdf(df, group, valueCol, buckets), group, valueCol, qs, buckets)

  /** The bucket-locate bucket index for `__v`, given `__mn`/`__mx` in
    * scope — the SAME expression in the CDF count pass and the keep
    * pass, so located buckets are bit-identical across the two scans.
    */
  private def bucketIdx(buckets: Int): Column =
    when(col("__mx") === col("__mn"), lit(0L))
      .otherwise(least(
        floor((col("__v") - col("__mn")) * lit(buckets.toDouble) /
          (col("__mx") - col("__mn"))).cast("long"),
        lit((buckets - 1).toLong)))

  /** The QUERY-INDEPENDENT prefix of the bucket-locate quantile plan:
    * per-group count/min/max joined onto per-(group, bucket) counts
    * with their running sum — ≤ |groups|·buckets rows, built in two
    * scans of `df`. The quantile targets (qs) only enter the plan
    * AFTER this frame, so one memoized CDF serves every quantile probe
    * of the same input (col_quantiles / group_quantiles / the MAD
    * median passes / eqdepth bounds): each consumer then pays ONE scan
    * of the input (the located-bucket keep pass) instead of three —
    * guide §2.4, share one expensive subtree.
    */
  def bucketCdf(
      df: DataFrame, group: String, valueCol: String,
      buckets: Int = 256): DataFrame = {
    val base = df.select(col(group), col(valueCol).cast("double").as("__v"))
    val mm = base.groupBy(col(group)).agg(
      count(lit(1)).as("__n"), min(col("__v")).as("__mn"), max(col("__v")).as("__mx"))
    val counts = base.join(broadcast(mm), group)
      .groupBy(col(group), col("__mn"), col("__mx"), col("__n"),
        bucketIdx(buckets).as("__b"))
      .agg(count(lit(1)).as("__c"))
    counts
      .withColumn("__cum", sum(col("__c")).over(
        Window.partitionBy(col(group)).orderBy(col("__b"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** The per-query tail of the bucket-locate plan over a (possibly
    * memoized) [[bucketCdf]] frame: locate each target rank's bucket in
    * the CDF, then ONE scan of `df` keeps only rows in located buckets
    * (~n/buckets each) and ranks within. Identical output to
    * [[quantilesNearestBucketed]] by construction — the composed
    * expressions are the same; only the reuse boundary moved.
    */
  def quantilesNearestBucketedFrom(
      df: DataFrame, cdf: DataFrame, group: String, valueCol: String,
      qs: Seq[Double] = quantiles, buckets: Int = 256): DataFrame = {
    val base = df.select(col(group), col(valueCol).cast("double").as("__v"))
    // one row per group (bucket 0 always exists: the min value lands
    // there, and the degenerate mx == mn group is all bucket 0)
    val mm = cdf.filter(col("__b") === 0L)
      .select(col(group), col("__n"), col("__mn"), col("__mx"))
    // target rank r per (group, q); its bucket is the first with cum ≥ r
    val targets = mm
      .withColumn("quantile", explode(array(qs.map(lit): _*)))
      .select(col(group), col("quantile"),
        (expr("CAST(bround(quantile * (__n - 1), 0) AS BIGINT)") + 1L).as("__r"))
    val located = targets
      .join(cdf.select(col(group), col("__b"), col("__c"), col("__cum")), group)
      .filter(col("__cum") >= col("__r") && col("__cum") - col("__c") < col("__r"))
      .select(col(group), col("quantile"), col("__r"),
        col("__b"), (col("__cum") - col("__c")).as("__below"))
    // keep only rows in located buckets; rank within = __below + local rank
    val narrowed = base.join(broadcast(mm), group)
      .withColumn("__b", bucketIdx(buckets))
      .join(broadcast(located), Seq(group, "__b"))
    narrowed
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(group), col("quantile")).orderBy(col("__v"))))
      .filter(col("__below") + col("__rn") === col("__r"))
      .select(col(group), col("quantile"), col("__v").as("value"))
      .orderBy(col(group), col("quantile"))
  }
}
