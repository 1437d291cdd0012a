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
}
