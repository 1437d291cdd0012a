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
    val n = col("__n")
    val ranked = df
      .select(col(valueCol).cast("double").as("__v"))
      .withColumn("__rn", row_number().over(Window.orderBy(col("__v"))))
      .crossJoin(broadcast(
        df.agg(count(lit(1)).as("__n"))))
    qs.map { q =>
        // pandas 'nearest' uses round-half-even on q*(n-1)
        ranked
          .filter(col("__rn") === (expr(s"CAST(bround($q * (__n - 1), 0) AS BIGINT)") + 1))
          .select(lit(q).as("quantile"), col("__v").as("value"))
      }
      .reduce(_.unionAll(_))
      .orderBy(col("quantile"))
  }
}
