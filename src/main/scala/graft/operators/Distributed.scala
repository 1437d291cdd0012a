package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed order-statistics plumbing shared by the dictionary,
  * midrank, and ECDF plans — the pattern that replaces a global
  * (single-task) window with range partitioning:
  * range-partition by the order column (a distributed sort whose
  * partition ids are in key order), roll per-partition totals into
  * broadcast exclusive offsets (a window over ≤ shuffle-partition-count
  * rows — the only unpartitioned window left, config-bounded), then
  * rank/accumulate inside each partition independently. The stamped
  * frame is persisted before fanning out to the totals pass and the
  * accumulate pass, pinning ONE physical partitioning for both.
  */
object Distributed {

  /** Exclusive prefix sums of `measures` in `order`-ascending order,
    * appended as `__pre_<measure>`. Input rows must be unique per
    * order key (pre-aggregate first); all sums are exact longs.
    */
  def exclusivePrefixSums(
      df: DataFrame, order: Column, measures: Seq[String]): DataFrame = {
    val stamped = df
      .repartitionByRange(order)
      .withColumn("__pid", spark_partition_id())
      .transform(graft.Memo.persisted(_))
    val offAggs = measures.map(m => sum(col(m)).as(s"__n_$m"))
    val wOff = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = measures
      .foldLeft(stamped.groupBy(col("__pid")).agg(offAggs.head, offAggs.tail: _*)) {
        (acc, m) =>
          acc.withColumn(s"__off_$m",
            coalesce(sum(col(s"__n_$m")).over(wOff), lit(0L)))
      }
      .select(col("__pid") +: measures.map(m => col(s"__off_$m")): _*)
    val wIn = Window.partitionBy(col("__pid")).orderBy(order)
      .rowsBetween(Window.unboundedPreceding, -1)
    measures
      .foldLeft(stamped.join(broadcast(offsets), "__pid")) { (acc, m) =>
        acc.withColumn(s"__pre_$m",
          col(s"__off_$m") + coalesce(sum(col(m)).over(wIn), lit(0L)))
      }
      .drop("__pid" +: measures.map(m => s"__off_$m"): _*)
  }
}
