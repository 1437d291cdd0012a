package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: multi-dimensional clustering keys for writing
  * 100 TB tables so that range predicates on EITHER key prune files.
  * A table sorted by z-value keeps rows close in both dimensions close
  * in the file order, so per-file min/max stats stay tight on both
  * columns — the standard lakehouse OPTIMIZE ZORDER BY layout, here as
  * a pure codegen'd expression (no shuffle beyond the final sort the
  * writer would do anyway).
  */
object Layout {

  /** Exact global NTILE(n) OVER (ORDER BY sortCols) WITHOUT the
    * single-partition window: range-partition by the sort key, stamp
    * partition ids, turn per-partition counts into cumulative offsets
    * (a window over ≤ #shuffle-partitions rows — trivially small), rank
    * = offset + per-partition row_number, and bucket from rank with the
    * exact SQL NTILE size rule (the first N mod n buckets carry one
    * extra row). Identical output to the built-in ntile for a TIE-FREE
    * sort order (callers append a unique id), but every stage is
    * distributed — the plan that survives a 100 TB input.
    */
  def rankedNtile(df: DataFrame, sortCols: Seq[Column], n: Int, out: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // session-scoped persist (never unpersisted): the stamped frame is
    // read twice below and callers run once per (session, dir); the
    // cached blocks are reclaimed at session teardown like the Memo's
    val stamped = df
      .repartitionByRange(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .transform(graft.Memo.persisted(_))
    val counts = stamped.groupBy(col("__pid")).agg(count(lit(1)).as("__n"))
    val offs = counts
      .withColumn("__off",
        coalesce(
          sum(col("__n")).over(
            Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__pid"), col("__off"))
    val total = counts.agg(sum(col("__n")).as("__N"))
    stamped
      .join(broadcast(offs), "__pid")
      .withColumn("__r0",
        row_number().over(Window.partitionBy(col("__pid")).orderBy(sortCols: _*)) +
          col("__off") - lit(1L))
      .crossJoin(broadcast(total))
      .withColumn(out,
        when(col("__r0") < (col("__N") % n) * (expr(s"__N div $n") + 1),
          expr(s"__r0 div ((__N div $n) + 1)") + 1)
          .otherwise(
            // when __N < n the `when` branch covers every rank, so this
            // divisor is never 0 here — greatest(…,1) keeps that safety
            // explicit (non-ANSI div-by-0 would silently NULL the bucket)
            col("__N") % n +
              expr(s"(__r0 - (__N % $n) * ((__N div $n) + 1)) div greatest(__N div $n, 1)") + 1)
          .cast("int"))
      .drop("__pid", "__off", "__r0", "__N")
  }

  /** Per-group exact NTILE(n) OVER (PARTITION BY groupCols ORDER BY
    * sortCols) without a per-group single-task sort: the same plan as
    * [[rankedNtile]], generalized so a handful of huge groups (e.g. 5
    * event types over 100 TB of events) still spread over every
    * executor. Range-partition by (group, sort) — contiguous key ranges
    * mean a group's rows split across partitions in sort order — then
    * per-(partition, group) counts roll up to exclusive per-group
    * offsets via a window over ≤ #groups × #shuffle-partitions rows
    * (bounded by config, not data), broadcast back, and the bucket is
    * computed from the exact per-group rank with the SQL NTILE size
    * rule. Identical output to the built-in grouped ntile for a
    * tie-free sort order (callers append a unique id).
    */
  def groupedRankedNtile(df: DataFrame, groupCols: Seq[String],
      sortCols: Seq[Column], n: Int, out: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gcols = groupCols.map(col)
    val stamped = df
      .repartitionByRange((gcols ++ sortCols): _*)
      .withColumn("__pid", spark_partition_id())
      .transform(graft.Memo.persisted(_))
    val counts = stamped.groupBy((col("__pid") +: gcols): _*)
      .agg(count(lit(1)).as("__n"))
    val offs = counts
      .withColumn("__off",
        coalesce(
          sum(col("__n")).over(
            Window.partitionBy(gcols: _*).orderBy(col("__pid"))
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select((col("__pid") +: gcols :+ col("__off")): _*)
    val totals = counts.groupBy(gcols: _*).agg(sum(col("__n")).as("__N"))
    stamped
      .join(broadcast(offs), "__pid" +: groupCols)
      .withColumn("__r0",
        row_number().over(
          Window.partitionBy((col("__pid") +: gcols): _*).orderBy(sortCols: _*)) +
          col("__off") - lit(1L))
      .join(broadcast(totals), groupCols)
      .withColumn(out,
        when(col("__r0") < (col("__N") % n) * (expr(s"__N div $n") + 1),
          expr(s"__r0 div ((__N div $n) + 1)") + 1)
          .otherwise(
            // unreachable for groups with __N < n (the `when` branch
            // covers all their ranks) — greatest(…,1) makes the
            // div-by-0 safety explicit instead of implicit
            col("__N") % n +
              expr(s"(__r0 - (__N % $n) * ((__N div $n) + 1)) div greatest(__N div $n, 1)") + 1)
          .cast("int"))
      .drop("__pid", "__off", "__r0", "__N")
  }

  /** Exact top-k per group WITHOUT a per-group single-task sort: any
    * partitioning works, because each partition's local top-k is a
    * superset of that partition's contribution to the global answer —
    * stage 1 keeps ≤ k rows per (group, partition) via a
    * HIGH-cardinality partitioned window, stage 2 ranks the survivors
    * (≤ k × #partitions per group — bounded by config, not data) with
    * the final per-group window. Identical output to the built-in
    * `row_number over (partition by group)` top-k for a tie-free sort
    * order (callers append a unique id), but no group ever funnels its
    * full row set through one task — the plan that survives 5 groups
    * over 100 TB.
    */
  def groupedTopK(df: DataFrame, groupCols: Seq[String], sortCols: Seq[Column],
      k: Int, out: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gcols = groupCols.map(col)
    val local = df
      .withColumn("__pid", spark_partition_id())
      .withColumn("__lr",
        row_number().over(
          Window.partitionBy((col("__pid") +: gcols): _*).orderBy(sortCols: _*)))
      .filter(col("__lr") <= k)
    local
      .withColumn(out,
        row_number().over(Window.partitionBy(gcols: _*).orderBy(sortCols: _*)))
      .filter(col(out) <= k)
      .drop("__pid", "__lr")
  }

  /** 2-D skyline (Pareto frontier, minimize BOTH x and y) without a
    * single-partition sweep. A point is dominated iff another point is
    * ≤ in both dimensions and < in one. Classic sweep = global sort by
    * x, running min of y — one partition at scale. Here the same sweep
    * distributes exactly like [[rankedNtile]]'s rank: collapse to
    * per-x group minima, range-partition by x, per-partition prefix
    * minima via a partitioned window, and carry each partition's
    * running minimum across partitions through a ≤ #partitions-row
    * cumulative window, broadcast back. Survivors: y < prefix-min of
    * all strictly-smaller x AND y = its x-group minimum (ties on both
    * dims are mutually non-dominating and all survive — the join back
    * to `df` keeps duplicates). Output = the skyline rows of `df`.
    */
  def skylineMin2(df: DataFrame, x: String, y: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = df.groupBy(col(x)).agg(min(col(y)).as("__gy"))
      .repartitionByRange(col(x))
      .withColumn("__pid", spark_partition_id())
      .transform(graft.Memo.persisted(_))
    // strict-prefix min inside each partition…
    val wLocal = Window.partitionBy(col("__pid")).orderBy(col(x))
      .rowsBetween(Window.unboundedPreceding, -1)
    // …plus each partition's full min, cumulated EXCLUSIVELY over the
    // tiny ordered partition list, carried in as the cross-partition seed
    val carry = g.groupBy(col("__pid")).agg(min(col("__gy")).as("__pm"))
      .withColumn("__carry",
        min(col("__pm")).over(
          Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("__pid"), col("__carry"))
    // survivors derive from df, so keep the join keys under fresh names
    // — a df(x) === survivors(x) predicate on a self-derived frame only
    // works through Spark's self-join disambiguation (and logs a
    // trivially-true-predicate warning); distinct names are unambiguous
    val survivors = g
      .join(broadcast(carry), "__pid")
      .withColumn("__prefix", least(min(col("__gy")).over(wLocal), col("__carry")))
      .filter(col("__prefix").isNull || col("__gy") < col("__prefix"))
      .select(col(x).as("__sx"), col("__gy").as("__sy"))
    df.join(survivors, df(x) === col("__sx") && df(y) === col("__sy"), "leftsemi")
  }

  /** Z-value (Morton code) of two non-negative keys over their low
    * `bits` bits: output bit 2i+1 = bit i of a, bit 2i = bit i of b.
    * A flat sum of shift/mask terms — whole-stage-codegen'd, no UDF.
    */
  def zValue(a: Column, b: Column, bits: Int): Column =
    (0 until bits)
      .map { i =>
        shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1) +
          shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i)
      }
      .reduce(_ + _)

  /** The same z-value as engine-portable SQL text (DuckDB oracle). */
  def zValueSql(a: String, b: String, bits: Int): String =
    (0 until bits)
      .map(i => s"((($a >> $i) & 1) << ${2 * i + 1}) + ((($b >> $i) & 1) << ${2 * i})")
      .mkString(" + ")

  /** Z-order layout summary: rows bucketed by the top bits of their
    * z-value (= the files a z-sorted writer would produce), per-bucket
    * row count and min/max of both keys — the per-file stats a reader
    * would prune on. Tight per-bucket ranges on BOTH keys are exactly
    * what makes the layout work; the oracle checks them value-for-value.
    */
  def zorderSummary(
      df: DataFrame, aCol: String, bCol: String, bits: Int, bucketShift: Int): DataFrame =
    df.withColumn("z", zValue(col(aCol).cast("long"), col(bCol).cast("long"), bits))
      .withColumn("bucket", shiftright(col("z"), bucketShift))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("cnt"),
        min(col(aCol)).as(s"min_$aCol"),
        max(col(aCol)).as(s"max_$aCol"),
        min(col(bCol)).as(s"min_$bCol"),
        max(col(bCol)).as(s"max_$bCol"),
        min(col("z")).as("z_lo"),
        max(col("z")).as("z_hi"))
}
