package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dictionary discretization + column factorization
  * (reference: scardina/common.py:85 set_dist, :198 discretize_values,
  * :137 factorize).
  *
  * Code space mirrors the reference exactly: 0 = MASK (never in data),
  * 1 = NULL, 2.. = index in the sorted distinct non-null values + 2.
  * Factorized subcolumns reserve only 0 = MASK, so sliced values get +1.
  */
object Encoding {

  /** Sorted distinct non-null values of a column
    * (reference: datasets.py:223-253 distinct-vals extraction).
    */
  def distinctVals(df: DataFrame, c: String): DataFrame =
    df.select(col(c)).na.drop().distinct().orderBy(col(c))

  /** Dictionary (value, code): code = 1-based rank in sorted distinct
    * values + 1, i.e. the reference's index+2 with 0=MASK / 1=NULL
    * reserved (common.py:241-243).
    *
    * Scale path: a global-window row_number would sort the whole
    * dictionary in ONE partition. Instead the distinct values are
    * range-partitioned (a distributed sort whose partition ids are in
    * value order), per-partition counts become cumulative offsets (a
    * window over ≤ shuffle-partitions count rows — trivially small),
    * and each partition ranks independently with a per-partition
    * row_number plus its offset. All DataFrame/Catalyst — no RDD
    * drop-out — so AQE and codegen still apply. The partition-id stamp
    * is persisted before fan-out to the counts pass and the rank pass,
    * pinning one physical partitioning for both.
    */
  def dictionary(df: DataFrame, c: String): DataFrame = {
    val stamped = df
      .select(col(c)).na.drop().distinct()
      .repartitionByRange(col(c))
      .withColumn("__pid", spark_partition_id())
      .transform(graft.Memo.persisted(_))
    val offsets = stamped
      .groupBy(col("__pid")).agg(count(lit(1)).as("__n"))
      .withColumn(
        "__offset",
        coalesce(
          sum(col("__n")).over(
            Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__pid"), col("__offset"))
    stamped
      .join(broadcast(offsets), "__pid")
      .withColumn(
        "code",
        (row_number().over(Window.partitionBy(col("__pid")).orderBy(col(c))) +
          col("__offset") + lit(1)).cast("int"))
      .drop("__pid", "__offset")
  }

  /** Encode `c` to its dictionary code as column `outName`; NULL → 1.
    * Dictionary join is left to Catalyst/AQE (the dictionary is the
    * pre-aggregated small side → broadcast when it fits).
    */
  def dictEncode(df: DataFrame, c: String, outName: String): DataFrame = {
    val dict = dictionary(df, c)
      .withColumnRenamed(c, "__dict_val")
      .withColumnRenamed("code", "__dict_code")
    df.join(dict, col(c) === col("__dict_val"), "left")
      .withColumn(outName, coalesce(col("__dict_code"), lit(1)).cast("int"))
      .drop("__dict_val", "__dict_code")
  }

  /** Number of subcolumns and (offset, width) per subcolumn for a domain
    * size, mirroring common.py:137-158: nScols = ceil(bitLen/threshold),
    * widths split evenly with the remainder added to the lowest slices.
    * Pure integer expressions so the same math is SQL-expressible for the
    * oracle; all arithmetic stays inside whole-stage codegen.
    */
  def factorSlices(distSize: Column, threshold: Int): (Column, Column => (Column, Column)) = {
    val bitLen = length(bin(distSize.cast("bigint"))) // == distSize.bit_length()
    val nScols = ceil(bitLen.cast("double") / lit(threshold)).cast("int")
    val base = floor(bitLen.cast("double") / nScols).cast("int")
    val rem = (bitLen - base * nScols).cast("int")
    val slice = (i: Column) => {
      val width = base + when(i < rem, 1).otherwise(0)
      val offset = base * i + least(i, rem)
      (offset, width)
    }
    (nScols, slice)
  }

  /** Factorize an already-encoded code column into long-format rows
    * (keys..., fact_idx, scol_code):
    * scol_code = ((code >> offset) & (2^width - 1)) + 1 (common.py:189-196).
    * Emitted long-form so the output schema is fixed regardless of how
    * many subcolumns the domain size implies.
    */
  def factorize(
      encoded: DataFrame,
      codeCol: String,
      keyCols: Seq[String],
      threshold: Int
  ): DataFrame = {
    val distSizeDf = encoded
      .agg((max(col(codeCol)) + lit(0)).as("__max_code"))
      // dist_size = ndv + 2; max code == ndv + 1 when no nulls dominate,
      // so derive from the dictionary size instead: max code over all rows
      // is exactly ndv+1 because codes are dense. dist_size = max_code + 1.
      .select((col("__max_code") + lit(1)).cast("bigint").as("__dist_size"))
    val withSize = encoded.crossJoin(broadcast(distSizeDf))
    val (nScols, slice) = factorSlices(col("__dist_size"), threshold)
    val exploded = withSize
      .withColumn("fact_idx", explode(sequence(lit(0), nScols - lit(1))))
    val (offset, width) = slice(col("fact_idx"))
    // (code >> offset) & (2^width - 1), via exact double pow (< 2^53).
    val sliced =
      pmod(
        floor(col(codeCol).cast("double") / pow(lit(2.0), offset)).cast("bigint"),
        pow(lit(2.0), width).cast("bigint")
      ) + lit(1)
    exploded
      .withColumn("scol_code", sliced.cast("int"))
      .select((keyCols.map(col) ++ Seq(col("fact_idx"), col("scol_code"))): _*)
  }
}
