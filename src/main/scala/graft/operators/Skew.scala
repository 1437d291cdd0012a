package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot-key aggregations — the 100 TB failure mode
  * where a groupBy key has so few distinct values (or such a skewed
  * distribution) that single reducers take the whole table.
  *
  * Two-phase salted aggregation: phase 1 groups by (key, salt) so each
  * hot key spreads over `buckets` reducers; phase 2 merges the per-salt
  * partials per key. For decomposable aggregates (sum/count/min/max)
  * the result is identical to the direct groupBy — the oracle checks
  * that equivalence. The salt is round-robin within each input
  * partition (monotonically_increasing_id mod buckets), NOT a hash of
  * the row content: content hashing would send identical rows — the
  * degenerate hot-key case — to one bucket and reintroduce the skew.
  * Round-robin spreads them perfectly, and any assignment is correct
  * because the aggregates decompose.
  *
  * (AQE's skewJoin handles skewed JOINS; this is the aggregation-side
  * counterpart for when the partial-agg map side alone is not enough —
  * e.g. high-cardinality decimal sums or collect-style aggregates.)
  */
object Skew {

  /** Generic two-phase plan: caller supplies partial and merge
    * aggregation columns (partial outputs must be what merge reads).
    */
  def twoPhase(
      df: DataFrame, keys: Seq[String], buckets: Int,
      partial: Seq[Column], merge: Seq[Column]): DataFrame =
    df.withColumn(
        "__salt",
        pmod(monotonically_increasing_id(), lit(buckets.toLong)))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)

  /** Salted count + decimal-exact sum per key — equals the direct
    * `groupBy(keys).agg(count, sum)` (decimal sums are associative, so
    * the salt split cannot change the result).
    */
  def saltedCountSum(
      df: DataFrame, keys: Seq[String], valueCol: String, buckets: Int): DataFrame =
    twoPhase(
      df, keys, buckets,
      partial = Seq(
        count(lit(1)).as("__pcnt"),
        sum(col(valueCol).cast("decimal(38,6)")).as("__psum")),
      merge = Seq(
        sum(col("__pcnt")).as("cnt"),
        sum(col("__psum")).cast("double").as(s"sum_$valueCol")))

  /** Salted replicate join — the skewed-JOIN counterpart of the salted
    * aggregation, for when the build side is too big to broadcast and
    * one fact key is hot enough to sink a reducer. The fact side gets a
    * round-robin salt (any assignment is correct: each fact row still
    * meets every matching dim row exactly once), the dim side is
    * replicated once per salt bucket, and the join key becomes
    * (key, salt) so a hot key's rows spread over `buckets` reducers.
    * Result is row-identical to the plain equi-join.
    */
  def saltedJoin(
      fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
      buckets: Int): DataFrame = {
    val salted = fact.withColumn(
      "__salt", pmod(monotonically_increasing_id(), lit(buckets.toLong)))
    val repl = dim.withColumn(
      "__salt", explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    salted
      .join(repl, salted(factKey) === repl(dimKey) && salted("__salt") === repl("__salt"))
      .drop("__salt")
  }
}
