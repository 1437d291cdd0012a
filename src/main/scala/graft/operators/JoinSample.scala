package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{FkEdge, Subschema}

/** Distributed, seeded, unbiased sampling of a subschema's padded full
  * outer join (reference: scardina/join.py:sample — root rows drawn with
  * probability ∝ `__weight__`, then per-edge weighted picks; unmatched
  * rows NULL-padded with `__in__:t = false`).
  *
  * Spark-first design (no driver-side loops, no collect):
  *  - root draw: expected-copies rounding — copies = ⌊n·w/W⌋ plus one more
  *    with probability frac(n·w/W), decided by a per-row seeded uniform
  *    from `xxhash64`. Unbiased (E[copies] = n·w/W), embarrassingly
  *    parallel, and scale-free: no CDF materialization, no driver state.
  *  - per-edge pick: each sample slot left-joins its matching child rows,
  *    each candidate gets an exponential clock `-log(u)/w` with a seeded
  *    per-(slot, candidate-row) uniform — the uniform hashes the child
  *    table's PRIMARY KEY columns (not the join key, which is constant
  *    across a slot's candidates, so hashing it would collapse all
  *    clocks) — and the minimum clock wins: P(pick) = w_i/Σw, resolved
  *    by one window per edge with the PK as deterministic tie-break.
  *    One shuffle per edge, exactly as SURVEY.md §3 plans it.
  */
object JoinSample {

  private val M = 1L << 31

  /** Seeded uniform in (0, 1): hash the mix columns, fold into (0,1). */
  private def uniform(seed: Long, mix: Column*): Column =
    (pmod(xxhash64((lit(seed) +: mix): _*), lit(M)).cast("double") + lit(0.5)) / lit(M.toDouble)

  /** Padded-full-join size rooted at `root` = Σ root weights. */
  def totalWeight(sub: Subschema, root: String, load: String => DataFrame): DataFrame =
    Fanouts.weighted(sub, root, load).agg(sum("__weight__").as("total_weight"))

  /** Draw ~n sample slots over the subschema join, rooted at `root`.
    *
    * Returns one row per slot: all columns of every table on the root→leaf
    * chains, plus `__slot__` and one `__in__:t` boolean per non-root
    * table. Requires `rootKey`: the root's primary key column (slot
    * identity + hash seed).
    */
  def sample(
      sub: Subschema,
      root: String,
      rootKey: String,
      load: String => DataFrame,
      n: Long,
      seed: Long,
      pkOf: String => Seq[String] = graft.Tables.pks
  ): DataFrame = {
    val weighted = Fanouts.weighted(sub, root, load)
    val total = totalWeight(sub, root, load)

    // Root draw: copies per row, then explode into slots.
    val e = lit(n.toDouble) * col("__weight__").cast("double") / col("total_weight").cast("double")
    val base = floor(e).cast("long")
    val extra = (uniform(seed, col(rootKey)) < (e - floor(e))).cast("long")
    val drawn = weighted
      .crossJoin(broadcast(total))
      .withColumn("__copies__", base + extra)
      .filter(col("__copies__") > 0)
      .withColumn("__copy__", explode(sequence(lit(1L), col("__copies__"))))
      .withColumn("__slot__", xxhash64(lit(seed), col(rootKey), col("__copy__")))
      .drop("__copies__", "__copy__", "total_weight", "__weight__")

    // Per-edge weighted pick, walking edges outward from the root.
    def neighbors(t: String): Seq[(FkEdge, String)] =
      sub.edges.collect {
        case e if e.pkTable == t => (e, e.fkTable)
        case e if e.fkTable == t => (e, e.pkTable)
      }

    def descend(df: DataFrame, at: String, from: Option[String]): DataFrame = {
      var out = df
      for ((edge, child) <- neighbors(at) if !from.contains(child)) {
        val (myKey, childKey) =
          if (edge.pkTable == at) (edge.pkCol, edge.fkCol) else (edge.fkCol, edge.pkCol)
        // Child rows carry their own downstream weight for the pick.
        val childSub = Subschema(child, child, sub.edges.filterNot(_ == edge))
        val childW = Fanouts
          .weighted(childSub, child, load)
          .withColumnRenamed("__weight__", "__cw__")
        // Seed the clock with the candidate row's PK — unique per child
        // row, unlike childKey which equals the slot's own join key.
        val childPk = pkOf(child).map(col)
        val clock =
          -log(uniform(seed + 1, (col("__slot__") +: childPk): _*)) /
            col("__cw__").cast("double")
        val win = Window.partitionBy(col("__slot__"))
          .orderBy((col("__clock__") +: childPk): _*)
        out = out
          .join(childW, col(myKey) === col(childKey), "left")
          .withColumn("__clock__", clock)
          .withColumn("__rn__", row_number().over(win))
          .filter(col("__rn__") === 1)
          .withColumn(s"__in__:$child", col(childKey).isNotNull)
          .drop("__clock__", "__rn__", "__cw__")
        out = descend(out, child, Some(at))
      }
      out
    }
    descend(drawn, root, None)
  }
}
