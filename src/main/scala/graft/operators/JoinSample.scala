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
  *    with probability frac(n·w/W), decided by a per-row seeded uniform.
  *    Unbiased (E[copies] = n·w/W), embarrassingly parallel, and
  *    scale-free: no CDF materialization, no driver state.
  *  - per-edge pick: each sample slot left-joins its matching child rows
  *    and picks by INVERSE CDF over integer weights — running cumulative
  *    weight per slot (window ordered by the child's PRIMARY KEY), one
  *    uniform threshold t = ⌊u·Σw⌋ per (slot, edge), keep the candidate
  *    whose cumulative interval contains t. P(pick) = w_i/Σw with pure
  *    integer compares — no log()/exp(), so the whole sample is
  *    reproducible in ANSI SQL. One shuffle per edge, exactly as
  *    SURVEY.md §3 plans it.
  *
  * All randomness is md5-derived (seed-mixed, first 13 hex digits → a
  * 52-bit integer → uniform in [0,1)), so a DuckDB oracle reproduces the
  * sample bit-for-bit — the sampling operator is correctness-gated like
  * any deterministic query.
  */
object JoinSample {

  /** 2^52 — the uniform's denominator. */
  val H: Double = 4503599627370496.0

  /** 52-bit integer from the first 13 md5 hex digits of the ':'-joined
    * mix (SQL twin: CAST('0x' || substr(md5(...), 1, 13) AS BIGINT)).
    */
  private def h52(mix: Column*): Column =
    conv(substring(md5(concat_ws(":", mix.map(_.cast("string")): _*)), 1, 13), 16, 10)
      .cast("long")

  /** Seeded uniform in [0, 1). */
  private def uniform(mix: Column*): Column =
    h52(mix: _*).cast("double") / lit(H)

  /** Padded-full-join size rooted at `root` = Σ root weights. */
  def totalWeight(sub: Subschema, root: String, load: String => DataFrame): DataFrame =
    Fanouts.weighted(sub, root, load).agg(sum("__weight__").as("total_weight"))

  /** Draw ~n sample slots over the subschema join, rooted at `root`.
    *
    * Returns one row per slot: all columns of every table on the root→leaf
    * chains, plus `__slot__` (md5 hex of (seed, root key, copy)) and one
    * `__in__:t` boolean per non-root table. Requires `rootKey`: the root's
    * primary key column (slot identity + hash seed) and `pkOf`: each
    * child table's unique key columns (per-candidate randomness + pick
    * order).
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
    val extra = (uniform(lit(seed), col(rootKey)) < (e - floor(e))).cast("long")
    val drawn = weighted
      .crossJoin(broadcast(total))
      .withColumn("__copies__", base + extra)
      .filter(col("__copies__") > 0)
      .withColumn("__copy__", explode(sequence(lit(1L), col("__copies__"))))
      .withColumn("__slot__",
        md5(concat_ws(":",
          lit(seed).cast("string"), col(rootKey).cast("string"), col("__copy__").cast("string"))))
      .drop("__copies__", "__copy__", "total_weight", "__weight__")

    // Per-edge inverse-CDF pick, walking edges outward from the root.
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
        val childPk = pkOf(child).map(col)
        val winCum = Window.partitionBy(col("__slot__")).orderBy(childPk: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val winAll = Window.partitionBy(col("__slot__"))
        // t = ⌊u·Σw⌋ clamped to Σw−1 (guards the half-ulp round-up when
        // u → 1); candidate k wins iff cum_k−w_k ≤ t < cum_k.
        val t = least(
          floor(uniform(lit(edge.joinLabel), col("__slot__")) * col("__ws__").cast("double"))
            .cast("long"),
          col("__ws__") - 1)
        out = out
          .join(childW, col(myKey) === col(childKey), "left")
          .withColumn("__cum__", sum(col("__cw__")).over(winCum))
          .withColumn("__ws__", sum(col("__cw__")).over(winAll))
          .withColumn("__t__", t)
          .filter(col(childKey).isNull ||
            (col("__t__") >= col("__cum__") - col("__cw__") && col("__t__") < col("__cum__")))
          .withColumn(s"__in__:$child", col(childKey).isNotNull)
          .drop("__cum__", "__ws__", "__t__", "__cw__")
        out = descend(out, child, Some(at))
      }
      out
    }
    descend(drawn, root, None)
  }
}
