package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 wave: multiple-testing control over the pairwise source
  * screens (Benjamini–Hochberg), plus scale-planning and analytics
  * operators in the same portable-grid discipline as every wave.
  */
object QueriesWave22 {

  // ---- bh_fdr: Benjamini–Hochberg FDR over the source-pair z-tests ----

  /** FDR level for the BH step-up procedure, as an exact ppb integer so
    * the rejection rule `p9 · m ≤ rank · bhAlphaPpb` compares BIGINTs. */
  val bhAlphaPpb = 50000000L // α = 0.05 in parts-per-billion

  /** Benjamini–Hochberg FDR control over `prop_ztest_pairs`' pairwise
    * source screen — the missing piece of any dashboard that runs
    * #sources² significance tests at once: per-comparison α=0.05 at
    * 190 pairs expects ~10 false flags, so the pairwise drift screen
    * NEEDS multiple-testing control before anyone acts on it. Two-sided
    * p from each pair's z via the Abramowitz–Stegun 7.1.26 erf
    * polynomial (p = poly(t)·exp(−z²/2), t = 1/(1+0.3275911·|z|/√2) —
    * one libm exp per pair, the repo's one-quantized-libm-call
    * discipline), pinned to the 1e-9 grid; the step-up rule is then
    * EXACT integer arithmetic: reject ranks ≤ k* where k* = max{i :
    * p9_(i)·m ≤ i·α·1e9}. The pair frame is ≤ #sources² rows (the
    * per-source rates are the memoized one-scan aggregate), so the
    * ranking window is source-bounded — at 100 TB this stage touches a
    * ~200-row frame.
    */
  def bhFdrQ(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val z = QueriesWave9.propZtestPairsQ(spark, dir)
      .select(col("src_a"), col("src_b"), col("z"))
      .withColumn("p9", expr(
        """CAST(round(1e9 * (
          |  0.254829592 / (1 + 0.3275911 * (abs(z) / sqrt(2.0)))
          |  - 0.284496736 / pow(1 + 0.3275911 * (abs(z) / sqrt(2.0)), 2)
          |  + 1.421413741 / pow(1 + 0.3275911 * (abs(z) / sqrt(2.0)), 3)
          |  - 1.453152027 / pow(1 + 0.3275911 * (abs(z) / sqrt(2.0)), 4)
          |  + 1.061405429 / pow(1 + 0.3275911 * (abs(z) / sqrt(2.0)), 5)
          |) * exp(-(z * z) / 2.0)) AS BIGINT)""".stripMargin))
    // source-bounded frame (≤ #sources² rows): documented unpartitioned
    // windows, on the WindowAuditSpec allowlist
    val wRank = Window.orderBy(col("p9"), col("src_a"), col("src_b"))
    val ranked = z
      .withColumn("rnk", row_number().over(wRank))
      .withColumn("m", count(lit(1)).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("bh_ok", col("p9") * col("m") <= col("rnk") * bhAlphaPpb)
    ranked
      .withColumn("kstar", max(when(col("bh_ok"), col("rnk"))).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("src_a"), col("src_b"), col("z"), col("p9"),
        col("rnk").cast("bigint").as("rnk"), col("m"), col("bh_ok"),
        (col("kstar").isNotNull && col("rnk") <= col("kstar")).as("rejected"))
      .orderBy(col("rnk"))
  }

  val bhFdrSql: String =
    s"""WITH zt AS (${QueriesWave9.propZtestPairsSql}),
       |p AS (SELECT src_a, src_b, z,
       |    CAST(round(1e9 * (
       |      0.254829592 / (1 + 0.3275911 * (abs(z) / sqrt(2.0)))
       |      - 0.284496736 / pow(1 + 0.3275911 * (abs(z) / sqrt(2.0)), 2)
       |      + 1.421413741 / pow(1 + 0.3275911 * (abs(z) / sqrt(2.0)), 3)
       |      - 1.453152027 / pow(1 + 0.3275911 * (abs(z) / sqrt(2.0)), 4)
       |      + 1.061405429 / pow(1 + 0.3275911 * (abs(z) / sqrt(2.0)), 5)
       |    ) * exp(-(z * z) / 2.0)) AS BIGINT) AS p9
       |  FROM zt),
       |rk AS (SELECT *,
       |    CAST(ROW_NUMBER() OVER (ORDER BY p9, src_a, src_b) AS BIGINT) AS rnk,
       |    CAST(COUNT(*) OVER () AS BIGINT) AS m
       |  FROM p),
       |bh AS (SELECT *, p9 * m <= rnk * $bhAlphaPpb AS bh_ok FROM rk),
       |ks AS (SELECT MAX(CASE WHEN bh_ok THEN rnk END) AS kstar FROM bh)
       |SELECT src_a, src_b, z, p9, rnk, m, bh_ok,
       |  (kstar IS NOT NULL AND rnk <= kstar) AS rejected
       |FROM bh, ks ORDER BY rnk""".stripMargin

  // ---- label_propagation: synchronous LPA communities on the trade graph ----

  val lpaRounds = 4

  /** Label-propagation communities (Raghavan et al. 2007) on the
    * undirected nation trade graph — the cheap community detector that
    * complements the centrality family (`nation_pagerank`, `salsa`) and
    * the density family (`kcore_membership`): every node starts as its
    * own label; each synchronous round it adopts its neighbors' most
    * frequent label, ties to the SMALLEST label (what makes classically
    * random LPA deterministic and oracle-replayable). Fixed
    * [[lpaRounds]] rounds, each a broadcast join + two keyed aggregates
    * over the memoized edge frame, literal-checkpointed per round (the
    * kcore discipline — each round reads the previous one, so
    * checkpointing keeps every plan flat AND bounded). At 100 TB the
    * graph build is the one heavy aggregate; the rounds touch a
    * ≤|V|²-edge nation frame.
    */
  def labelPropagationQ(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val und = QueriesWave9.nationUndirected(spark, dir)
    val l0 = Memo(spark, dir, "wave22:lpa0")(
      und.select(col("a").as("node")).distinct()
        .select(col("node"), col("node").as("lbl")))
    def round(prev: DataFrame, r: Int): DataFrame =
      Memo(spark, dir, s"wave22:lpa$r") {
        und
          .join(broadcast(prev.select(col("node").as("b"), col("lbl"))), "b")
          .select(col("a").as("node"), col("lbl"))
          .groupBy(col("node"), col("lbl")).agg(count(lit(1)).as("c"))
          .groupBy(col("node"))
          .agg(min_by(col("lbl"), struct((-col("c")).as("nc"), col("lbl"))).as("lbl"))
          .as[(Long, Long)].collect().toSeq.toDF("node", "lbl")
      }
    val fin = (1 to lpaRounds).foldLeft(l0)(round)
    val sizes = fin.groupBy(col("lbl")).agg(count(lit(1)).as("community_size"))
    fin.join(broadcast(sizes), "lbl")
      .select(col("node").as("nationkey"), col("lbl").as("community"),
        col("community_size"))
      .orderBy(col("nationkey"))
  }

  val labelPropagationSql: String = {
    val rounds = (1 to lpaRounds).map { r =>
      val p = r - 1
      s"""lab$r AS (SELECT node, lbl FROM (
         |  SELECT node, lbl, ROW_NUMBER() OVER (
         |      PARTITION BY node ORDER BY c DESC, lbl) AS rn
         |  FROM (SELECT e.a AS node, l.lbl, COUNT(*) AS c
         |        FROM und e JOIN lab$p l ON l.node = e.b GROUP BY 1, 2))
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${QueriesWave9.nationUndCte},
       |lab0 AS (SELECT DISTINCT a AS node, a AS lbl FROM und),
       |$rounds,
       |sz AS (SELECT lbl, CAST(COUNT(*) AS BIGINT) AS community_size
       |  FROM lab$lpaRounds GROUP BY 1)
       |SELECT f.node AS nationkey, f.lbl AS community, sz.community_size
       |FROM lab$lpaRounds f JOIN sz ON sz.lbl = f.lbl
       |ORDER BY nationkey""".stripMargin
  }

  // ---- mg_heavy_hitters: mergeable Misra–Gries summary + error audit ----

  val mgK = 8      // counters per summary
  val mgParts = 8  // md5 shards standing in for executor-local summaries

  /** Mergeable Misra–Gries heavy-hitters (Agarwal et al., SIGMOD'12
    * mergeable summaries) over event users — the DETERMINISTIC-bound
    * complement of `cms_freq` (probabilistic overcount) and `dp_topk`
    * (noised): each md5 shard's exact per-user counts compress to
    * [[mgK]] counters by subtracting the (k+1)-th largest count s_p and
    * clipping (the order-free equivalent of streaming MG), shard
    * summaries merge by summing surviving counters. Every step is
    * auditable: estimates only UNDERCOUNT, and the total undercount is
    * ≤ Σ_p s_p — both gates checked against the exact global counts.
    * Scale: per-shard top-(k+1) runs through [[graft.operators.Layout
    * .groupedTopK]] (no shard ever funnels its users through one
    * task); the merge touches ≤ shards × k rows. The md5 shard is the
    * reproducible stand-in for executor-local summaries — the merge
    * algebra is identical.
    */
  def mgHeavyHittersQ(spark: SparkSession, dir: String): DataFrame = {
    val cnt = Tables(spark, dir, "events")
      .select(col("user_id"),
        (conv(substring(md5(concat(lit("mg:"), col("user_id").cast("string"))),
          1, 13), 16, 10).cast("long") % mgParts).as("__p"))
      .groupBy(col("__p"), col("user_id")).agg(count(lit(1)).as("c"))
    val top = graft.operators.Layout.groupedTopK(
      cnt, Seq("__p"), Seq(col("c").desc, col("user_id")), mgK + 1, "rnk")
    val s = top.filter(col("rnk") === mgK + 1).select(col("__p"), col("c").as("__s"))
    val kept = top.filter(col("rnk") <= mgK)
      .join(broadcast(s), Seq("__p"), "left_outer")
      .withColumn("est", col("c") - coalesce(col("__s"), lit(0L)))
      .filter(col("est") > 0)
    val sTot = s.agg(coalesce(sum(col("__s")), lit(0L)).as("err_bound"))
    val hh = kept.groupBy(col("user_id")).agg(sum(col("est")).as("est"))
      .orderBy(col("est").desc, col("user_id")).limit(mgK)
    val truth = Tables(spark, dir, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("true_count"))
    hh.join(truth, "user_id").crossJoin(broadcast(sTot))
      .select(col("user_id"), col("est"), col("true_count"), col("err_bound"),
        (col("est") <= col("true_count")).as("under_ok"),
        (col("true_count") - col("est") <= col("err_bound")).as("bound_ok"))
      .orderBy(col("est").desc, col("user_id"))
  }

  val mgHeavyHittersSql: String =
    s"""WITH pc AS (SELECT
       |    CAST(('0x' || substr(md5('mg:' || CAST(user_id AS VARCHAR)), 1, 13))
       |      AS BIGINT) % $mgParts AS p,
       |    user_id, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM events GROUP BY 1, 2),
       |rk AS (SELECT *, ROW_NUMBER() OVER (
       |    PARTITION BY p ORDER BY c DESC, user_id) AS rnk FROM pc),
       |s AS (SELECT p, c AS s FROM rk WHERE rnk = ${mgK + 1}),
       |kept AS (SELECT r.user_id, r.c - COALESCE(s.s, 0) AS est
       |  FROM rk r LEFT JOIN s ON s.p = r.p
       |  WHERE r.rnk <= $mgK AND r.c - COALESCE(s.s, 0) > 0),
       |stot AS (SELECT CAST(COALESCE(SUM(s), 0) AS BIGINT) AS err_bound FROM s),
       |hh AS (SELECT user_id, CAST(SUM(est) AS BIGINT) AS est FROM kept
       |  GROUP BY 1 ORDER BY est DESC, user_id LIMIT $mgK),
       |tr AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS true_count
       |  FROM events GROUP BY 1)
       |SELECT h.user_id, h.est, t.true_count, st.err_bound,
       |  h.est <= t.true_count AS under_ok,
       |  t.true_count - h.est <= st.err_bound AS bound_ok
       |FROM hh h JOIN tr t USING (user_id), stot st
       |ORDER BY est DESC, user_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bh_fdr" -> (bhFdrQ _),
    "label_propagation" -> (labelPropagationQ _),
    "mg_heavy_hitters" -> (mgHeavyHittersQ _)
  )

  val oracleSql: Map[String, String] = Map(
    "bh_fdr" -> bhFdrSql,
    "label_propagation" -> labelPropagationSql,
    "mg_heavy_hitters" -> mgHeavyHittersSql
  )
}
