package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9 wave: the classical hypothesis-test family the drift/audit
  * stack was still missing — one-way ANOVA (variance decomposition),
  * Kruskal–Wallis (its rank-based twin), Spearman rank correlation,
  * and pairwise Welch t-tests. All follow the repo's parity discipline:
  * moments as exact DECIMAL(38,0)/HUGEINT integers on a quantization
  * grid, per-group terms quantized to integers before any order-
  * dependent sum, ONE quantized √ per pair, and rank computation via
  * the range-partitioned prefix-sum plan (no single-partition window
  * over data-scale frames).
  */
object QueriesWave10 {

  private def dec(c: Column): Column = c.cast("decimal(38,0)")

  /** Midranks over a quantized integer value column, 2×-scaled so ties'
    * half-ranks stay integers: mr2(v) = 2·|{x < v}| + t_v + 1.
    *
    * Scale path: the value-level frame (one row per DISTINCT quantized
    * value — bounded by the grid, not the data) is range-partitioned,
    * per-partition counts become cumulative offsets (a window over
    * ≤ #shuffle-partitions rows), and the within-partition prefix runs
    * partitioned by partition id — the `Encoding.dictionary` rank
    * discipline, so no global-sort single-partition window ever sees
    * the frame.
    */
  def valueMidranks2(df: DataFrame, value: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vt = df.select(value.as("__v")).na.drop()
      .groupBy(col("__v")).agg(count(lit(1)).as("__t"))
    val stamped = vt
      .repartitionByRange(col("__v"))
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val offsets = stamped
      .groupBy(col("__pid")).agg(sum(col("__t")).as("__n"))
      .withColumn("__off",
        coalesce(
          sum(col("__n")).over(
            Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__pid"), col("__off"))
    stamped
      .join(broadcast(offsets), "__pid")
      .withColumn("__pre",
        col("__off") + coalesce(
          sum(col("__t")).over(
            Window.partitionBy(col("__pid")).orderBy(col("__v"))
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__v"), col("__t"),
        (lit(2L) * col("__pre") + col("__t") + lit(1L)).as("__mr2"))
  }

  /** The same midrank table as a DuckDB subquery (single-node oracle —
    * a plain window is fine there). */
  private def midranksSub(table: String, valueExpr: String): String =
    s"""(SELECT __v, __t, 2 * COALESCE(SUM(__t) OVER (ORDER BY __v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |    + __t + 1 AS __mr2
       |  FROM (SELECT $valueExpr AS __v, CAST(COUNT(*) AS BIGINT) AS __t
       |        FROM $table WHERE $valueExpr IS NOT NULL GROUP BY 1))""".stripMargin

  // ---- anova_oneway: one-way ANOVA F-test across event types ----

  /** F(4, ∞) 0.95 critical value, driver-quantized literal. */
  val anovaCrit = 2.371902

  /** One-way ANOVA of `events.value` (1e-2 grid) across event types:
    * SS_between = Σ n_j(x̄_j−x̄)², SS_within = Σ (n_jS_j−T_j²)/n_j,
    * F = (SSB/(k−1))/(SSW/(N−k)) — the "does the group label explain
    * the variance" omnibus screen in front of the pairwise tests.
    * Per-group (n, T, S) moments are exact DECIMAL(38,0) one-scan
    * aggregates; each group's SS term is one double division of exact
    * integers rounded back to an integer before the k-row sum, so no
    * order-dependent float accumulation exists anywhere.
    */
  def anovaOnewayQ(spark: SparkSession, dir: String): DataFrame = {
    val v2 = expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")
    val g = Tables(spark, dir, "events")
      .select(col("event_type"), v2.as("__x"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_j"),
        sum(dec(col("__x"))).as("t_j"),
        sum(dec(col("__x") * col("__x"))).as("s_j"))
    val tot = g.agg(sum(col("n_j")).as("nn"), sum(col("t_j")).as("tt"),
      count(lit(1)).as("k"))
    val terms = g.crossJoin(broadcast(tot))
      .withColumn("ssw_q",
        round((dec(col("n_j")) * col("s_j") - col("t_j") * col("t_j")).cast("double") /
          col("n_j").cast("double")).cast("decimal(38,0)"))
      .withColumn("__d", (dec(col("nn")) * col("t_j") - dec(col("n_j")) * col("tt"))
        .cast("double"))
      .withColumn("ssb_q",
        round(col("__d") * col("__d") /
          (col("n_j").cast("double") * col("nn").cast("double") * col("nn").cast("double")))
          .cast("decimal(38,0)"))
    terms
      .groupBy(col("nn"), col("k"))
      .agg(sum(col("ssb_q")).as("__ssb"), sum(col("ssw_q")).as("__ssw"))
      .select(col("nn").as("n"), col("k"),
        (col("__ssb").cast("double") / 1e4).as("ss_between"),
        (col("__ssw").cast("double") / 1e4).as("ss_within"),
        ((col("__ssb").cast("double") / (col("k") - 1).cast("double")) /
          (col("__ssw").cast("double") / (col("nn") - col("k")).cast("double")))
          .as("f_stat"),
        (col("__ssb").cast("double") /
          (col("__ssb") + col("__ssw")).cast("double")).as("eta_sq"))
      .withColumn("significant", col("f_stat") >= anovaCrit)
  }

  val anovaOnewaySql: String =
    s"""WITH g AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_j,
       |    CAST(SUM(__x) AS HUGEINT) AS t_j, CAST(SUM(__x * __x) AS HUGEINT) AS s_j
       |  FROM (SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS __x
       |        FROM events) GROUP BY 1),
       |tot AS (SELECT CAST(SUM(n_j) AS HUGEINT) AS nn, SUM(t_j) AS tt,
       |    CAST(COUNT(*) AS BIGINT) AS k FROM g),
       |terms AS (
       |  SELECT nn, k,
       |    CAST(round(CAST(n_j * s_j - t_j * t_j AS DOUBLE)
       |      / CAST(n_j AS DOUBLE)) AS HUGEINT) AS ssw_q,
       |    CAST(round(CAST(nn * t_j - n_j * tt AS DOUBLE) * CAST(nn * t_j - n_j * tt AS DOUBLE)
       |      / (CAST(n_j AS DOUBLE) * CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE))) AS HUGEINT)
       |      AS ssb_q
       |  FROM g, tot),
       |s AS (SELECT nn, k, SUM(ssb_q) AS ssb, SUM(ssw_q) AS ssw
       |  FROM terms GROUP BY 1, 2)
       |SELECT CAST(nn AS BIGINT) AS n, k,
       |  CAST(ssb AS DOUBLE) / 1e4 AS ss_between,
       |  CAST(ssw AS DOUBLE) / 1e4 AS ss_within,
       |  (CAST(ssb AS DOUBLE) / CAST(k - 1 AS DOUBLE))
       |    / (CAST(ssw AS DOUBLE) / CAST(nn - k AS DOUBLE)) AS f_stat,
       |  CAST(ssb AS DOUBLE) / CAST(ssb + ssw AS DOUBLE) AS eta_sq,
       |  (CAST(ssb AS DOUBLE) / CAST(k - 1 AS DOUBLE))
       |    / (CAST(ssw AS DOUBLE) / CAST(nn - k AS DOUBLE)) >= $anovaCrit AS significant
       |FROM s""".stripMargin

  // ---- kruskal_wallis: rank-based k-sample test with tie correction ----

  /** χ²(4) 0.95 critical value, driver-quantized literal. */
  val kwCrit = 9.487729

  /** Kruskal–Wallis H across event types on the 1e-2-quantized value
    * grid, with the tie-corrected statistic (heavy grid ties make the
    * correction material): H = 12/(N(N+1))·ΣR_j²/n_j − 3(N+1),
    * H_c = H/(1 − Σ(t³−t)/(N³−N)). Midranks come from the distributed
    * 2×-scaled prefix plan ([[valueMidranks2]]); per-group rank sums
    * are exact decimals (group counts × integer midranks), each R_j²/n_j
    * term is rounded to an integer before the k-row sum. Output is one
    * row per group (n, rank sum) carrying the shared H verdict columns.
    */
  def kruskalWallisQ(spark: SparkSession, dir: String): DataFrame = {
    val v2 = expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")
    val ev = Tables(spark, dir, "events").select(col("event_type"), v2.as("__v"))
    val mr = Memo(spark, dir, "wave10:valueMidranks")(
      valueMidranks2(Tables(spark, dir, "events"), v2))
    val cj = ev.groupBy(col("event_type"), col("__v")).agg(count(lit(1)).as("__c"))
      .join(mr.select(col("__v"), col("__mr2")), "__v")
      .groupBy(col("event_type"))
      .agg(sum(dec(col("__c"))).as("n_j_d"),
        sum(dec(col("__c")) * dec(col("__mr2"))).as("r2_j"))
      .withColumn("n_j", col("n_j_d").cast("bigint"))
    val tot = mr.agg(sum(dec(col("__t"))).as("nn_d"),
      sum(dec(col("__t")) * dec(col("__t")) * dec(col("__t")) - dec(col("__t")))
        .as("tie3"))
    val terms = cj.crossJoin(broadcast(tot))
      .withColumn("term_q",
        round((col("r2_j").cast("double") / 2.0) * (col("r2_j").cast("double") / 2.0) /
          col("n_j").cast("double")).cast("decimal(38,0)"))
    val h = terms
      .groupBy(col("nn_d"), col("tie3"))
      .agg(sum(col("term_q")).as("__st"))
      .withColumn("__n", col("nn_d").cast("double"))
      .select(col("nn_d"), col("tie3"),
        (lit(12.0) * col("__st").cast("double") / (col("__n") * (col("__n") + 1.0)) -
          lit(3.0) * (col("__n") + 1.0)).as("h"))
      .withColumn("h_tie_corrected",
        col("h") / (lit(1.0) - col("tie3").cast("double") /
          (col("nn_d") * col("nn_d") * col("nn_d") - col("nn_d")).cast("double")))
    cj.crossJoin(broadcast(h))
      .select(col("event_type"), col("n_j").as("n"),
        (col("r2_j").cast("double") / 2.0).as("rank_sum"),
        col("nn_d").cast("bigint").as("n_total"), col("h"), col("h_tie_corrected"),
        (col("h_tie_corrected") >= kwCrit).as("significant"))
      .orderBy(col("event_type"))
  }

  val kruskalWallisSql: String = {
    val mrSub = midranksSub("events", "CAST(floor(value * 100 + 0.5) AS BIGINT)")
    s"""WITH mr AS $mrSub,
       |cj AS (
       |  SELECT event_type, CAST(SUM(c) AS BIGINT) AS n_j,
       |    CAST(SUM(CAST(c AS HUGEINT) * __mr2) AS HUGEINT) AS r2_j
       |  FROM (SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS __v,
       |          CAST(COUNT(*) AS BIGINT) AS c
       |        FROM events GROUP BY 1, 2) e
       |  JOIN mr USING (__v) GROUP BY 1),
       |tot AS (SELECT CAST(SUM(__t) AS HUGEINT) AS nn,
       |    CAST(SUM(CAST(__t AS HUGEINT) * __t * __t - __t) AS HUGEINT) AS tie3
       |  FROM mr),
       |terms AS (SELECT cj.*, tot.nn, tot.tie3,
       |    CAST(round((CAST(r2_j AS DOUBLE) / 2.0) * (CAST(r2_j AS DOUBLE) / 2.0)
       |      / CAST(n_j AS DOUBLE)) AS HUGEINT) AS term_q
       |  FROM cj, tot),
       |h AS (SELECT nn, tie3,
       |    12.0 * CAST(SUM(term_q) AS DOUBLE) / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) + 1.0))
       |      - 3.0 * (CAST(nn AS DOUBLE) + 1.0) AS h
       |  FROM terms GROUP BY 1, 2),
       |hc AS (SELECT nn, h,
       |    h / (1.0 - CAST(tie3 AS DOUBLE) / CAST(nn * nn * nn - nn AS DOUBLE))
       |      AS h_tie_corrected
       |  FROM h)
       |SELECT cj.event_type, cj.n_j AS n, CAST(cj.r2_j AS DOUBLE) / 2.0 AS rank_sum,
       |  CAST(hc.nn AS BIGINT) AS n_total, hc.h, hc.h_tie_corrected,
       |  hc.h_tie_corrected >= $kwCrit AS significant
       |FROM cj, hc ORDER BY event_type""".stripMargin
  }

  // ---- spearman_rho: rank correlation over lineitem measure pairs ----

  /** (pair label, x quantized expr, y quantized expr) on lineitem. */
  val spearmanPairs: Seq[(String, String, String)] = Seq(
    ("lineitem.l_quantity:l_extendedprice",
      "CAST(l_quantity AS BIGINT)",
      "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"),
    ("lineitem.l_discount:l_tax",
      "CAST(floor(l_discount * 100 + 0.5) AS BIGINT)",
      "CAST(floor(l_tax * 100 + 0.5) AS BIGINT)"))

  /** Spearman rank correlation: Pearson over midranks, ties as
    * half-ranks. Both columns' midrank maps come from the distributed
    * prefix plan (2×-scaled integers, so the scale cancels in ρ); every
    * row joins its two midranks (value-keyed joins against grid-bounded
    * maps) and one exact-decimal moment aggregate feeds the
    * `corr_matrix` covariance discipline — numerators exact until the
    * final cast, one √ per side.
    */
  def spearmanRhoQ(spark: SparkSession, dir: String): DataFrame =
    spearmanPairs.map { case (label, xe, ye) =>
      val li = Tables(spark, dir, "lineitem")
        .select(expr(xe).as("__x"), expr(ye).as("__y"))
      val mx = Memo(spark, dir, s"wave10:mr:$xe")(
        valueMidranks2(Tables(spark, dir, "lineitem"), expr(xe)))
        .select(col("__v").as("__x"), col("__mr2").as("__ra"))
      val my = Memo(spark, dir, s"wave10:mr:$ye")(
        valueMidranks2(Tables(spark, dir, "lineitem"), expr(ye)))
        .select(col("__v").as("__y"), col("__mr2").as("__rb"))
      val m = li.join(mx, "__x").join(my, "__y")
        .agg(count(lit(1)).as("n"),
          sum(dec(col("__ra"))).as("sa"), sum(dec(col("__rb"))).as("sb"),
          sum(dec(col("__ra")) * dec(col("__ra"))).as("qa"),
          sum(dec(col("__rb")) * dec(col("__rb"))).as("qb"),
          sum(dec(col("__ra")) * dec(col("__rb"))).as("p"))
      def nd = dec(col("n"))
      m.select(lit(label).as("col_pair"), col("n"),
        ((nd * col("p") - col("sa") * col("sb")).cast("double") /
          (sqrt((nd * col("qa") - col("sa") * col("sa")).cast("double")) *
            sqrt((nd * col("qb") - col("sb") * col("sb")).cast("double")))).as("rho"))
    }.reduce(_.unionAll(_)).orderBy(col("col_pair"))

  val spearmanRhoSql: String =
    spearmanPairs.map { case (label, xe, ye) =>
      val mx = midranksSub("lineitem", xe)
      val my = midranksSub("lineitem", ye)
      s"""SELECT '$label' AS col_pair, n,
         |  CAST(CAST(n AS HUGEINT) * p - sa * sb AS DOUBLE)
         |    / (sqrt(CAST(CAST(n AS HUGEINT) * qa - sa * sa AS DOUBLE))
         |       * sqrt(CAST(CAST(n AS HUGEINT) * qb - sb * sb AS DOUBLE))) AS rho
         |FROM (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(ra) AS HUGEINT) AS sa, CAST(SUM(rb) AS HUGEINT) AS sb,
         |    CAST(SUM(CAST(ra AS HUGEINT) * ra) AS HUGEINT) AS qa,
         |    CAST(SUM(CAST(rb AS HUGEINT) * rb) AS HUGEINT) AS qb,
         |    CAST(SUM(CAST(ra AS HUGEINT) * rb) AS HUGEINT) AS p
         |  FROM (
         |    SELECT mx.__mr2 AS ra, my.__mr2 AS rb
         |    FROM (SELECT $xe AS __x, $ye AS __y FROM lineitem) li
         |    JOIN $mx mx ON li.__x = mx.__v
         |    JOIN $my my ON li.__y = my.__v))""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col_pair")

  // ---- welch_ttest_pairs: pairwise Welch t-tests between sources ----

  /** Φ⁻¹(0.975), the large-sample two-sided 5% critical value. */
  val welchCrit = 1.959964

  /** Pairwise Welch (unequal-variance) t-tests on document length
    * (`n_chars`) between every source pair — the continuous-measure
    * companion to `prop_ztest_pairs`' rate test: t = (x̄₁−x̄₂)/√(v₁/n₁+v₂/n₂)
    * with Welch–Satterthwaite df. Per-source (n, Σx, Σx²) is one
    * memoized scan; the pair stage is ≤ #sources² rows with exact-decimal
    * sample variances ((nS−T²)/(n(n−1))) and ONE quantized √ per pair.
    */
  def welchTtestPairsQ(spark: SparkSession, dir: String): DataFrame = {
    val m = Memo(spark, dir, "wave10:srcLenMoments")(
      Tables(spark, dir, "documents")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("n_chars"))).as("t"),
          sum(dec(col("n_chars") * col("n_chars"))).as("s")))
    def varOf(n: Column, t: Column, s: Column): Column =
      (dec(n) * s - t * t).cast("double") /
        (n.cast("double") * (n - 1).cast("double"))
    val a = m.select(col("source").as("src_a"), col("n").as("n1"),
      col("t").as("t1"), col("s").as("s1"))
    val b = m.select(col("source").as("src_b"), col("n").as("n2"),
      col("t").as("t2"), col("s").as("s2"))
    a.join(b, col("src_a") < col("src_b"))
      .withColumn("v1n", varOf(col("n1"), col("t1"), col("s1")) / col("n1").cast("double"))
      .withColumn("v2n", varOf(col("n2"), col("t2"), col("s2")) / col("n2").cast("double"))
      .withColumn("se6",
        expr("CAST(round(1e6 * sqrt(v1n + v2n)) AS BIGINT)"))
      .select(col("src_a"), col("src_b"), col("n1"), col("n2"),
        (col("t1").cast("double") / col("n1").cast("double")).as("mean_a"),
        (col("t2").cast("double") / col("n2").cast("double")).as("mean_b"),
        ((col("t1").cast("double") / col("n1").cast("double") -
          col("t2").cast("double") / col("n2").cast("double")) * 1e6 /
          col("se6").cast("double")).as("t_stat"),
        ((col("v1n") + col("v2n")) * (col("v1n") + col("v2n")) /
          (col("v1n") * col("v1n") / (col("n1") - 1).cast("double") +
            col("v2n") * col("v2n") / (col("n2") - 1).cast("double"))).as("df_welch"))
      .withColumn("significant", abs(col("t_stat")) >= welchCrit)
      .orderBy(col("src_a"), col("src_b"))
  }

  val welchTtestPairsSql: String =
    s"""WITH m AS (
       |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(n_chars) AS HUGEINT) AS t,
       |    CAST(SUM(CAST(n_chars AS HUGEINT) * n_chars) AS HUGEINT) AS s
       |  FROM documents GROUP BY 1),
       |p AS (
       |  SELECT a.source AS src_a, b.source AS src_b,
       |    a.n AS n1, a.t AS t1, a.s AS s1, b.n AS n2, b.t AS t2, b.s AS s2
       |  FROM m a JOIN m b ON a.source < b.source),
       |v AS (SELECT *,
       |    CAST(n1 * s1 - t1 * t1 AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n1 - 1 AS DOUBLE))
       |      / CAST(n1 AS DOUBLE) AS v1n,
       |    CAST(n2 * s2 - t2 * t2 AS DOUBLE) / (CAST(n2 AS DOUBLE) * CAST(n2 - 1 AS DOUBLE))
       |      / CAST(n2 AS DOUBLE) AS v2n
       |  FROM p),
       |se AS (SELECT *, CAST(round(1e6 * sqrt(v1n + v2n)) AS BIGINT) AS se6 FROM v)
       |SELECT src_a, src_b, n1, n2,
       |  CAST(t1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS mean_a,
       |  CAST(t2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS mean_b,
       |  (CAST(t1 AS DOUBLE) / CAST(n1 AS DOUBLE)
       |    - CAST(t2 AS DOUBLE) / CAST(n2 AS DOUBLE)) * 1e6 / CAST(se6 AS DOUBLE) AS t_stat,
       |  (v1n + v2n) * (v1n + v2n)
       |    / (v1n * v1n / CAST(n1 - 1 AS DOUBLE) + v2n * v2n / CAST(n2 - 1 AS DOUBLE))
       |    AS df_welch,
       |  abs((CAST(t1 AS DOUBLE) / CAST(n1 AS DOUBLE)
       |    - CAST(t2 AS DOUBLE) / CAST(n2 AS DOUBLE)) * 1e6 / CAST(se6 AS DOUBLE))
       |    >= $welchCrit AS significant
       |FROM se ORDER BY src_a, src_b""".stripMargin

  // ---- registry ----

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "anova_oneway" -> (anovaOnewayQ _),
    "kruskal_wallis" -> (kruskalWallisQ _),
    "spearman_rho" -> (spearmanRhoQ _),
    "welch_ttest_pairs" -> (welchTtestPairsQ _)
  )

  def oracleSql: Map[String, String] = Map(
    "anova_oneway" -> anovaOnewaySql,
    "kruskal_wallis" -> kruskalWallisSql,
    "spearman_rho" -> spearmanRhoSql,
    "welch_ttest_pairs" -> welchTtestPairsSql
  )
}
