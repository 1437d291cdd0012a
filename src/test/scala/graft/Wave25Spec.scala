package graft

class Wave25Spec extends SparkSpec {

  test("ppr_scores: a sub-stochastic distribution peaked at the seed") {
    val rows = QueriesWave25.pprScoresQ(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    for ((_, deg, p) <- rows) { assert(deg > 0); assert(p >= 0.0) }
    // every iteration floors inbound mass on the 2^20 grid, so total
    // mass can only leak DOWN from 1 — never up
    val mass = rows.map(_._3).sum
    assert(mass <= 1.0 + 1e-9 && mass >= 0.9, s"PPR mass $mass")
    // the teleport pins (1-alpha) on the seed every round: the seed
    // (smallest node id) must dominate
    val seed = rows.map(_._1).min
    val top = rows.maxBy(_._3)._1
    assert(top === seed, s"PPR peak at $top, seed is $seed")
  }

  test("permutation_test: a valid Monte-Carlo p on the A/A split") {
    val r = QueriesWave25.permutationTestQ(spark, sf).collect().head
    assert(r.getLong(1) === QueriesWave25.permTrials.toLong)
    val (nGe, p) = (r.getLong(3), r.getDouble(4))
    assert(nGe >= 0 && nGe <= QueriesWave25.permTrials)
    assert(p === (nGe + 1).toDouble / (QueriesWave25.permTrials + 1))
    assert(p > 0.0 && p <= 1.0)
    assert(r.getDouble(5) >= math.abs(r.getDouble(2)) || nGe === 0L)
  }

  test("theil_u: entropies and coefficients obey information bounds") {
    val r = QueriesWave25.theilUQ(spark, sf).collect().head
    val (hl, hs, hj, mi) =
      (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(hl >= 0 && hs >= 0)
    // subadditivity and monotonicity (1e-6-grid slack on each ln)
    assert(hj <= hl + hs + 1e-4, "joint entropy exceeded sum of marginals")
    assert(hj >= math.max(hl, hs) - 1e-4, "joint entropy below a marginal")
    assert(mi >= -1e-4)
    for (i <- 5 to 6 if !r.isNullAt(i)) {
      val u = r.getDouble(i)
      assert(u >= -1e-6 && u <= 1.0 + 1e-6, s"U out of [0,1]: $u")
    }
  }

  test("cochran_q: nonnegative statistic, consistent totals, chi2(2) p") {
    val r = QueriesWave25.cochranQQ(spark, sf).collect().head
    val n = r.getLong(0)
    for (i <- 1 to 3) assert(r.getLong(i) >= 0 && r.getLong(i) <= n)
    if (!r.isNullAt(4)) {
      val q = r.getDouble(4)
      assert(q >= 0.0)
      val p9 = r.getLong(5)
      assert(p9 >= 0L && p9 <= 1000000000L)
      // p = exp(-Q/2) exactly for df=2
      assert(math.abs(p9 - math.rint(1e9 * math.exp(-q / 2.0))) <= 1,
        "p9 drifted from the closed-form chi2(2) tail")
    }
  }

  test("fleiss_kappa: P-bar floor for 3 binary raters, kappa <= 1") {
    val r = QueriesWave25.fleissKappaQ(spark, sf).collect().head
    val (pPass, pBar, pE) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(pPass >= 0.0 && pPass <= 1.0)
    // per-doc agreement P_i = (r^2 + (3-r)^2 - 3)/6 has minimum 1/3
    assert(pBar >= 1.0 / 3 - 1e-12 && pBar <= 1.0)
    assert(pE >= 0.5 - 1e-12 && pE <= 1.0) // p^2 + (1-p)^2 in [1/2, 1]
    if (!r.isNullAt(4)) assert(r.getDouble(4) <= 1.0 + 1e-12)
  }

  test("stratified_est: the estimator's own audit columns are coherent") {
    val r = QueriesWave25.stratifiedEstQ(spark, sf).collect().head
    val (nf, ns) = (r.getLong(0), r.getLong(1))
    assert(ns > 0 && ns < nf, "1-in-16 sample must be a strict subset")
    val (est, tru, se, err) =
      (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
    assert(se > 0.0)
    assert(math.abs(err - math.abs(est - tru)) < 1e-12)
    assert(r.getBoolean(6) === (err <= 2.0 * se))
  }

  test("token_budget_plan: largest-remainder is exactly budget-preserving") {
    val rows = QueriesWave25.tokenBudgetPlanQ(spark, sf).collect()
    assert(rows.nonEmpty)
    val quotas = rows.map(_.getLong(3))
    assert(quotas.forall(_ >= 0L))
    assert(quotas.sum === QueriesWave25.tokenBudget,
      s"quotas sum ${quotas.sum} != budget")
    // a zero-weight source gets nothing
    for (r <- rows if r.getLong(2) === 0L) assert(r.getLong(3) === 0L)
  }

  test("hoeffding_plan: bound shrinks with n, plan covers all metrics") {
    val rows = QueriesWave25.hoeffdingPlanQ(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet ===
      QueriesWave25.hoeffMetrics.map { case (t, c) => s"$t.$c" }.toSet)
    for (r <- rows) {
      val (n, rng, eps) = (r.getLong(1), r.getDouble(2), r.getDouble(4))
      assert(n > 0 && rng > 0 && eps > 0)
      // the bound's form: doubling n divides eps by sqrt(2)
      assert(math.abs(eps - rng * math.sqrt(
        QueriesWave25.hoeffL / (2.0 * n))) < 1e-9)
      if (!r.isNullAt(5)) assert(r.getLong(5) >= 1L)
    }
  }
}
