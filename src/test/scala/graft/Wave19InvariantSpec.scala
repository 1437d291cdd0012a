package graft

import org.apache.spark.sql.functions._

/** Invariants of the rank-agreement / segmented-trend / ESS wave. */
class Wave19InvariantSpec extends SparkSpec {

  test("kendall_tau: pair algebra conserves and tau refits from the counts") {
    val r = QueriesWave19.kendallTauQ(spark, sf).collect().head
    val (n0, c, d) = (r.getAs[Long]("n_pairs"), r.getAs[Long]("concordant"),
      r.getAs[Long]("discordant"))
    assert(c + d <= n0)
    val tau = r.getAs[Double]("tau_b")
    assert(math.abs(tau) <= 1.0 + 1e-9)
    val (tx, ty) = (r.getAs[Long]("ties_x"), r.getAs[Long]("ties_y"))
    val se6 = math.round(1e6 * math.sqrt((n0 - tx).toDouble * (n0 - ty)))
    val refit = (c - d).toDouble * 1e6 / se6
    assert(math.abs(refit - tau) < 1e-12, s"refit $refit vs $tau")
  }

  test("segmented_trend: two segments partition the day frame") {
    val rows = QueriesWave19.segmentedTrendQ(spark, sf).collect()
    assert(rows.map(_.getAs[String]("segment")).toSet == Set("left", "right"))
    val days = Tables(spark, sf, "orders")
      .select(expr("date_trunc('DAY', o_orderdate)")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_days")).sum == days)
    rows.foreach(r => assert(r.getAs[Double]("mean_daily_dollars") > 0.0))
  }

  test("ess_autocorr: ESS positive and equals the closed form of the rho sum") {
    val r = QueriesWave19.essAutocorrQ(spark, sf).collect().head
    val (n, rs, ess) = (r.getAs[Long]("n_days"), r.getAs[Double]("rho_sum"),
      r.getAs[Double]("ess"))
    assert(ess > 0.0)
    assert(math.abs(ess - n / (1.0 + 2.0 * rs)) < 1e-9)
    assert(math.abs(r.getAs[Double]("ess_ratio") - ess / n) < 1e-12)
  }
}
