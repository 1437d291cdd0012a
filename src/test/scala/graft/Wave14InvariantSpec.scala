package graft

import org.apache.spark.sql.functions._

/** Invariants of the stylometry / JL / extreme-value / whiteness wave. */
class Wave14InvariantSpec extends SparkSpec {

  test("burrows_delta: symmetric pair coverage, nonnegative, identical sources score 0") {
    val rows = QueriesWave14.burrowsDeltaQ(spark, sf).collect()
    val srcs = rows.flatMap(r => Seq(r.getAs[String]("src_a"), r.getAs[String]("src_b"))).toSet
    assert(rows.length == srcs.size * (srcs.size - 1) / 2)
    rows.foreach { r =>
      assert(r.getAs[Double]("delta") >= 0.0)
      assert(r.getAs[Long]("n_words") > 0 &&
        r.getAs[Long]("n_words") <= QueriesWave14.bdTopWords)
    }
  }

  test("jl_projection_audit: ratios concentrate near 1 (JL guarantee at k=16)") {
    val r = QueriesWave14.jlProjectionAuditQ(spark, sf).collect().head
    assert(r.getAs[Long]("n_pairs") > 0)
    val mean = r.getAs[Double]("mean_ratio")
    assert(mean > 0.5 && mean < 2.0, s"mean distortion $mean way off 1")
    assert(r.getAs[Double]("min_ratio") <= mean && mean <= r.getAs[Double]("max_ratio"))
    // most pairs within 2x distortion at k=16
    assert(r.getAs[Long]("n_within_2x") * 10 >= r.getAs[Long]("n_pairs") * 8,
      "fewer than 80% of pairs within 2x distortion")
  }

  test("extreme_value_pot: threshold is a real P90, moments internally consistent") {
    val r = QueriesWave14.extremeValuePotQ(spark, sf).collect().head
    val days = Tables(spark, sf, "events")
      .groupBy(expr("unix_micros(date_trunc('DAY', ts))")).count()
      .collect().map(_.getLong(1))
    val u = r.getAs[Long]("threshold")
    // ~10% of days exceed an exact nearest-rank P90
    val exceed = days.count(_ > u)
    assert(exceed == r.getAs[Long]("n_exceed"))
    assert(exceed <= math.ceil(days.length * 0.1).toInt + 1)
    assert(r.getAs[Double]("mean_excess") > 0.0)
    assert(r.getAs[Boolean]("heavy_tail") == (r.getAs[Double]("xi_hat") > 0.0))
    // MOM identities: beta = m(1 - xi) for the fitted pair
    val (xi, beta, m) = (r.getAs[Double]("xi_hat"), r.getAs[Double]("beta_hat"),
      r.getAs[Double]("mean_excess"))
    assert(math.abs(beta - m * (1 - xi)) < 1e-9, s"beta $beta vs m(1-xi) ${m * (1 - xi)}")
  }

  test("ljung_box: Q nonnegative and consistent with the autocorr query's rhos") {
    val r = QueriesWave14.ljungBoxQ(spark, sf).collect().head
    val q = r.getAs[Double]("q_stat")
    assert(q >= 0.0)
    assert(r.getAs[Int]("df") == QueriesWave14.lbLags)
    assert(r.getAs[Boolean]("significant") == (q >= QueriesWave14.lbCrit))
    // refit from the autocorr query's exact moment columns
    val n = r.getAs[Long]("n_days").toDouble
    val rhos = QueriesWave6.autocorrQ(spark, sf).collect()
      .filter(_.getAs[Long]("lag") <= QueriesWave14.lbLags)
      .map(x => (x.getAs[Long]("lag"), x.getAs[Double]("r")))
    val refit = n * (n + 2) * rhos.map { case (k, rho) =>
      val r6 = math.round(1e6 * rho)
      math.round(r6.toDouble * r6 / (n - k)) / 1e12
    }.sum
    assert(math.abs(refit - q) < 1e-6, s"refit $refit vs $q")
  }
}
