package graft

import org.apache.spark.sql.functions._

/** Invariants of the causal/sequential decision-statistics wave. */
class Wave15InvariantSpec extends SparkSpec {

  test("granger_lite: correlations and F internally consistent") {
    val r = QueriesWave15.grangerLiteQ(spark, sf).collect().head
    val (ryx, ryz, rxz, rp) = (r.getAs[Double]("r_yx"), r.getAs[Double]("r_yz"),
      r.getAs[Double]("r_xz"), r.getAs[Double]("r_partial"))
    Seq(ryx, ryz, rxz).foreach(v => assert(math.abs(v) <= 1.0 + 1e-9))
    val refit = (ryx - ryz * rxz) / math.sqrt((1 - ryz * ryz) * (1 - rxz * rxz))
    assert(math.abs(refit - rp) < 1e-12)
    val n = r.getAs[Long]("n")
    val f = (n - 3).toDouble * rp * rp / (1 - rp * rp)
    assert(math.abs(f - r.getAs[Double]("f_stat")) < 1e-9)
    assert(r.getAs[Boolean]("significant") == (f >= QueriesWave15.grCrit))
  }

  test("ratio_metric_ci: CI brackets the ratio symmetrically, se nonnegative") {
    val rows = QueriesWave15.ratioMetricCiQ(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (x, lo, hi, se) = (r.getAs[Double]("rev_per_order"), r.getAs[Double]("ci_lo"),
        r.getAs[Double]("ci_hi"), r.getAs[Double]("se"))
      assert(se >= 0.0)
      assert(lo <= x + 1e-9 && x <= hi + 1e-9)
      assert(math.abs((hi - x) - (x - lo)) < 1e-6, "CI symmetric around the ratio")
      assert(x > 0.0)
    }
  }

  test("sprt_audit: the LLR walk is the exact cumulative sum and stops consistently") {
    val rows = QueriesWave15.sprtAuditQ(spark, sf).collect().sortBy(_.getAs[Long]("day_s"))
    assert(rows.nonEmpty)
    var cum = 0L
    rows.foreach { r =>
      cum += r.getAs[Long]("k") * QueriesWave15.sprtL1 +
        (r.getAs[Long]("n") - r.getAs[Long]("k")) * QueriesWave15.sprtL0
      assert(cum == r.getAs[Long]("llr12"))
      val st = r.getAs[String]("state")
      if (cum >= QueriesWave15.sprtUpper) assert(st == "accept_h1")
      else if (cum <= QueriesWave15.sprtLower) assert(st == "accept_h0")
      else assert(st == "continue")
    }
    assert(rows.count(_.getAs[Boolean]("first_decision")) <= 1)
  }

  test("hazard_curve: at-risk telescopes, hazards in [0,1]") {
    val rows = QueriesWave15.hazardCurveQ(spark, sf).collect().sortBy(_.getAs[Long]("week"))
    assert(rows.nonEmpty)
    // at_risk non-increasing; each hazard a valid probability
    rows.map(_.getAs[Long]("at_risk")).sliding(2).foreach {
      case Array(a, b) => assert(b <= a); case _ =>
    }
    rows.foreach { r =>
      val h = r.getAs[Double]("hazard")
      assert(h >= 0.0 && h <= 1.0)
      assert(r.getAs[Long]("churned") <= r.getAs[Long]("at_risk"))
    }
    // total population equals the number of distinct users
    val users = Tables(spark, sf, "events").select(col("user_id")).distinct().count()
    assert(rows.head.getAs[Long]("at_risk") == users)
  }

  test("entropy_over_time: entropy in [0, ln k], evenness in [0,1]") {
    val rows = QueriesWave15.entropyOverTimeQ(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (h, k) = (r.getAs[Double]("entropy"), r.getAs[Long]("n_types"))
      assert(h >= -1e-9)
      assert(h <= math.log(k.toDouble) + 1e-6)
      if (k > 1) {
        val e = r.getAs[Double]("evenness")
        assert(e >= -1e-9 && e <= 1.0 + 1e-6)
      }
    }
  }
}
