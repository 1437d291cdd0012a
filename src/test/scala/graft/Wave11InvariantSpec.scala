package graft

import org.apache.spark.sql.functions._

/** Invariants of the evaluation-loop wave: κ/MCC confusion algebra,
  * NDCG ordering properties, Lorenz convexity, and the PAV fixpoint.
  */
class Wave11InvariantSpec extends SparkSpec {

  test("cohen_kappa: confusion counts conserve the corpus, kappa <= po identity") {
    val r = QueriesWave11.cohenKappaQ(spark, sf).collect().head
    val n = r.getAs[Long]("n11") + r.getAs[Long]("n10") +
      r.getAs[Long]("n01") + r.getAs[Long]("n00")
    val docs = Tables(spark, sf, "documents").count()
    assert(n == docs, s"confusion total $n vs corpus $docs")
    val (po, pe, kappa) =
      (r.getAs[Double]("po"), r.getAs[Double]("pe"), r.getAs[Double]("kappa"))
    assert(po >= 0 && po <= 1 && pe >= 0 && pe <= 1)
    assert(math.abs(kappa - (po - pe) / (1 - pe)) < 1e-12)
    assert(kappa <= 1.0 + 1e-12)
  }

  test("ann_ndcg: ndcg in [0,1], perfect recall implies ndcg below 1 only by ordering") {
    val rows = QueriesWave11.annNdcgQ(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ndcg = r.getAs[Double]("ndcg")
      assert(ndcg >= 0.0 && ndcg <= 1.0 + 1e-12)
      assert(r.getAs[Long]("n_hits") <= r.getAs[Long]("n_returned"))
      // zero hits forces zero ndcg
      if (r.getAs[Long]("n_hits") == 0) assert(ndcg == 0.0)
      // ndcg == 1 requires the full true top-k in true order
      if (ndcg >= 1.0 - 1e-12) assert(r.getAs[Long]("n_hits") == QueriesText.topK)
    }
    // consistency with ann_recall: same probes, hits agree
    val rec = QueriesText.annRecallQ(spark, sf).collect()
      .map(r => r.getAs[Long]("probe_id") -> r.getAs[Long]("n_hits")).toMap
    rows.foreach { r =>
      assert(rec(r.getAs[Long]("probe_id")) == r.getAs[Long]("n_hits"))
    }
  }

  test("lorenz_curve: shares cumulative to 1, curve convex (below diagonal)") {
    val rows = QueriesWave11.lorenzCurveQ(spark, sf).collect().sortBy(_.getAs[Int]("decile"))
    assert(rows.length == 10)
    assert(math.abs(rows.last.getAs[Double]("cum_pop_share") - 1.0) < 1e-12)
    assert(math.abs(rows.last.getAs[Double]("cum_rev_share") - 1.0) < 1e-12)
    // Lorenz curve sits on or below the diagonal and is non-decreasing
    var prev = 0.0
    rows.foreach { r =>
      val (p, s) = (r.getAs[Double]("cum_pop_share"), r.getAs[Double]("cum_rev_share"))
      assert(s <= p + 1e-9, s"decile ${r.getAs[Int]("decile")}: rev share $s above pop $p")
      assert(s >= prev - 1e-12); prev = s
    }
    // increments non-decreasing (sorted by revenue → convex curve)
    val incs = rows.map(_.getAs[Double]("cum_rev_share"))
      .zip(0.0 +: rows.map(_.getAs[Double]("cum_rev_share")).init)
      .map { case (a, b) => a - b }
    incs.sliding(2).foreach { case Array(a, b) => assert(b >= a - 1e-9); case _ => }
  }

  test("mcc_gate_agreement: |MCC| <= 1 and matches a driver-side refit") {
    val r = QueriesWave11.mccGateAgreementQ(spark, sf).collect().head
    val (tp, fn, fp, tn) = (r.getAs[Long]("tp"), r.getAs[Long]("fn"),
      r.getAs[Long]("fp"), r.getAs[Long]("tn"))
    val mcc = r.getAs[Double]("mcc")
    assert(math.abs(mcc) <= 1.0 + 1e-9)
    val denom = math.sqrt((tp + fp).toDouble * (tp + fn) * (tn + fp) * (tn + fn))
    if (denom > 0) {
      val refit = (tp.toDouble * tn - fp.toDouble * fn) / denom
      assert(math.abs(refit - mcc) < 1e-5, s"refit $refit vs $mcc")
    }
  }

  test("isotonic_calibration: staircase is the PAV solution (monotone, mass-preserving)") {
    val fit = QueriesWave11.isotonicCalibrationQ(spark, sf).collect()
      .sortBy(_.getAs[Double]("score"))
    assert(fit.nonEmpty)
    fit.map(_.getAs[Double]("p_calibrated")).sliding(2).foreach {
      case Array(a, b) => assert(b >= a - 1e-12); case _ =>
    }
    fit.foreach(r => assert(r.getAs[Double]("p_calibrated") >= 0.0 &&
      r.getAs[Double]("p_calibrated") <= 1.0))
    val check = QueriesWave11.isotonicCheckQ(spark, sf).collect().head
    Seq("monotone_ok", "range_ok", "mass_ok", "fit_ok", "improves_ok")
      .foreach(cn => assert(check.getAs[Boolean](cn), s"$cn false"))
  }
}
