package graft

import org.apache.spark.sql.functions._

/** Invariants of the segmentation / decomposition-strength /
  * grid-density / SRM wave.
  */
class Wave16InvariantSpec extends SparkSpec {

  test("binseg_changepoints: level-1 cut splits the series, level-2 cuts nest inside") {
    val rows = QueriesWave16.binsegChangepointsQ(spark, sf).collect()
    val l1 = rows.filter(_.getAs[Int]("level") == 1)
    assert(l1.length == 1 && l1.head.getAs[String]("segment") == "all")
    val cut1 = l1.head.getAs[Long]("day_s")
    val l2 = rows.filter(_.getAs[Int]("level") == 2)
    assert(l2.length <= 2)
    l2.foreach { r =>
      val d = r.getAs[Long]("day_s")
      if (r.getAs[String]("segment") == "left") assert(d <= cut1)
      else assert(d > cut1)
      assert(r.getAs[Long]("score") >= 0)
    }
  }

  test("seasonal_strength: strengths are valid shares and orderable vs variance") {
    val r = QueriesWave16.seasonalStrengthQ(spark, sf).collect().head
    val (fs, ft) = (r.getAs[Double]("f_seasonal"), r.getAs[Double]("f_trend"))
    assert(fs >= 0.0 && fs <= 1.0)
    assert(ft >= 0.0 && ft <= 1.0)
    assert(r.getAs[Long]("n_days") > 0)
  }

  test("grid_dbscan: mass conservation and core-cell threshold") {
    val rows = QueriesWave16.gridDbscanQ(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("n_points")).sum
    val vecs = Tables(spark, sf, "embeddings").count()
    assert(total == vecs, s"cluster+noise mass $total vs corpus $vecs")
    rows.filter(_.getAs[Long]("cluster_id") >= 0).foreach { r =>
      // every clustered cell holds >= minPts, so a cluster with c cells
      // carries at least c * minPts points
      assert(r.getAs[Long]("n_points") >=
        r.getAs[Long]("n_cells") * QueriesWave16.gdMinPts)
    }
  }

  test("srm_check: expectations sum to n, chi2 agrees with a driver refit") {
    val rows = QueriesWave16.srmCheckQ(spark, sf).collect()
    assert(rows.length == 3)
    val n = rows.map(_.getAs[Long]("observed")).sum
    val eSum = rows.map(_.getAs[Double]("expected")).sum
    assert(math.abs(eSum - n) < 1e-6)
    val chi = rows.head.getAs[Double]("chi2")
    val refit = rows.map { r =>
      val (o, e) = (r.getAs[Long]("observed").toDouble, r.getAs[Double]("expected"))
      math.round(1e6 * (o - e) * (o - e) / e) / 1e6
    }.sum
    assert(math.abs(refit - chi) < 1e-9, s"refit $refit vs $chi")
    rows.foreach(r => assert(r.getAs[Boolean]("srm_detected") ==
      (chi >= QueriesWave16.srmCrit)))
  }
}
