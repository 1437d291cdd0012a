package graft

import org.apache.spark.sql.functions._

/** Invariants of the distribution-alignment / robustness wave. */
class Wave13InvariantSpec extends SparkSpec {

  test("quantile_norm: cutpoints monotone in pct, shifts consistent") {
    val rows = QueriesWave13.quantileNormQ(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("pct"))
      sorted.map(_.getAs[Long]("src_cut")).sliding(2).foreach {
        case Array(a, b) => assert(b >= a); case _ =>
      }
      sorted.map(_.getAs[Long]("pool_cut")).sliding(2).foreach {
        case Array(a, b) => assert(b >= a); case _ =>
      }
      sorted.foreach(r => assert(
        r.getAs[Long]("shift") == r.getAs[Long]("src_cut") - r.getAs[Long]("pool_cut")))
    }
    // median cutpoint agrees with a driver-side nearest-rank refit for one source
    val src = rows.head.getAs[String]("source")
    val vals = Tables(spark, sf, "documents").filter(col("source") === src)
      .select(col("n_chars")).collect().map(_.getLong(0)).sorted
    val want = vals((math.ceil(vals.length * 0.5) - 1).toInt.max(0))
    val got = rows.find(r => r.getAs[String]("source") == src && r.getAs[Int]("pct") == 50)
      .get.getAs[Long]("src_cut")
    assert(got == want, s"P50 refit $want vs $got")
  }

  test("winsorize_stats: winsorized mean within clip bounds, clipping counted") {
    val rows = QueriesWave13.winsorizeStatsQ(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p5, p95) = (r.getAs[Double]("p5"), r.getAs[Double]("p95"))
      val mw = r.getAs[Double]("mean_winsorized")
      assert(p5 <= p95)
      assert(mw >= p5 - 1e-9 && mw <= p95 + 1e-9,
        s"${r.getAs[String]("event_type")}: winsorized mean $mw outside [$p5,$p95]")
      // ~5% in each tail by construction of the nearest-rank cutpoints
      val n = r.getAs[Long]("n")
      assert(r.getAs[Long]("clipped_lo") <= n / 20 + 1)
      assert(r.getAs[Long]("clipped_hi") <= n / 20 + 1)
    }
  }

  test("heavy_change: scores descending, support floor honored, score refits") {
    val rows = QueriesWave13.heavyChangeQ(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= QueriesWave13.hcTopK)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("change_score") <= a.getAs[Long]("change_score"))
      case _ =>
    }
    val n1 = rows.map(_.getAs[Long]("c1"))
    val n2 = rows.map(_.getAs[Long]("c2"))
    rows.foreach(r => assert(r.getAs[Long]("c1") + r.getAs[Long]("c2") >=
      QueriesWave13.hcMinCount))
    // recompute totals and verify one row's score
    val ev = Tables(spark, sf, "events")
      .select(col("user_id"), expr("unix_micros(ts)").as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val (d0, d1) = (ev.map(_._2).min, ev.map(_._2).max)
    val byUser = ev.groupBy(_._1).view.mapValues { xs =>
      (xs.count(_._2 * 2 <= d0 + d1).toLong, xs.count(_._2 * 2 > d0 + d1).toLong)
    }.toMap
    val tot1 = byUser.values.map(_._1).sum
    val tot2 = byUser.values.map(_._2).sum
    rows.foreach { r =>
      val (c1, c2) = byUser(r.getAs[Long]("user_id"))
      assert(c1 == r.getAs[Long]("c1") && c2 == r.getAs[Long]("c2"))
      assert(math.abs(c1 * tot2 - c2 * tot1) == r.getAs[Long]("change_score"))
    }
  }

  test("simpson_paradox_audit: correlations valid, reversal flag consistent") {
    val rows = QueriesWave13.simpsonParadoxAuditQ(spark, sf).collect()
    assert(rows.nonEmpty)
    val pooled = rows.head.getAs[Double]("corr_pooled")
    rows.foreach { r =>
      val cs = r.getAs[Double]("corr_stratum")
      assert(math.abs(cs) <= 1.0 + 1e-6)
      assert(math.abs(r.getAs[Double]("corr_pooled") - pooled) < 1e-12)
      assert(r.getAs[Boolean]("sign_reversed") ==
        ((cs > 0 && pooled < 0) || (cs < 0 && pooled > 0)))
    }
  }
}
