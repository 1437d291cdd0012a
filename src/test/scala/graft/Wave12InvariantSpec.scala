package graft

import org.apache.spark.sql.functions._

/** Invariants of the forecasting-hygiene / concentration / keyword /
  * TPC-H-completion wave.
  */
class Wave12InvariantSpec extends SparkSpec {

  test("rolling_origin_backtest: expanding origins, nonnegative errors") {
    val rows = QueriesWave12.rollingOriginBacktestQ(spark, sf).collect()
      .sortBy(_.getAs[Int]("fold"))
    assert(rows.length == QueriesWave12.backtestFolds)
    val trains = rows.map(_.getAs[Long]("train_days"))
    trains.sliding(2).foreach { case Array(a, b) => assert(b >= a); case _ => }
    rows.foreach { r =>
      assert(r.getAs[Long]("test_days_seasonal") >= 0)
      assert(r.getAs[Double]("mae_seasonal") >= 0.0)
      assert(r.getAs[Double]("mae_persist") >= 0.0)
    }
  }

  test("conformal_interval: bands centered on the prediction, covered flag consistent") {
    val rows = QueriesWave12.conformalIntervalQ(spark, sf).collect()
    assert(rows.nonEmpty)
    val cov = rows.head.getAs[Double]("coverage")
    assert(cov >= 0.0 && cov <= 1.0)
    val observed = rows.count(_.getAs[Boolean]("covered")).toDouble / rows.length
    assert(math.abs(observed - cov) < 1e-12)
    rows.foreach { r =>
      val (a, p, lo, hi) = (r.getAs[Long]("actual"), r.getAs[Long]("pred"),
        r.getAs[Long]("lo"), r.getAs[Long]("hi"))
      assert(lo <= p && p <= hi)
      assert(hi - p == p - lo, "band is symmetric around the prediction")
      assert(r.getAs[Boolean]("covered") == (a >= lo && a <= hi))
    }
  }

  test("hhi_index: bounded by the equal-share floor and the monopoly ceiling") {
    val rows = QueriesWave12.hhiIndexQ(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, hhi) = (r.getAs[Long]("n_suppliers"), r.getAs[Double]("hhi"))
      assert(hhi <= 1e4 + 1e-6)
      assert(hhi >= 1e4 / n - 1e-6, s"HHI $hhi below equal-share floor for n=$n")
      val bucket = r.getAs[String]("doj_bucket")
      if (hhi < 1500) assert(bucket == "unconcentrated")
      else if (hhi < 2500) assert(bucket == "moderate")
      else assert(bucket == "high")
    }
  }

  test("keyword_rake: scores are degree/freq with phrase-length floor 1") {
    val rows = QueriesWave12.keywordRakeQ(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= QueriesWave12.rakeTopK)
    rows.foreach { r =>
      val (f, d, s) = (r.getAs[Long]("freq"), r.getAs[Long]("degree"),
        r.getAs[Double]("score"))
      assert(f >= QueriesWave12.rakeMinFreq)
      assert(d >= f, "every occurrence contributes at least phrase length 1")
      assert(math.abs(s - d.toDouble / f) < 1e-12)
      assert(s >= 1.0)
    }
    // descending by score with word tie-break
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Double]("score") <= a.getAs[Double]("score") + 1e-12)
      case _ =>
    }
  }

  test("q11_stock_share: every kept part is above 1.5x the mean; shares consistent") {
    val rows = QueriesWave12.q11StockShareQ(spark, sf).collect()
    assert(rows.nonEmpty, "scale-free threshold should keep the heavy tail at any sf")
    rows.foreach { r =>
      // share > q11Mult / n_parts ⟺ value·n > tot·mult, and share sums ≤ 1
      assert(r.getAs[Long]("value_cents") > 0)
      assert(r.getAs[Double]("share") > 0.0 && r.getAs[Double]("share") <= 1.0)
    }
    assert(rows.map(_.getAs[Double]("share")).sum <= 1.0 + 1e-9)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("value_cents") <= a.getAs[Long]("value_cents"))
      case _ =>
    }
  }

  test("q20_excess_suppliers: every returned supplier has a qualifying widget part") {
    val sup = QueriesWave12.q20ExcessSuppliersQ(spark, sf).collect()
      .map(_.getAs[Long]("s_suppkey")).toSet
    // driver-side refit of the qualification predicate
    val widgets = Tables(spark, sf, "part")
      .filter(col("p_name").like(QueriesWave12.q20NamePat))
      .select(col("p_partkey")).collect().map(_.getLong(0)).toSet
    val li = Tables(spark, sf, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"),
        year(expr("CAST(l_shipdate AS TIMESTAMP)")).as("yr"),
        expr("CAST(l_quantity AS BIGINT)").as("q"))
      .collect()
      .filter(r => widgets.contains(r.getLong(0)))
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    val supply = li.filter(_._3 == QueriesWave12.q20SupplyYear)
      .groupBy(x => (x._1, x._2)).view.mapValues(_.map(_._4).sum).toMap
    val demand = li.filter(_._3 == QueriesWave12.q20DemandYear)
      .groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    val expected = supply.collect {
      case ((p, s), sup) if demand.getOrElse(p, 0L) > 0 &&
        sup * 2 > demand(p) => s
    }.toSet
    assert(sup == expected, s"got ${sup.size} suppliers, refit ${expected.size}")
  }
}
