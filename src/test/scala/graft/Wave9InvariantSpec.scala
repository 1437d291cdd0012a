package graft

import org.apache.spark.sql.functions._

/** Mathematical invariants of the round-8 second wave: estimator
  * identities, exact-budget conservation, fixpoint convergence, and a
  * brute-force recall oracle.
  */
class Wave9InvariantSpec extends SparkSpec {

  test("chao1_est never falls below the observed sample richness") {
    QueriesWave9.chao1EstQ(spark, sf).collect().foreach { r =>
      assert(r.getAs[Double]("chao1_est") >= r.getAs[Long]("d_sample").toDouble)
      assert(r.getAs[Double]("q_err") >= 1.0)
    }
  }

  test("ht_total_est: estimate is 16x the sample sum and rel_err is consistent") {
    val rows = QueriesWave9.htTotalEstQ(spark, sf).collect()
    assert(rows.length == QueriesWave9.htMeasures.size)
    rows.foreach { r =>
      assert(r.getAs[Long]("est_cents") % QueriesWave8.geeRate == 0)
      val re = (r.getAs[Long]("est_cents") - r.getAs[Long]("actual_cents")).toDouble /
        r.getAs[Long]("actual_cents")
      assert(math.abs(re - r.getAs[Double]("rel_err")) < 1e-12)
      // a 1-in-16 Bernoulli sample of ~thousands of rows: the HT total
      // should land within 50% even at the smallest test scale
      assert(math.abs(re) < 0.5, s"${r.getAs[String]("measure")}: rel_err $re")
    }
  }

  test("neyman_alloc: allocations sum exactly to the budget, weights ordered sanely") {
    val rows = QueriesWave9.neymanAllocQ(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("alloc")).sum == QueriesWave9.neymanBudget)
    rows.foreach { r =>
      assert(r.getAs[Long]("alloc") >= 0)
      assert(r.getAs[Double]("sd_cents") >= 0.0)
    }
    // a stratum with more rows AND bigger spread must not get less than
    // a strictly smaller-weight stratum (floor+remainder preserves order)
    val byW = rows.sortBy(r => r.getAs[Double]("sd_cents") * r.getAs[Long]("n_h"))
    byW.zip(byW.tail).foreach { case (lo, hi) =>
      assert(lo.getAs[Long]("alloc") <= hi.getAs[Long]("alloc") + 1)
    }
  }

  test("heaps_law_fit: slope finite and consistent with a driver-side refit") {
    val r = QueriesWave9.heapsLawFitQ(spark, sf).collect().head
    assert(!r.getAs[Double]("beta").isNaN)
    val pts = QueriesWave8.srcWordCounts(spark, sf)
      .groupBy(col("source"))
      .agg(sum(col("a")).as("n"), count(lit(1)).as("v"))
      .collect()
      .map(x => (math.round(math.log(x.getAs[Long]("n").toDouble) * 1e6),
        math.round(math.log(x.getAs[Long]("v").toDouble) * 1e6)))
    val n = pts.length.toLong
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val beta = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx)
    assert(math.abs(beta - r.getAs[Double]("beta")) < 1e-12)
    assert(r.getAs[Long]("n_sources") == n)
  }

  test("lsh_recall_audit agrees with a brute-force exact-pair set") {
    val r = QueriesWave9.lshRecallAuditQ(spark, sf).collect().head
    // brute-force truth: every doc pair's exact 3-shingle Jaccard
    val sets = QueriesText.shArr3(spark, sf).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Seq[String]]("sh").toSet).toMap
    val ids = sets.keys.toSeq.sorted
    val nTrue = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = sets(ids(i)); b = sets(ids(j))
      inter = (a & b).size
      if (QueriesWave6.psjTauDen + QueriesWave6.psjTauNum) * inter >=
        QueriesWave6.psjTauNum * (a.size + b.size)
    } yield 1).size
    assert(r.getAs[Long]("n_true") == nTrue)
    assert(r.getAs[Long]("n_hit") <= r.getAs[Long]("n_true"))
    val recall = r.getAs[Double]("recall")
    assert(recall >= 0.0 && recall <= 1.0)
  }

  test("epoch_shuffle_plan conserves docs per epoch and varies shards across epochs") {
    val rows = QueriesWave9.epochShufflePlanQ(spark, sf).collect()
    val nDocs = Tables(spark, sf, "documents").count()
    val byEpoch = rows.groupBy(_.getAs[Int]("epoch"))
    assert(byEpoch.keySet == (0 until QueriesWave9.epochCount).toSet)
    byEpoch.values.foreach { cells =>
      assert(cells.map(_.getAs[Long]("n_docs")).sum == nDocs)
    }
    // the rotation must actually rotate: per-epoch shard loads differ
    val sig = byEpoch.view.mapValues(_.sortBy(_.getAs[Int]("shard"))
      .map(_.getAs[Long]("n_docs")).toSeq).toMap
    assert(sig.values.toSet.size > 1, "all epochs produced identical shard loads")
  }

  test("prop_ztest_pairs: symmetric pair coverage, z sign matches the rate difference") {
    val rows = QueriesWave9.propZtestPairsQ(spark, sf).collect()
    val ns = rows.flatMap(r => Seq(r.getAs[String]("src_a"), r.getAs[String]("src_b"))).toSet
    assert(rows.length == ns.size * (ns.size - 1) / 2)
    rows.foreach { r =>
      val (p1, p2, z) = (r.getAs[Double]("p1"), r.getAs[Double]("p2"), r.getAs[Double]("z"))
      assert(p1 >= 0 && p1 <= 1 && p2 >= 0 && p2 <= 1)
      if (p1 > p2) assert(z > 0) else if (p1 < p2) assert(z < 0) else assert(z == 0.0)
      assert(r.getAs[Boolean]("significant") == (math.abs(z) >= QueriesWave9.ztestCrit))
    }
  }

  test("burstiness_fano: burstiness in (-1,1), Fano consistent with a driver-side refit") {
    val rows = QueriesWave9.burstinessFanoQ(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val b = r.getAs[Double]("burstiness")
      assert(b > -1.0 && b < 1.0)
      assert(r.getAs[Double]("fano") >= 0.0)
      assert(r.getAs[Double]("mean_daily") > 0.0)
    }
  }

  test("page_hinkley: PH nonnegative, resets never overshoot, at most one first alarm") {
    val rows = QueriesWave9.pageHinkleyQ(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("ph") >= 0L))
    assert(rows.count(_.getAs[Boolean]("first_alarm")) <= 1)
    // the marked first alarm day, if any, is the earliest alarmed day
    val alarms = rows.filter(_.getAs[Boolean]("alarm")).map(_.getAs[Long]("day_s"))
    rows.filter(_.getAs[Boolean]("first_alarm")).foreach { r =>
      assert(r.getAs[Long]("day_s") == alarms.min)
      assert(r.getAs[Boolean]("alarm"))
    }
  }

  test("kcore_membership: peel reached its fixpoint and members have core_deg >= k") {
    val (prev, last) = QueriesWave9.kcoreLastRounds(spark, sf)
    val a = prev.collect().map(_.getLong(0)).toSet
    val b = last.collect().map(_.getLong(0)).toSet
    assert(a == b, s"peel not converged in ${QueriesWave9.kcoreRounds} rounds: ${a.diff(b)}")
    QueriesWave9.kcoreMembershipQ(spark, sf).collect().foreach { r =>
      if (r.getAs[Boolean]("in_kcore"))
        assert(r.getAs[Long]("core_deg") >= QueriesWave9.kcoreK)
      else assert(r.getAs[Long]("core_deg") == 0L)
    }
  }
}
