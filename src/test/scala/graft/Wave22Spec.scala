package graft

import org.apache.spark.sql.functions._

class Wave22Spec extends SparkSpec {
  import spark.implicits._

  test("bh_fdr: p monotone in rank, rejections are exactly the prefix 1..k*") {
    val rows = QueriesWave22.bhFdrQ(spark, sf).collect()
    // cols: src_a src_b z p9 rnk m bh_ok rejected
    val m = rows.head.getLong(5)
    assert(rows.length.toLong === m)
    for (r <- rows) {
      val p9 = r.getLong(3)
      assert(p9 >= 0L && p9 <= 1000000000L, s"p out of range in $r")
    }
    val byRank = rows.sortBy(_.getLong(4)).map(_.getLong(3))
    assert(byRank.zip(byRank.tail).forall { case (a, b) => a <= b },
      "p must be non-decreasing in rank")
    val rej = rows.filter(_.getBoolean(7)).map(_.getLong(4))
    if (rej.nonEmpty) {
      val k = rej.max
      assert(rej.toSet === (1L to k).toSet,
        "rejections must be the contiguous prefix of the p-ranked order")
      assert(rows.filter(_.getBoolean(6)).map(_.getLong(4)).max === k,
        "k* must be the LAST rank whose BH inequality holds")
    } else assert(rows.forall(!_.getBoolean(6)))
  }

  test("label_propagation: labels are node ids, sizes consistent, plan is flat") {
    val rows = QueriesWave22.labelPropagationQ(spark, sf).collect()
    val nodes = rows.map(_.getLong(0)).toSet
    val labels = rows.map(_.getLong(1)).toSet
    assert(labels.subsetOf(nodes), "a community label must be a member node id")
    val bySize = rows.groupBy(_.getLong(1)).map { case (l, rs) => l -> rs.length.toLong }
    for (r <- rows)
      assert(r.getLong(2) === bySize(r.getLong(1)), s"size mismatch in $r")
    assert(bySize.values.sum === rows.length.toLong)
  }

  test("graph_modularity: degree sums cover the edge list, Q in range") {
    val rows = QueriesWave22.graphModularityQ(spark, sf).collect()
    val comms = QueriesWave22.labelPropagationQ(spark, sf)
      .select($"community").distinct().count()
    assert(rows.length.toLong === comms)
    val twoM = QueriesWave9.nationUndirected(spark, sf).count()
    assert(rows.map(_.getLong(3)).sum === twoM, "Σ d_c must equal 2m")
    assert(rows.map(_.getLong(2)).sum <= twoM / 2)
    val q = rows.map(_.getDouble(4)).sum
    assert(q >= -0.5 && q <= 1.0, s"modularity $q out of range")
  }

  test("mg_heavy_hitters: undercount-only and bound gates hold on every row") {
    val rows = QueriesWave22.mgHeavyHittersQ(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= QueriesWave22.mgK)
    for (r <- rows) {
      assert(r.getBoolean(4), s"overcount in $r")
      assert(r.getBoolean(5), s"error bound violated in $r")
    }
  }

  test("diff_in_diff: arms partition the users, estimate consistent with the means") {
    val row = QueriesWave22.diffInDiffQ(spark, sf).collect().head
    val users = Tables(spark, sf, "events").select($"user_id").distinct().count()
    assert(row.getLong(0) + row.getLong(1) === users)
    val didFromMeans = (row.getDouble(3) - row.getDouble(2)) -
      (row.getDouble(5) - row.getDouble(4))
    assert(math.abs(row.getDouble(6) - didFromMeans) < 1e-9,
      s"did ${row.getDouble(6)} vs means $didFromMeans")
  }

  test("rendezvous_shard: shares sum to 1, movement near the 1/(S+1) ideal") {
    val rows = QueriesWave22.rendezvousShardQ(spark, sf).collect()
    assert(rows.length === QueriesWave22.hrwShards)
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-9)
    val nTot = rows.map(_.getLong(1)).sum
    val moved = rows.map(_.getLong(3)).sum
    val ideal = 1.0 / (QueriesWave22.hrwShards + 1)
    assert(moved.toDouble / nTot < 2 * ideal,
      s"moved ${moved.toDouble / nTot} vs ideal $ideal — HRW's minimal-move " +
        "property should keep movement near 1/(S+1)")
  }

  test("deletion_vector_plan: per-file action and cost columns are consistent") {
    val rows = QueriesWave22.deletionVectorPlanQ(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (nDocs, nBytes, nDel) = (r.getLong(2), r.getLong(3), r.getLong(4))
      val action = r.getString(6)
      assert(nDel <= nDocs)
      val want =
        if (nDel == 0) "KEEP"
        else if (r.getDouble(5) >= QueriesWave22.dvRewriteShare) "REWRITE"
        else "DV"
      assert(action === want, s"action in $r")
      assert(r.getLong(7) === (if (action == "REWRITE") nBytes else 0L))
      assert(r.getLong(8) === (if (action == "DV") nDel else 0L))
    }
  }

  test("jackknife_variance: CI brackets the point estimate, score-scale sane") {
    val r = QueriesWave22.jackknifeVarianceQ(spark, sf).collect().head
    val (theta, se, lo, hi) =
      (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
    assert(se >= 0.0)
    assert(lo <= theta && theta <= hi, s"CI [$lo, $hi] must bracket $theta")
    assert(theta >= 0.0 && theta <= 1.0, s"mean quality score $theta")
  }

  test("capture_recapture: estimate at least the overlap, q-error finite") {
    val r = QueriesWave22.captureRecaptureQ(spark, sf).collect().head
    val (n1, n2, m, est) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(m <= n1 && m <= n2)
    assert(est >= math.max(n1, n2) - 1, s"LP estimate $est below a sample size")
    assert(r.getDouble(5) >= 1.0)
  }

  test("covariate_balance: one row per covariate, arms consistent across rows") {
    val rows = QueriesWave22.covariateBalanceQ(spark, sf).collect()
    assert(rows.length === 3)
    assert(rows.map(r => (r.getLong(1), r.getLong(2))).distinct.length === 1,
      "arm sizes must be identical for every covariate")
    val users = Tables(spark, sf, "events").select($"user_id").distinct().count()
    assert(rows.head.getLong(1) + rows.head.getLong(2) === users)
  }

  test("dedup_transitivity: closure is a rate over real wedges") {
    val r = QueriesWave22.dedupTransitivityQ(spark, sf).collect().head
    val (nPairs, nWedges, nClosed) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nClosed <= nWedges)
    val rate = r.getDouble(3)
    assert(rate >= 0.0 && rate <= 1.0)
    if (nWedges > 0) assert(rate === nClosed.toDouble / nWedges)
    assert(nPairs >= 0)
  }

  test("median_ci: CI brackets the median, median is the exact order statistic") {
    val r = QueriesWave22.medianCiQ(spark, sf).collect().head
    val (n, med, lo, hi) =
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(lo <= med && med <= hi)
    val want = Tables(spark, sf, "events")
      .select(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("c"))
      .orderBy($"c").limit(((n + 1) / 2).toInt).orderBy($"c".desc).limit(1)
      .as[Long].collect().head
    assert(med === want.toDouble / 100.0, s"median $med vs sorted $want")
  }

  test("funnel_wilson_ci: intervals inside [0,1] and bracketing the rates") {
    val rows = QueriesWave22.funnelWilsonCiQ(spark, sf).collect()
    assert(rows.length === 2)
    for (r <- rows) {
      val (rate, lo, hi) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(lo >= 0.0 && hi <= 1.0, s"Wilson interval escaped [0,1] in $r")
      assert(lo <= rate && rate <= hi, s"interval must bracket the rate in $r")
    }
  }

  test("dedup_savings_sweep: monotone non-increasing in tau, shares in [0,1]") {
    val rows = QueriesWave22.dedupSavingsSweepQ(spark, sf).collect()
      .sortBy(_.getInt(0))
    assert(rows.map(_.getInt(0)).toSeq === QueriesWave22.savingsTaus)
    val pairs = rows.map(_.getLong(1))
    val removed = rows.map(_.getLong(2))
    val chars = rows.map(_.getLong(3))
    assert(pairs.zip(pairs.tail).forall { case (a, b) => a >= b })
    assert(removed.zip(removed.tail).forall { case (a, b) => a >= b })
    assert(chars.zip(chars.tail).forall { case (a, b) => a >= b })
    for (r <- rows) {
      val s = r.getDouble(4)
      assert(s >= 0.0 && s <= 1.0)
    }
  }

  test("negbin_fit: moments exact, NB params only where overdispersed") {
    val rows = QueriesWave22.negbinFitQ(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (mean, v, od) = (r.getDouble(2), r.getDouble(3), r.getBoolean(4))
      assert(od === (v > mean), s"overdispersion gate vs moments in $r")
      if (od) {
        val (nr, np) = (r.getDouble(5), r.getDouble(6))
        assert(nr > 0.0 && np > 0.0 && np < 1.0, s"NB params out of range in $r")
        // moment identity: mean = r(1-p)/p under the fitted params
        assert(math.abs(nr * (1 - np) / np - mean) < 1e-6 * math.max(1.0, mean))
      } else assert(r.isNullAt(5) && r.isNullAt(6))
    }
  }

  test("group_sequential: OBF boundaries decrease, counts cumulate to the total") {
    val rows = QueriesWave22.groupSequentialQ(spark, sf).collect()
      .sortBy(_.getInt(0))
    assert(rows.length === QueriesWave22.gstLooks)
    val bs = rows.map(_.getDouble(4))
    assert(bs.zip(bs.tail).forall { case (a, b) => a > b },
      "OBF boundary must strictly decrease across looks")
    val cum = rows.map(r => r.getLong(1) + r.getLong(2))
    assert(cum.zip(cum.tail).forall { case (a, b) => a <= b })
    assert(cum.last === Tables(spark, sf, "events").count())
  }
}
