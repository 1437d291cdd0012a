package graft

import org.apache.spark.sql.functions._

/** Mathematical invariants of the hypothesis-test wave: driver-side
  * refits of the F / ρ statistics, rank-sum conservation, and the
  * Welch df sandwich.
  */
class Wave10InvariantSpec extends SparkSpec {

  test("anova_oneway: F matches a driver-side refit, eta_sq in [0,1]") {
    val row = QueriesWave10.anovaOnewayQ(spark, sf).collect().head
    val eta = row.getAs[Double]("eta_sq")
    assert(eta >= 0.0 && eta <= 1.0)
    assert(row.getAs[Double]("f_stat") >= 0.0)
    // refit from raw quantized values
    val raw = Tables(spark, sf, "events")
      .select(col("event_type"), expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val groups = raw.groupBy(_._1).view.mapValues(_.map(_._2.toDouble)).toMap
    val all = raw.map(_._2.toDouble)
    val gm = all.sum / all.length
    val ssb = groups.values.map(g => g.length * math.pow(g.sum / g.length - gm, 2)).sum
    val ssw = groups.values.map(g => { val m = g.sum / g.length; g.map(x => (x - m) * (x - m)).sum }).sum
    val f = (ssb / (groups.size - 1)) / (ssw / (all.length - groups.size))
    assert(math.abs(f - row.getAs[Double]("f_stat")) / f < 1e-3,
      s"refit F $f vs ${row.getAs[Double]("f_stat")}")
  }

  test("kruskal_wallis: rank sums conserve N(N+1)/2, tie correction only grows H") {
    val rows = QueriesWave10.kruskalWallisQ(spark, sf).collect()
    assert(rows.nonEmpty)
    val n = rows.head.getAs[Long]("n_total")
    val totalRankSum = rows.map(_.getAs[Double]("rank_sum")).sum
    assert(math.abs(totalRankSum - n.toDouble * (n + 1) / 2) < 1e-6,
      s"rank sums $totalRankSum vs ${n.toDouble * (n + 1) / 2}")
    rows.foreach { r =>
      val h = r.getAs[Double]("h")
      assert(h >= 0.0)
      assert(r.getAs[Double]("h_tie_corrected") >= h - 1e-12)
    }
    assert(rows.map(_.getAs[Long]("n")).sum == n)
  }

  test("spearman_rho: |rho| <= 1 and matches a driver-side midrank refit") {
    val rows = QueriesWave10.spearmanRhoQ(spark, sf).collect()
    assert(rows.length == QueriesWave10.spearmanPairs.length)
    rows.foreach(r => assert(math.abs(r.getAs[Double]("rho")) <= 1.0))
    // refit the quantity:price pair from raw values
    val raw = Tables(spark, sf, "lineitem")
      .select(expr("CAST(l_quantity AS BIGINT)"),
        expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def midranks(xs: Seq[Long]): Map[Long, Double] = {
      val sorted = xs.groupBy(identity).view.mapValues(_.size).toSeq.sortBy(_._1)
      var before = 0L
      sorted.map { case (v, t) =>
        val mr = before + (t + 1) / 2.0; before += t; v -> mr
      }.toMap
    }
    val mx = midranks(raw.map(_._1))
    val my = midranks(raw.map(_._2))
    val pts = raw.map { case (a, b) => (mx(a), my(b)) }
    val n = pts.length
    val (sa, sb) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val (qa, qb) = (pts.map(p => p._1 * p._1).sum, pts.map(p => p._2 * p._2).sum)
    val p = pts.map(t => t._1 * t._2).sum
    val rho = (n * p - sa * sb) /
      (math.sqrt(n * qa - sa * sa) * math.sqrt(n * qb - sb * sb))
    val got = rows.find(_.getAs[String]("col_pair").contains("l_quantity")).get
      .getAs[Double]("rho")
    assert(math.abs(rho - got) < 1e-9, s"refit rho $rho vs $got")
  }

  test("wander_join_est: estimates positive where truth is, q-error bounded at test scale") {
    val rows = QueriesWave10.wanderJoinEstQ(spark, sf).collect()
    assert(rows.length == QueriesWave10.wjSpecs.length)
    rows.foreach { r =>
      assert(r.getAs[Long]("true_card") > 0L, s"${r.getAs[String]("spec")}: degenerate spec")
      assert(r.getAs[Double]("est") > 0.0)
      // 1024 HT walks on a ~6k-row join: generous but real accuracy bar
      assert(r.getAs[Double]("q_err") < 3.0,
        s"${r.getAs[String]("spec")}: q_err ${r.getAs[Double]("q_err")}")
    }
  }

  test("t_closeness_audit: EMD in [0,1], pass flag is the exact threshold comparison") {
    val rows = QueriesWave10.tClosenessAuditQ(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val emd = r.getAs[Double]("emd")
      assert(emd >= 0.0 && emd <= 1.0, s"${r.getAs[String]("combo")}: emd $emd")
      val thr = QueriesWave10.tCloseNum.toDouble / QueriesWave10.tCloseDen
      // exact integer comparison on the Spark side; emd is its float image
      assert(r.getAs[Boolean]("pass") == (emd <= thr + 1e-12))
      assert(r.getAs[Long]("n") > 0)
    }
  }

  test("woe_iv: IV total equals the sum of contributions and is nonnegative-ish") {
    val rows = QueriesWave10.woeIvQ(spark, sf).collect()
    assert(rows.nonEmpty)
    val ivTotal = rows.head.getAs[Double]("iv_total")
    assert(rows.forall(r => math.abs(r.getAs[Double]("iv_total") - ivTotal) < 1e-12))
    val sum = rows.map(_.getAs[Double]("iv_contrib")).sum
    assert(math.abs(sum - ivTotal) < 1e-9, s"sum $sum vs total $ivTotal")
    // unsmoothed IV terms are >= 0; half-count smoothing can dip a hair below
    rows.foreach(r => assert(r.getAs[Double]("iv_contrib") >= -1e-4))
  }

  test("adamic_adar: pairs are non-adjacent, scores match a driver-side refit") {
    val rows = QueriesWave10.adamicAdarQ(spark, sf).collect()
    assert(rows.nonEmpty, "thresholded graph left no non-adjacent pairs to score")
    val und = QueriesWave10.sigLanesForTest(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val deg = und.groupBy(_._1).view.mapValues(_.size).toMap
    val nbrs = und.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    rows.foreach { r =>
      val (u, v) = (r.getAs[Long]("u"), r.getAs[Long]("v"))
      assert(!und.contains((u, v)), s"pair ($u,$v) is adjacent")
      val common = nbrs(u) & nbrs(v)
      assert(common.size == r.getAs[Long]("common_cnt"))
      val refit = common.toSeq.map(w => math.round(1e6 / math.log(deg(w))).toDouble / 1e6).sum
      assert(math.abs(refit - r.getAs[Double]("aa_score")) < 1e-9)
    }
  }

  test("graph_assortativity: coefficient is a valid correlation") {
    val r = QueriesWave10.graphAssortativityQ(spark, sf).collect().head
    val a = r.getAs[Double]("assortativity")
    assert(a >= -1.0 && a <= 1.0 && !a.isNaN)
    assert(r.getAs[Long]("n_directed_edges") > 0)
  }

  test("approx_quantile_check: every sketch quantile honors its rank-error contract") {
    val rows = QueriesWave10.approxQuantileCheckQ(spark, sf).collect()
    assert(rows.length == QueriesWave10.aqMeasures.length * QueriesWave10.aqPcts.length)
    rows.foreach(r => assert(r.getAs[Boolean]("ok"),
      s"${r.getAs[String]("measure")} p=${r.getAs[Double]("pct")} violated the bound"))
  }

  test("markov_entropy_rate: rate is the pi-weighted state mix, bounded by ln k") {
    val rows = QueriesWave10.markovEntropyRateQ(spark, sf).collect()
    assert(rows.nonEmpty)
    val k = rows.length
    val hRate = rows.head.getAs[Double]("h_rate")
    rows.foreach { r =>
      assert(r.getAs[Double]("h_state") >= 0.0)
      assert(r.getAs[Double]("h_state") <= math.log(k) + 1e-6)
      assert(math.abs(r.getAs[Double]("h_rate") - hRate) < 1e-12)
    }
    val mix = rows.map(r => r.getAs[Double]("pi_hat") * r.getAs[Double]("h_state")).sum
    assert(math.abs(mix - hRate) < 1e-6, s"mix $mix vs rate $hRate")
    assert(math.abs(rows.map(_.getAs[Double]("pi_hat")).sum - 1.0) < 1e-12)
  }

  test("target_encode_audit: LOO envelope brackets the group mean") {
    val rows = QueriesWave10.targetEncodeAuditQ(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lo, hi, m) = (r.getAs[Double]("loo_min"), r.getAs[Double]("loo_max"),
        r.getAs[Double]("mean_value"))
      assert(lo <= m + 1e-9 && m <= hi + 1e-9, s"envelope [$lo,$hi] vs mean $m")
      assert(r.getAs[Long]("n") > 1)
    }
  }

  test("feature_hash_collisions: counts are conserved and bounded by the bucket space") {
    val r = QueriesWave10.featureHashCollisionsQ(spark, sf).collect().head
    val (vocab, used, maxLoad, collided) =
      (r.getAs[Long]("vocab_size"), r.getAs[Long]("buckets_used"),
        r.getAs[Long]("max_bucket_load"), r.getAs[Long]("collided_terms"))
    assert(used <= QueriesWave10.fhBuckets && used > 0)
    assert(collided == vocab - used, "collided = vocab - occupied buckets")
    assert(maxLoad >= (vocab + QueriesWave10.fhBuckets - 1) / QueriesWave10.fhBuckets)
    assert(r.getAs[Double]("collision_share") >= 0.0 &&
      r.getAs[Double]("collision_share") < 1.0)
  }

  test("mmr_rerank: distinct picks, round 1 is the relevance argmax, scores sane") {
    val rows = QueriesWave10.mmrRerankQ(spark, sf).collect()
    assert(rows.length == QueriesWave10.mmrK)
    assert(rows.map(_.getAs[Long]("cand_id")).distinct.length == rows.length)
    val r1 = rows.find(_.getAs[Int]("rnk") == 1).get
    assert(r1.getAs[Double]("max_sim_to_sel") == 0.0)
    assert(math.abs(r1.getAs[Double]("mmr_score") -
      QueriesWave10.mmrLambda * r1.getAs[Double]("rel_cos")) < 1e-12)
    // round-1 pick dominates every later pick on raw relevance
    rows.filter(_.getAs[Int]("rnk") > 1).foreach { r =>
      assert(r.getAs[Double]("rel_cos") <= r1.getAs[Double]("rel_cos") + 1e-12)
      // score identity (the similarity term can be a NEGATIVE-cosine bonus)
      assert(math.abs(r.getAs[Double]("mmr_score") -
        (QueriesWave10.mmrLambda * r.getAs[Double]("rel_cos") -
          (1 - QueriesWave10.mmrLambda) * r.getAs[Double]("max_sim_to_sel"))) < 1e-12)
    }
  }

  test("auc_roc: AUC in [0,1], agrees with a driver-side pair-counting refit") {
    val r = QueriesWave10.aucRocQ(spark, sf).collect().head
    val auc = r.getAs[Double]("auc")
    assert(auc >= 0.0 && auc <= 1.0)
    assert(math.abs(r.getAs[Double]("gini") - (2 * auc - 1)) < 1e-12)
    // brute-force pair counting on the same quantized scores
    val scored = operators.TextAnalysis.qualityScore(Tables(spark, sf, "documents"))
      .select(col("doc_id"), expr("CAST(round(1e6 * score) AS BIGINT)").as("s6"))
      .join(operators.Corpus.docFilter(Tables(spark, sf, "documents"))
        .select(col("doc_id"), col("kept")), "doc_id")
      .collect().map(x => (x.getAs[Long]("s6"), x.getAs[Boolean]("kept")))
    val pos = scored.filter(_._2).map(_._1)
    val neg = scored.filterNot(_._2).map(_._1)
    var wins = 0.0
    for (p <- pos; n <- neg) wins += (if (p > n) 1.0 else if (p == n) 0.5 else 0.0)
    val refit = wins / (pos.length.toDouble * neg.length)
    assert(math.abs(refit - auc) < 1e-9, s"refit $refit vs $auc")
  }

  test("survival_km: monotone curve, risk-set conservation, product identity") {
    val rows = QueriesWave10.survivalKmQ(spark, sf).collect().sortBy(_.getAs[Long]("day"))
    assert(rows.nonEmpty)
    // survival non-increasing from 1
    val surv = rows.map(_.getAs[Double]("survival"))
    surv.sliding(2).foreach { case Array(a, b) => assert(b <= a + 1e-9); case _ => }
    assert(surv.head <= 1.0 && surv.last >= 0.0)
    // risk set at t equals N minus everything resolved before t
    val n0 = rows.head.getAs[Long]("n_risk")
    var resolved = 0L
    rows.foreach { r =>
      assert(r.getAs[Long]("n_risk") == n0 - resolved)
      resolved += r.getAs[Long]("d_events") + r.getAs[Long]("n_censored")
    }
    // censoring only at the cutoff day → S(t) = (N - cum d) / N exactly
    val cumD = rows.scanLeft(0L)((acc, r) => acc + r.getAs[Long]("d_events")).tail
    rows.zip(cumD).filter(_._1.getAs[Long]("day") < QueriesWave10.kmCutoffDays)
      .foreach { case (r, cd) =>
        val direct = (n0 - cd).toDouble / n0
        assert(math.abs(r.getAs[Double]("survival") - direct) < 1e-4,
          s"day ${r.getAs[Long]("day")}: KM ${r.getAs[Double]("survival")} vs direct $direct")
      }
  }

  test("ab_power_plan: sample sizes positive and decreasing in baseline variance") {
    val rows = QueriesWave10.abPowerPlanQ(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p1, p2) = (r.getAs[Double]("p1"), r.getAs[Double]("p2"))
      assert(p1 >= 0 && p1 <= 1 && p2 >= p1)
      val n = r.getAs[Long]("n_per_arm")
      assert(n > 0)
      // closed-form refit
      val expected = math.ceil(QueriesWave10.abZsum * QueriesWave10.abZsum *
        (p1 * (1 - p1) + p2 * (1 - p2)) / (QueriesWave10.abMde * QueriesWave10.abMde)).toLong
      assert(n == expected)
      assert(r.getAs[Boolean]("feasible_now") == (2 * n <= r.getAs[Long]("n_observed")))
    }
  }

  test("welch_ttest_pairs: full pair coverage, t sign tracks mean diff, df sandwich") {
    val rows = QueriesWave10.welchTtestPairsQ(spark, sf).collect()
    val ns = rows.flatMap(r => Seq(r.getAs[String]("src_a"), r.getAs[String]("src_b"))).toSet
    assert(rows.length == ns.size * (ns.size - 1) / 2)
    rows.foreach { r =>
      val (ma, mb, t) =
        (r.getAs[Double]("mean_a"), r.getAs[Double]("mean_b"), r.getAs[Double]("t_stat"))
      if (ma > mb) assert(t > 0) else if (ma < mb) assert(t < 0)
      val df = r.getAs[Double]("df_welch")
      val (n1, n2) = (r.getAs[Long]("n1"), r.getAs[Long]("n2"))
      assert(df >= math.min(n1, n2) - 1 - 1e-9, s"df $df below min(n)-1")
      assert(df <= n1 + n2 - 2 + 1e-9, s"df $df above pooled df")
      assert(r.getAs[Boolean]("significant") ==
        (math.abs(t) >= QueriesWave10.welchCrit))
    }
  }
}
