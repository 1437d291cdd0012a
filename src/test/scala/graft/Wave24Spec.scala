package graft

import org.apache.spark.sql.functions._

class Wave24Spec extends SparkSpec {
  import spark.implicits._

  test("wavelet_est: full-range query reconstructs the total EXACTLY") {
    val rows = QueriesWave24.waveletEstQ(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(rows.keySet === QueriesWave24.wvRanges.map(_._1).toSet)
    // every detail coefficient sums to zero over its own block, so the
    // all-bins range must be exact no matter which coefficients survive
    val (est, tru) = rows("w04")
    assert(est === tru.toDouble, s"full-range est $est != total $tru")
    assert(tru === Tables(spark, sf, "orders").count())
    for ((id, (e, t)) <- rows) {
      assert(e >= 0.0, s"$id negative estimate")
      assert(t >= 0L)
    }
  }

  test("wavelet_est: estimate error is bounded by the dropped energy") {
    // 6 of 31 coefficients kept on 15k rows: the synopsis should sit
    // within a few percent of truth on these block-aligned ranges
    for (r <- QueriesWave24.waveletEstQ(spark, sf).collect()) {
      val (est, tru) = (r.getDouble(1), r.getLong(2).toDouble)
      assert(math.abs(est - tru) <= math.max(0.15 * tru, 64.0),
        s"${r.getString(0)}: est $est vs tru $tru drifted past the synopsis bound")
    }
  }

  test("cvm_test: pooled-ECDF statistic is nonnegative and tie-consistent") {
    val r = QueriesWave24.cvmTestQ(spark, sf).collect().head
    val (na, nb, tnum, t) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    assert(na > 0 && nb > 0)
    assert(tnum >= 0L && t >= 0.0)
    // CvM is bounded by the pooled mass: T <= N·(n_a·n_b/N²) ≈ min(n_a,n_b)
    assert(t <= math.min(na, nb).toDouble)
  }

  test("eb_shrinkage: every source shrinks TOWARD the prior mean") {
    val rows = QueriesWave24.ebShrinkageQ(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (raw, shrunk) = (r.getDouble(3), r.getDouble(4))
      if (!r.isNullAt(5)) {
        val (alpha, beta) = (r.getDouble(5), r.getDouble(6))
        assert(alpha > 0 && beta > 0)
        val m = alpha / (alpha + beta)
        val (lo, hi) = (math.min(raw, m), math.max(raw, m))
        assert(shrunk >= lo - 1e-12 && shrunk <= hi + 1e-12,
          s"${r.getString(0)}: shrunk $shrunk outside [$raw, $m]")
      } else assert(shrunk === raw, "degenerate prior must fall back to raw")
    }
  }

  test("brier_decomp: decomposition reproduces the direct Brier score") {
    val r = QueriesWave24.brierDecompQ(spark, sf).collect().head
    val brier = r.getDouble(5)
    val direct = QueriesWave10.scoredDocs(spark, sf)
      .select(((col("s6").cast("double") / lit(1e6) -
        when(col("kept"), 1.0).otherwise(0.0)) *
        (col("s6").cast("double") / lit(1e6) -
          when(col("kept"), 1.0).otherwise(0.0))).as("sq"))
      .agg(avg(col("sq"))).collect().head.getDouble(0)
    // Murphy's decomposition is exact only within-bin-constant forecasts;
    // with 10 bins over a 1e-6 grid the residual is the within-bin
    // variance of p — small but nonzero
    assert(math.abs(brier - direct) < 0.05,
      s"decomposed $brier vs direct $direct")
    assert(r.getDouble(2) >= 0.0 && r.getDouble(3) >= 0.0)
    val unc = r.getDouble(4)
    assert(unc >= 0.0 && unc <= 0.25 + 1e-12)
  }

  test("pr_auc: in [0,1] and above the random baseline for this gate") {
    val r = QueriesWave24.prAucQ(spark, sf).collect().head
    val (np, nn, ap, base) = (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
    assert(np + nn === Tables(spark, sf, "documents").count())
    assert(ap >= 0.0 && ap <= 1.0)
    assert(base === np.toDouble / (np + nn))
    // the quality score drives the gate, so AP must clear prevalence
    assert(ap > base, s"AP $ap not above baseline $base")
  }

  test("mcnemar_gates: cells partition the corpus; p9 on the 1e9 grid") {
    val r = QueriesWave24.mcnemarGatesQ(spark, sf).collect().head
    val cells = (0 to 3).map(r.getLong(_))
    assert(cells.sum === Tables(spark, sf, "documents").count())
    if (!r.isNullAt(4)) {
      assert(r.getDouble(4) >= 0.0)
      val p9 = r.getLong(5)
      assert(p9 >= 0L && p9 <= 1000000000L)
    }
  }

  test("gopher_rules: fail counts and passes are consistent per source") {
    val rows = QueriesWave24.gopherRulesQ(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum ===
      Tables(spark, sf, "documents").count())
    for (r <- rows) {
      val n = r.getLong(1)
      val fails = (2 to 6).map(r.getLong(_))
      val pass = r.getLong(7)
      assert(fails.forall(f => f >= 0 && f <= n))
      // a doc passing all rules fails none: pass <= n - max(fail)
      assert(pass <= n - fails.max,
        s"${r.getString(0)}: pass $pass inconsistent with fails $fails")
      assert(r.getDouble(8) === pass.toDouble / n)
    }
  }

  test("nb_quality_filter: confusion matrix partitions the corpus") {
    val r = QueriesWave24.nbQualityFilterQ(spark, sf).collect().head
    val (tp, fp, fn, tn) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(tp + fp + fn + tn === Tables(spark, sf, "documents").count())
    assert(r.getLong(0) > 0, "empty vocabulary")
    val acc = r.getDouble(5)
    assert(acc === (tp + tn).toDouble / (tp + fp + fn + tn))
    assert(acc > 0.0 && acc <= 1.0)
  }

  test("lid_estimate: positive dimensionality, grid-consistent bounds") {
    val rows = QueriesWave24.lidEstimateQ(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (n, mean, mn, mx) =
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(n > 0)
      assert(mn > 0.0, "LID of a metric neighborhood is positive")
      assert(mn <= mean + 1e-9 && mean <= mx + 1e-9)
    }
  }

  test("rrf_fusion: fused order is by RRF score; ranks stay in depth") {
    val rows = QueriesWave24.rrfFusionQ(spark, sf).collect()
    assert(rows.length === QueriesWave24.rrfTopK)
    val scores = rows.map(_.getDouble(3))
    for (Seq(a, b) <- scores.toSeq.sliding(2)) assert(a >= b)
    for (r <- rows) {
      val ra = if (r.isNullAt(1)) None else Some(r.getInt(1))
      val rb = if (r.isNullAt(2)) None else Some(r.getInt(2))
      assert(ra.isDefined || rb.isDefined)
      for (x <- ra ++ rb) assert(x >= 1 && x <= QueriesWave24.rrfDepth)
      val expect = ra.map(x => 1.0 / (QueriesWave24.rrfK + x)).getOrElse(0.0) +
        rb.map(x => 1.0 / (QueriesWave24.rrfK + x)).getOrElse(0.0)
      assert(r.getDouble(3) === expect)
    }
  }

  test("ccnet_bucket: buckets order by perplexity and tile each language") {
    val rows = QueriesWave24.ccnetBucketQ(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    val langs = rows.map(_._1).distinct
    assert(langs.length >= 3)
    for (lang <- langs) {
      val bs = rows.filter(_._1 == lang).map(r => r._2 -> r).toMap
      assert(bs.keySet === Set("head", "middle", "tail"),
        s"$lang missing a tercile")
      // CCNet semantics: head = lowest perplexity
      assert(bs("head")._5 <= bs("middle")._5 + 1e-9)
      assert(bs("middle")._5 <= bs("tail")._5 + 1e-9)
      val share = bs.values.map(_._4).sum
      assert(math.abs(share - 1.0) < 1e-9, s"$lang shares sum to $share")
      // nearest-rank terciles keep each bucket within a few docs of n/3
      val ns = bs.values.map(_._3.toDouble).toSeq
      assert(ns.max - ns.min <= ns.sum / 3.0 + 2.0)
    }
  }
}
