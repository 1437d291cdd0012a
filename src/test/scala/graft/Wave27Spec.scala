package graft

class Wave27Spec extends SparkSpec {

  test("heldout_perplexity: the split tiles the corpus; NLLs are sane") {
    val rows = QueriesWave27.heldoutPerplexityQ(spark, sf).collect()
      .map(r => r.getBoolean(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4))).toMap
    assert(rows.keySet === Set(true, false))
    val nDocs = rows.values.map(_._1).sum
    assert(nDocs === Tables(spark, sf, "documents").count())
    // md5 1-in-4 holdout: the test share sits near a quarter
    val testShare = rows(true)._1.toDouble / nDocs
    assert(testShare > 0.10 && testShare < 0.45, s"test share $testShare")
    for ((_, (_, nb, nll, v)) <- rows) {
      assert(nb > 0)
      assert(nll > 0.0, "smoothed NLL is strictly positive")
      assert(v >= 2)
    }
    // add-one smoothing prices unseen bigrams finitely: the held-out
    // NLL stays within an order of magnitude of train
    assert(rows(true)._3 < 10.0 * rows(false)._3)
  }

  test("topk_rbo: a proper [0,1] rank-stability score") {
    val r = QueriesWave27.topkRboQ(spark, sf).collect().head
    assert(r.getInt(0) === QueriesWave27.rboK)
    val (ov, rbo) = (r.getLong(1), r.getDouble(2))
    assert(ov >= 0 && ov <= QueriesWave27.rboK)
    assert(rbo >= 0.0 && rbo <= 1.0 + 1e-12)
    // no common member in the two top-k lists => X_d = 0 at every
    // depth => rbo is exactly zero
    if (ov == 0L) assert(rbo === 0.0)
  }

  test("welch_anova: F and the Welch-Satterthwaite dfs are coherent") {
    val r = QueriesWave27.welchAnovaQ(spark, sf).collect().head
    val (k, n, f, df1) = (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))
    assert(k >= 2 && n > k)
    assert(f >= 0.0)
    assert(df1 === k - 1)
    if (!r.isNullAt(4)) {
      val df2 = r.getDouble(4)
      // df2 is bounded above by n - k (equal-variance limit) times a
      // slack factor, and must be positive
      assert(df2 > 0.0)
    }
  }
}
