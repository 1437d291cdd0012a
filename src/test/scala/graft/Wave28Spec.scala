package graft

class Wave28Spec extends SparkSpec {

  test("bloom_fpp_plan: rounded plans beat their targets; geometry holds") {
    val rows = QueriesWave28.bloomFppPlanQ(spark, sf).collect()
    assert(rows.length === QueriesWave28.bfKeys.size * QueriesWave28.bfTargets.size)
    for (r <- rows) {
      val (ndv, target, m, bytes, k, p9) = (r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      assert(ndv > 0)
      assert((m & (m - 1)) === 0L, s"m_bits $m not a power of two")
      assert(bytes === m / 8 || m < 8)
      assert(k >= 1)
      // rounding m UP to a power of two can only tighten the fpp
      assert(p9 <= math.rint(1e9 * target).toLong,
        s"achieved $p9 worse than target $target after round-up")
      assert(p9 >= 0)
    }
  }

  test("cluster_purity: exact-integer purity over the pair components") {
    val r = QueriesWave28.clusterPurityQ(spark, sf).collect().head
    val (nc, nd, pure, maj) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nc > 0)
    // every component of the verified-pair graph has >= 2 docs
    assert(nd >= 2 * nc, s"$nd docs across $nc clusters")
    assert(pure <= nc)
    // the majority language covers at least one doc per cluster and at
    // most all of them
    assert(maj >= nc && maj <= nd)
    assert(r.getDouble(4) === maj.toDouble / nd)
  }

  test("embed_outliers: the 2-sigma gate flags a small minority per label") {
    val rows = QueriesWave28.embedOutliersQ(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (n, mean, out, mx) =
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4))
      assert(n >= 2)
      assert(mean > 0.0 && mx >= mean)
      // Chebyshev: at most 1/4 of any distribution sits past mean+2sd
      assert(out <= n / 4 + 1, s"label ${r.getInt(0)}: $out of $n flagged")
    }
  }
}
