package graft

import org.apache.spark.sql.functions._

class Wave26Spec extends SparkSpec {

  test("dp_join_enum: DP optimum never loses to the naive chain") {
    val r = QueriesWave26.dpJoinEnumQ(spark, sf).collect().head
    val (ord, best, naive) = (r.getString(0), r.getDouble(1), r.getDouble(2))
    // the naive schema order IS one of the enumerated left-deep plans
    assert(best <= naive + 1e-9, s"DP best $best above naive $naive")
    assert(r.getDouble(3) >= 1.0 - 1e-12)
    val tables = ord.split('>')
    assert(tables.length === 6 && tables.distinct.length === 6,
      s"order must visit every table once: $ord")
    assert(tables.toSet === Set("region", "nation", "customer",
      "supplier", "orders", "lineitem"))
    assert(best > 0.0)
  }

  test("em_mixture: a proper clamped two-component fit of event values") {
    val r = QueriesWave26.emMixtureQ(spark, sf).collect().head
    val (pi1, mu1, s1, mu2, s2) = (r.getDouble(1), r.getDouble(2),
      r.getDouble(3), r.getDouble(4), r.getDouble(5))
    assert(pi1 >= 0.001 && pi1 <= 0.999)
    assert(s1 > 0.0 && s2 > 0.0, "variance floor keeps sigmas positive")
    val mm = Tables(spark, sf, "events")
      .agg(min(col("value")).cast("double"), max(col("value")).cast("double"))
      .collect().head
    val (mn, mx) = (mm.getDouble(0), mm.getDouble(1))
    for (mu <- Seq(mu1, mu2))
      assert(mu >= mn - 1e-6 && mu <= mx + 1e-6, s"mean $mu outside [$mn,$mx]")
    // init splits at the 1/4 and 3/4 points; on this right-skewed data
    // the components keep their order
    assert(mu1 < mu2)
  }

  test("hard_negatives: per-label mining stats are internally consistent") {
    val rows = QueriesWave26.hardNegativesQ(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (n, hn, marg, viol) =
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))
      assert(n > 0)
      assert(hn >= -1.0 - 1e-6 && hn <= 1.0 + 1e-6)
      assert(viol >= 0 && viol <= n)
      // margin <= (hardest-positive=1) - mean hard-neg, loose sanity
      assert(marg <= 1.0 - hn + 1e-6)
    }
  }

  test("hard_negatives: probed-cell mining vs brute-force truth") {
    graft.functions.GraftFunctions.register(spark)
    // brute-force per-anchor hardest negative over the WHOLE corpus
    val q = QueriesWave6.knnQuantized(spark, sf)
    val anchors = q.filter(
      expr("CAST(conv(substring(md5(concat('hn:', CAST(vec_id AS STRING))), 1, 13), 16, 10) AS BIGINT)")
        % QueriesWave26.hnRate === 0L)
    val brute = anchors
      .select(col("vec_id").as("va"), col("label").as("la"),
        col("qv").as("qa"), col("nn").as("na"))
      .crossJoin(q.select(col("vec_id").as("vb"), col("label").as("lb"),
        col("qv").as("qb"), col("nn").as("nb")))
      .filter(col("va") =!= col("vb"))
      .withColumn("cos6", expr(
        """CAST(round(1e6 * (CAST(quantized_dot(qa, qb) AS DOUBLE)
          | / sqrt(CAST(na AS DOUBLE)) / sqrt(CAST(nb AS DOUBLE)))) AS BIGINT)"""
          .stripMargin))
      .groupBy(col("va"))
      .agg(max(when(col("la") =!= col("lb"), col("cos6"))).as("bhn6"))
    val mined = QueriesWave26.hardNegativesPerAnchor(spark, sf)
      .select(col("va"), col("hn6"))
    val joined = mined.join(brute, Seq("va")).collect()
    assert(joined.nonEmpty)
    // probed candidates ⊆ corpus: the mined hardest negative can never
    // beat the brute-force one
    for (r <- joined)
      assert(r.getLong(1) <= r.getLong(2),
        s"anchor ${r.getLong(0)}: mined ${r.getLong(1)} above brute ${r.getLong(2)}")
    // ...and the nProbe=2/16 probe budget must still FIND the true
    // hardest negative for a meaningful share of anchors (the same
    // recall regime as ivf_kmeans_recall's 0.2 floor)
    val agree = joined.count(r => r.getLong(1) == r.getLong(2)).toDouble / joined.length
    assert(agree >= 0.2, s"probed mining found the true hardest negative for only $agree")
  }

  test("linear_attribution: credits never exceed the attributed value") {
    val rows = QueriesWave26.linearAttributionQ(spark, sf).collect()
    for (r <- rows) {
      val h = r.getInt(0)
      assert(h >= 0 && h <= 23)
      assert(r.getLong(1) > 0)
    }
    val credited = rows.map(_.getDouble(2)).sum
    val totalPurchase = Tables(spark, sf, "events")
      .filter(col("event_type") === "purchase")
      .agg(sum(col("value"))).collect().head.getDouble(0)
    // integer-div split drops sub-cent remainders: credits can only
    // fall short of the purchase mass, never exceed it
    assert(credited <= totalPurchase + 1e-6,
      s"credited $credited above purchase total $totalPurchase")
  }

  test("dedup_saturation: deciles tile the corpus, novelty is cumulative") {
    val rows = QueriesWave26.dedupSaturationQ(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq === (1 to 10))
    val nDocs = Tables(spark, sf, "documents").count()
    assert(rows.map(_._2).sum === nDocs)
    for ((_, n, nNew, _) <- rows) assert(nNew >= 0 && nNew <= n)
    for (Seq(a, b) <- rows.toSeq.sliding(2))
      assert(b._4 === a._4 + b._3, "cum_unique must accumulate n_new")
    assert(rows.last._4 <= nDocs)
  }
}
