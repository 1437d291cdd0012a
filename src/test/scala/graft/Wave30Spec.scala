package graft

import org.apache.spark.sql.functions._

class Wave30Spec extends SparkSpec {

  test("bitext_mine: forward-mined pairs cross sides, margin and verdict agree") {
    val labels = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("label"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = QueriesWave30.bitextMineQ(spark, sf).collect()
    assert(rows.nonEmpty)
    val tau = QueriesWave30.bmTauNum.toDouble / QueriesWave30.bmTauDen
    var acc = 0
    for (r <- rows) {
      val (va, vb) = (r.getLong(0), r.getLong(1))
      assert(labels(va) == 0 && labels(vb) == 1,
        s"pair ($va, $vb) does not cross sides")
      val accepted = r.getBoolean(4)
      if (accepted) acc += 1
      if (!r.isNullAt(3)) {
        val margin = r.getDouble(3)
        // the exact integer verdict and the reported double margin are
        // the same inequality up to the final rounding of the double
        if (accepted) assert(margin >= tau - 1e-9, s"accepted at margin $margin")
        else assert(margin < tau + 1e-9, s"rejected at margin $margin")
      } else assert(!accepted, "margin undefined must reject")
    }
    // the threshold splits the output non-trivially on the test corpus
    assert(acc > 0 && acc < rows.length, s"degenerate split: $acc/${rows.length}")
  }

  test("bitext_mine: mined target is the max-cosine probed candidate per source") {
    // recompute the forward candidate set from the shared IVF frames
    // and check the argmax discipline (cos desc, lower vb on ties)
    graft.functions.GraftFunctions.register(spark)
    val assign = QueriesWave26.ivfAssign(spark, sf)
    val cands = QueriesWave26.ivfProbes(spark, sf, col("label") === 0)
      .select(col("vec_id").as("va"), col("qv").as("qa"), col("nn").as("na"),
        col("list_id"))
      .join(assign.filter(col("label") === 1)
        .select(col("vec_id").as("vb"), col("qv").as("qb"), col("nn").as("nb"),
          col("list_id")), Seq("list_id"))
      .withColumn("cos6", expr(
        """CAST(round(1e6 * (CAST(quantized_dot(qa, qb) AS DOUBLE)
          | / sqrt(CAST(na AS DOUBLE)) / sqrt(CAST(nb AS DOUBLE)))) AS BIGINT)"""
          .stripMargin))
      .select(col("va"), col("vb"), col("cos6"))
      .collect().groupBy(_.getLong(0))
    for (r <- QueriesWave30.bitextMineQ(spark, sf).collect()) {
      val best = cands(r.getLong(0))
        .maxBy(c => (c.getLong(2), -c.getLong(1)))
      assert(best.getLong(1) == r.getLong(1) && best.getLong(2) == r.getLong(2),
        s"anchor ${r.getLong(0)}: mined (${r.getLong(1)}, ${r.getLong(2)})" +
          s" vs true best (${best.getLong(1)}, ${best.getLong(2)})")
    }
  }

  test("bitext_recall: mined never beats brute force; probe budget finds a real share") {
    val rows = QueriesWave30.bitextRecallQ(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getLong(2) <= r.getLong(4),
        s"anchor ${r.getLong(0)}: mined cos ${r.getLong(2)} above truth ${r.getLong(4)}")
      // hit ⟺ same target ⟹ same cosine
      if (r.getBoolean(5)) assert(r.getLong(2) == r.getLong(4))
    }
    val recall = rows.count(_.getBoolean(5)).toDouble / rows.length
    // same probe-budget regime as ivf_kmeans_recall's 0.2 floor
    assert(recall >= 0.2, s"probed mining recall $recall")
  }

  test("bradley_terry: a proper normalized strength scale over every source") {
    val rows = QueriesWave30.bradleyTerryQ(spark, sf).collect()
    val nSrc = Tables(spark, sf, "documents")
      .select(col("source")).distinct().count().toInt
    assert(rows.length == nSrc, "one strength row per source")
    val s6 = rows.map(_.getLong(3))
    assert(s6.forall(_ >= QueriesWave30.btMin6))
    // per-iteration normalization pins the total to #sources (up to
    // per-source rounding and the strength floor)
    assert(math.abs(s6.sum - nSrc * 1000000L) <= nSrc.toLong,
      s"strength mass ${s6.sum} off target ${nSrc * 1000000L}")
    assert(rows.map(_.getInt(5)).sorted.toSeq == (1 to nSrc),
      "rnk must be a permutation")
    // ranks follow strengths (desc), ties broken by source
    val byRank = rows.sortBy(_.getInt(5))
    for (Seq(a, b) <- byRank.toSeq.sliding(2))
      assert(a.getLong(3) > b.getLong(3) ||
        (a.getLong(3) == b.getLong(3) && a.getString(0) < b.getString(0)))
    // wins are consistent with the games matrix: 0 ≤ wins ≤ games
    for (r <- rows) assert(r.getLong(1) >= 0 && r.getLong(1) <= r.getLong(2))
    // MM moves mass toward winners: the top-ranked source must not
    // have a below-average win share
    val top = byRank.head
    val shares = rows.map(r => r.getLong(1).toDouble / math.max(r.getLong(2), 1L))
    assert(top.getLong(1).toDouble / math.max(top.getLong(2), 1L) >=
      shares.sum / shares.length - 1e-9)
  }
}
