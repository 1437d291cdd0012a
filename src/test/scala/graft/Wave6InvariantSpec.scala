package graft

import org.apache.spark.sql.functions._

/** Mathematical invariants of the round-6 wave, checked on real
  * testdata at sf0.001 — properties the oracle hash can't state
  * directly (exact additivity, budget exhaustion, bound membership).
  */
class Wave6InvariantSpec extends SparkSpec {

  test("seasonal_decompose is exactly additive: rev = trend + effect + residual") {
    val bad = QueriesWave6.seasonalDecomposeQ(spark, sf)
      .filter(col("rev_c") =!= col("trend_c") + col("eff_c") + col("resid_c"))
      .count()
    assert(bad == 0L)
  }

  test("source_temp_mix exhausts the budget exactly and upweights small sources") {
    val rows = QueriesWave6.sourceTempMixQ(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("alloc")).sum == QueriesWave6.tempMixBudget)
    // α = 1/2 compresses the mix: every source's allocated share must sit
    // between uniform and proportional-to-size for sources off the mean
    val total = rows.map(_.getAs[Long]("n_docs")).sum.toDouble
    rows.foreach { r =>
      val share = r.getAs[Double]("share")
      val prop = r.getAs[Long]("n_docs") / total
      val unif = 1.0 / rows.length
      assert((share >= prop - 1e-9 && share <= unif + 1e-9) ||
        (share <= prop + 1e-9 && share >= unif - 1e-9),
        s"${r.getAs[String]("source")}: share=$share prop=$prop unif=$unif")
    }
  }

  test("autocorr and cross_corr coefficients are valid correlations (|r| <= 1)") {
    val a = QueriesWave6.autocorrQ(spark, sf)
      .filter(abs(col("r")) > 1.0 + 1e-12).count()
    val c = QueriesWave6.crossCorrQ(spark, sf)
      .filter(abs(col("r")) > 1.0 + 1e-12).count()
    assert(a == 0L && c == 0L)
  }

  test("gini_index lands in [0, 1) for every segment") {
    val bad = QueriesWave6.giniIndexQ(spark, sf)
      .filter(col("gini") < 0.0 || col("gini") >= 1.0).count()
    assert(bad == 0L)
  }

  test("psi_drift is non-negative for every source pair (PSI >= 0 always)") {
    val bad = QueriesWave6.psiDriftQ(spark, sf).filter(col("psi_q") < 0L).count()
    assert(bad == 0L)
  }

  test("bootstrap_ci bounds are ordered and replicate means bracket sanely") {
    val bad = QueriesWave6.bootstrapCiQ(spark, sf)
      .filter(col("lo_c") > col("hi_c") || col("n") <= 0L).count()
    assert(bad == 0L)
  }

  test("kmv_join_est: sketch fills to min(K, |keys|) and estimates within 3x") {
    val rows = QueriesWave6.kmvJoinEstQ(spark, sf).collect()
    assert(rows.length == QueriesWave6.kjeEdges.size)
    rows.foreach { r =>
      assert(r.getAs[Long]("m") <= QueriesWave6.kjeK)
      assert(r.getAs[Double]("q_err") < 3.0, s"${r.getAs[String]("edge")}: ${r.getAs[Double]("q_err")}")
    }
  }

  test("negative_sampling never emits a positive pair and caps at 3 per customer") {
    val neg = QueriesWave6.negativeSamplingQ(spark, sf)
    val pos = Tables(spark, sf, "orders")
      .select(col("o_custkey").as("custkey"), col("o_orderkey"))
      .join(Tables(spark, sf, "lineitem").select(col("l_orderkey"), col("l_partkey")),
        col("o_orderkey") === col("l_orderkey"))
      .join(Tables(spark, sf, "part").select(col("p_partkey"), col("p_brand").as("brand")),
        col("l_partkey") === col("p_partkey"))
      .select(col("custkey"), col("brand")).distinct()
    assert(neg.join(pos, Seq("custkey", "brand"), "leftsemi").count() == 0L)
    assert(neg.groupBy(col("custkey")).count().filter(col("count") > 3L).count() == 0L)
  }

  test("prefix_sim_join is EXACT: equals brute-force all-pairs 3-shingle Jaccard >= 3/5") {
    val arrs = graft.operators.TextOps
      .shingleArrays(Tables(spark, sf, "documents"), 3)
      .select(col("doc_id"), col("sh"), size(col("sh")).cast("long").as("n"))
    val brute = arrs.select(col("doc_id").as("doc_a"), col("sh").as("sha"), col("n").as("na"))
      .crossJoin(arrs.select(col("doc_id").as("doc_b"), col("sh").as("shb"), col("n").as("nb")))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))).cast("long"))
      .filter(lit(8L) * col("inter") >= lit(3L) * (col("na") + col("nb")))
      .select(col("doc_a"), col("doc_b"))
    val got = QueriesWave6.prefixSimJoinQ(spark, sf).select(col("doc_a"), col("doc_b"))
    assert(got.exceptAll(brute).count() == 0L, "false positives")
    assert(brute.exceptAll(got).count() == 0L, "FALSE NEGATIVES — prefix filter broken")
  }

  test("knn_graph edges are mutual by construction (each endpoint ranks the other)") {
    val edges = QueriesWave6.knnGraphQ(spark, sf)
    // every emitted edge has a < b and both in the same label slice
    assert(edges.filter(col("a") >= col("b")).count() == 0L)
    // spot the mutuality: edge count is bounded by nodes * k / 2
    val n = Tables(spark, sf, "embeddings").count()
    assert(edges.count() <= n * QueriesWave6.knnK / 2)
  }
}
