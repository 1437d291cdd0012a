package graft

import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Mathematical invariants of the round-7 wave, checked on real
  * testdata at sf0.001 plus hand-built oracles where the property is
  * stronger than the hash (upper-bound dominance, pigeonhole
  * completeness, exact prefix sums, simplex conservation).
  */
class Wave7InvariantSpec extends SparkSpec {

  test("cms_join_est dominates the truth on every edge (inner product is an upper bound)") {
    val rows = QueriesWave7.cmsJoinEstQ(spark, sf).collect()
    assert(rows.length == QueriesWave6.kjeEdges.size)
    rows.foreach { r =>
      assert(r.getAs[Long]("est") >= r.getAs[Long]("actual"),
        s"${r.getAs[String]("edge")}: est < actual")
    }
  }

  test("bbit_minhash estimates live in [0,1] and agree at signature equality") {
    val rows = QueriesWave7.bbitMinhashQ(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq("j_exact", "j_sig", "j_1bit").foreach { c =>
        val v = r.getAs[Double](c)
        assert(v >= 0.0 && v <= 1.0, s"$c=$v out of range")
      }
      // identical signatures ⇒ every low bit agrees ⇒ Ĵ₁ = 1 exactly
      if (r.getAs[Double]("j_sig") == 1.0)
        assert(r.getAs[Double]("j_1bit") == 1.0)
    }
  }

  test("containment_sim: containment >= jaccard and >= tau on every pair") {
    val bad = QueriesWave7.containmentSimQ(spark, sf)
      .filter(col("containment") < col("jaccard") - lit(1e-12) ||
        col("containment") < QueriesWave7.containTau)
      .count()
    assert(bad == 0L)
  }

  test("mm_phash_dup equals brute-force hamming<=3 over all image pairs (pigeonhole complete)") {
    val bands = QueriesWave7.phashBandsOf(Tables(spark, sf, "documents"))
      .collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues { rs =>
        val m = rs.map(r => r.getAs[Int]("band") -> r.getAs[Long]("bv")).toMap
        (0 until 4).map(m)
      }.toMap
    val ids = bands.keys.toSeq.sorted
    val brute = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      h = (0 until 4).map(b =>
        java.lang.Long.bitCount(bands(ids(i))(b) ^ bands(ids(j))(b))).sum
      if h <= QueriesWave7.phashMaxHamming
    } yield (ids(i), ids(j), h.toLong)).toSet
    val got = QueriesWave7.mmPhashDupQ(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Long]("hamming")))
      .toSet
    assert(got == brute, s"banded=${got.size} brute=${brute.size}")
  }

  test("hill_tail matches a driver-side recomputation from the top-k values") {
    val cents = Tables(spark, sf, "orders")
      .select(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("c"))
      .orderBy(col("c").desc).limit(QueriesWave7.hillK + 1)
      .collect().map(_.getAs[Long]("c"))
    val xk = cents.min
    val terms = cents.filter(_ > xk)
      .map(c => math.round(math.log(c.toDouble / xk) * 1e6) / 1e6)
    val r = QueriesWave7.hillTailQ(spark, sf).collect().head
    assert(r.getAs[Long]("m") == terms.length)
    assert(r.getAs[Long]("x_thresh") == xk)
    assert(math.abs(r.getAs[Double]("h_hill") - terms.sum / terms.length) < 1e-9)
  }

  test("cusum_changepoint: D_n = 0 by construction and exactly one peak") {
    val rows = QueriesWave7.cusumChangepointQ(spark, sf).collect()
    assert(rows.last.getAs[Long]("d_t") == 0L)
    assert(rows.count(_.getAs[Boolean]("is_peak")) == 1)
  }

  test("window_funnel matches a hand-built oracle and is monotone") {
    import spark.implicits._
    def ts(min: Int) = new Timestamp(min * 60000L)
    // u1 completes view→click→purchase inside the hour windows;
    // u2's click comes 2h after its view (disqualified, and so is its
    // purchase); u3 purchases with no prior funnel at all.
    val e = Seq(
      (1L, "view", ts(0)), (1L, "click", ts(30)), (1L, "purchase", ts(80)),
      (2L, "view", ts(0)), (2L, "click", ts(130)), (2L, "purchase", ts(150)),
      (3L, "purchase", ts(10))
    ).toDF("user_id", "event_type", "ts")
    val r = QueriesWave7.windowFunnelCore(e).collect().head
    assert(r.getAs[Long]("u_view") == 2L)
    assert(r.getAs[Long]("u_click") == 1L)
    assert(r.getAs[Long]("u_purchase") == 1L)
    val real = QueriesWave7.windowFunnelQ(spark, sf).collect().head
    assert(real.getAs[Long]("u_view") >= real.getAs[Long]("u_click"))
  }

  test("sax_symbols emits only a-d over contiguous frames covering every day") {
    val rows = QueriesWave7.saxSymbolsQ(spark, sf).collect()
    assert(rows.forall(r => Set("a", "b", "c", "d")(r.getAs[String]("symbol"))))
    val days = rows.map(_.getAs[Long]("w")).sum
    val nDays = Tables(spark, sf, "events")
      .select(expr("date_trunc('DAY', ts)")).distinct().count()
    assert(days == nDays)
  }

  test("curriculum_plan offsets are the exact token prefix sums and docs conserve") {
    val rows = QueriesWave7.curriculumPlanQ(spark, sf).collect()
    var run = 0L
    rows.foreach { r =>
      assert(r.getAs[Long]("token_offset") == run)
      run += r.getAs[Long]("n_tokens")
    }
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total == Tables(spark, sf, "documents").count())
  }

  test("kn_bigram_lm: model normalizes (sum ncw = T, every count >= 1) and NLL > 0") {
    // With D = 3/4: Σ_w2 P(w2|w1) = [(4·cw1 − 3·n1fw)·T + 3·n1fw·Σ ncw]
    // / (4·T·cw1) = 1 exactly, PROVIDED every seen bigram count is ≥ 1
    // (so max(4c−3,0) = 4c−3) and Σ_w2 N₁₊(·w2) = T. Check both legs.
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), graft.operators.TextOps.tokensExpr.as("__ws"))
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, greatest(size(__ws) - 1, 0)),
          |          i -> struct(__ws[i-1] AS w1, __ws[i] AS w2))""".stripMargin)).as("bg"))
      .groupBy(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .agg(count(lit(1)).as("c"))
    val t = docs.count()
    val sumNcw = docs.groupBy(col("w2")).agg(count(lit(1)).as("ncw"))
      .agg(sum(col("ncw"))).collect().head.getLong(0)
    assert(sumNcw == t)
    assert(docs.filter(col("c") < 1L).count() == 0L)
    val bad = QueriesWave7.knBigramLmQ(spark, sf)
      .filter(col("nll_kn") <= 0.0).count()
    assert(bad == 0L)
  }

  test("weighted_jaccard stays in [0,1] and equals plain jaccard at identity") {
    val rows = QueriesWave7.weightedJaccardQ(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val wj = r.getAs[Double]("w_jaccard")
      val j = r.getAs[Double]("jaccard")
      assert(wj >= 0.0 && wj <= 1.0 + 1e-12)
      // identical sets: intersection = union on both metrics
      if (j == 1.0) assert(wj == 1.0)
    }
  }

  test("kfold_assign balances every stratum to spread <= 1 and conserves docs") {
    val rows = QueriesWave7.kfoldAssignQ(spark, sf).collect()
    assert(rows.forall(_.getAs[Long]("spread") <= 1L))
    assert(rows.map(_.getAs[Long]("n_docs")).sum ==
      Tables(spark, sf, "documents").count())
  }

  test("lsh_tuning: recall rises with band count and all probabilities are valid") {
    val rows = QueriesWave7.lshTuningQ(spark, sf).collect()
      .sortBy(-_.getAs[Int]("bands"))
    rows.foreach { r =>
      val er = r.getAs[Double]("exp_recall")
      assert(er >= 0.0 && er <= 1.0 + 1e-9)
    }
    // splitting the same 16 perms into more bands can only add collision
    // chances: recall is monotone in b for fixed b·r
    rows.sliding(2).foreach {
      case Array(hi, lo) =>
        assert(hi.getAs[Double]("exp_recall") >= lo.getAs[Double]("exp_recall") - 1e-9)
      case _ =>
    }
  }

  test("hist_quantile_check: the exact quantile lands in the predicted bin for every p") {
    val rows = QueriesWave7.histQuantileCheckQ(spark, sf).collect()
    assert(rows.length == QueriesWave7.hqPs.length)
    assert(rows.forall(_.getAs[Boolean]("within_bound")))
  }

  test("sample_est_ci brackets are ordered and the point estimate equals sample_est") {
    val ci = QueriesSampleEst.sampleEstCiQ(spark, sf).collect()
      .map(r => r.getAs[String]("query_id") ->
        (r.getAs[Double]("est"), r.getAs[Double]("lo"), r.getAs[Double]("hi"))).toMap
    assert(ci.nonEmpty)
    ci.values.foreach { case (est, lo, hi) =>
      assert(lo <= hi && est >= 0.0 && lo >= 0.0)
    }
    val point = QueriesSampleEst.sampleEstQ(spark, sf).collect()
      .map(r => r.getAs[String]("query_id") -> r.getAs[Double]("est")).toMap
    point.foreach { case (id, est) => assert(ci(id)._1 == est, id) }
  }

  test("voptimal_hist matches a driver-side exact DP and is non-increasing in k") {
    val vals = Tables(spark, sf, "lineitem")
      .groupBy(col("l_quantity").cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getAs[Long]("v"), r.getAs[Long]("c"))).sortBy(_._1)
    val n = vals.length
    val p = new Array[BigInt](n + 1); val s = new Array[BigInt](n + 1)
    val q = new Array[BigInt](n + 1)
    p(0) = 0; s(0) = 0; q(0) = 0
    for (i <- 1 to n) {
      val (v, c) = vals(i - 1)
      p(i) = p(i - 1) + c; s(i) = s(i - 1) + BigInt(c) * v
      q(i) = q(i - 1) + BigInt(c) * v * v
    }
    def sse6(i: Int, j: Int): Long = {
      val dp = p(j) - p(i)
      val num = (q(j) - q(i)) * dp - (s(j) - s(i)) * (s(j) - s(i))
      math.round(1e6 * (num.toDouble / dp.toLong))
    }
    val B = QueriesWave7.voptMaxBuckets
    val inf = Long.MaxValue / 4
    val e = Array.fill(B + 1, n + 1)(inf)
    for (j <- 1 to n) e(1)(j) = sse6(0, j)
    for (k <- 2 to B; j <- k to n; i <- (k - 1) until j)
      e(k)(j) = math.min(e(k)(j), e(k - 1)(i) + sse6(i, j))
    val got = QueriesWave7.voptimalHistQ(spark, sf).collect()
      .map(r => r.getAs[Int]("n_buckets") -> r.getAs[Long]("sse_q")).toMap
    for (k <- 1 to B) assert(got(k) == e(k)(n), s"k=$k: ${got(k)} vs ${e(k)(n)}")
    (1 until B).foreach(k => assert(got(k + 1) <= got(k)))
  }

  test("salsa_scores stays on the simplex: grid mass conserved within floor loss") {
    val rows = QueriesWave7.salsaScoresQ(spark, sf).collect()
    val hub = rows.map(_.getAs[Long]("hub_grid")).sum
    val auth = rows.map(_.getAs[Long]("auth_grid")).sum
    val g = QueriesWave7.salsaGrid
    // each stochastic sweep loses at most one grid unit per edge to the
    // floor; 25² edges × 2·4 sweeps bounds the total leak far below 1%
    assert(hub <= g && auth <= g)
    assert(hub > g * 99 / 100, s"hub mass $hub")
    assert(auth > g * 99 / 100, s"auth mass $auth")
    rows.foreach { r =>
      assert(r.getAs[Long]("hub_grid") >= 0L && r.getAs[Long]("auth_grid") >= 0L)
    }
  }
}
