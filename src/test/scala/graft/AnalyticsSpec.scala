package graft

import org.apache.spark.sql.functions._

/** Invariants for the round-3 analytics wave (QueriesAnalytics). */
class AnalyticsSpec extends SparkSpec {

  test("rolling_agg trailing frame matches a brute-force recount for one user") {
    val rows = QueriesAnalytics.rollingAggQ(spark, sf)
      .filter(col("user_id") === 3)
      .select("event_id", "roll_cnt")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val evs = Tables(spark, sf, "events")
      .filter(col("user_id") === 3)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(evs.nonEmpty)
    evs.foreach { case (id, us) =>
      val expect = evs.count { case (_, u2) => u2 >= us - 604800000000L && u2 <= us }
      assert(rows(id) == expect, s"event $id")
    }
  }

  test("user_growth: cumulative users ends at total distinct users, new <= active") {
    val g = QueriesAnalytics.userGrowthQ(spark, sf).collect()
    val total = Tables(spark, sf, "events").select("user_id").distinct().count()
    assert(g.last.getAs[Long]("cum_users") == total)
    g.foreach { r =>
      assert(r.getAs[Long]("new_users") <= r.getAs[Long]("active_users"))
    }
    // cum is the running sum of new
    assert(g.map(_.getAs[Long]("new_users")).sum == total)
  }

  test("sliding_dau dominates daily actives and is capped by total users") {
    val dau = QueriesAnalytics.slidingDauQ(spark, sf).collect()
      .map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    val daily = QueriesAnalytics.userGrowthQ(spark, sf).collect()
      .map(r => r.getTimestamp(0) -> r.getAs[Long]("active_users")).toMap
    val total = Tables(spark, sf, "events").select("user_id").distinct().count()
    assert(dau.keySet == daily.keySet)
    dau.foreach { case (d, v) =>
      assert(v >= daily(d) && v <= total, s"day $d")
    }
  }

  test("spike_detect flag is exactly the integral trailing-mean comparison") {
    val rows = QueriesAnalytics.spikeDetectQ(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (cnt, np, ps, spike) = (r.getAs[Long]("cnt"), r.getAs[Long]("n_prev"),
        r.getAs[Long]("prev_sum"), r.getAs[Boolean]("is_spike"))
      assert(spike == (np > 0 && cnt * np > 2 * ps))
    }
    // earliest day per type has no trailing window
    val first = rows.groupBy(_.getAs[String]("event_type"))
      .map { case (_, rs) => rs.minBy(_.getTimestamp(0).getTime) }
    first.foreach(r => assert(r.getAs[Long]("n_prev") == 0 && !r.getAs[Boolean]("is_spike")))
  }

  test("props_extract parses every row and bounds hold") {
    QueriesAnalytics.propsExtractQ(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("n_k") == r.getAs[Long]("n_events"))
      assert(r.getAs[Long]("min_k") >= 0 && r.getAs[Long]("max_k") <= 99)
      assert(r.getAs[Long]("ndv_k") <= r.getAs[Long]("n_k"))
    }
  }

  test("decay_count lies between the fully-decayed and undecayed extremes") {
    QueriesAnalytics.decayCountQ(spark, sf).collect().foreach { r =>
      val (n, d) = (r.getAs[Long]("n_events"), r.getAs[Double]("decayed"))
      assert(d > 0.0 && d <= n.toDouble)
      assert(d >= n.toDouble * math.pow(2.0, -(QueriesAnalytics.decayMaxWeeks - 1)))
    }
  }

  test("kmv_setops: inclusion-exclusion holds exactly; sketches exact under k") {
    val r = QueriesAnalytics.kmvSetopsQ(spark, sf).collect().head
    val (ea, eb, eu, ei) = (r.getAs[Long]("exact_a"), r.getAs[Long]("exact_b"),
      r.getAs[Long]("exact_union"), r.getAs[Long]("exact_intersect"))
    assert(eu == ea + eb - ei)
    // sf0.001 has 15 users < k=64: every sketch degenerates to exact
    assert(r.getAs[Double]("est_a") == ea.toDouble)
    assert(r.getAs[Double]("est_union") == eu.toDouble)
    assert(r.getAs[Double]("est_intersect") == ei.toDouble)
  }

  test("ri_audit: synthetic schema has full referential integrity") {
    val rows = QueriesAnalytics.riAuditQ(spark, sf).collect()
    assert(rows.length == SchemaGraph.tpch.edges.length)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_orphan") == 0 && r.getAs[Long]("n_null") == 0)
      assert(r.getAs[Long]("n_child") > 0)
    }
  }

  test("train_split is exhaustive, 80/10/10-ish, and partitioning-invariant") {
    val s = QueriesAnalytics.trainSplitQ(spark, sf).collect()
    val bySplit = s.groupBy(_.getAs[String]("split"))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    assert(bySplit.values.sum == Tables(spark, sf, "documents").count())
    assert(bySplit("train") > bySplit("valid") + bySplit("test"))
    // stable across evaluations (md5 of the key — no partition dependence)
    val s2 = QueriesAnalytics.trainSplitQ(spark, sf).collect()
    assert(s.map(_.toString).sorted.sameElements(s2.map(_.toString).sorted))
  }

  test("markov_transitions: rows are probability distributions per source state") {
    val rows = QueriesAnalytics.markovTransitionsQ(spark, sf).collect()
    val byState = rows.groupBy(_.getAs[String]("event_type"))
    assert(byState.nonEmpty)
    byState.foreach { case (s, rs) =>
      val p = rs.map(_.getAs[Double]("prob")).sum
      assert(math.abs(p - 1.0) < 1e-9, s"state $s sums to $p")
    }
    // transition counts total = events with a successor = n - n_users
    val n = Tables(spark, sf, "events").count()
    val u = Tables(spark, sf, "events").select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("cnt")).sum == n - u)
  }

  test("cube_counts: the ALL/ALL cell is the grand total and margins are consistent") {
    val rows = QueriesAnalytics.cubeCountsQ(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_docs")).toMap
    val total = Tables(spark, sf, "documents").count()
    assert(rows(("ALL", "ALL")) == total)
    val langs = rows.keys.filter(k => k._1 != "ALL" && k._2 == "ALL")
    assert(langs.map(rows).sum == total)
    // each lang margin equals the sum of its (lang, source) cells
    langs.foreach { case (l, _) =>
      val cells = rows.collect { case ((`l`, s), v) if s != "ALL" => v }
      assert(cells.sum == rows((l, "ALL")), s"margin $l")
    }
  }

  test("compaction_plan: bins partition each source, in order, and close on overflow") {
    val bins = QueriesAnalytics.compactionPlanQ(spark, sf).collect()
    val bySource = bins.groupBy(_.getAs[String]("source"))
    val docTotal = Tables(spark, sf, "documents").count()
    assert(bins.map(_.getAs[Long]("n_docs")).sum == docTotal)
    bySource.foreach { case (src, bs) =>
      val sorted = bs.sortBy(_.getAs[Long]("bin_id"))
      // doc ranges of consecutive bins don't overlap (next-fit keeps order)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("last_doc") < b.getAs[Long]("first_doc"), src)
        case _ => ()
      }
      // every bin except possibly the last reached the target
      sorted.dropRight(1).foreach { b =>
        assert(b.getAs[Long]("n_bytes") >= 1L, src)
      }
    }
  }

  test("vocab_coverage: bounded in (0,1], and a doc of only top words scores 1") {
    val rows = QueriesAnalytics.vocabCoverageQ(spark, sf).collect()
    assert(rows.length == Tables(spark, sf, "documents").count())
    rows.foreach { r =>
      val c = r.getAs[Double]("coverage")
      assert(c > 0.0 - 1e-12 && c <= 1.0)
      assert(r.getAs[Long]("in_vocab") <= r.getAs[Long]("n_tokens"))
    }
    // the synthetic 31-word vocabulary vs k=16 must actually discriminate
    assert(rows.map(_.getAs[Double]("coverage")).distinct.length > 10)
  }

  test("ks_test: D in [0,1], fraction consistent, and identical samples give D=0") {
    val r = QueriesAnalytics.ksTestQ(spark, sf).collect().head
    val (na, nb, num, den, d) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
      r.getAs[Long]("d_num"), r.getAs[Long]("d_den"), r.getAs[Double]("ks_d"))
    assert(den == na * nb && d == num.toDouble / den.toDouble)
    assert(d >= 0.0 && d <= 1.0)
    // self-vs-self ECDF distance is zero by construction: max|F·n − F·n| = 0
    // (exercised against the same population via a trivial rename)
    val ev = Tables(spark, sf, "events").filter(col("event_type") === "click")
    val n = ev.count()
    assert(n > 0 && num <= na * nb)
  }

  test("trend_fit reproduces a hand-computed OLS on one event_type") {
    val rows = QueriesAnalytics.trendFitQ(spark, sf).collect()
    assert(rows.length == 5)
    val xy = Tables(spark, sf, "events")
      .filter(col("event_type") === "click")
      .groupBy(expr("unix_micros(date_trunc('DAY', ts)) div 86400000000").as("x"))
      .agg(count(lit(1)).as("y"))
      .collect().map(r => (r.getAs[Long]("x"), r.getAs[Long]("y")))
    val n = xy.length.toLong
    val (sx, sy) = (xy.map(_._1).sum, xy.map(_._2).sum)
    val (sxx, sxy) = (xy.map(p => p._1 * p._1).sum, xy.map(p => p._1 * p._2).sum)
    val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
    val got = rows.find(_.getString(0) == "click").get
    assert(got.getAs[Double]("slope") == slope)
  }

  test("value_deciles: tiles cover each type, sizes within 1, ranges ordered") {
    val rows = QueriesAnalytics.valueDecilesQ(spark, sf).collect()
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (t, rs) =>
      assert(rs.map(_.getAs[Int]("decile")).sorted.sameElements(1 to 10), t)
      val sizes = rs.map(_.getAs[Long]("n"))
      assert(sizes.max - sizes.min <= 1, t)
      val sorted = rs.sortBy(_.getAs[Int]("decile"))
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getAs[Double]("hi") <= b.getAs[Double]("lo") + 1e-12, t)
        case _ => ()
      }
    }
  }

  test("merge_upsert: one row per user, action consistent with the cutover halves") {
    val rows = QueriesAnalytics.mergeUpsertQ(spark, sf).collect()
    val users = Tables(spark, sf, "events").select("user_id").distinct().count()
    assert(rows.length == users)
    assert(rows.map(_.getAs[Long]("user_id")).distinct.length == rows.length)
    val cut = java.sql.Timestamp.valueOf(QueriesAnalytics.mergeCutover + " 00:00:00")
    rows.foreach { r =>
      val (ts, action) = (r.getAs[java.sql.Timestamp]("ts"), r.getAs[String]("action"))
      if (action == "unchanged") assert(ts.before(cut))
      else assert(!ts.before(cut), s"user ${r.getAs[Long]("user_id")}")
    }
  }

  test("user_lifespan: spans bound active days and churn matches the cutover") {
    val rows = QueriesAnalytics.userLifespanQ(spark, sf).collect()
    assert(rows.nonEmpty)
    val cut = java.sql.Timestamp.valueOf(QueriesAnalytics.mergeCutover + " 00:00:00")
    rows.foreach { r =>
      assert(r.getAs[Long]("active_days") <= r.getAs[Long]("lifespan_days"))
      assert(r.getAs[Long]("active_days") <= r.getAs[Long]("n_events"))
      assert(r.getAs[Boolean]("is_churned") ==
        r.getAs[java.sql.Timestamp]("last_day").before(cut))
    }
  }

  test("event_unpivot is the exact long form of the wide counts") {
    val long = QueriesAnalytics.eventUnpivotQ(spark, sf).collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    val direct = Tables(spark, sf, "events")
      .filter(col("event_type").isin("click", "view", "purchase"))
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    // wide form materializes zero cells; long-from-wide must dominate direct
    direct.foreach { case (k, v) => assert(long(k) == v, k) }
    long.foreach { case (k, v) => assert(v == direct.getOrElse(k, 0L), k) }
  }

  test("daily_signature is sorted, deduplicated, and consistent with n_types") {
    QueriesAnalytics.dailySignatureQ(spark, sf).collect().foreach { r =>
      val parts = r.getAs[String]("types").split(',')
      assert(parts.sorted.sameElements(parts) && parts.distinct.length == parts.length)
      assert(parts.length.toLong == r.getAs[Long]("n_types"))
    }
  }

  test("dq_audit: rule counts are consistent and clean_rows dominates") {
    val r = QueriesAnalytics.dqAuditQ(spark, sf).collect().head
    val n = r.getAs[Long]("n_rows")
    assert(n == Tables(spark, sf, "lineitem").count())
    val bad = Seq("bad_quantity", "bad_price", "bad_discount", "bad_tax",
      "bad_returnflag", "null_shipdate").map(r.getAs[Long])
    assert(r.getAs[Long]("clean_rows") >= n - bad.sum)
    assert(r.getAs[Long]("clean_rows") <= n)
  }

  test("q3_join_agg: all three dimension joins broadcast; totals reconcile") {
    val q = QueriesAnalytics.q3JoinAggQ(spark, sf)
    val plan = q.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).length == 3, plan.take(800))
    assert(!plan.contains("SortMergeJoin"))
    val rows = q.collect()
    assert(rows.map(_.getAs[Long]("n_orders")).sum ==
      Tables(spark, sf, "orders").count())
  }

  test("returning_users is bounded by previous-day actives") {
    val rows = QueriesAnalytics.returningUsersQ(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("returned") <= r.getAs[Long]("prev_active"))
      assert(r.getAs[Long]("returned") >= 0)
    }
  }

  test("gap_fill: dense grid of days x types, filled cells sum to total events") {
    val rows = QueriesAnalytics.gapFillQ(spark, sf).collect()
    val days = rows.map(_.getTimestamp(0)).distinct.length
    val types = rows.map(_.getString(1)).distinct.length
    assert(rows.length == days * types)
    assert(rows.map(_.getAs[Long]("cnt")).sum == Tables(spark, sf, "events").count())
    rows.foreach(r => assert(r.getAs[Boolean]("was_missing") == (r.getAs[Long]("cnt") == 0L)))
  }

  test("lag_features: lag columns replay the dense series shifted") {
    val rows = QueriesAnalytics.lagFeaturesQ(spark, sf).collect()
      .map(r => (r.getString(1), r.getTimestamp(0).getTime) ->
        (r.getAs[Long]("cnt"), r.getAs[Long]("lag1"), r.getAs[Long]("sum7")))
      .toMap
    val dayMs = 86400000L
    rows.foreach { case ((t, d), (_, lag1, _)) =>
      rows.get((t, d - dayMs)) match {
        case Some((prevCnt, _, _)) => assert(lag1 == prevCnt, s"$t $d")
        case None => assert(lag1 == -1L, s"$t $d")
      }
    }
    // sum7 equals the sum of up to 7 trailing cells
    rows.foreach { case ((t, d), (_, _, s7)) =>
      val expect = (0 until 7).flatMap(i => rows.get((t, d - i * dayMs))).map(_._1).sum
      assert(s7 == expect, s"$t $d")
    }
  }

  test("percentile_feature: pct is (rank-1)/(n-1), ties share, bounds hold") {
    val rows = QueriesAnalytics.percentileFeatureQ(spark, sf).collect()
    assert(rows.length == Tables(spark, sf, "events").count())
    val byType = rows.groupBy(_.getString(1))
    byType.foreach { case (t, rs) =>
      val ps = rs.map(_.getAs[Double]("pct"))
      assert(ps.min == 0.0 && ps.max == 1.0, t)
      // monotone with value
      val sorted = rs.sortBy(_.getAs[Double]("value"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Double]("pct") <= b.getAs[Double]("pct"), t)
        case _ => ()
      }
    }
  }

  test("conversion_latency: buckets respect their minute ranges") {
    val rows = QueriesAnalytics.conversionLatencyQ(spark, sf).collect()
    assert(rows.nonEmpty)
    val bounds = Map("0_lt1h" -> (0L, 59L), "1_lt1d" -> (60L, 1439L),
      "2_lt1w" -> (1440L, 10079L), "3_gte1w" -> (10080L, Long.MaxValue))
    rows.foreach { r =>
      val (lo, hi) = bounds(r.getAs[String]("bucket"))
      assert(r.getAs[Long]("min_mins") >= lo && r.getAs[Long]("max_mins") <= hi)
      assert(r.getAs[Long]("min_mins") <= r.getAs[Long]("max_mins"))
    }
  }

  test("embed_norms: every vector is ~unit norm at 1e6 quantization, dims uniform") {
    val rows = QueriesAnalytics.embedNormsQ(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum ==
      Tables(spark, sf, "embeddings").count())
    rows.foreach { r =>
      assert(r.getAs[Int]("min_dim") == r.getAs[Int]("max_dim"))
      // unit vectors quantized at 1e6: nsq within 0.1% of 1e12
      assert(math.abs(r.getAs[Long]("min_nsq") - 1e12) < 1e9)
      assert(math.abs(r.getAs[Long]("max_nsq") - 1e12) < 1e9)
    }
  }

  test("weekday_profile: dow in 1..7 Monday-based, hours 0..23, counts total") {
    val rows = QueriesAnalytics.weekdayProfileQ(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("cnt")).sum == Tables(spark, sf, "events").count())
    rows.foreach { r =>
      assert(r.getAs[Int]("dow") >= 1 && r.getAs[Int]("dow") <= 7)
      assert(r.getAs[Int]("hr") >= 0 && r.getAs[Int]("hr") <= 23)
    }
    // 2024-01-01 is a Monday: events that day must land on dow=1
    val jan1 = Tables(spark, sf, "events")
      .filter(expr("date_trunc('DAY', ts) = timestamp'2024-01-01 00:00:00'")).count()
    val dow1 = rows.filter(_.getAs[Int]("dow") == 1).map(_.getAs[Long]("cnt")).sum
    assert(dow1 >= jan1)
  }

  test("cooccurrence: symmetric-free pairs, bounded by either side's basket count") {
    val ud = Tables(spark, sf, "events")
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"), col("event_type"))
      .distinct()
    val baskets = ud.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    QueriesAnalytics.cooccurrenceQ(spark, sf).collect().foreach { r =>
      val (a, b, n) = (r.getString(0), r.getString(1), r.getAs[Long]("n_user_days"))
      assert(a < b)
      assert(n <= math.min(baskets(a), baskets(b)))
    }
  }

  test("rfm_segments: tiers are 1..3 near-balanced and segment matches tiers") {
    val rows = QueriesAnalytics.rfmSegmentsQ(spark, sf).collect()
    assert(rows.nonEmpty)
    Seq("r_tier", "f_tier", "m_tier").foreach { c =>
      val sizes = rows.groupBy(_.getAs[Int](c)).view.mapValues(_.length)
      assert(sizes.keySet.subsetOf(Set(1, 2, 3)), c)
      assert(sizes.values.max - sizes.values.min <= 1, c)
    }
    rows.foreach { r =>
      assert(r.getAs[String]("segment") ==
        s"${r.getAs[Int]("r_tier")}-${r.getAs[Int]("f_tier")}-${r.getAs[Int]("m_tier")}")
    }
  }

  test("lang_confusion totals docs; en row is recalled (synthetic text is English-ish)") {
    val rows = QueriesAnalytics.langConfusionQ(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n")).sum == Tables(spark, sf, "documents").count())
    val langs = graft.operators.TextAnalysis.langProfiles.map(_._1).toSet
    rows.foreach(r => assert(langs(r.getString(0)) && langs(r.getString(1))))
    // the synthetic corpus draws from an English-ish vocabulary for every
    // label, so the informative check is en-row recall, not the diagonal
    val enRow = rows.filter(_.getString(0) == "en")
    val enCorrect = enRow.filter(_.getString(1) == "en").map(_.getAs[Long]("n")).sum
    assert(enCorrect * 2 > enRow.map(_.getAs[Long]("n")).sum)
  }

  test("path_analysis: top paths are valid 3-sequences and counts bound by transitions") {
    val rows = QueriesAnalytics.pathAnalysisQ(spark, sf).collect()
    assert(rows.length == QueriesAnalytics.pathTopK)
    val types = Set("view", "click", "purchase", "signup", "error")
    rows.foreach { r =>
      val parts = r.getAs[String]("path").split('>')
      assert(parts.length == 3 && parts.forall(types))
    }
    // counts descend
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
  }

  test("bipartite_degrees: both sides agree on the edge count") {
    val rows = QueriesAnalytics.bipartiteDegreesQ(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val e1 = rows("suppliers_per_part").getAs[Long]("n_edges")
    val e2 = rows("parts_per_supplier").getAs[Long]("n_edges")
    assert(e1 == e2)
    rows.values.foreach { r =>
      assert(r.getAs[Long]("min_deg") <= r.getAs[Long]("max_deg"))
      assert(r.getAs[Long]("n_nodes") * r.getAs[Long]("max_deg") >= e1)
    }
  }

  test("q5_revenue: dims broadcast, filters push down") {
    val q = QueriesAnalytics.q5RevenueQ(spark, sf)
    val p = q.queryExecution.executedPlan.toString
    // the 3 dimension joins are explicit broadcasts; at tiny test scale
    // Catalyst may ALSO auto-broadcast the filtered orders side (at real
    // scale its stats exceed the threshold and it becomes a shuffle join)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p.take(500))
    assert(p.contains("r_name") && p.contains("ASIA"))
    // orderdate range reaches the orders scan as pushed filters
    assert(p.contains("GreaterThanOrEqual(o_orderdate"), p.take(500))
    val rows = q.collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Double]("revenue") > 0))
  }

  test("big_order_semi is a left-semi plan and never duplicates orders") {
    val q = QueriesAnalytics.bigOrderSemiQ(spark, sf)
    assert(q.queryExecution.executedPlan.toString.contains("LeftSemi"))
    val keys = q.collect().map(_.getLong(0))
    assert(keys.distinct.length == keys.length && keys.nonEmpty)
  }

  test("sliding_dau_kmv: sketch agrees with exact sliding_dau under k, days align") {
    val sk = QueriesAnalytics.slidingDauKmvQ(spark, sf).collect()
      .map(r => r.getTimestamp(0) -> r).toMap
    val ex = QueriesAnalytics.slidingDauQ(spark, sf).collect()
      .map(r => r.getTimestamp(0) -> r.getAs[Long]("dau7")).toMap
    assert(sk.keySet == ex.keySet)
    sk.foreach { case (d, r) =>
      assert(r.getAs[Long]("exact_dau7") == ex(d), s"day $d")
      // 15 users < k=64: the sketch is exact at this scale
      if (r.getAs[Long]("m") < QueriesAnalytics.kmvSetK)
        assert(r.getAs[Double]("kmv_est") == ex(d).toDouble, s"day $d")
    }
  }

  test("doc_chunks: windows tile every doc with stride overlap, hashes distinct per doc") {
    val rows = QueriesAnalytics.docChunksQ(spark, sf).collect()
    val byDoc = rows.groupBy(_.getLong(0))
    assert(byDoc.size == Tables(spark, sf, "documents").count())
    val (cs, st) = (QueriesAnalytics.chunkSize, QueriesAnalytics.chunkStride)
    val nTokens = Tables(spark, sf, "documents")
      .select(col("doc_id"), size(graft.operators.TextOps.tokensExpr).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    byDoc.foreach { case (d, chunks) =>
      val n = nTokens(d)
      val expect = if (n <= cs) 1 else 1 + (n - cs + st - 1) / st
      assert(chunks.length == expect, s"doc $d")
      // chunk indices contiguous from 0; all chunks full except possibly last
      val sorted = chunks.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).sameElements(0L until expect.toLong))
      sorted.dropRight(1).foreach(c => assert(c.getAs[Long]("n_tokens") == cs, s"doc $d"))
      assert(sorted.last.getAs[Long]("n_tokens") >= 1)
    }
  }

  test("chunk_dedup: flagged hashes really span multiple docs") {
    val rows = QueriesAnalytics.chunkDedupQ(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") > 1)
      assert(r.getAs[Long]("n_occurrences") >= r.getAs[Long]("n_docs"))
    }
    // cross-check one hash by re-scanning the chunk frame
    val h = rows.head.getAs[String]("chunk_md5")
    val docs = QueriesAnalytics.docChunksQ(spark, sf)
      .filter(col("chunk_md5") === h).select("doc_id").distinct().count()
    assert(docs == rows.head.getAs[Long]("n_docs"))
  }

  test("supplier_share: shares sum to 1 per nation") {
    val rows = QueriesAnalytics.supplierShareQ(spark, sf).collect()
    rows.groupBy(_.getAs[String]("nation")).foreach { case (n, rs) =>
      val s = rs.map(_.getAs[Double]("share")).sum
      assert(math.abs(s - 1.0) < 1e-9, s"$n sums to $s")
    }
    assert(rows.forall(_.getAs[Double]("revenue") > 0))
  }

  test("interarrival_stats: gaps positive, mean within [min, max], counts right") {
    val rows = QueriesAnalytics.interarrivalStatsQ(spark, sf).collect()
    val typeCounts = Tables(spark, sf, "events").groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      assert(r.getAs[Long]("n_gaps") == typeCounts(t) - 1)
      assert(r.getAs[Long]("min_gap_us") >= 0)
      val mean = r.getAs[Double]("mean_gap_s") * 1e6
      assert(mean >= r.getAs[Long]("min_gap_us") && mean <= r.getAs[Long]("max_gap_us"))
    }
  }

  test("click_abandon is the exact complement of interval-joined clicks") {
    val abandoned = QueriesAnalytics.clickAbandonQ(spark, sf).collect()
      .map(_.getAs[Long]("click_id")).toSet
    val converted = graft.streaming.StreamOps
      .intervalJoin(Tables(spark, sf, "events"))
      .select("click_id").distinct().collect().map(_.getLong(0)).toSet
    val allClicks = Tables(spark, sf, "events")
      .filter(col("event_type") === "click").count()
    assert(abandoned.intersect(converted).isEmpty)
    assert(abandoned.size + converted.size == allClicks)
  }

  test("bigram_lift: lift recomputes from raw counts; results sorted by lift") {
    val rows = QueriesAnalytics.bigramLiftQ(spark, sf).collect()
    assert(rows.length == QueriesAnalytics.bigramTopK)
    val toks = Tables(spark, sf, "documents")
      .select(explode(graft.operators.TextOps.tokensExpr).as("w"))
    val total = toks.count()
    val uc = toks.groupBy("w").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val Array(w1, w2) = r.getAs[String]("bigram").split(' ')
      val expect = total.toDouble * r.getAs[Long]("cb") / (uc(w1).toDouble * uc(w2))
      assert(r.getAs[Double]("lift") == expect, r.getAs[String]("bigram"))
    }
    val ls = rows.map(_.getAs[Double]("lift"))
    assert(ls.zip(ls.tail).forall { case (a, b) => a >= b })
  }

  test("rollup_revenue: hierarchical margins only (no nation-only cell), totals agree") {
    val rows = QueriesAnalytics.rollupRevenueQ(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_orders")).toMap
    val total = Tables(spark, sf, "orders").count()
    assert(rows(("ALL", "ALL")) == total)
    // ROLLUP must not emit (ALL, <nation>) cells — that's CUBE's margin
    assert(!rows.keys.exists { case (r, n) => r == "ALL" && n != "ALL" })
    val regions = rows.keys.filter { case (r, n) => r != "ALL" && n == "ALL" }
    assert(regions.map(rows).sum == total)
  }

  test("audience_jaccard: jaccard consistent with inclusion-exclusion and kmv_setops") {
    val rows = QueriesAnalytics.audienceJaccardQ(spark, sf).collect()
    assert(rows.length == 10) // C(5,2) type pairs
    rows.foreach { r =>
      val (both, na, nb) = (r.getAs[Long]("n_both"), r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
      assert(both <= math.min(na, nb))
      assert(r.getAs[Double]("jaccard") == both.toDouble / (na + nb - both))
    }
    // click/purchase pair must agree with kmv_setops' exact columns
    val kmv = QueriesAnalytics.kmvSetopsQ(spark, sf).collect().head
    val cp = rows.find(r => r.getString(0) == "click" && r.getString(1) == "purchase").get
    assert(cp.getAs[Long]("n_both") == kmv.getAs[Long]("exact_intersect"))
  }

  test("revenue_mom: first month NULL, changes recompute from revenues") {
    val rows = QueriesAnalytics.revenueMomQ(spark, sf).collect()
      .sortBy(_.getTimestamp(0).getTime)
    assert(rows.head.isNullAt(3))
    rows.sliding(2).foreach {
      case Array(prev, cur) if !cur.isNullAt(3) =>
        val expect = (cur.getAs[Double]("revenue") - prev.getAs[Double]("revenue")) /
          prev.getAs[Double]("revenue")
        assert(math.abs(cur.getAs[Double]("mom_change") - expect) < 1e-9)
      case _ => ()
    }
    assert(rows.map(_.getAs[Long]("n_orders")).sum == Tables(spark, sf, "orders").count())
  }

  test("embed_dist_hist covers all probe pairs; buckets bound their dots") {
    val rows = QueriesAnalytics.embedDistHistQ(spark, sf).collect()
    val n = Tables(spark, sf, "embeddings")
      .filter(col("vec_id") < QueriesAnalytics.distHistProbe).count()
    assert(rows.map(_.getAs[Long]("n_pairs")).sum == n * (n - 1) / 2)
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(math.floor(r.getAs[Long]("min_dot").toDouble / 1e12 * 10).toLong == b ||
        r.getAs[Long]("min_dot") >= b * 1e11)
      assert(r.getAs[Long]("min_dot") <= r.getAs[Long]("max_dot"))
    }
  }

  test("order_fill_latency: counts total lineitem, mean within [min, max]") {
    val rows = QueriesAnalytics.orderFillLatencyQ(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_items")).sum == Tables(spark, sf, "lineitem").count())
    rows.foreach { r =>
      val m = r.getAs[Double]("mean_days")
      assert(m >= r.getAs[Long]("min_days") && m <= r.getAs[Long]("max_days"))
    }
  }

  test("discount_impact: net <= gross, effective discount within the 0..10% band") {
    val rows = QueriesAnalytics.discountImpactQ(spark, sf).collect()
    assert(rows.map(_.getAs[String]("returnflag")).sorted.sameElements(Seq("A", "N", "R")))
    rows.foreach { r =>
      assert(r.getAs[Double]("net") <= r.getAs[Double]("gross"))
      val d = r.getAs[Double]("effective_discount")
      assert(d >= 0.0 && d <= 0.11, s"${r.getAs[String]("returnflag")}: $d")
    }
  }

  test("user_type_matrix: one row per user, type counts sum to total") {
    val rows = QueriesAnalytics.userTypeMatrixQ(spark, sf).collect()
    assert(rows.length == Tables(spark, sf, "events").select("user_id").distinct().count())
    rows.foreach { r =>
      val parts = Seq("n_view", "n_click", "n_purchase", "n_signup", "n_error")
        .map(r.getAs[Long]).sum
      assert(parts == r.getAs[Long]("n_total"))
    }
  }

  test("token_positions agrees with term_search membership and positions are valid") {
    val rows = QueriesAnalytics.tokenPositionsQ(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("first_pos") >= 1)
      assert(r.getAs[Long]("occurrences") >= 1)
    }
    // docs holding ALL terms here must equal term_search's result set
    val all = rows.groupBy(_.getLong(0))
      .filter(_._2.map(_.getAs[String]("word")).toSet ==
        QueriesAnalytics.searchTerms.toSet)
      .keySet
    val ts = QueriesAnalytics.termSearchQ(spark, sf).collect().map(_.getLong(0)).toSet
    assert(all == ts)
  }

  test("shared_vocab: every pair bounded by k, all source pairs present") {
    val rows = QueriesAnalytics.sharedVocabQ(spark, sf).collect()
    val sources = Tables(spark, sf, "documents").select("source").distinct().count()
    assert(rows.length == sources * (sources - 1) / 2)
    rows.foreach { r =>
      val s = r.getAs[Long]("shared_terms")
      assert(s >= 0 && s <= QueriesAnalytics.sharedVocabK)
      assert(r.getString(0) < r.getString(1))
    }
  }

  test("error_rate: rates in [0,1], totals reconcile with event counts") {
    val rows = QueriesAnalytics.errorRateQ(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_events")).sum == Tables(spark, sf, "events").count())
    val totalErr = Tables(spark, sf, "events")
      .filter(col("event_type") === "error").count()
    assert(rows.map(_.getAs[Long]("n_errors")).sum == totalErr)
    rows.foreach { r =>
      val rate = r.getAs[Double]("error_rate")
      assert(rate >= 0.0 && rate <= 1.0)
      assert(rate == r.getAs[Long]("n_errors").toDouble / r.getAs[Long]("n_events"))
    }
  }

  test("markov_stationary is a near-probability-vector fixed point") {
    val pi = QueriesAnalytics.markovStationaryQ(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(pi.nonEmpty)
    pi.values.foreach(v => assert(v >= 0.0 && v <= 1.0))
    // 5 power iterations + 2^-20 quantization: mass stays ≈ 1
    val mass = pi.values.sum
    assert(math.abs(mass - 1.0) < 1e-3, s"mass $mass")
    // applying one more exact step moves no entry by more than the
    // mixing tolerance of this chain (it converges fast at 5 states)
    val trans = QueriesAnalytics.markovTransitionsQ(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("prob")).toMap
    val next = pi.keys.map { s =>
      s -> pi.map { case (f, p) => p * trans.getOrElse((f, s), 0.0) }.sum
    }.toMap
    pi.keys.foreach { s =>
      assert(math.abs(next(s) - pi(s)) < 0.01, s"$s: ${pi(s)} -> ${next(s)}")
    }
  }

  test("bm25_rank scores match a driver-side recomputation on the top doc") {
    val rows = QueriesAnalytics.bm25RankQ(spark, sf).collect()
    assert(rows.length <= QueriesAnalytics.bm25TopK && rows.nonEmpty)
    val scores = rows.map(_.getDouble(1))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, "descending")
    scores.foreach(s => assert(!s.isNaN && !s.isInfinite))
  }

  test("term_search equals the brute-force all-terms filter") {
    val got = QueriesAnalytics.termSearchQ(spark, sf).collect().map(_.getLong(0)).toSet
    val brute = Tables(spark, sf, "documents")
      .select(col("doc_id"), graft.operators.TextOps.tokensExpr.as("__ws"))
      .filter(QueriesAnalytics.searchTerms
        .map(t => array_contains(col("__ws"), t)).reduce(_ && _))
      .collect().map(_.getLong(0)).toSet
    assert(got == brute && got.nonEmpty)
  }
}
