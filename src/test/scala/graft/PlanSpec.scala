package graft

/** Plan-regression guards: the scale-critical physical-plan properties
  * (filter pushdown to the scan, broadcast of bounded sides, shuffle
  * counts) asserted as tests, so an innocent-looking rewrite cannot
  * silently turn a broadcast into a shuffle or lift a filter off the
  * scan. Plans are inspected WITHOUT AQE (the fixture session), so the
  * assertions are deterministic.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  /** Leaf node class names of the EXECUTED tree — InMemoryTableScan
    * leaves do NOT expand to their cached child's file scan here, unlike
    * the plan string, which embeds the cached relation's definition.
    */
  private def leaves(name: String): Seq[String] = {
    // AQE wraps the whole tree in AdaptiveSparkPlanExec — itself a leaf
    // — so the typed walk needs it off for this one planning pass.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan
      .collectLeaves().map(_.getClass.getSimpleName)
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("bpe_pairs is two keyed aggregations, no join (vocab-bounded pair work)") {
    val p = plan("bpe_pairs")
    assert(!p.contains("Join"), p.take(600))
    // word-count exchange + pair-count exchange + top-k
    assert("Exchange".r.findAllIn(p).size <= 3, p)
  }

  test("embed_int8 is pure per-row expressions (no join, only the output sort shuffles)") {
    val p = plan("embed_int8")
    assert(!p.contains("Join"), p.take(600))
    assert("Exchange".r.findAllIn(p).size <= 1, p)
  }

  test("key_degree_hist never joins — one scan per profiled key") {
    val p = plan("key_degree_hist")
    assert(!p.contains("Join"), p.take(600))
    assert("Scan parquet".r.findAllIn(p).size == QueriesStats.degreeKeys.size, p)
  }

  test("substring_dup serves from the shared tokenized corpus and bounds its shuffle count") {
    // the text scan + tokenize live in the session's text:toks memo;
    // the query's executed tree must read only cached relations
    val ls = leaves("substring_dup")
    assert(ls.count(_.contains("FileSourceScan")) == 0, ls.mkString(","))
    val p = plan("substring_dup")
    // gram count, semi join, coverage agg (+partials), output sort
    assert("Exchange".r.findAllIn(p).size <= 6, p)
  }

  test("interval_join pushes the event_type filters into the parquet scans") {
    val p = plan("interval_join")
    assert(p.contains("EqualTo(event_type,click)"))
    assert(p.contains("EqualTo(event_type,purchase)"))
  }

  test("cms_freq joins its bounded counter table by broadcast") {
    assert(plan("cms_freq").contains("BroadcastHashJoin"))
  }

  test("naive_est serves from the persisted model artifact — no estimator-arm scans") {
    // since round 14 the closed-form est frames serve from the
    // warehouse-persisted six-model artifact (model_ests): the plan
    // must be a bounded artifact read + filter, with NONE of the
    // estimator arm's data-table scans (those run only inside the
    // checkpoint build)
    val p = plan("naive_est")
    assert(!p.contains("lineitem") && !p.contains("orders.parquet") &&
      !p.contains("customer"), p)
  }

  test("q1_agg is a single scan + partial/final aggregate (one exchange)") {
    val p = plan("q1_agg")
    assert("Exchange".r.findAllIn(p).size <= 2) // agg shuffle (+ sort for output order)
  }

  test("stratified_sample is a pure pushed-down filter — no shuffle at all") {
    // the operator itself (before the presentation orderBy) must not
    // exchange: sampling 100 TB is a scan, not a shuffle
    val thresh = org.apache.spark.sql.functions.lit(
      graft.operators.Corpus.thresholdHex(0.5))
    val p = graft.operators.Corpus
      .stratifiedSample(Tables(spark, sf, "documents"), "s", thresh)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }

  test("chi2_drift broadcasts its one-row totals frame") {
    val p = plan("chi2_drift")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"))
  }

  test("doc_filter is a single scan with no aggregation exchange") {
    val p = graft.operators.Corpus
      .docFilter(Tables(spark, sf, "documents"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }

  test("asof_join is one shuffle on user_id — no join operator at all") {
    // the union+running-window formulation must not produce a Join node
    // (a range join would explode per-pair candidates before picking)
    val p = graft.streaming.StreamOps
      .asofJoin(Tables(spark, sf, "events"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p)
    assert("Exchange".r.findAllIn(p).size == 1, p)
  }

  test("winnow fingerprints are computed with zero shuffle") {
    val p = graft.operators.TextOps
      .winnowFingerprints(Tables(spark, sf, "documents"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }

  test("bloom_filter probes via broadcast of the bounded bit set") {
    assert(plan("bloom_filter").contains("BroadcastExchange"))
  }

  test("pq_adc_topk broadcasts the LUT onto the code table") {
    assert(plan("pq_adc_topk").contains("BroadcastHashJoin"))
  }

  test("latest_snapshot reads all its output columns but shuffles once") {
    val p = graft.streaming.StreamOps
      .latestSnapshot(Tables(spark, sf, "events"))
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(p).size == 1, p)
  }

  test("ur_size never materializes a full-outer join") {
    val p = plan("ur_size")
    assert(!p.contains("FullOuter"), p)
  }

  test("subschema_sizes never materializes a full-outer join") {
    assert(!plan("subschema_sizes").contains("FullOuter"))
  }

  test("zorder summary is one scan + one aggregation exchange") {
    val p = graft.operators.Layout
      .zorderSummary(Tables(spark, sf, "lineitem"), "l_partkey", "l_suppkey", 16, 16)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(p).size == 1, p)
  }

  test("source_mix_sample broadcasts its per-source counts and the min row") {
    val p = plan("source_mix_sample")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"))
  }

  test("scd2_history is one shuffle on the key, no join") {
    val p = graft.streaming.StreamOps
      .scd2History(Tables(spark, sf, "events"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p)
    assert("Exchange".r.findAllIn(p).size == 1, p)
  }

  test("funnel's three stage windows share one user_id shuffle") {
    val p = graft.streaming.StreamOps
      .funnel(Tables(spark, sf, "events"))
      .queryExecution.executedPlan.toString
    // one shuffle into the windows (+1 for the global 1-row rollup)
    assert("Exchange".r.findAllIn(p).size <= 2, p)
  }

  test("seq_pack serves from the shared tokenized corpus and shuffles once") {
    val ls = leaves("seq_pack")
    assert(ls.count(_.contains("FileSourceScan")) == 0, ls.mkString(","))
    val p = plan("seq_pack")
    // one shuffle into the per-lang pack window + the presentation sort
    assert("Exchange".r.findAllIn(p).size <= 2, p)
  }

  test("dict_encode stays in DataFrame land (no RDD scan node)") {
    val p = plan("dict_encode")
    assert(!p.contains("ExistingRDD"), p.take(600))
    // dictionary broadcast back onto the fact side
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p.take(600))
  }

  test("exact_dedup reads only the columns it needs") {
    val p = plan("exact_dedup")
    // ReadSchema on the documents scan must not include the wide columns
    // that the dedup never touches (lang, source)
    val readSchemas = "ReadSchema: [^\n]*".r.findAllIn(p).toList
    assert(readSchemas.nonEmpty && readSchemas.forall(s => !s.contains("lang")))
  }

  test("ri_audit scans each child table once (joint per-table plan)") {
    val p = plan("ri_audit")
    // 5 child tables (nation, customer, supplier, orders, lineitem) —
    // one parquet scan each + 7 parent-PK scans = 12 total; the old
    // per-edge formulation needed 2 child scans per edge (18 total)
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans <= 12, s"$scans child/parent scans")
  }

  test("vocab_coverage broadcasts the vocabulary, never shuffles the corpus onto it") {
    val p = plan("vocab_coverage")
    assert(p.contains("BroadcastHashJoin"), p.take(600))
  }

  test("fuzzy_match uses the bounded (threshold) levenshtein") {
    val p = plan("fuzzy_match")
    assert(p.contains("levenshtein") && p.contains("Some(8)"), p.take(600))
  }

  test("train_split is a pushed-down scan + one aggregation exchange") {
    val p = plan("train_split")
    // md5-threshold assignment is per-row arithmetic: the only shuffles
    // are the groupBy and the presentation sort
    assert("Exchange".r.findAllIn(p).size <= 3, p)
    assert(!p.contains("Join"), p)
  }

  test("rolling_agg is one shuffle on user_id, no join") {
    val p = plan("rolling_agg")
    assert(!p.contains("Join"), p)
  }

  test("merge_upsert resolves both snapshots and the merge in one key shuffle each") {
    val p = plan("merge_upsert")
    // full outer join on the merge key: SortMergeJoin is expected (both
    // sides keyed); there must be no nested-loop fallback
    assert(!p.contains("NestedLoop"), p)
  }

  test("triangle_count joins are all keyed (no cartesian path enumeration)") {
    val p = plan("triangle_count")
    assert(!p.contains("CartesianProduct"), p.take(800))
    // the 1-row n_edges × n_triangles combine is the only nested-loop
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p.take(800))
  }

  test("nation_pagerank iterates over the cached edge frame, not the parquet tables") {
    // all 5 unrolled iterations must read the memoized aggregated graph;
    // a file-scan leaf here means the 4-table join pipeline re-executes
    // once per iteration
    val ls = leaves("nation_pagerank")
    assert(!ls.exists(_.contains("FileSourceScan")), ls.mkString(","))
    assert(ls.exists(_.contains("InMemoryTableScan")), ls.mkString(","))
  }

  test("zone_map_prune reads the slim projection once, no joins beyond the 1-row bounds") {
    val ls = leaves("zone_map_prune")
    assert(!ls.exists(_.contains("FileSourceScan")), ls.mkString(","))
    assert(!plan("zone_map_prune").contains("SortMergeJoin"))
  }

  test("shuffle_skew_audit never joins and aggregates per key before per partition") {
    val p = plan("shuffle_skew_audit")
    assert(!p.contains("Join"), p.take(800))
    // key agg + partition agg + presentation sort
    assert("Exchange".r.findAllIn(p).size <= 3, p)
  }

  test("mlm_mask serves from the shared tokenized corpus, one doc-agg shuffle") {
    val ls = leaves("mlm_mask")
    assert(ls.count(_.contains("FileSourceScan")) == 0, ls.mkString(","))
    val p = plan("mlm_mask")
    assert(!p.contains("Join"), p.take(800))
    assert("Exchange".r.findAllIn(p).size <= 2, p)
  }

  test("sample_quantiles takes the bottom-k without a global sort") {
    val p = plan("sample_quantiles")
    // per-partition top-k + driver merge, not Exchange+Sort over the table
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
  }

  test("cust_order_dist aggregates BOTH sides before the custkey join") {
    val p = plan("cust_order_dist")
    // orders are pre-aggregated to one row per custkey before the join
    // (map-side partial aggregation shrinks the shuffled/sorted payload
    // to distinct keys): the join output is the cc*oc product, so no
    // post-join re-aggregation of fact rows exists in the plan
    assert(p.contains("coalesce"), p.take(800))
    assert("partial_count".r.findAllIn(p).size >= 2, p.take(800))
    assert("Exchange".r.findAllIn(p).size <= 5, p)
  }

  test("lm_perplexity broadcasts the bigram model onto the token stream") {
    val p = plan("lm_perplexity")
    assert(p.contains("BroadcastHashJoin"), p.take(600))
    val readSchemas = "ReadSchema: [^\n]*".r.findAllIn(p).toList
    assert(readSchemas.nonEmpty && readSchemas.forall(s => !s.contains("source")), p.take(800))
  }

  test("ewma_spikes self-joins the cached day-count frame, not the events table") {
    val ls = leaves("ewma_spikes")
    assert(!ls.exists(_.contains("FileSourceScan")), ls.mkString(","))
  }

  test("min_price_supplier broadcasts the supplier dimension") {
    assert(plan("min_price_supplier").contains("BroadcastHashJoin"))
  }

  test("bloom_prejoin broadcasts the bit-position set into the probe") {
    val p = plan("bloom_prejoin")
    assert(p.contains("BroadcastHashJoin"), p.take(600))
  }

  test("q4_priority_exists runs the EXISTS as a semi join, not a distinct") {
    val p = plan("q4_priority_exists")
    assert(p.contains("LeftSemi"), p.take(800))
    assert(!p.contains("HashAggregate(keys=[o_orderkey"), p.take(800))
  }

  test("q7_trade_volume broadcasts both nation-filtered dimensions") {
    val p = plan("q7_trade_volume")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(800))
    // date column pruned: lineitem scan reads only the 5 used columns
    val readSchemas = "ReadSchema: [^\n]*".r.findAllIn(p).toList
    assert(readSchemas.exists(s => s.contains("l_shipdate") && !s.contains("l_tax")), p.take(800))
  }

  test("q8_market_share computes numerator and denominator in one aggregation pass") {
    val p = plan("q8_market_share")
    // a single pair of partial/final aggregates over the joined fact —
    // not two scans of lineitem
    assert("FileScan parquet.*lineitem".r.findAllIn(p).size <= 1, p.take(1200))
  }

  test("q10_returns takes the top 20 without a full sort of the aggregate") {
    assert(plan("q10_returns").contains("TakeOrderedAndProject"))
  }

  test("q14_promo_share broadcasts the 2-column part dim") {
    val p = plan("q14_promo_share")
    assert(p.contains("BroadcastHashJoin"), p.take(600))
    val readSchemas = "ReadSchema: [^\n]*".r.findAllIn(p).toList
    assert(readSchemas.exists(s => s.contains("p_partkey") && !s.contains("p_name")), p.take(800))
  }

  test("q16_supplier_variety reduces to distinct pairs before the part join") {
    val p = plan("q16_supplier_variety")
    // the (partkey, suppkey) distinct happens on a 2-column scan
    val readSchemas = "ReadSchema: [^\n]*".r.findAllIn(p).toList
    assert(readSchemas.exists(s =>
      s.contains("l_partkey") && s.contains("l_suppkey") && !s.contains("l_quantity")), p.take(800))
  }

  test("q17_small_qty broadcasts the brand part list and the per-part stats") {
    val p = plan("q17_small_qty")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(800))
  }

  test("q22_idle_balance broadcasts the 1-row average and anti-joins pruned orders") {
    val p = plan("q22_idle_balance")
    assert(p.contains("LeftAnti"), p.take(800))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p.take(800))
  }

  test("last_touch_attribution shuffles once by user_id into the window") {
    val p = plan("last_touch_attribution")
    assert(p.contains("Window"), p.take(600))
    // user_id shuffle + 25-row aggregate exchange + presentation sort
    assert("Exchange".r.findAllIn(p).size <= 3, p)
  }

  test("centroid_drift derives the global centroid without a second embeddings scan") {
    // the (label,dim) sums frame is memoized: executed-tree leaves are
    // in-memory scans of it, never two parquet scans of embeddings
    val ls = leaves("centroid_drift")
    assert(ls.count(_.contains("FileSourceScan")) == 0, ls.mkString(","))
  }

  test("gram_top_eigen iterates on the tiny Gram matrix via broadcast joins") {
    val p = plan("gram_top_eigen")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    // the three w-updates and normalizers feed off the memoized Gram
    // matrix — the executed tree never rescans the embeddings parquet
    val ls = leaves("gram_top_eigen")
    assert(ls.count(_.contains("FileSourceScan")) == 0, ls.mkString(","))
  }

  test("late_events broadcasts the batch watermarks back onto the events scan") {
    val p = plan("late_events")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
  }

  test("mutual_info derives all six pairs from the memoized cube, not six scans") {
    val ls = leaves("mutual_info")
    assert(ls.count(_.contains("FileSourceScan")) == 0, ls.mkString(","))
  }

  test("ngram_novelty serves from the shared tokenized corpus (no raw text scan)") {
    val ls = leaves("ngram_novelty")
    assert(ls.count(_.contains("FileSourceScan")) == 0, ls.mkString(","))
  }

  test("sole_late_supplier scans the fact table once (no row-level self-join)") {
    // the per-(order,supplier) frame is memoized: the executed tree's
    // only parquet leaf is the supplier dimension
    val ls = leaves("sole_late_supplier")
    assert(ls.count(_.contains("FileSourceScan")) <= 1, ls.mkString(","))
  }

  test("skew_salt_plan broadcasts the totals and the powers table") {
    val p = plan("skew_salt_plan")
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size >= 1 ||
      p.contains("BroadcastExchange"), p.take(800))
  }

  test("shard_plan is one scan + one 16-row aggregate") {
    val p = plan("shard_plan")
    assert(!p.contains("SortMergeJoin"), p.take(600))
    val readSchemas = "ReadSchema: [^\n]*".r.findAllIn(p).toList
    assert(readSchemas.nonEmpty && readSchemas.forall(s => !s.contains("lang")), p.take(800))
  }

  test("ngram_jaccard joins LSH candidates by doc id, never all-pairs per (lang, source)") {
    val p = plan("ngram_jaccard")
    // the r4-weak plan was a.join(b, Seq("lang","source")) — a group
    // cross product whose join keys were EXACTLY [lang, source]; in the
    // re-target every join key list includes a doc id (the lang/source
    // equalities may legitimately fold in as extra keys)
    assert("Join \\[lang#[0-9]+, source#[0-9]+\\]".r.findFirstIn(p).isEmpty, p.take(1200))
    assert(p.contains("doc_a") && p.contains("doc_b"), p.take(800))
  }

  test("quality_calibration deciles without a single-partition ntile window") {
    val p = plan("quality_calibration")
    assert(!p.contains("ntile("), p.take(1200))
    // the distributed rank: range-partition stamp + per-partition window
    assert(p.contains("__pid"), p.take(1200))
  }

  test("value_deciles tiles without a low-cardinality-partition ntile window") {
    val p = plan("value_deciles")
    // the r6-weak plan was ntile(10) OVER (PARTITION BY event_type) —
    // ~5 partitions, each a single-task sort of n/5 rows at scale
    assert(!p.contains("ntile("), p.take(1200))
    // the grouped distributed rank: range-partition stamp + per-(pid,
    // group) window — every window partition key includes __pid
    assert(p.contains("__pid"), p.take(1200))
  }

  test("q6_forecast_revenue pushes every filter to the scan; one agg exchange") {
    val p = plan("q6_forecast_revenue")
    // toString truncates the PushedFilters list; the data-filter node
    // shows the full conjunction that reached the scan stage
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p.take(1600))
    assert(p.contains(">= 0.05") && p.contains("< 24.0"), p.take(1600))
    assert(!p.contains("Join"), p.take(600))
    assert("Exchange".r.findAllIn(p).size <= 1, p)
  }

  test("q9_profit_by_nation pushes the name LIKE into the part scan and broadcasts dims") {
    val p = plan("q9_profit_by_nation")
    assert(p.contains("StringContains(p_name,widget)"), p.take(1200))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(1200))
  }

  test("q12_priority_split prunes the fact scan by date and keeps one agg pass") {
    val p = plan("q12_priority_split")
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), p.take(1200))
    // lineitem reads only the 3 used columns
    val readSchemas = "ReadSchema: [^\n]*".r.findAllIn(p).toList
    assert(readSchemas.exists(s =>
      s.contains("l_linestatus") && !s.contains("l_extendedprice")), p.take(1200))
  }

  test("q15_top_supplier broadcasts the scalar max back onto the cached revenue view") {
    val p = plan("q15_top_supplier")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"), p.take(800))
    assert(p.contains("InMemoryTableScan"), p.take(800))
  }

  test("q18_big_orders aggregates the slim projection before any join") {
    val p = plan("q18_big_orders")
    // lineitem feeds the HAVING agg with only (orderkey, quantity)
    val readSchemas = "ReadSchema: [^\n]*".r.findAllIn(p).toList
    assert(readSchemas.exists(s => s.contains("l_orderkey") &&
      s.contains("l_quantity") && !s.contains("l_partkey")), p.take(1200))
    // top-20 without a full sort of the joined result
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
  }

  test("q19_disjunctive_rev evaluates the OR inside one part join (no 3-scan union)") {
    val p = plan("q19_disjunctive_rev")
    // exactly two scans total (lineitem + part) — no per-brand union
    assert("Scan parquet".r.findAllIn(p).size == 2, p.take(1200))
    assert(!p.contains("Union"), p.take(600))
    // the three-brand OR rides inside the single part join
    assert(p.contains("BroadcastHashJoin") && p.contains("Brand#23"), p.take(1200))
  }

  test("kmv_join_est bounds the sketch with TakeOrdered, never a global sort") {
    val p = plan("kmv_join_est")
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
    assert(!p.contains("Window"), p.take(600))
  }

  test("hist_join_est broadcasts the catalog bounds onto every bucketed agg") {
    val p = plan("hist_join_est")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p.take(800))
    assert(!p.contains("Window"), p.take(600))
  }

  test("bootstrap_ci explodes replicates without any window") {
    val p = plan("bootstrap_ci")
    assert(!p.contains("Window"), p.take(600))
  }

  test("knn_graph pairs stay label-keyed (no cartesian, bounded top-k aggregate)") {
    val p = plan("knn_graph")
    assert(!p.contains("CartesianProduct"), p.take(600))
    // the per-node top-k ranking is the bounded TopKPairs AGGREGATE
    // over the memoized pair frame — no window, and crucially no
    // input-sized sort of the quadratic pair frame (the embedded
    // cached-relation definition carries the ObjectHashAggregate)
    assert(!p.contains("Window"), p.take(600))
    assert(p.contains("topkpairs") || p.contains("TopKPairs"), p.take(1200))
  }

  test("negative_sampling broadcasts the brand dimension and anti-joins positives") {
    val p = plan("negative_sampling")
    assert(p.contains("BroadcastExchange"), p.take(800))
    assert(p.contains("LeftAnti"), p.take(800))
  }

  test("seasonal_decompose: two windows over the cached daily frame, no explode") {
    val p = plan("seasonal_decompose")
    // the ±3-day RANGE trend window + the dow-effect window both ride
    // the calendar-sized daily memo; the old offset-explode crossJoin
    // (daily ×7 + regroup) and the twice-computed detrended join are gone
    assert(p.contains("windowspecdefinition"), p.take(800))
    assert(!p.contains("Generate"), p.take(800))
    assert(p.contains("InMemoryTableScan"), p.take(800))
  }

  test("cross_corr aligns lags by join over the memoized daily frame, no window") {
    val p = plan("cross_corr")
    assert(!p.contains("Window"), p.take(600))
    assert(p.contains("InMemoryTableScan"), p.take(800))
  }

  test("gini_index's only window is partitioned by segment over the value frame") {
    val p = plan("gini_index")
    assert(p.contains("windowspecdefinition(segment"), p.take(1200))
  }

  test("prefix_sim_join ranks tokens per document only — no global token order") {
    val p = plan("prefix_sim_join")
    assert(p.contains("windowspecdefinition(doc_id"), p.take(1200))
    assert(!p.contains("windowspecdefinition(df"), p.take(600))
    assert(!p.contains("CartesianProduct"), p.take(600))
  }

  test("window_funnel is one exchange on user_id — no join, windows share the partitioning") {
    val p = plan("window_funnel")
    assert(!p.contains("Join"), p.take(600))
    assert("Exchange".r.findAllIn(p).size <= 3, p)
  }

  test("cusum_changepoint aggregates to days before any window and never sort-merges") {
    val ls = leaves("cusum_changepoint")
    assert(ls.count(_.contains("FileSourceScan")) <= 1, ls.mkString(","))
    assert(!plan("cusum_changepoint").contains("SortMergeJoin"))
  }

  test("kn_bigram_lm derives every model frame from the memoized bigram table") {
    // docBg and bgStats are session memos: the executed tree's only
    // leaves are in-memory scans — zero extra documents scans at serve
    val ls = leaves("kn_bigram_lm")
    assert(ls.count(_.contains("FileSourceScan")) == 0, ls.mkString(","))
  }

  test("mm_phash_dup joins band-keyed candidates only — no cartesian, memoized bands") {
    val p = plan("mm_phash_dup")
    assert(!p.contains("CartesianProduct"), p.take(600))
    val ls = leaves("mm_phash_dup")
    assert(ls.count(_.contains("FileSourceScan")) == 0, ls.mkString(","))
  }

  test("bbit_minhash and containment_sim serve entirely from session memos") {
    Seq("bbit_minhash", "containment_sim").foreach { q =>
      val ls = leaves(q)
      assert(ls.count(_.contains("FileSourceScan")) == 0, s"$q: ${ls.mkString(",")}")
    }
  }

  test("hill_tail bounds the top-k with TakeOrdered, never a global sort") {
    val p = plan("hill_tail")
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
  }

  test("curriculum_plan ranks via range partitioning (no single-partition corpus sort)") {
    val p = plan("curriculum_plan")
    assert(p.contains("rangepartitioning") || p.contains("RangePartitioning"), p.take(800))
  }

  test("salsa_scores iterations read only memoized frames (edge pipeline runs once)") {
    val ls = leaves("salsa_scores")
    assert(ls.count(_.contains("FileSourceScan")) == 0, ls.mkString(","))
  }

  test("benford_audit reads the memoized digit frame (one fact scan per session)") {
    val ls = leaves("benford_audit")
    assert(ls.count(_.contains("FileSourceScan")) == 0, ls.mkString(","))
    assert(!plan("benford_audit").contains("SortMergeJoin"))
  }

  test("theil_sen and mann_kendall serve from the memoized calendar-bounded pair frame") {
    Seq("theil_sen", "mann_kendall").foreach { q =>
      val ls = leaves(q)
      assert(ls.count(_.contains("FileSourceScan")) == 0, s"$q: ${ls.mkString(",")}")
      assert(!plan(q).contains("SortMergeJoin"), q)
    }
  }

  test("ams_join_est rides the kjeDeg memos; gee_est never sort-merge-joins") {
    val ls = leaves("ams_join_est")
    assert(ls.count(_.contains("FileSourceScan")) == 0, ls.mkString(","))
    assert(!plan("gee_est").contains("SortMergeJoin"))
  }

  test("jsd_drift, simpson_diversity, assoc_rules, hurst_exponent serve from session memos") {
    Seq("jsd_drift", "simpson_diversity", "assoc_rules", "hurst_exponent").foreach { q =>
      val ls = leaves(q)
      assert(ls.count(_.contains("FileSourceScan")) == 0, s"$q: ${ls.mkString(",")}")
    }
  }

  test("chao1_est reads the memoized sample profiles gee_est already built") {
    val ls = leaves("chao1_est")
    // 4 exact-NDV scans stay; the sample legs are in-memory
    assert(ls.count(_.contains("FileSourceScan")) == QueriesStats.hllCols.size,
      ls.mkString(","))
  }

  test("lsh_recall_audit semi-joins two memoized pair frames (no re-shingling)") {
    val ls = leaves("lsh_recall_audit")
    assert(ls.count(_.contains("FileSourceScan")) == 0, ls.mkString(","))
  }

  test("kcore_membership peels over memoized broadcast rounds, never sort-merging") {
    val p = plan("kcore_membership")
    assert(!p.contains("SortMergeJoin"), p.take(600))
    val ls = leaves("kcore_membership")
    assert(ls.count(_.contains("FileSourceScan")) == 0, ls.mkString(","))
  }

  test("neyman_alloc windows only the bounded stratum frame; one fact scan") {
    val ls = leaves("neyman_alloc")
    assert(ls.count(_.contains("FileSourceScan")) == 1, ls.mkString(","))
    assert(!plan("neyman_alloc").contains("SortMergeJoin"))
  }

  test("epoch_shuffle_plan is one scan, one aggregate, windows over the plan frame") {
    val p = plan("epoch_shuffle_plan")
    assert(!p.contains("Join"), p.take(400))
    val ls = leaves("epoch_shuffle_plan")
    assert(ls.count(_.contains("FileSourceScan")) == 1, ls.mkString(","))
  }

  test("stream_dedup and ttr_segments are join-free keyed aggregations") {
    Seq("stream_dedup", "ttr_segments").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Join"), s"$q: ${p.take(400)}")
      // ttr's count_distinct expands to a two-phase aggregate: up to
      // (distinct-expand + segment agg + doc agg + output sort)
      assert("Exchange".r.findAllIn(p).size <= 4, s"$q: $p")
    }
  }

  test("anova_oneway: memoized group frame — at most one fact scan per session") {
    val p = plan("anova_oneway")
    assert(!p.contains("SortMergeJoin"), p.take(600))
    val ls = leaves("anova_oneway")
    // first planning materializes the memo (one scan); later plans read cache
    assert(ls.count(_.contains("FileSourceScan")) <= 1, ls.mkString(","))
  }

  test("kruskal_wallis: midranks join value-keyed, never sort-merge on the raw rows") {
    // the value-level rank frame is range-partitioned + broadcast
    // offsets; the only shuffles are value-keyed aggregations
    val p = plan("kruskal_wallis")
    assert(!p.contains("CartesianProduct"), p.take(600))
  }

  test("sprt_audit: join-free single scan, walk over the calendar frame") {
    val p = plan("sprt_audit")
    assert(!p.contains("SortMergeJoin"), p.take(400))
    val ls = leaves("sprt_audit")
    assert(ls.count(_.contains("FileSourceScan")) == 1, ls.mkString(","))
  }

  test("cuped_adjust and heavy_change: broadcast span, no sort-merge join") {
    Seq("cuped_adjust", "heavy_change").foreach { q =>
      val p = plan(q)
      assert(!p.contains("SortMergeJoin"), s"$q: ${p.take(400)}")
      assert(p.contains("BroadcastExchange") || p.contains("InMemoryTableScan"),
        s"$q: span should arrive by broadcast")
    }
  }

  test("max_drawdown: windows over the day frame, scalar frames broadcast") {
    val p = plan("max_drawdown")
    assert(!p.contains("SortMergeJoin"), p.take(400))
    assert(!p.contains("CartesianProduct"), p.take(400))
  }

  test("hazard_curve: one events scan feeds tenure, edge arrives broadcast") {
    val p = plan("hazard_curve")
    assert(!p.contains("SortMergeJoin"), p.take(400))
  }

  test("q20_excess_suppliers: widget filter pushed to the part scan, grid is one pass") {
    val p = plan("q20_excess_suppliers")
    assert(p.contains("StringEndsWith(p_name,widget)") || p.contains("p_name"), p.take(800))
    // part filter + lineitem join + grid agg + demand agg + semi join + sort
    assert(!p.contains("CartesianProduct"), p.take(400))
  }
  test("ivf_pq_adc searches the stored index by broadcast LUT join, no cartesian") {
    val p = plan("ivf_pq_adc")
    // candidates join the probe LUT on (cell, subspace, code) — a
    // broadcast hash join; the only nested-loop joins are the bounded
    // centroid/codebook crosses on the probe/index-build side
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
  }

  test("gumbel_topk_sample ranks per (partition, source) first — no full-group sort") {
    val p = plan("gumbel_topk_sample")
    // stage-1 window keys include the partition stamp; the final
    // per-source window sees only the k-per-partition survivors
    assert(p.contains("__pid"), p.take(1200))
  }

  test("wasserstein_drift windows are pair-partitioned over the bounded grid") {
    val p = plan("wasserstein_drift")
    assert(p.contains("windowspecdefinition(src_a"), p.take(1600))
  }

  test("rendezvous_shard routes map-side: no join, one corpus scan total") {
    val p = plan("rendezvous_shard")
    // HRW argmax is a transform+array_max expression per row; the only
    // joins are the broadcast of the 1-row total onto the 8-row frame
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      p.take(600))
    val ls = leaves("rendezvous_shard")
    assert(ls.count(_.contains("FileSourceScan")) <= 1, ls.mkString(","))
  }

  test("label_propagation's registered plan reads literal rounds, not the graph") {
    // every peel round is a literal checkpoint; the final frame joins
    // two bounded local relations — no file scan, no wide join
    val ls = leaves("label_propagation")
    assert(ls.count(_.contains("FileSourceScan")) === 0, ls.mkString(","))
  }

  test("mg_heavy_hitters ranks per (partition, shard) first, truth is one scan") {
    val p = plan("mg_heavy_hitters")
    // groupedTopK's stage-1 window keys include the partition stamp
    assert(p.contains("__pid"), p.take(1200))
    assert(!p.contains("CartesianProduct"), p.take(600))
  }

  test("diff_in_diff and group_sequential: broadcast span, single-scan moments") {
    Seq("diff_in_diff", "group_sequential").foreach { q =>
      val p = plan(q)
      assert(!p.contains("SortMergeJoin"), s"$q: ${p.take(400)}")
    }
  }
}
