package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.window.WindowExec

/** Audit of every registered query's physical plan for UNPARTITIONED
  * window operators. An unpartitioned `Window` runs its whole input
  * through one task — the classic 100 TB scale-killer — so every
  * instance left in the suite must run over a frame whose size is
  * bounded by CONFIG or CATALOG (shuffle-partition counts, bucket/value
  * grids, model checkpoints, spec lists, day/month calendars), never by
  * data volume. This spec walks all registered plans (descending into
  * cached relations and subqueries), collects every unpartitioned
  * WindowExec, and asserts the owning query is on the allowlist below —
  * the guard `Bench.scala`'s WindowExec log-routing comment points at.
  */
class WindowAuditSpec extends SparkSpec {

  /** Queries documented (at their implementation sites) to run one or
    * more unpartitioned windows over a bounded frame, by bound class.
    * A NEW query appearing in the audit failure list needs its own
    * documented bound before it is added here.
    */
  private val allowlist: Set[String] = Set(
    // ≤ #shuffle-partitions rows: the per-partition-count → cumulative
    // offset rollup of the distributed rank/quantile/sweep helpers
    // (Layout.rankedNtile / skylineMin2, Encoding.dictionary,
    // Stats bucket-locate quantiles, the shared 2×-midrank helper)
    "dict_encode", "factorize", "rfm_segments", "pareto_skyline",
    "sample_quantiles", "quality_calibration", "kruskal_wallis",
    "spearman_rho", "auc_roc", "quantile_norm", "hist_quantile_check",
    "median_ci", "fact_est", "fact_progressive", "ks_test",
    // k-bounded: rank over the k survivors of a TakeOrderedAndProject
    "mcv", "kmeans_coreset",
    // domain/grid-bounded: windows over value-level or bucket-level
    // frames whose size is the attribute domain, not the row count
    "mutual_info", "lorenz_curve", "gains_curve", "zipf_fit",
    // ≤ #order-priorities rows: pooled-moment window over the stratum
    // aggregate (see simpsonParadoxAuditQ)
    "simpson_paradox_audit",
    "survival_km", "hazard_curve", "extreme_value_pot",
    "hurst_exponent", "neyman_alloc", "dp_topk", "source_temp_mix",
    // calendar-bounded: one row per day/week/month after aggregation
    "user_growth", "revenue_mom", "cusum_changepoint", "page_hinkley",
    "binseg_changepoints", "segmented_trend", "late_events",
    // one row per day: the ±3-day RANGE trend window over the daily
    // revenue memo (see seasonalDecomposeQ; seasonal_strength consumes
    // the same decomposition)
    "seasonal_decompose", "seasonal_strength",
    // spec-/sample-/checkpoint-bounded: the cardinality-estimator
    // family's windows run over the ~2000-slot join sample, the
    // per-spec union, or the enumerated model joint (catalog-sized)
    "q_error_quantiles", "progressive_est", "training_batch",
    // (nar_inc_est dropped from the list: its windowed est frame now
    // ships as the nar_inc_ests warehouse artifact, so the serving
    // plan is a parquet scan with no window at all)
    "nar_est", "nar_progressive", "nar_check",
    "nar_inc_check", "nar_tx_est", "nar_tx_check", "nar_training_curve",
    // spec-frame unions (4 rows) + broadcast scalar joins, same shape
    // as every other nar leg — measured 4 -> 4 across scale factors
    "nar_cont_est", "nar_cont_check",
    // rank window over the ≤ #sources-row literal strength frame
    "bradley_terry",
    "nar_hpo", "nar_mlm_est", "nar_mlm_check",
    "wander_join_est", "isotonic_calibration",
    "isotonic_check", "conformal_interval", "curriculum_plan",
    "sprt_audit", "max_drawdown",
    // ≤ #sources² rows: the BH step-up ranking over the pairwise
    // z-test frame (per-source rates are a one-scan memoized aggregate)
    "bh_fdr",
    // K-row look frame: the interim monitor's cumulative window runs
    // over gstLooks rows (config-bounded), after the calendar-sliced
    // keyed aggregate
    "group_sequential",
    // ≤ #shuffle-partitions rows: cvm_test / pr_auc ride the shared
    // exclusivePrefixSums offsets rollup (the ks_test plan)
    "cvm_test", "pr_auc",
    // constant frames: wavelet_est ranks the 31-coefficient synopsis;
    // rrf_fusion ranks the two ≤20-row TakeOrdered leg cuts;
    // token_budget_plan ranks remainders over the source-bounded
    // apportionment frame; dedup_saturation cumulates over its 10-row
    // decile rollup (plus the rankedNtile offsets rollup)
    "wavelet_est", "rrf_fusion", "token_budget_plan", "dedup_saturation",
    // topk_rbo ranks the two ≤10-row TakeOrdered half cuts
    "topk_rbo")

  /** Entries allowed to show no unpartitioned window in the audited
    * plan: a registration staged before its query lands, or a
    * checkpoint-backed trainer whose windows exist only on a COLD
    * warehouse (nar_training_curve loads its persisted eval frame when
    * present — the audited plan is then a parquet scan + bounded joins;
    * on a fresh clone the training path's bounded windows appear and
    * the allowlist entry covers them). */
  private val pendingRegs: Set[String] = Set("nar_training_curve", "nar_hpo")

  /** All WindowExec nodes of a plan, including those inside cached
    * relations (InMemoryTableScan does not expand its child in the
    * typed tree), AQE wrappers (cached frames materialized by earlier
    * suites in this JVM were planned with AQE on, and
    * AdaptiveSparkPlanExec is a traversal leaf), and subquery plans —
    * so the audit sees the same windows whether or not another suite
    * already materialized a shared memo.
    */
  private def windows(p: SparkPlan): Seq[WindowExec] = {
    val here = p.collectWithSubqueries { case w: WindowExec => w }
    val nested = p.collectWithSubqueries {
      case s: InMemoryTableScanExec => s.relation.cachedPlan
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      // an already-executed AQE plan is a tree of QueryStageExec
      // wrappers, each a traversal leaf hiding its stage's subtree
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => q.plan
    }.flatMap(windows)
    here ++ nested
  }

  test("unpartitioned windows appear only in allowlisted bounded-frame plans") {
    // AQE wraps the tree (and would defer window planning) — plan
    // without it, as PlanSpec does, for a deterministic audit.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val hits = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, fn) =>
          val ws =
            try windows(fn(spark, sf).queryExecution.executedPlan)
            catch { case _: Throwable => Seq.empty } // EntrySpec guards analysis
          val unpart = ws.count(_.partitionSpec.isEmpty)
          if (unpart > 0) Some(name -> unpart) else None
      }
      info("unpartitioned-window hits: " +
        hits.map(h => s"${h._1}:${h._2}").mkString(" "))
      val offenders = hits.map(_._1).filterNot(allowlist)
      assert(offenders.isEmpty,
        s"unpartitioned WindowExec outside the allowlist: $offenders — " +
          "document the frame bound at the site, then add the query here")
      // keep the allowlist honest both ways: an entry whose plan no
      // longer carries an unpartitioned window must be pruned
      val stale = allowlist -- hits.map(_._1).toSet -- pendingRegs
      assert(stale.isEmpty,
        s"allowlist entries with no unpartitioned window left — prune: $stale")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  /** The allowlist's CLAIM is that every unpartitioned window runs over
    * a frame bounded by config or catalog, not data volume. This test
    * measures it: the rows actually flowing into each unpartitioned
    * WindowExec at sf0.001 and at 10× the data (sf0.01) must grow
    * sublinearly — a bounded frame (shuffle-partition rollups, value
    * grids, calendars, the fixed-slot join sample, spec lists) stays
    * put or saturates, while a data-scaled frame grows ~10× and fails
    * here BEFORE it becomes a single-task sort at 100×.
    */
  test("unpartitioned-window input frames grow sublinearly with the data") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      def childRows(dir: String): Map[String, Long] =
        SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
          val ws =
            try windows(fn(spark, dir).queryExecution.executedPlan)
            catch { case _: Throwable => Seq.empty }
          val counts = ws.filter(_.partitionSpec.isEmpty).flatMap { w =>
            // a detached fragment can carry unprepared subqueries —
            // skip those sites rather than fail the measurement
            try Some(w.child.execute().count())
            catch { case _: Throwable => None }
          }
          if (counts.isEmpty) None else Some(name -> counts.max)
        }.toMap
      val small = childRows(sf)
      val big = childRows("/root/testdata/sf0.01")
      // the swallow-and-skip fallbacks above must not let the audit
      // pass vacuously (missing test data / mass planning failure)
      assert(big.size >= 20 && small.size >= 20,
        s"sublinear audit measured too few window sites " +
          s"(${small.size} @ sf0.001, ${big.size} @ sf0.01) — " +
          "expected dozens; the measurement itself is broken")
      info("max unpartitioned-window input rows (sf0.001 -> sf0.01): " +
        big.toSeq.sorted.map { case (n, b) =>
          s"$n:${small.getOrElse(n, 0L)}->$b"
        }.mkString(" "))
      val offenders = big.toSeq.sortBy(_._1).filter { case (name, b) =>
        val s = small.getOrElse(name, 0L)
        // sublinear: saturating grids may still add rows; 3× headroom
        // plus an absolute floor for tiny frames is far below the 10×
        // a data-bounded frame shows
        b > math.max(3L * s, s + 64L)
      }
      assert(offenders.isEmpty,
        s"unpartitioned windows over data-scaled frames: $offenders — " +
          "the input grew superlinearly from sf0.001 to sf0.01; " +
          "repartition the window or bound its input frame")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
