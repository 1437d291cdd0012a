package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamOps

/** Mathematical invariants of the round-8 wave, checked on real
  * testdata at sf0.001 plus hand-built oracles where the property is
  * stronger than the hash (bucket-locate rank exactness, Theil–Sen
  * vs a brute-force median, streaming/batch dedup agreement across a
  * batch cut).
  */
class Wave8InvariantSpec extends SparkSpec {
  import spark.implicits._

  test("rankLocate finds the exact rank-r value for every rank of a known multiset") {
    val vals = Seq(5L, -3L, 7L, 7L, 0L, -3L, 12L, 7L, -100L, 4L)
    val df = vals.toDF("v")
    val sorted = vals.sorted
    (1 to vals.length).foreach { r =>
      val got = QueriesWave8.rankLocate(df, "v", lit(r.toLong))
        .collect().map(_.getLong(0)).toSeq
      assert(got == Seq(sorted(r - 1)), s"rank $r: got $got want ${sorted(r - 1)}")
    }
  }

  test("gee_est: formula identity, sample containment, q_err >= 1 on every column") {
    val rows = QueriesWave8.geeEstQ(spark, sf).collect()
    assert(rows.length == QueriesStats.hllCols.size)
    rows.foreach { r =>
      assert(r.getAs[Long]("gee_est") ==
        r.getAs[Long]("d_sample") + 3 * r.getAs[Long]("f1"))
      assert(r.getAs[Long]("f1") <= r.getAs[Long]("d_sample"))
      assert(r.getAs[Long]("d_sample") <= r.getAs[Long]("n_sample"))
      assert(r.getAs[Long]("d_sample") <= r.getAs[Long]("exact_ndv"))
      assert(r.getAs[Double]("q_err") >= 1.0)
    }
  }

  test("ams_join_est: actual matches an independently computed physical join count") {
    val got = QueriesWave8.amsJoinEstQ(spark, sf).collect()
      .map(r => r.getAs[String]("edge") -> r.getAs[Long]("actual")).toMap
    QueriesWave6.kjeEdges.foreach { case (label, ta, ka, tb, kb) =>
      val truth = Tables(spark, sf, ta).select(col(ka).cast("long").as("k"))
        .join(Tables(spark, sf, tb).select(col(kb).cast("long").as("k")), "k")
        .count()
      assert(got(label) == truth, s"$label: ${got(label)} vs $truth")
    }
  }

  test("benford_audit: digit counts conserve the row total and the chi2 row sums the terms") {
    val rows = QueriesWave8.benfordAuditQ(spark, sf).collect()
    assert(rows.length == 10)
    val total = rows.find(_.getAs[Int]("digit") == 0).get
    val digits = rows.filter(_.getAs[Int]("digit") != 0)
    assert(digits.map(_.getAs[Long]("n_obs")).sum == total.getAs[Long]("n_obs"))
    // both sides are sums of the same 1e-6-grid integers — exact equality
    val sum6 = digits.map(r => math.round(r.getAs[Double]("chi2") * 1e6)).sum
    assert(math.round(total.getAs[Double]("chi2") * 1e6) == sum6)
    assert(math.abs(QueriesWave8.benfordP.map(_._2).sum - 1.0) < 1e-4)
  }

  test("theil_sen slope equals the brute-force lower-median of pairwise slopes") {
    val daily = Tables(spark, sf, "orders")
      .groupBy(expr("unix_micros(date_trunc('DAY', o_orderdate))").as("day_us"))
      .agg(sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")).as("x"))
      .collect().map(r => (r.getAs[Long]("day_us"), r.getAs[Long]("x"))).sorted
    val d0 = daily.map(_._1).min
    val pts = daily.map { case (du, x) => ((du - d0) / 86400000000L, x) }
    // Spark/DuckDB round() on doubles is half-AWAY-FROM-ZERO; Scala's
    // math.round is half-up — they differ on negative .5 slopes
    def rnd(x: Double): Long = if (x >= 0) math.round(x) else -math.round(-x)
    val slopes = (for {
      i <- pts.indices; j <- (i + 1) until pts.length
    } yield rnd((pts(j)._2 - pts(i)._2) * 1e6 / (pts(j)._1 - pts(i)._1)))
      .sorted
    val want = slopes((slopes.length + 1) / 2 - 1)
    val got = QueriesWave8.theilSenQ(spark, sf).collect().head
    assert(math.round(got.getAs[Double]("slope_cents_per_day") * 1e6) == want)
    assert(got.getAs[Long]("n_pairs") == slopes.length)
  }

  test("mann_kendall: |S| bounded by pair count, tie-corrected variance positive") {
    val r = QueriesWave8.mannKendallQ(spark, sf).collect().head
    val n = r.getAs[Long]("n_days")
    assert(math.abs(r.getAs[Long]("s_stat")) <= n * (n - 1) / 2)
    assert(r.getAs[Long]("var18") > 0)
    assert(!r.getAs[Double]("z").isNaN)
  }

  test("l_diversity_audit: total row consistent with violating rows") {
    val rows = QueriesWave8.lDiversityAuditQ(spark, sf).collect()
    val total = rows.find(_.getAs[String]("combo") == "__TOTAL__").get
    val viol = rows.filter(_.getAs[String]("combo") != "__TOTAL__")
    assert(total.getAs[Long]("n_violating") == viol.length)
    assert(total.getAs[Long]("n_exposed") == viol.map(_.getAs[Long]("n")).sum)
    viol.foreach(r => assert(r.getAs[Long]("l") < QueriesWave8.lDivL))
  }

  test("dp_topk releases exactly k ranks with bounded noise") {
    val rows = QueriesWave8.dpTopkQ(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("rank")).toSeq == (1 to QueriesWave8.dpTopK))
    rows.foreach { r =>
      val noise = r.getAs[Double]("noisy_n") - r.getAs[Long]("n_events")
      // Laplace(b=2) through a 52-bit uniform: |noise| ≤ 2·ln(2^52)
      assert(math.abs(noise) <= 2.0 * 37.0)
    }
  }

  test("ttr_segments: msttr in (0,1], token totals conserve the tokenizer's counts") {
    val got = QueriesWave8.ttrSegmentsQ(spark, sf)
    assert(got.filter(col("msttr") <= 0.0 || col("msttr") > 1.0 + 1e-9).count() == 0)
    val fromTok = Tables(spark, sf, "documents")
      .select(size(graft.operators.TextOps.tokensExpr).as("n"))
      .agg(sum(col("n"))).collect().head.getLong(0)
    val fromSegs = got.agg(sum(col("n_tokens"))).collect().head.getLong(0)
    assert(fromSegs == fromTok)
  }

  test("compress_ratio_est: entropy bound below log2(vocab) bits per token") {
    val rows = QueriesWave8.compressRatioEstQ(spark, sf).collect()
    val vocab = QueriesWave8.srcWordCounts(spark, sf)
      .select(col("w")).distinct().count()
    rows.foreach { r =>
      val bitsPerTok = r.getAs[Double]("est_bytes") * 8.0 / r.getAs[Long]("n_tokens")
      assert(bitsPerTok >= 0.0 && bitsPerTok <= math.log(vocab.toDouble) / math.log(2.0) + 1e-6)
      assert(r.getAs[Double]("bits_per_char") > 0.0)
    }
  }

  test("jsd_drift: normalized divergence lives in [0,1] for every source") {
    val bad = QueriesWave8.jsdDriftQ(spark, sf)
      .filter(col("jsd_norm") < -1e-9 || col("jsd_norm") > 1.0 + 1e-9).count()
    assert(bad == 0L)
  }

  test("simpson_diversity: gini in [0,1), eff_vocab between 1 and vocab") {
    QueriesWave8.simpsonDiversityQ(spark, sf).collect().foreach { r =>
      val g = r.getAs[Double]("gini_simpson")
      assert(g >= 0.0 && g < 1.0)
      val ev = r.getAs[Double]("eff_vocab")
      assert(ev >= 1.0 - 1e-9 && ev <= r.getAs[Long]("vocab") + 1e-9)
    }
  }

  test("assoc_rules: every rule has its mirror and confidence*freq(ant) recovers the pair count") {
    val rows = QueriesWave8.assocRulesQ(spark, sf).collect()
    assert(rows.nonEmpty)
    val set = rows.map(r => (r.getAs[String]("antecedent"), r.getAs[String]("consequent"))).toSet
    set.foreach { case (a, b) => assert(set.contains((b, a))) }
    rows.foreach { r =>
      assert(r.getAs[Double]("confidence") > 0.0 && r.getAs[Double]("confidence") <= 1.0)
      assert(r.getAs[Double]("lift") > 0.0)
    }
  }

  test("stream_dedup: per-day first-seen counts conserve events and never exceed them") {
    val rows = QueriesWave8.streamDedupQ(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_events")).sum == Tables(spark, sf, "events").count())
    rows.foreach { r =>
      assert(r.getAs[Long]("n_first") <= r.getAs[Long]("n_events"))
      assert(r.getAs[Long]("n_dups") ==
        r.getAs[Long]("n_events") - r.getAs[Long]("n_first"))
    }
  }

  test("idempotencyDedupStream reproduces batch n_first across a batch cut") {
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Long): Timestamp = new Timestamp((1440 + min) * 60000)
    val batch1 = Seq(
      (1L, ts(0), 7L, "view", 0.0),
      (2L, ts(5), 7L, "view", 0.0),   // same key same day → dup
      (3L, ts(10), 7L, "click", 0.0),
      (4L, ts(30), 8L, "view", 0.0))
    val batch2 = Seq(
      (5L, ts(40), 7L, "view", 0.0),  // cross-batch dup of key (7, view, day0)
      (6L, ts(50), 8L, "click", 0.0),
      (7L, ts(24 * 60 + 10), 7L, "view", 0.0)) // next day → new key
    val all = batch1 ++ batch2
    val dir = java.nio.file.Files.createTempDirectory("graft_idem").toString
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val sdf = mem.toDF.toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = StreamOps.idempotencyDedupStream(sdf).writeStream
      .format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append")
      .start()
    try {
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()
      val got = spark.read.parquet(s"$dir/out")
        .groupBy(expr("unix_micros(date_trunc('DAY', ts)) div 1000000").as("day_s"))
        .agg(count(lit(1)).as("n_first"))
        .collect().map(r => r.getAs[Long]("day_s") -> r.getAs[Long]("n_first")).toMap
      val want = QueriesWave8
        .streamDedupCore(all.toDF("event_id", "ts", "user_id", "event_type", "value"))
        .collect().map(r => r.getAs[Long]("day_s") -> r.getAs[Long]("n_first")).toMap
      assert(got == want)
    } finally q.stop()
  }

  test("hurst_exponent: per-m arms populated, summary slope finite, R/S grows with m") {
    val rows = QueriesWave8.hurstExponentQ(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("m")).toSeq == 0 +: QueriesWave8.hurstMs)
    val perM = rows.filter(_.getAs[Int]("m") != 0)
    perM.foreach(r => assert(r.getAs[Long]("n_chunks") >= 1))
    val ys = perM.sortBy(_.getAs[Int]("m")).map(_.getAs[Double]("ln_rs_mean"))
    assert(ys.zip(ys.tail).forall { case (a, b) => b > a },
      s"mean ln(R/S) not increasing: ${ys.toSeq}")
    val h = rows.find(_.getAs[Int]("m") == 0).get.getAs[Double]("hurst")
    assert(!h.isNaN && h > 0.0 && h < 1.5)
  }
}
