package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamOps

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  // offset a day past the epoch: epoch-0 events sit exactly at Spark's
  // initial watermark and would be dropped as late in the streaming tests
  private def ts(min: Long): Timestamp = new Timestamp((1440 + min) * 60000)

  private val sample: Seq[(Long, Timestamp, Long, String, Double)] = Seq(
    (1L, ts(0), 100L, "click", 1.0),
    (2L, ts(10), 100L, "click", 2.0),
    (3L, ts(70), 100L, "view", 3.0), // >30min gap → new session, new hour window
    (4L, ts(75), 200L, "click", 4.0),
    (5L, ts(200), 100L, "click", 5.0)) // another session

  private def eventsDf =
    sample.toDF("event_id", "ts", "user_id", "event_type", "value")

  test("batch windowAgg: hour-tumbling counts and sums") {
    val got = StreamOps.windowAgg(eventsDf)
      .orderBy("w_start", "event_type")
      .as[(Timestamp, String, Long, Double)].collect().toSeq
    assert(got == Seq(
      (ts(0), "click", 2L, 3.0),
      (ts(60), "click", 1L, 4.0),
      (ts(60), "view", 1L, 3.0),
      (ts(180), "click", 1L, 5.0)))
  }

  test("streaming windowAgg over MemoryStream matches batch semantics") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val sdf = mem.toDF.toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = StreamOps.windowAggStream(sdf).writeStream
      .format("memory").queryName("wagg").outputMode("complete").start()
    try {
      mem.addData(sample: _*)
      q.processAllAvailable()
      val got = spark.table("wagg")
        .orderBy("w_start", "event_type")
        .as[(Timestamp, String, Long, Double)].collect().toSeq
      val want = StreamOps.windowAgg(eventsDf)
        .orderBy("w_start", "event_type")
        .as[(Timestamp, String, Long, Double)].collect().toSeq
      assert(got == want)
    } finally q.stop()
  }

  test("batch sessionize: 30-min gap splits sessions") {
    val got = StreamOps.sessionize(eventsDf)
      .orderBy("user_id", "session_idx")
      .as[(Long, Long, Timestamp, Timestamp, Long)].collect().toSeq
    assert(got == Seq(
      (100L, 1L, ts(0), ts(10), 2L),
      (100L, 2L, ts(70), ts(70), 1L),
      (100L, 3L, ts(200), ts(200), 1L),
      (200L, 1L, ts(75), ts(75), 1L)))
  }

  test("streaming sessionize closes sessions once the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val sdf = mem.toDF.toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = StreamOps.sessionizeStream(spark, sdf).writeStream
      .format("memory").queryName("sess").outputMode("append").start()
    try {
      mem.addData(sample.filter(_._2.getTime <= ts(10).getTime): _*)
      q.processAllAvailable()
      mem.addData(sample.filter(_._2.getTime > ts(10).getTime): _*)
      q.processAllAvailable()
      // push the watermark far past everything → all sessions time out
      mem.addData((99L, ts(100000), 999L, "click", 0.0))
      q.processAllAvailable()
      mem.addData((98L, ts(200000), 999L, "click", 0.0))
      q.processAllAvailable()
      val got = spark.table("sess")
        .filter(col("user_id") < 900)
        .orderBy("user_id", "session_start")
        .as[(Long, Timestamp, Timestamp, Long)].collect().toSeq
      val want = StreamOps.sessionize(eventsDf)
        .orderBy("user_id", "session_start")
        .select("user_id", "session_start", "session_end", "n_events")
        .as[(Long, Timestamp, Timestamp, Long)].collect().toSeq
      assert(got == want)
    } finally q.stop()
  }

  test("dedupeStream drops in-stream duplicates and writes to a parquet sink") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val sdf = mem.toDF.toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = StreamOps.dedupeStream(sdf, Seq("event_id")).writeStream
      .format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append")
      .start()
    try {
      mem.addData(sample ++ sample: _*) // every event duplicated
      q.processAllAvailable()
      val got = spark.read.parquet(s"$dir/out")
      assert(got.count() == sample.length)
      assert(got.select("event_id").as[Long].collect().toSet == sample.map(_._1).toSet)
    } finally q.stop()
  }

  test("asofJoin picks the latest prior click within the bound, else NULL") {
    val events = Seq(
      (1L, ts(0), 7L, "click", 1.0),
      (2L, ts(5), 7L, "click", 1.0),   // latest prior click for p=3
      (3L, ts(20), 7L, "purchase", 9.0),
      (4L, ts(100), 7L, "purchase", 9.0), // nearest click 95 min back → NULL
      (5L, ts(10), 8L, "view", 0.0),   // other kinds are ignored
      (6L, ts(10), 8L, "purchase", 9.0) // user 8 has no clicks at all
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = StreamOps.asofJoin(events)
      .orderBy("purchase_id")
      .select("purchase_id", "click_id")
      .as[(Long, Option[Long])].collect().toSeq
    assert(got === Seq((3L, Some(2L)), (4L, None), (6L, None)))
  }

  test("streaming asofJoin matches batch semantics across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val out = StreamOps.asofJoinStream(
      spark, in.toDF.toDF("event_id", "ts", "user_id", "event_type", "value"))
    val q = out.writeStream
      .format("memory").queryName("asof").outputMode("append").start()
    try {
      // batch 1: click then purchase; batch 2: stale purchase (95 min
      // after the click in state) then a fresh click+purchase
      in.addData((1L, ts(0), 7L, "click", 0.0), (2L, ts(20), 7L, "purchase", 0.0))
      q.processAllAvailable()
      in.addData(
        (3L, ts(95), 7L, "purchase", 0.0),
        (4L, ts(100), 7L, "click", 0.0), (5L, ts(110), 7L, "purchase", 0.0))
      q.processAllAvailable()
      val got = spark.table("asof")
        .select("purchase_id", "click_id")
        .as[(Long, Option[Long])].collect().toMap
      assert(got === Map(2L -> Some(1L), 3L -> None, 5L -> Some(4L)))
    } finally q.stop()
  }

  test("latestSnapshot compacts to one newest row per key") {
    val events = Seq(
      (1L, ts(0), 7L, "click", 1.0),
      (2L, ts(5), 7L, "view", 2.0),   // newest for user 7
      (3L, ts(5), 8L, "click", 3.0),
      (4L, ts(5), 8L, "view", 4.0)    // same ts: event_id desc wins
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = StreamOps.latestSnapshot(events)
      .orderBy("user_id").select("user_id", "event_id")
      .as[(Long, Long)].collect().toSeq
    assert(got === Seq((7L, 2L), (8L, 4L)))
  }

  test("topkEvents ranks users per day by decimal-exact sums") {
    val got = StreamOps.topkEvents(eventsDf, 1)
      .as[(Timestamp, Int, Long, Double)].collect().toSeq
    // day 0: user 100 total 1+2+3+5=11 vs user 200 total 4 → top-1 is 100
    assert(got == Seq((ts(0), 1, 100L, 11.0)))
  }

  // Interval-join fixture: clicks (1,2 by user 100; 3 by 200) and
  // purchases; only (1→10) and (2→11) fall in the (0, 30 min] window.
  private val ivClicks = Seq((100L, 1L, ts(0)), (100L, 2L, ts(40)), (200L, 3L, ts(0)))
  private val ivPurchases = Seq(
    (100L, 10L, ts(20)), (100L, 11L, ts(55)), (200L, 12L, ts(45)), (300L, 13L, ts(10)))

  test("batch intervalJoin: purchases within 30 min after a click") {
    val ev = (ivClicks.map { case (u, id, t) => (id, t, u, "click", 0.0) } ++
      ivPurchases.map { case (u, id, t) => (id, t, u, "purchase", 0.0) })
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = StreamOps.intervalJoin(ev)
      .select("click_id", "purchase_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (2L, 11L)))
  }

  test("slidingAgg puts every event in exactly two 1h/30min hop windows") {
    val got = StreamOps.slidingAgg(eventsDf)
      .orderBy("w_start", "event_type")
      .select("w_start", "event_type", "cnt")
      .as[(Timestamp, String, Long)].collect().toSeq
    // each event contributes twice; window starts are 30-min aligned
    assert(got.map(_._3).sum == 2L * sample.size)
    assert(got.forall(_._1.getTime % (30 * 60000) == 0))
    // the ts(0) and ts(10) clicks share the [−30, 30) and [0, 60) windows
    assert(got.contains((ts(-30), "click", 2L)) && got.contains((ts(0), "click", 2L)))
  }

  test("streaming slidingAgg over MemoryStream matches batch semantics") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val sdf = mem.toDF.toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = StreamOps.slidingAggStream(sdf).writeStream
      .format("memory").queryName("slagg").outputMode("complete").start()
    try {
      mem.addData(sample: _*)
      q.processAllAvailable()
      val got = spark.table("slagg")
        .orderBy("w_start", "event_type")
        .as[(Timestamp, String, Long, Double)].collect().toSeq
      val want = StreamOps.slidingAgg(eventsDf)
        .orderBy("w_start", "event_type")
        .as[(Timestamp, String, Long, Double)].collect().toSeq
      assert(got == want)
    } finally q.stop()
  }

  test("streaming latestSnapshot keeps one newest row of state per key") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val sdf = mem.toDF.toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = StreamOps.latestSnapshotStream(spark, sdf).writeStream
      .format("memory").queryName("snap").outputMode("update").start()
    try {
      mem.addData((1L, ts(0), 7L, "click", 1.0), (3L, ts(5), 8L, "click", 3.0))
      q.processAllAvailable()
      // a newer event for 7 and a same-ts higher-id event for 8
      mem.addData((2L, ts(9), 7L, "view", 2.0), (4L, ts(5), 8L, "view", 4.0))
      q.processAllAvailable()
      // last emitted update per key is the batch semantics' newest row
      val got = spark.table("snap")
        .groupBy("user_id").agg(max(struct(col("ts"), col("event_id"))).as("s"))
        .select("user_id", "s.event_id")
        .as[(Long, Long)].collect().toMap
      assert(got == Map(7L -> 2L, 8L -> 4L))
    } finally q.stop()
  }

  test("scd2History tiles each key's timeline with half-open validity intervals") {
    val ev = Seq(
      (1L, ts(0), 7L, "click", 1.0),
      (2L, ts(10), 7L, "view", 2.0),
      (3L, ts(20), 7L, "buy", 3.0),
      (4L, ts(5), 8L, "click", 4.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = StreamOps.scd2History(ev)
      .orderBy("user_id", "valid_from", "event_id")
      .select("user_id", "event_id", "valid_from", "valid_to", "is_current")
      .as[(Long, Long, Timestamp, Option[Timestamp], Boolean)].collect().toSeq
    assert(got == Seq(
      (7L, 1L, ts(0), Some(ts(10)), false),
      (7L, 2L, ts(10), Some(ts(20)), false),
      (7L, 3L, ts(20), None, true),
      (8L, 4L, ts(5), None, true)))
  }

  test("funnel enforces strict view → click → purchase ordering per user") {
    // user 1 completes in order; user 2's purchase PRECEDES its click
    // (must not count); user 3 clicks before its first view (no click
    // stage); user 4 never views (out of the funnel entirely).
    val ev = Seq(
      (1L, ts(0), 1L, "view", 0.0), (2L, ts(1), 1L, "click", 0.0), (3L, ts(2), 1L, "purchase", 0.0),
      (4L, ts(0), 2L, "view", 0.0), (5L, ts(2), 2L, "click", 0.0), (6L, ts(1), 2L, "purchase", 0.0),
      (7L, ts(1), 3L, "view", 0.0), (8L, ts(0), 3L, "click", 0.0),
      (9L, ts(0), 4L, "click", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = StreamOps.funnel(ev)
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq((3L, 2L, 1L, 2.0 / 3.0, 1.0 / 3.0)))
  }

  test("cohortRetention buckets activity by days since each user's first day") {
    def day(d: Long, min: Long): Timestamp = new Timestamp(((1440 * (d + 1)) + min) * 60000)
    val ev = Seq(
      (1L, day(0, 0), 1L, "view", 0.0), // cohort day 0
      (2L, day(0, 30), 1L, "view", 0.0), // same user+day → one activity row
      (3L, day(2, 0), 1L, "view", 0.0), // offset 2
      (4L, day(1, 0), 2L, "view", 0.0), // cohort day 1
      (5L, day(9, 0), 1L, "view", 0.0) // offset 9 > maxOffset → dropped
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = StreamOps.cohortRetention(ev, maxOffset = 7)
      .orderBy("cohort_day", "day_offset")
      .select("day_offset", "users").as[(Long, Long)].collect().toSeq
    assert(got == Seq((0L, 1L), (2L, 1L), (0L, 1L)))
  }

  test("streaming intervalJoin joins two watermarked streams with bounded state") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val purchases = MemoryStream[(Long, Long, Timestamp)]
    val joined = StreamOps.intervalJoinStream(
      clicks.toDF.toDF("user_id", "click_id", "click_ts"),
      purchases.toDF.toDF("user_id", "purchase_id", "purchase_ts"))
    val q = joined.writeStream
      .format("memory").queryName("ivj").outputMode("append").start()
    try {
      clicks.addData(ivClicks: _*)
      purchases.addData(ivPurchases: _*)
      q.processAllAvailable()
      val got = spark.table("ivj")
        .select("click_id", "purchase_id").as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 10L), (2L, 11L)))
    } finally q.stop()
  }

  test("streaming windowFunnel over the real events matches the batch counts") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val sdf = mem.toDF.toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = StreamOps.windowFunnelStream(spark, sdf).writeStream
      .format("memory").queryName("wfun").outputMode("append").start()
    try {
      val evs = Tables(spark, sf, "events")
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
        .as[(Long, Timestamp, Long, String, Double)].collect().toSeq
      // two batches split mid-stream: state must carry across the cut
      val (b1, b2) = evs.sortBy(_._2.getTime).splitAt(evs.length / 2)
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      val hits = spark.table("wfun")
      val gotByDepth = hits.groupBy(col("depth"))
        .agg(countDistinct(col("user_id")).as("u"))
        .as[(Int, Long)].collect().toMap
      val batch = QueriesWave7.windowFunnelQ(spark, sf).collect().head
      assert(gotByDepth.getOrElse(1, 0L) == batch.getAs[Long]("u_view"))
      assert(gotByDepth.getOrElse(2, 0L) == batch.getAs[Long]("u_click"))
      assert(gotByDepth.getOrElse(3, 0L) == batch.getAs[Long]("u_purchase"))
    } finally q.stop()
  }
}
