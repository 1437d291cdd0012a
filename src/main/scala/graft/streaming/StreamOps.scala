package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One emitted session (sessionizeStream output row). */
final case class Session(
    user_id: Long,
    session_start: Timestamp,
    session_end: Timestamp,
    n_events: Long)

/** Open-session state for one user (top-level so state-encoder codegen
  * resolves the constructor).
  */
final case class SessionState(startUs: Long, endUs: Long, n: Long)

/** Streaming as-of output row (asofJoinStream). */
final case class AsofRow(
    user_id: Long,
    purchase_id: Long,
    purchase_ts: Timestamp,
    click_id: Option[Long],
    click_ts: Option[Timestamp])

/** Most-recent-click state for one user (asofJoinStream). */
final case class ClickState(clickId: Long, clickUs: Long)

/** One funnel-depth advancement (windowFunnelStream output row). */
final case class FunnelHit(user_id: Long, depth: Int, ts: Timestamp)

/** Funnel state for one user: last view / last qualified click in
  * micros, -1 = none yet (windowFunnelStream).
  */
final case class FunnelState(lastViewUs: Long, lastQcUs: Long)

/** Newest-row state/output for one key (latestSnapshotStream). */
final case class SnapRow(
    user_id: Long,
    event_id: Long,
    ts: Timestamp,
    event_type: String,
    value: Double)

/** Event-stream operators. Batch and streaming share the same transform
  * bodies, so the DuckDB oracle (batch) verifies the semantics of the
  * Structured Streaming variants too.
  *
  * Scale notes: tumbling windows + watermarks keep state bounded per
  * (window, key); sessionization state is one small record per active
  * user, evicted by event-time timeout.
  */
object StreamOps {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,6)")

  /** Micros → Timestamp preserving the full microsecond: a bare
    * `new Timestamp(us / 1000)` silently drops sub-millisecond
    * precision, so a stream twin's reconstructed timestamps would
    * drift from the batch operator's on any real (micro-stamped)
    * event feed — caught by the stream_batch_parity row. */
  private def tsOfMicros(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  val sessionGapMicros: Long = 30L * 60 * 1000000 // 30 min

  // ---- tumbling window agg (row 31) ----

  /** Hour-tumbling count/sum per event_type. Works on batch AND streaming
    * inputs (the groupBy is identical; streaming adds a watermark first).
    */
  def windowAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(dec(col("value"))).cast("double").as("sum_value"))
      .select(col("w.start").as("w_start"), col("event_type"), col("cnt"), col("sum_value"))

  /** Streaming variant: 2h watermark bounds state; append-mode safe. */
  def windowAggStream(events: DataFrame): DataFrame =
    windowAgg(events.withWatermark("ts", "2 hours"))

  /** Sliding (hopping) 1h windows every 30 min: each event lands in
    * exactly two windows. Same shape on batch and streaming inputs;
    * state per (window, key) stays bounded by the watermark.
    */
  def slidingAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(dec(col("value"))).cast("double").as("sum_value"))
      .select(col("w.start").as("w_start"), col("event_type"), col("cnt"), col("sum_value"))

  def slidingAggStream(events: DataFrame): DataFrame =
    slidingAgg(events.withWatermark("ts", "2 hours"))

  // ---- sessionization (row 32) ----

  /** Batch sessionization: a session breaks after a >30 min silence.
    * Window-function formulation — one shuffle on user_id.
    */
  def sessionize(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("__prev", lag(col("ts"), 1).over(byUser))
      .withColumn(
        "__new",
        when(
          col("__prev").isNull ||
            (unix_micros(col("ts")) - unix_micros(col("__prev")) > sessionGapMicros),
          1L).otherwise(0L))
      .withColumn("session_idx", sum(col("__new")).over(byUser))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
  }

  /** Streaming sessionization via flatMapGroupsWithState: state is one
    * (start, end, count) record per live user, closed by event-time
    * timeout once the watermark passes end + gap.
    *
    * Within a micro-batch, events are sorted by event time (batches are
    * small slices of the stream); sessions that close inside the batch
    * are emitted immediately, the trailing open session stays in state.
    */
  def sessionizeStream(spark: SparkSession, events: DataFrame): Dataset[Session] = {
    import spark.implicits._
    val typed = events
      .withWatermark("ts", "1 hour")
      .select(col("user_id").cast("long"), col("ts"))
      .as[(Long, Timestamp)]

    def micros(t: Timestamp): Long = t.getTime * 1000 + (t.getNanos / 1000) % 1000

    typed
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[(Long, Timestamp)], state: GroupState[SessionState]) =>
          def toSession(s: SessionState): Session =
            Session(userId, tsOfMicros(s.startUs), tsOfMicros(s.endUs), s.n)

          if (rows.isEmpty && state.hasTimedOut) {
            val out = state.getOption.map(toSession).toIterator
            state.remove()
            out
          } else {
            val ts = rows.map(r => micros(r._2)).toSeq.sorted
            var closed = List.empty[Session]
            var cur = state.getOption
            for (t <- ts) {
              cur match {
                case Some(s) if t - s.endUs <= sessionGapMicros =>
                  cur = Some(s.copy(endUs = math.max(s.endUs, t), n = s.n + 1))
                case Some(s) =>
                  closed ::= toSession(s)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp((s.endUs + sessionGapMicros) / 1000 + 1)
            }
            closed.reverseIterator
          }
      }
  }

  /** Streaming exact dedup by key with bounded state: watermarked
    * `dropDuplicates` keeps one state entry per key only until the
    * watermark passes — the streaming face of `exact_dedup`.
    */
  def dedupeStream(events: DataFrame, keyCols: Seq[String]): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicates(keyCols :+ "ts")

  /** Streaming face of `stream_dedup`'s idempotency key: first event per
    * (user, type, day) passes, later ones drop. The day lives INSIDE the
    * dedup key so state is one marker per active key and the 25-hour
    * watermark (one day + late slack) lets state for closed days evict —
    * the bound that keeps a forever-running pipeline's store flat.
    * Emits the surviving first-seen events; aggregating them per day
    * reproduces the batch query's `n_first` exactly (spec-checked
    * across a batch cut).
    */
  def idempotencyDedupStream(events: DataFrame): DataFrame =
    events
      .withColumn("day", date_trunc("DAY", col("ts")))
      .withWatermark("ts", "25 hours")
      .dropDuplicates("user_id", "event_type", "day")

  // ---- streaming window funnel (row 163's streaming face) ----

  /** Streaming time-bounded funnel via flatMapGroupsWithState — the
    * stateful face of `window_funnel`: per user, state is ONE
    * two-field record (last view µs, last qualified-click µs), so state
    * size is O(active users) and event-time timeout evicts a user 1 h
    * after their last event. Each batch's events process in event-time
    * order; a view emits a depth-1 hit and arms the click window, a
    * click inside (view, view+1h] emits depth 2 and arms the purchase
    * window, a purchase inside (click, click+1h] emits depth 3.
    * Aggregating distinct users per depth over the emitted hits
    * reproduces the batch query's counts exactly (spec-checked against
    * `windowFunnelQ` on the same events).
    */
  def windowFunnelStream(spark: SparkSession, events: DataFrame): Dataset[FunnelHit] = {
    import spark.implicits._
    val win = graft.QueriesWave7.funnelWindowUs
    val typed = events
      .withWatermark("ts", "1 hour")
      .select(col("user_id").cast("long"), col("event_type"), col("ts"))
      .as[(Long, String, Timestamp)]

    def micros(t: Timestamp): Long = t.getTime * 1000 + (t.getNanos / 1000) % 1000

    typed
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[(Long, String, Timestamp)],
         state: GroupState[FunnelState]) =>
          if (rows.isEmpty && state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val evs = rows.toSeq.sortBy(r => micros(r._3))
            var s = state.getOption.getOrElse(FunnelState(-1L, -1L))
            val out = scala.collection.mutable.ListBuffer.empty[FunnelHit]
            var lastUs = -1L
            for ((_, et, t) <- evs) {
              val tu = micros(t)
              lastUs = math.max(lastUs, tu)
              et match {
                case "view" =>
                  s = s.copy(lastViewUs = tu)
                  out += FunnelHit(userId, 1, t)
                case "click" =>
                  // strict (view, view + 1h]: same-instant events never
                  // qualify — the batch range frame's [t−1h, t−1] bound
                  if (s.lastViewUs >= 0 && tu > s.lastViewUs &&
                      tu - s.lastViewUs <= win) {
                    s = s.copy(lastQcUs = tu)
                    out += FunnelHit(userId, 2, t)
                  }
                case "purchase" =>
                  if (s.lastQcUs >= 0 && tu > s.lastQcUs && tu - s.lastQcUs <= win)
                    out += FunnelHit(userId, 3, t)
                case _ =>
              }
            }
            state.update(s)
            if (lastUs >= 0)
              state.setTimeoutTimestamp(lastUs / 1000 + win / 1000 + 1)
            out.iterator
          }
      }
  }

  // ---- interval join (row 34) ----

  val intervalJoinGap = "INTERVAL 30 MINUTES"

  /** Interval join: each click matched to the same user's purchases in
    * (click_ts, click_ts + 30 min]. The user_id equality key makes this
    * one co-partitioned shuffle join (both sides hash-partition on
    * user_id); the time bound is a residual predicate, so no cross
    * product and no skew beyond the key distribution.
    */
  def intervalJoin(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
    joinWithin(clicks, purchases)
  }

  /** The shared join body — batch and streaming run exactly this. */
  private def joinWithin(clicks: DataFrame, purchases: DataFrame): DataFrame =
    clicks.join(purchases, Seq("user_id"))
      .filter(
        col("purchase_ts") > col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr(intervalJoinGap))
      .select(
        col("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"))

  /** Streaming variant: stream-stream inner join. Watermarks on BOTH
    * sides plus the time-range condition let Spark bound the join state —
    * a click can be dropped from state once the watermark passes
    * click_ts + 30 min, a purchase as soon as its watermark expires.
    * Inputs carry (user_id, click_id, click_ts) / (user_id, purchase_id,
    * purchase_ts) like the batch sides.
    */
  def intervalJoinStream(clicks: DataFrame, purchases: DataFrame): DataFrame =
    joinWithin(
      clicks.withWatermark("click_ts", "1 hour"),
      purchases.withWatermark("purchase_ts", "1 hour"))

  // ---- as-of join (row 34b) ----

  val asofBound = "INTERVAL 30 MINUTES"

  /** Left as-of join: every purchase matched to the same user's most
    * recent click at-or-before it (within 30 min), NULL when none.
    *
    * Scale-correct formulation: instead of a range join (which explodes
    * into per-pair candidates before picking the latest), both sides are
    * UNIONED and a single running `last(click, ignoreNulls)` window per
    * user carries the most recent click forward — one shuffle on
    * user_id, state O(1) per row, no pair blow-up however many clicks
    * precede a purchase. Clicks sort before purchases at equal ts
    * (kind 0 < 1) so a same-instant click is visible, and event_id
    * breaks remaining ties deterministically.
    */
  def asofJoin(events: DataFrame): DataFrame = {
    val tagged = events
      .filter(col("event_type").isin("click", "purchase"))
      .select(
        col("user_id"), col("ts"), col("event_id"),
        when(col("event_type") === "click", 0).otherwise(1).as("__kind"))
    val run = Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts"), col("__kind"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inBound = col("__click_ts") >= col("ts") - expr(asofBound)
    tagged
      .withColumn("__click_id",
        last(when(col("__kind") === 0, col("event_id")), ignoreNulls = true).over(run))
      .withColumn("__click_ts",
        last(when(col("__kind") === 0, col("ts")), ignoreNulls = true).over(run))
      .filter(col("__kind") === 1)
      .select(
        col("user_id"),
        col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"),
        when(inBound, col("__click_id")).as("click_id"),
        when(inBound, col("__click_ts")).as("click_ts"))
  }

  /** Streaming as-of join via flatMapGroupsWithState: state is ONE
    * (click_id, click_ts) record per user — the most recent click seen —
    * against which each purchase matches immediately. Within a
    * micro-batch events are walked in event order (clicks before
    * purchases at equal ts), so streaming output equals the batch
    * [[asofJoin]] when batches arrive in event-time order.
    */
  def asofJoinStream(spark: SparkSession, events: DataFrame): Dataset[AsofRow] = {
    import spark.implicits._
    val boundUs = 30L * 60 * 1000000
    val typed = events
      .withWatermark("ts", "1 hour")
      .filter(col("event_type").isin("click", "purchase"))
      .select(
        col("user_id").cast("long"), col("event_id").cast("long"), col("ts"),
        (col("event_type") === "click").as("is_click"))
      .as[(Long, Long, Timestamp, Boolean)]
    def micros(t: Timestamp): Long = t.getTime * 1000 + (t.getNanos / 1000) % 1000
    typed
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[(Long, Long, Timestamp, Boolean)],
         state: GroupState[ClickState]) =>
          val sorted = rows.toSeq
            .sortBy(r => (micros(r._3), if (r._4) 0 else 1, r._2))
          val out = scala.collection.mutable.ListBuffer[AsofRow]()
          var cur = state.getOption
          for ((_, eid, ts, isClick) <- sorted) {
            if (isClick) cur = Some(ClickState(eid, micros(ts)))
            else {
              val m = cur.filter(_.clickUs >= micros(ts) - boundUs)
              out += AsofRow(userId, eid, ts,
                m.map(_.clickId), m.map(c => tsOfMicros(c.clickUs)))
            }
          }
          cur.foreach(state.update)
          out.iterator
      }
  }

  // ---- latest-snapshot compaction (row 35b) ----

  /** CDC-style compaction: the latest event per user (ts desc, event_id
    * desc tie-break) — the argmax-per-key plan every changelog→snapshot
    * materialization needs. One shuffle on the key; at scale this is the
    * standard log-compaction job (and the streaming twin is
    * `mapGroupsWithState` keeping one row per key).
    */
  def latestSnapshot(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    events
      .withColumn("__rn", row_number().over(byUser))
      .filter(col("__rn") === 1)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"), col("value"))
  }

  /** Streaming twin of latestSnapshot: one SnapRow of state per key,
    * replaced whenever a newer (ts, event_id) arrives; each micro-batch
    * emits the key's current snapshot row (Update output mode).
    */
  def latestSnapshotStream(
      spark: SparkSession, events: DataFrame): Dataset[SnapRow] = {
    import spark.implicits._
    events
      .select(
        col("user_id").cast("long"), col("event_id").cast("long"),
        col("ts"), col("event_type"), col("value").cast("double"))
      .as[SnapRow]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[SnapRow], state: GroupState[SnapRow]) =>
          def newer(a: SnapRow, b: SnapRow): SnapRow =
            if (a.ts.getTime > b.ts.getTime ||
              (a.ts.getTime == b.ts.getTime && a.event_id >= b.event_id)) a
            else b
          val best = (state.getOption.iterator ++ rows).reduce(newer)
          state.update(best)
          best
      }
  }

  // ---- SCD2 history (row 45) ----

  /** Changelog → slowly-changing-dimension type-2 history: each event
    * opens a version valid from its own timestamp until the key's next
    * event (NULL = still current). One lead() window per key — the same
    * single user_id shuffle as latestSnapshot, producing the full
    * validity-interval table instead of just the newest row.
    */
  def scd2History(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"), col("ts"))
      .withColumn("valid_from", col("ts"))
      .withColumn("valid_to", lead(col("ts"), 1).over(byUser))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("ts")
  }

  // ---- funnel analysis (row 43) ----

  /** Strict-sequence funnel view → click → purchase: per user, the
    * earliest view, then the earliest click AFTER that view, then the
    * earliest purchase AFTER that click; output = per-stage user counts
    * with conversion rates off the first stage.
    *
    * Three window passes over the SAME user_id partitioning — Catalyst
    * plans one shuffle (the unbounded min frames need no sort), then a
    * single global rollup of 1 row per user. At 100 TB the per-user
    * reduction is the classic funnel job shape.
    */
  def funnel(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
    val staged = events
      .withColumn("t1", min(when(col("event_type") === "view", col("ts"))).over(byUser))
      .withColumn("t2",
        min(when(col("event_type") === "click" && col("ts") > col("t1"), col("ts"))).over(byUser))
      .withColumn("t3",
        min(when(col("event_type") === "purchase" && col("ts") > col("t2"), col("ts"))).over(byUser))
      .groupBy(col("user_id"))
      .agg(first(col("t1")).as("t1"), first(col("t2")).as("t2"), first(col("t3")).as("t3"))
      .agg(
        count(col("t1")).as("view_users"),
        count(col("t2")).as("click_users"),
        count(col("t3")).as("purchase_users"))
    staged.select(
      col("view_users"), col("click_users"), col("purchase_users"),
      (col("click_users").cast("double") / col("view_users").cast("double")).as("click_rate"),
      (col("purchase_users").cast("double") / col("view_users").cast("double")).as("purchase_rate"))
  }

  // ---- cohort retention (row 44) ----

  /** Day-offset retention matrix: cohort = each user's first active day,
    * cell (cohort_day, day_offset) = distinct users of that cohort active
    * day_offset days later (0..maxOffset). Two aggregations sharing the
    * user_id partitioning plus one join of the (small) per-user cohort
    * frame back onto per-user-day activity.
    */
  def cohortRetention(events: DataFrame, maxOffset: Int): DataFrame = {
    val activity = events
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .distinct()
    val cohorts = activity.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    activity
      .join(cohorts, "user_id")
      .withColumn("day_offset", datediff(col("day"), col("cohort_day")).cast("long"))
      .filter(col("day_offset") <= maxOffset)
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("users"))
  }

  // ---- per-window top-k (row 33) ----

  /** Per-day top-k users by summed value; decimal-exact ranking with a
    * user_id tie-break so the result is engine-independent.
    */
  def topkEvents(events: DataFrame, k: Int): DataFrame = {
    val byDay = Window.partitionBy(col("day")).orderBy(col("__tot").desc, col("user_id"))
    events
      .groupBy(date_trunc("day", col("ts")).as("day"), col("user_id"))
      .agg(sum(dec(col("value"))).as("__tot"))
      .withColumn("rnk", row_number().over(byDay))
      .filter(col("rnk") <= k)
      .select(col("day"), col("rnk"), col("user_id"), col("__tot").cast("double").as("total"))
  }
}
