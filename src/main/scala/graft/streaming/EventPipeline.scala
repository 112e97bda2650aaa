package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Structured Streaming over the events table (beyond-reference extension;
  * the reference has no streaming surface — SURVEY.md §2.10).
  *
  * The same transform body serves batch and streaming: [[windowedCounts]]
  * takes whichever DataFrame (static `read` or `readStream`) and applies
  * watermark + tumbling window + aggregation, so batch results are the
  * oracle for the streaming path (tested in ScalaTest with a memory sink).
  */
object EventPipeline {

  /** Logical schema all pipeline transforms see: `ts` is always a
    * microsecond TimestampType after [[readEventStream]]'s normalization,
    * whatever the physical encoding on disk (INT64 nanos, TIMESTAMP_NTZ
    * micros, or TIMESTAMP micros — the test-data generator has shipped
    * all three across generations).
    */
  def eventsSchema: StructType = new StructType()
    .add("event_id", "long").add("ts", "timestamp").add("user_id", "long")
    .add("event_type", "string").add("value", "double").add("props", "string")

  /** Tumbling-window counts/sums per event type with a 10-minute
    * watermark for late data (no-op in batch mode).
    */
  def windowedCounts(events: DataFrame, width: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(col("window.start").as("wstart"), col("event_type"),
        col("n"), col("total"))

  /** Per-user session windows (30-minute gap). */
  def sessionized(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total"))
      .select(col("session_window.start").as("sstart"),
        col("session_window.end").as("send"),
        col("user_id"), col("n_events"), col("total"))

  /** Open a streaming source over a parquet directory of events,
    * normalizing `ts` to a microsecond TimestampType whatever its
    * physical encoding. Streaming sources require a declared schema, so
    * the on-disk schema is sniffed once with a batch metadata read
    * (driver-side footer read only — no data scan) and the conversion
    * branches on the sniffed dtype, mirroring [[graft.Tables.events]].
    */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    // self-sufficient on the TIMESTAMP(NANOS) test-data generation: the
    // sniff read throws "Illegal Parquet type" without this conf, and
    // library callers don't necessarily preset it. The sniff runs on a
    // dedicated SESSION CLONE (own SQLConf, shared SparkContext), so the
    // shared session's conf is never flipped-and-restored — concurrent
    // parquet reads in the calling session can't race a mutation window.
    val confKey = "spark.sql.legacy.parquet.nanosAsLong"
    val sniffSession = spark.newSession()
    sniffSession.conf.set(confKey, "true")
    val physical = sniffSession.read.parquet(dir).schema
    // Only a genuinely nanos-encoded source needs the conf on the
    // CALLING session: every micro-batch planning read consults it for
    // the stream's whole lifetime, and Spark offers no per-stream scope
    // for it. Non-nanos sources leave the session untouched entirely.
    if (physical.exists(f => f.name == "ts" && f.dataType == LongType))
      spark.conf.set(confKey, "true")
    val raw = spark.readStream.schema(physical)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    physical("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", to_timestamp(col("ts")))
      case _ => raw
    }
  }

  /** One event for the typed custom-state pipeline. */
  final case class Event(user_id: Long, ts: java.sql.Timestamp, value: Double)
  /** Custom per-user running state: event count + value sum so far. */
  final case class UserRunning(user_id: Long, n_events: Long, total: Double)

  /** Custom arbitrary-state aggregation via
    * `KeyValueGroupedDataset.flatMapGroupsWithState` — the escape hatch
    * for state machines `session_window` can't express (here: a running
    * per-user profile updated per micro-batch, emitted on every update).
    * Works identically over a batch Dataset (state spans the whole input)
    * so the batch run is the streaming oracle.
    */
  def runningUserTotals(events: DataFrame): org.apache.spark.sql.Dataset[UserRunning] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("ts"), col("value")).as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)({
        (uid: Long, it: Iterator[Event], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(uid, 0L, 0.0))
          var n = prev.n_events
          var total = prev.total
          it.foreach { e => n += 1; total += e.value }
          val next = UserRunning(uid, n, total)
          state.update(next)
          Iterator(next)
      })
  }

  /** [[runningUserTotals]] on the arbitrary-state v2 API
    * (`transformWithState`, Spark 4): state lives in named typed state
    * variables on the processor handle instead of one GroupState value —
    * the forward path for multi-variable state, timers and TTL. Output
    * matches the v1 `flatMapGroupsWithState` port row for row, so either
    * serves as the other's oracle.
    */
  final class RunningTotalsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, UserRunning] {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var state: ValueState[UserRunning] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[UserRunning]("running",
        org.apache.spark.sql.Encoders.product[UserRunning], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[UserRunning] = {
      val prev =
        if (state.exists()) state.get() else UserRunning(key, 0L, 0.0)
      var n = prev.n_events
      var total = prev.total
      rows.foreach { e => n += 1; total += e.value }
      val next = UserRunning(key, n, total)
      state.update(next)
      Iterator(next)
    }
  }

  def runningUserTotalsV2(events: DataFrame): org.apache.spark.sql.Dataset[UserRunning] = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("ts"), col("value")).as[Event]
      .groupByKey(_.user_id)
      .transformWithState(new RunningTotalsProcessor(),
        TimeMode.None(), OutputMode.Update())
  }

  /** A closed per-user activity session (emitted on expiry). */
  final case class SessionSummary(user_id: Long, n_events: Long,
      total: Double, first_ms: Long, last_ms: Long)

  /** Per-user session expiry on EVENT-TIME TIMERS (`transformWithState`
    * + `registerTimer`): each input row extends the user's open session
    * and re-arms a timer at `last_ts + gap`; when the watermark passes
    * it, `handleExpiredTimer` emits the closed session and clears state.
    * This is the timer-driven state machine `session_window` can't
    * express incrementally — output rows appear exactly when a session
    * CLOSES, not when the aggregation result is retracted/updated.
    */
  final class SessionExpiryProcessor(gapMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, SessionSummary] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var state: ValueState[SessionSummary] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SessionSummary]("open_session",
        org.apache.spark.sql.Encoders.product[SessionSummary], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[SessionSummary] = {
      // a batch may carry several of the user's sessions: walk the rows
      // in event-time order, closing (and emitting) a session whenever
      // the next event starts more than `gap` after the last one; only
      // the final still-open session stays in state behind a timer
      val sorted = rows.toSeq.sortBy(_.ts.getTime)
      val closed = Vector.newBuilder[SessionSummary]
      var open: Option[SessionSummary] =
        if (state.exists()) Some(state.get()) else None
      sorted.foreach { e =>
        val t = e.ts.getTime
        open match {
          case Some(s) if t - s.last_ms > gapMs =>
            closed += s
            open = Some(SessionSummary(key, 1L, e.value, t, t))
          case Some(s) if s.first_ms - t > gapMs =>
            // in-watermark straggler older than the open session by more
            // than the gap: it can't merge (that would bridge a gap the
            // batch session_window keeps), so it closes alone
            closed += SessionSummary(key, 1L, e.value, t, t)
          case Some(s) =>
            open = Some(SessionSummary(key, s.n_events + 1, s.total + e.value,
              math.min(s.first_ms, t), math.max(s.last_ms, t)))
          case None =>
            open = Some(SessionSummary(key, 1L, e.value, t, t))
        }
      }
      open.foreach { s =>
        state.update(s)
        getHandle.registerTimer(s.last_ms + gapMs)
      }
      closed.result().iterator
    }
    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionSummary] = {
      // only the LATEST armed timer closes the session — earlier timers
      // fire too but find the session extended past them
      if (state.exists() &&
          state.get().last_ms + gapMs <= expiredTimerInfo.getExpiryTimeInMs) {
        val s = state.get(); state.clear(); Iterator(s)
      } else Iterator.empty
    }
  }

  def expiredSessions(events: DataFrame,
      gap: String = "30 minutes"): org.apache.spark.sql.Dataset[SessionSummary] = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(gap))
    require(gapMs.months == 0,
      s"expiredSessions gap must be day/time denominated, got '$gap' " +
        "(months have no fixed millisecond length)")
    val ms = gapMs.days * 86400000L + gapMs.microseconds / 1000L
    require(ms > 0, s"expiredSessions gap must be positive, got '$gap'")
    events.withWatermark("ts", "10 minutes")
      .select(col("user_id"), col("ts"), col("value")).as[Event]
      .groupByKey(_.user_id)
      .transformWithState(new SessionExpiryProcessor(ms),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Late-arrival dedup: drop duplicate event_ids arriving within the
    * watermark window (`dropDuplicatesWithinWatermark` keeps state only
    * until the watermark passes — bounded state on unbounded input; a
    * plain dropDuplicates would grow state forever). Spark REJECTS the
    * within-watermark form on batch frames (it is not merely degraded),
    * so batch inputs take the exact dropDuplicates spelling explicitly —
    * that batch run is the oracle for the streaming one.
    */
  def dedupWithinWatermark(events: DataFrame,
      lateness: String = "10 minutes"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", lateness)
        .dropDuplicatesWithinWatermark("event_id")
    else events.dropDuplicates("event_id")

  /** Streaming anti-join: clicks with NO purchase by the same user
    * within 30 minutes after the click (abandonment detection). Spark
    * does not support stream-stream LEFT ANTI directly — the supported
    * shape is a watermarked LEFT OUTER time-interval join whose
    * unmatched rows emit (with a NULL right side) once the watermark
    * proves no matching purchase can still arrive; the NULL filter then
    * yields exactly the anti rows. Both watermarks bound the join state.
    */
  def clicksWithoutPurchase(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val l = clicks.select(col("user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", "1 hour")
    val r = purchases.select(col("user_id").as("p_user"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "1 hour")
    l.join(r,
      col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"),
      "left_outer")
      .filter(col("p_user").isNull)
      .select(col("user_id"), col("click_id"), col("click_ts"))
  }

  /** Stream-stream inner join with watermarks: click-like events joined
    * to purchase-like events of the same user within ±30 minutes. Both
    * sides carry watermarks so Spark can expire join state — the pattern
    * that keeps state bounded on unbounded inputs.
    */
  def streamStreamJoin(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val l = clicks.select(col("user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", "1 hour")
    val r = purchases.select(col("user_id").as("p_user"),
        col("ts").as("purchase_ts"), col("value"))
      .withWatermark("purchase_ts", "1 hour")
    l.join(r,
      col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") - expr("INTERVAL 30 MINUTES") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("user_id"), col("click_id"), col("click_ts"),
        col("purchase_ts"), col("value"))
  }
}
