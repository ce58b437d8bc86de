package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState,
  GroupStateTimeout, OutputMode, StatefulProcessor, TimeMode, TimerValues,
  TTLConfig, ValueState}
import java.sql.Timestamp

/** Structured Streaming surface (SURVEY.md §2.9: batch-first engine with the
  * event pipeline optionally exposed as streams — stock API, watermarks +
  * windows + keyed state, no custom sinks).
  *
  * Each pipeline takes a STREAMING DataFrame (readStream/MemoryStream) shaped
  * like the `events` table and shares semantics with its batch twin in
  * graft.queries.Temporal; the ScalaTest suite drives them with MemoryStream
  * and checks agreement against the batch results.
  *
  * Scale notes: all state is keyed (user_id / window), so state distributes
  * across executors; watermarks bound state size; shuffle partitioning is the
  * same hash-on-key layout the batch jobs use.
  */
// Serializable: the sessionizer closures reference the shared foldSessions
// member, so tasks capture the module object itself
object Streams extends Serializable {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double)
  case class SessionOut(user_id: Long, session_start: Timestamp,
                        session_end: Timestamp, n_events: Long, total_value: Double)

  /** Tumbling 1-hour event-time aggregation with watermark — the streaming
    * twin of Temporal."st_hourly_window". */
  def hourlyCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("w.start").as("ws"), col("w.end").as("we"),
        col("event_type"), col("n"), col("sum_value"))

  /** Hourly OHLC bars per user with watermark — the streaming twin of
    * Temporal."ts_resample_ohlc". min_by/max_by carry mergeable
    * (value, ts) extremum state, so each (user, hour) window updates
    * incrementally and finalizes once the watermark passes: downsampling an
    * unbounded metric stream with state proportional to open windows, never
    * to events seen. */
  def ohlcBars(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), window(col("ts"), "1 hour").as("w"))
      .agg(min_by(col("value"), col("ts")).as("open"),
           max("value").as("high"), min("value").as("low"),
           max_by(col("value"), col("ts")).as("close"),
           count(lit(1)).as("n"))
      .select(col("user_id"), col("w.start").as("hour"),
        col("open"), col("high"), col("low"), col("close"), col("n"))

  /** Streaming dedup keeping the first-ARRIVED row per key. Matches the
    * batch "st_dedup_first" (min event-time row) only under in-order
    * delivery — dropDuplicates keeps whatever arrived first, so an
    * out-of-order earlier-timestamped row inside the watermark loses here
    * but wins in batch. A strict keep-earliest stream needs keyed min_by
    * state instead; this is the stock-API form. */
  def dedupFirst(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicates("user_id", "event_type")

  /** Streaming dedup with BOUNDED state: dropDuplicatesWithinWatermark
    * evicts per-key state once it ages past the watermark, so state size
    * tracks the delay window, not the full key cardinality — the shape an
    * unbounded 100 TB stream needs (plain dropDuplicates above keeps every
    * key forever and is only safe when key cardinality is bounded). Within
    * the window the semantics match "st_dedup_first". */
  def dedupWithinWatermark(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** Stream-static enrichment: join the event stream against a slow-changing
    * dimension. The static side broadcasts under every micro-batch — no
    * stream-side shuffle, no state store; the dim is re-read per batch so
    * dimension updates flow in without restarts. */
  def enrich(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), Seq("user_id"), "left")

  /** Benchmark DECONTAMINATION flagging (VERDICT r12 #8) — the
    * dd_decontaminate 13-gram overlap rule as ONE reusable transform, so
    * the streaming ingestion path and the batch census provably apply the
    * identical rule: per incoming document, the distinct per-step-mod
    * Horner 13-grams joined against the BROADCAST benchmark gram set
    * (`evalGrams`: (gram, eval_id) — benchmark-sized at any corpus scale,
    * the standard decontamination join: corpus streams, benchmark rides
    * along), then a per-doc census. Flagging is per-document independent,
    * so applying this to each micro-batch of arriving train shards
    * (foreachBatch) yields exactly the batch answer — StreamingSpec pins
    * stream ≡ batch over a MemoryStream. Returns only flagged docs:
    * (doc_id, n_shared_grams, n_eval_docs). */
  private val gram13: org.apache.spark.sql.Column = {
    val fold = (2 to 13).foldLeft("element_at(__th, i)")((acc, j) =>
      s"($acc * 131 + element_at(__th, i + ${j - 1})) % 1000000007L")
    when(size(col("__th")) < 13, array().cast("array<long>"))
      .otherwise(expr(s"transform(sequence(1, size(__th) - 12), i -> $fold)"))
  }

  private def docGrams(docs: DataFrame): DataFrame = docs
    .withColumn("__th", graft.engine.TextFunctions.tokenHashes(col("text")))
    .select(col("doc_id"), explode(array_distinct(gram13)).as("gram"))

  /** The benchmark's distinct 13-gram set (gram, eval_id) — derived by the
    * IDENTICAL fold the flagging applies, so set and probe can't drift. */
  def benchmarkGrams(evalDocs: DataFrame): DataFrame =
    docGrams(evalDocs).select(col("gram"), col("doc_id").as("eval_id"))

  def flagContaminated(docs: DataFrame, evalGrams: DataFrame): DataFrame =
    docGrams(docs)
      .join(broadcast(evalGrams), "gram")
      .groupBy("doc_id")
      .agg(countDistinct("gram").as("n_shared_grams"),
           countDistinct("eval_id").as("n_eval_docs"))

  /** First-failing-rule classification — the streaming face of the batch
    * catalog query `etl_quarantine` (same rule order; the Event schema has
    * no JSON payload, so the props rule doesn't apply here). */
  def classify(events: DataFrame): DataFrame =
    events.withColumn("reason",
      when(col("event_type") === "error", "error_event")
        .when(col("value") < 0.01, "negligible_value")
        .otherwise("ok"))

  /** Multi-sink dead-letter routing via foreachBatch: each micro-batch is
    * classified ONCE (cached), then split into the clean sink and the
    * quarantine sink inside the same batch function. foreachBatch gives
    * per-batch atomicity hooks: both sink callbacks receive the batchId,
    * so idempotent sinks (overwrite-by-batchId) survive micro-batch
    * replays after failure — the standard exactly-once recipe for
    * multi-sink streaming. State footprint is zero (stateless
    * classification); throughput is one scan per batch, not one per sink. */
  def routeQuarantine(events: DataFrame,
                      good: (DataFrame, Long) => Unit,
                      quarantine: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    classify(events).writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        val staged = batch.cache() // classify once, feed both sinks
        try {
          good(staged.filter(col("reason") === "ok").drop("reason"), id)
          quarantine(staged.filter(col("reason") =!= "ok"), id)
        } finally { staged.unpersist(); () }
      }
      .start()

  /** Native session_window aggregation on the stream — twin of the batch
    * "st_session_window" (same gap semantics: an event at exactly
    * last_ts + gap starts a new session). State is (user, open session),
    * merged by the operator; the watermark closes and evicts sessions. */
  def sessionWindowAgg(events: DataFrame, gap: String = "30 minutes",
                       watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("session_value"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"), col("session_value"))

  /** Stream-stream inner join: each purchase attributes back to views by the
    * same user within the preceding hour. BOTH sides carry watermarks and
    * the join condition bounds purchase_ts relative to view_ts, so Spark
    * derives state-eviction watermarks for the join state store — bounded
    * state on an unbounded stream (without the time bound, stream-stream
    * join state grows forever). Batch twin: Temporal."st_view_purchase"
    * runs the same join condition then aggregates per user. */
  def viewToPurchase(views: DataFrame, purchases: DataFrame,
                     watermark: String = "2 hours"): DataFrame =
    attributionJoin(views, purchases, watermark, "inner")

  /** The one attribution-join definition both variants share — the window
    * bound and column names cannot drift between inner and outer. */
  private def attributionJoin(views: DataFrame, purchases: DataFrame,
                              watermark: String, joinType: String): DataFrame = {
    val v = views
      .select(col("user_id"), col("ts").as("view_ts"), col("event_id").as("view_id"))
      .withWatermark("view_ts", watermark)
    val p = purchases
      .select(col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))
      .withWatermark("purchase_ts", watermark)
    v.join(p,
        col("user_id") === col("p_user_id") &&
          col("purchase_ts") >= col("view_ts") &&
          col("purchase_ts") < col("view_ts") + expr("INTERVAL 1 HOUR"),
        joinType)
      .select(col("user_id"), col("view_id"), col("view_ts"),
        col("purchase_ts"), col("purchase_value"))
  }

  /** LEFT-OUTER stream-stream join: like [[viewToPurchase]], but views with
    * no purchase in their hour emit once with null purchase columns — AFTER
    * the watermark passes the end of their window, because only then can the
    * engine prove no match is still coming. This is the "unconverted
    * impressions" feed a training pipeline needs alongside the conversions;
    * the null rows arrive with watermark latency by construction. */
  def viewToPurchaseOuter(views: DataFrame, purchases: DataFrame,
                          watermark: String = "2 hours"): DataFrame =
    attributionJoin(views, purchases, watermark, "left_outer")

  /** Gap-based sessionization with explicit keyed state
    * (flatMapGroupsWithState, event-time timeout) — twin of "st_sessionize".
    * Emits a session when a gap > gapMinutes closes it. */
  private type SessionState = (Timestamp, Timestamp, Long, Double)

  /** The one gap-merge fold both sessionizers share: folds a batch's events
    * (pre-sorted by event time) into the open session, emitting sessions a
    * gap closes. An out-of-order event that lands INSIDE the gap — within
    * gapMs on EITHER side of the open [start, end] window — extends the
    * session on whichever end it falls (min start / max end); it must
    * never shrink session_end below session_start, which the naive
    * "end := e.ts" update did for cross-batch late arrivals. Late events
    * from BEFORE start − gap cannot extend the open session at arrival
    * time (the batch twin would give them their own earlier session[s]);
    * they gap-fold among THEMSELVES and emit when the batch ends — UNLESS
    * a same-batch event later shrinks the open session's start to within
    * gap of the early session's end, in which case the batch-end re-check
    * merges the two exactly like a single batch sort would (ADVICE r5's
    * "bridge" ordering). Sorted input gives two invariants the merge rule
    * leans on: only the LAST early session can still be unflushed at batch
    * end, and the open start can never shrink past an early event (an
    * event between early.end and start − gap lands in the open branch, not
    * early). Within one batch this is EXACT, chains included: separate
    * early sessions are separated by > gap by construction, so the batch
    * sort splits exactly where the eager flush does, and the only link that
    * can bridge into the open session is the last one — which the batch-end
    * re-check merges (both pinned in StreamingSpec's chain test). The
    * remaining cross-batch under-merge (append-mode output is immutable) is
    * repaired downstream by [[repairSessions]]; the "cross-batch early
    * flush is FINAL" spec pins the raw divergence shape, and the repair
    * spec proves repair(streamed) ≡ single-batch on the same orderings. */
  private def foldSessions(userId: Long, sorted: Seq[Event],
                           init: Option[SessionState],
                           gapMs: Long): (List[SessionOut], Option[SessionState]) = {
    var out = List.empty[SessionOut]
    var cur = init
    // accumulator for the before-window late events of THIS batch
    var early: Option[SessionState] = None
    def flushEarly(): Unit = early.foreach { case (es, ee, n, v) =>
      out ::= SessionOut(userId, es, ee, n, v); early = None
    }
    for (e <- sorted) {
      cur match {
        case Some((s0, _, _, _)) if e.ts.getTime < s0.getTime - gapMs =>
          early match {
            case Some((es, ee, n, v)) if e.ts.getTime - ee.getTime <= gapMs =>
              // sorted input ⇒ e.ts >= ee; extend the early session forward
              early = Some((es, e.ts, n + 1, v + e.value))
            case _ =>
              flushEarly()
              early = Some((e.ts, e.ts, 1L, e.value))
          }
        case Some((s0, e0, n, v)) if e.ts.getTime - e0.getTime <= gapMs =>
          val s1 = if (e.ts.getTime < s0.getTime) e.ts else s0
          val e1 = if (e.ts.getTime > e0.getTime) e.ts else e0
          cur = Some((s1, e1, n + 1, v + e.value))
        case Some((s0, e0, n, v)) =>
          // the closing session's start may have shrunk to within gap of
          // the early session — apply the same bridge merge before emitting
          val (ms, me, mn, mv) = early match {
            case Some((es, ee, ne, ve)) if s0.getTime - ee.getTime <= gapMs =>
              early = None; (es, e0, n + ne, v + ve)
            case _ => (s0, e0, n, v)
          }
          flushEarly() // an unmergeable early session still precedes in time
          out ::= SessionOut(userId, ms, me, mn, mv)
          cur = Some((e.ts, e.ts, 1L, e.value))
        case None =>
          cur = Some((e.ts, e.ts, 1L, e.value))
      }
    }
    // batch-end re-check: events after the early run may have shrunk the
    // open session's start to within gap of the early session's end — the
    // batch twin would merge them, so merge here before flushing
    (early, cur) match {
      case (Some((es, ee, n, v)), Some((s0, e0, n0, v0)))
          if s0.getTime - ee.getTime <= gapMs =>
        cur = Some((es, e0, n + n0, v + v0))
        early = None
      case _ => ()
    }
    flushEarly()
    (out.reverse, cur)
  }

  /** Batch REPAIR COMPACTION for append-mode session output (VERDICT r7
    * #5): merges cross-batch under-merged session fragments under the same
    * gap rule, closing the one approximation [[foldSessions]] documents —
    * a session flushed in an earlier micro-batch is immutable, so a later
    * batch's in-gap late event gets its own fragment where a batch sort
    * would have merged them. This is the production pattern: the stream
    * emits fragments with low latency, a downstream batch job compacts
    * them per corpus window. Correctness: a fragment's internal event gaps
    * are ≤ gap by construction (the sessionizer built it), and two events
    * with gap ≤ gap always belong to one batch session — so gap-chaining
    * the fragment INTERVALS reproduces exactly the sessions a single batch
    * sort would emit (StreamingSpec proves repair(streamed) ≡ single-batch
    * on the adversarial orderings, including the pinned cross-batch
    * divergence case). The chain uses a RUNNING-MAX end, not lag(end):
    * out-of-order fragments can be time-nested, and a nested fragment's
    * small end must not mask its container's reach. Scale shape: one
    * shuffle on user_id over FRAGMENT counts (≪ event counts), two window
    * passes + one aggregate. */
  def repairSessions(fragments: Dataset[SessionOut],
                     gapMinutes: Long = 30): Dataset[SessionOut] = {
    import fragments.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val gapUs = gapMinutes * 60L * 1000000L
    val w = Window.partitionBy("user_id")
      .orderBy(col("session_start").asc, col("session_end").asc,
        col("n_events").asc, col("total_value").asc)
    fragments.toDF()
      .withColumn("prev_reach_us",
        max(unix_micros(col("session_end")))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("is_new", coalesce(
        unix_micros(col("session_start")) - col("prev_reach_us") > gapUs, lit(true)))
      .withColumn("island",
        sum(when(col("is_new"), 1L).otherwise(0L))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "island")
      .agg(min("session_start").as("session_start"),
           max("session_end").as("session_end"),
           sum("n_events").as("n_events"),
           sum("total_value").as("total_value"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("total_value"))
      .as[SessionOut]
  }

  def sessionize(events: Dataset[Event], gapMinutes: Long = 30): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60 * 1000

    def fn(userId: Long, it: Iterator[Event],
           state: GroupState[SessionState]): Iterator[SessionOut] = {
      val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      val (out, cur) = foldSessions(userId, sorted, state.getOption, gapMs)
      cur.foreach(state.update)
      out.iterator
    }

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  /** Sessionization with EVENT-TIME TIMEOUT: unlike [[sessionize]] (which
    * only closes a user's session when a LATER event for the same user
    * arrives), the open session also closes when the watermark passes
    * last_event + gap — so a user who walks away still gets their session
    * emitted, with watermark latency. This is the semantics an unbounded
    * production stream needs: state for idle keys is guaranteed to drain,
    * making state size track the ACTIVE key set, not the all-time key set. */
  def sessionizeTimeout(events: Dataset[Event], gapMinutes: Long = 30,
                        watermark: String = "0 seconds"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60 * 1000

    def fn(userId: Long, it: Iterator[Event],
           state: GroupState[SessionState]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val (s0, e0, n, v) = state.get
        state.remove()
        Iterator.single(SessionOut(userId, s0, e0, n, v))
      } else {
        val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
        val (out, cur) = foldSessions(userId, sorted, state.getOption, gapMs)
        cur.foreach { c =>
          state.update(c)
          state.setTimeoutTimestamp(c._2.getTime + gapMs)
        }
        out.iterator
      }
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Gap sessionizer on the transformWithState API (the
    * flatMapGroupsWithState successor) with EVENT-TIME TIMERS: the open
    * session lives in a typed ValueState, every batch re-registers a timer
    * at session_end + gap, and [[handleExpiredTimer]] emits the session
    * when the watermark passes that instant — so idle users drain exactly
    * like [[sessionizeTimeout]], but through the new API's explicit
    * timer/state handles (RocksDB-backed, TTL-capable). Within a batch the
    * shared [[foldSessions]] runs unchanged, so every within-batch
    * semantics pinned by StreamingSpec (bridge merges, early chains)
    * carries over verbatim; the spec asserts agreement with sessionize on
    * closed sessions AND the timer-driven emission of the idle tail. */
  class SessionizeProcessor(gapMs: Long)
      extends StatefulProcessor[Long, Event, SessionOut] {
    @transient private var st: ValueState[SessionState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[SessionState]("open_session",
        Encoders.tuple(Encoders.TIMESTAMP, Encoders.TIMESTAMP,
          Encoders.scalaLong, Encoders.scalaDouble), TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Event],
                                 tv: TimerValues): Iterator[SessionOut] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      val prev = if (st.exists()) Some(st.get()) else None
      val (out, cur) = foldSessions(key, sorted, prev, gapMs)
      // one live timer per key: re-arm at the (possibly extended) gap edge
      prev.foreach(p => getHandle.deleteTimer(p._2.getTime + gapMs))
      cur.foreach { c =>
        st.update(c)
        getHandle.registerTimer(c._2.getTime + gapMs)
      }
      out.iterator
    }
    override def handleExpiredTimer(key: Long, tv: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[SessionOut] =
      if (st.exists()) {
        val (s0, e0, n, v) = st.get()
        // a stale timer (re-armed later for an extended session) must not
        // flush the still-open state early
        if (e0.getTime + gapMs == info.getExpiryTimeInMs) {
          st.clear()
          Iterator.single(SessionOut(key, s0, e0, n, v))
        } else Iterator.empty
      } else Iterator.empty
  }

  /** Sessionization over transformWithState with event-time timers.
    * Requires the RocksDB state store provider (spec sets it). */
  def sessionizeTws(events: Dataset[Event], gapMinutes: Long = 30,
                    watermark: String = "0 seconds"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .transformWithState(new SessionizeProcessor(gapMinutes * 60 * 1000),
        TimeMode.EventTime(), OutputMode.Append())
  }

  case class UserRunning(user_id: Long, event_id: Long, n_so_far: Long, ewma: Double)

  /** Arbitrary stateful processing on the transformWithState API (the
    * mapGroupsWithState successor): per-user running count + EWMA carried in
    * a typed ValueState across micro-batches. State lives in the RocksDB
    * state store (the operator requires it — spec sets the provider), is
    * keyed per user so it distributes, and TTLConfig would bound it for
    * unbounded key spaces. Within a batch, rows are processed in event-time
    * order so the recurrence matches the batch ts_ewma semantics. */
  class RunningStatsProcessor extends StatefulProcessor[Long, Event, UserRunning] {
    @transient private var st: ValueState[(Long, Double)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Double)]("running",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble), TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Event],
                                 tv: TimerValues): Iterator[UserRunning] = {
      var (n, ew) = if (st.exists()) st.get() else (0L, 0.0)
      val out = rows.toSeq.sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id)).map { e =>
        n += 1
        ew = if (n == 1) e.value else 0.2 * e.value + 0.8 * ew
        UserRunning(key, e.event_id, n, ew)
      }
      st.update((n, ew))
      out.iterator
    }
  }

  /** Per-user running stats over transformWithState. Requires
    * spark.sql.streaming.stateStore.providerClass=RocksDBStateStoreProvider. */
  def runningStats(events: Dataset[Event]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new RunningStatsProcessor, TimeMode.None(), OutputMode.Update())
  }
}
