package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
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
object Streams {

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

  /** Streaming dedup within the watermark — twin of "st_dedup_first". */
  def dedupFirst(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicates("user_id", "event_type")

  /** Gap-based sessionization with explicit keyed state
    * (flatMapGroupsWithState, event-time timeout) — twin of "st_sessionize".
    * Emits a session when a gap > gapMinutes closes it. */
  def sessionize(events: Dataset[Event], gapMinutes: Long = 30): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60 * 1000

    def fn(userId: Long, it: Iterator[Event],
           state: GroupState[(Timestamp, Timestamp, Long, Double)]): Iterator[SessionOut] = {
      val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      var out = List.empty[SessionOut]
      var cur = state.getOption
      for (e <- sorted) {
        cur match {
          case Some((s0, e0, n, v)) if e.ts.getTime - e0.getTime <= gapMs =>
            cur = Some((s0, e.ts, n + 1, v + e.value))
          case Some((s0, e0, n, v)) =>
            out ::= SessionOut(userId, s0, e0, n, v)
            cur = Some((e.ts, e.ts, 1L, e.value))
          case None =>
            cur = Some((e.ts, e.ts, 1L, e.value))
        }
      }
      cur.foreach(state.update)
      out.reverseIterator
    }

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }
}
