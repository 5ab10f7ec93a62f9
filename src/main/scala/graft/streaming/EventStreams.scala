package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming forms of the event analytics — the incremental
  * equivalents of `EventQueries`' batch `events_hourly` /
  * `events_sessionize` (StreamingSpec asserts they agree on the same data).
  *
  * The reference is batch-only (SURVEY.md §1.1: "no streams… anywhere in
  * the tree"); this module is part of the north-star pipeline surface:
  * readStream → watermarked transforms → writeStream, with custom state via
  * flatMapGroupsWithState.
  *
  * Scale: windowed aggregation is partial-agg + state-store keyed by
  * (window, type); the sessionizer keys state by user_id — both shuffle
  * once on their state key, and watermarks bound state size (sessions also
  * expire via event-time timeout).
  */
object EventStreams extends Serializable {

  final case class Event(user_id: Long, ts: java.sql.Timestamp, value: Double)

  /** Sessions are identified by (user_id, session_start_us), NOT an ordinal
    * per-user counter: an ordinal would have to survive session timeouts,
    * i.e. keep one counter per user ever seen — unbounded state. Start-time
    * identity lets the state store drop a session the moment it times out,
    * can never emit duplicate keys, and is exactly derivable in the batch
    * twin (`events_sessionize` carries the same column).
    */
  final case class SessionOut(user_id: Long, session_start_us: Long,
                              n_events: Long, sum_value: Double)
  final case class SessionState(startUs: Long, lastUs: Long,
                                n: Long, sum: Double)

  /** Tumbling 1-hour counts per event type; 2-hour watermark bounds state
    * and admits moderately late events. Works on both batch and streaming
    * frames (withWatermark is a no-op in batch).
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count("*").as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("window.start").as("bucket"), col("event_type"),
              col("n"), col("sum_value"))

  /** Gap-based sessionization with explicit state: a session closes after
    * `gapMinutes` of user silence (event-time timeout) and is emitted once,
    * matching the batch `events_sessionize` aggregation.
    *
    * State per user: the open session. Events inside a micro-batch are
    * sorted by timestamp; cross-batch order is guaranteed by the watermark
    * (late events beyond it are dropped by the runtime).
    */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30)
      : Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

    def update(userId: Long, it: Iterator[Event],
               state: GroupState[SessionState]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val s = state.get
        // start-time identity makes this removal safe: the user's NEXT
        // session gets a fresh identity, never a restarted counter
        state.remove()
        return Iterator(SessionOut(userId, s.startUs, s.n, round4(s.sum)))
      }
      val sorted = it.toIndexedSeq.sortBy(e => (e.ts.getTime, e.value))
      var closed = List.empty[SessionOut]
      var cur = state.getOption
      for (e <- sorted) {
        val us = e.ts.getTime * 1000L
        cur match {
          case Some(s) if us - s.lastUs <= gapUs =>
            cur = Some(s.copy(lastUs = us, n = s.n + 1, sum = s.sum + e.value))
          case Some(s) =>
            closed ::= SessionOut(userId, s.startUs, s.n, round4(s.sum))
            cur = Some(SessionState(us, us, 1, e.value))
          case None =>
            cur = Some(SessionState(us, us, 1, e.value))
        }
      }
      cur.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.lastUs / 1000L + gapMinutes * 60L * 1000L)
      }
      closed.reverseIterator
    }

    events
      .withWatermark("ts", "0 seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
                              GroupStateTimeout.EventTimeTimeout)(update)
  }

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
}
