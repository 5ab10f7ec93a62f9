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

  final case class TypeStep(user_id: Long, ts: java.sql.Timestamp,
                            event_type: String, event_id: Long)
  final case class Transition(prev_type: String, next_type: String)

  /** Streaming twin of the batch `events_transitions` matrix: each user's
    * consecutive event-type pairs, emitted as they happen. State per user
    * is ONE string (the last event type) — O(users), no timeout needed;
    * the pair stream feeds any downstream count. Within a micro-batch a
    * user's events are ordered by (ts, event_id); across batches arrival
    * order is stream order (same contract as [[CorpusStreams.packStream]]).
    */
  def transitionStream(events: Dataset[TypeStep]): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
                              GroupStateTimeout.NoTimeout) {
        (_: Long, it: Iterator[TypeStep], state: GroupState[String]) =>
          var prev = state.getOption.orNull
          // full-resolution ordering key: getTime is ms-truncated, and the
          // batch twin orders by microseconds — seconds·1e9 + nanos ties out
          val out = it.toIndexedSeq
            .sortBy(e => (math.floorDiv(e.ts.getTime, 1000L) * 1000000000L +
                          e.ts.getNanos, e.event_id))
            .flatMap { e =>
              val t = Option(prev).map(p => Transition(p, e.event_type))
              prev = e.event_type
              t
            }
          state.update(prev)
          out.iterator
      }
  }

  /** Streaming twin of the batch `events_anomaly` flag: daily volumes per
    * event type (tumbling 1-day windows, watermark-closed) checked against
    * STATIC per-type moments trained on a reference period — the same
    * division-free integer z-test inequality, so a day flags identically
    * in stream and batch. `moments` columns: event_type, n, sx, sxx.
    * Retraining the moments as the reference period moves is a batch-job
    * swap, like [[graft.streaming.CorpusStreams.mixtureGate]]'s cuts.
    */
  def anomalyFlags(events: DataFrame, moments: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("event_type"), to_date(col("window.start")).as("d"),
              col("cnt"))
      .join(broadcast(moments), "event_type")
      .withColumn("__dev", col("n") * col("cnt") - col("sx"))
      .withColumn("is_anomaly",
        col("__dev") * col("__dev") * (col("n") - 1) >
          lit(4) * col("n") * (col("n") * col("sxx") - col("sx") * col("sx")))
      .select(col("event_type"), col("d"), col("cnt"), col("is_anomaly"))

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
      val sorted = it.toIndexedSeq.sortBy(e => (microsOf(e.ts), e.value))
      var closed = List.empty[SessionOut]
      var cur = state.getOption
      for (e <- sorted) {
        val us = microsOf(e.ts)
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

  /** Watermark-bounded stream-stream interval join: every (click, purchase)
    * pair of one user with the purchase in [click_ts, click_ts + window] —
    * conversion-pair mining. Column contract: clicks(c_user, c_ts, click_id),
    * purchases(p_user, p_ts, purchase_id).
    *
    * Unlike [[asofAttribution]] (one latest-click row per user), this is a
    * TRUE stream-stream join: both sides buffer in the state store, and the
    * watermark plus the two-sided time bound let the runtime evict a
    * buffered row as soon as no future match can arrive — state stays
    * O(events per watermark horizon), not O(stream length). Works on batch
    * frames too (withWatermark is a no-op in batch), so the batch twin for
    * spec parity is this very function.
    */
  def conversionPairs(clicks: DataFrame, purchases: DataFrame,
                      windowMinutes: Int = 60,
                      watermark: String = "2 hours"): DataFrame =
    clicks.withWatermark("c_ts", watermark)
      .join(purchases.withWatermark("p_ts", watermark),
            expr(s"""c_user = p_user AND
                     p_ts >= c_ts AND
                     p_ts <= c_ts + INTERVAL $windowMinutes MINUTES"""))
      .select(col("c_user").as("user_id"), col("click_id"),
              col("purchase_id"), col("c_ts"), col("p_ts"))

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Event-time in µs. `getTime` alone is ms-truncated — the sub-ms part
    * lives in the nanos field — and a ms/µs mismatch silently diverges
    * from the batch twins' `unix_micros` on real (µs-granular) data.
    */
  private def microsOf(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  final case class TypedEvent(user_id: Long, ts: java.sql.Timestamp,
                              event_type: String, event_id: Long)
  final case class Attribution(purchase_id: Long, user_id: Long, ts_us: Long,
                               click_id: Option[Long], click_ts_us: Option[Long])
  final case class LastClick(tsUs: Long, clickId: Long)

  /** Streaming AS-OF attribution — the incremental twin of the batch
    * `events_asof_join`: each purchase is attributed to the same user's
    * most recent click at or before it.
    *
    * State per user is ONE row (the latest click), so unlike a
    * stream-stream interval join there is no retained event buffer and no
    * watermark-bounded join state — the classic enrich-by-latest pattern.
    * Within a batch events process in (ts, clicks-first, event_id) order,
    * matching the batch twin's ASOF `>=` tie rule and its max-event_id
    * pick among same-timestamp clicks; cross-batch order is event-time
    * (late events beyond a configured watermark are dropped upstream).
    */
  def asofAttribution(events: Dataset[TypedEvent]): Dataset[Attribution] = {
    import events.sparkSession.implicits._

    def update(userId: Long, it: Iterator[TypedEvent],
               state: GroupState[LastClick]): Iterator[Attribution] = {
      val sorted = it.toIndexedSeq.sortBy(e =>
        (microsOf(e.ts), if (e.event_type == "click") 0 else 1, e.event_id))
      var last = state.getOption
      val out = List.newBuilder[Attribution]
      for (e <- sorted) {
        val us = microsOf(e.ts)
        e.event_type match {
          case "click" =>
            // among equal-ts clicks the highest event_id wins (also across
            // batch boundaries), exactly the batch side's max(event_id)
            // per (user, ts) collapse
            if (last.forall(s => s.tsUs < us ||
                  (s.tsUs == us && s.clickId < e.event_id))) {
              last = Some(LastClick(us, e.event_id))
            }
          case "purchase" =>
            out += Attribution(e.event_id, userId, us,
              last.map(_.clickId), last.map(_.tsUs))
          case _ => ()
        }
      }
      last.foreach(state.update)
      out.result().iterator
    }

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
                              GroupStateTimeout.NoTimeout)(update)
  }
}
