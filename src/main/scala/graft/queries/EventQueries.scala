package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch analytics over the `events` stream table: tumbling windows and
  * gap-based sessionization. The same semantics run incrementally in
  * `graft.streaming` (watermarked windowed aggregation,
  * flatMapGroupsWithState sessionizer); these batch forms are the
  * oracle-checkable equivalents.
  *
  * Scale: both queries shuffle once — on (bucket, type) and user_id
  * respectively. Sessionization sorts within user partitions (Spark's
  * window exec); skewed users would page through the sort spill, not OOM.
  */
object EventQueries extends QueryModule {

  /** The ns→µs-normalized events table (public for spec witnesses). */
  def eventsFor(s: org.apache.spark.sql.SparkSession, dir: String) =
    events(s, dir)

  override def all: Seq[GraftQuery] = Seq(

    // Tumbling 1-hour windows per event type.
    GraftQuery(
      "events_hourly",
      (s, dir) =>
        events(s, dir)
          .groupBy(date_trunc("hour", col("ts")).as("bucket"),
                   col("event_type"))
          // no rounded avg here: the 2-decimal values divided by small group
          // counts land exactly on .00005 halves, where Spark's BigDecimal
          // rounding and DuckDB's float rounding disagree on the double
          // representation — sum+count carry the same information safely
          .agg(count("*").as("n"),
               round(sum(col("value")), 4).as("sum_value")),
      Some("""SELECT date_trunc('hour', ts)::TIMESTAMP AS bucket, event_type,
        |  count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY 1, event_type""".stripMargin)),

    // Sliding 1-hour windows every 15 minutes — each event lands in
    // size/slide = 4 overlapping windows (the windowing mode tumbling
    // events_hourly doesn't cover; the same groupBy(window(...)) runs
    // incrementally under readStream). Spark's window() materializes the
    // per-event window list at plan time, so this stays one shuffle on
    // (window, type) with map-side partial aggregation — the 4× row
    // expansion happens map-side, pre-combine. The oracle derives each
    // event's 4 window starts arithmetically.
    GraftQuery(
      "events_sliding",
      (s, dir) =>
        events(s, dir)
          .groupBy(window(col("ts"), "1 hour", "15 minutes"),
                   col("event_type"))
          .agg(count(lit(1)).as("n"),
               round(sum(col("value")), 4).as("sum_value"))
          .select(unix_micros(col("window.start")).as("start_us"),
                  col("event_type"), col("n"), col("sum_value")),
      Some("""WITH e AS (SELECT epoch_us(ts) us, event_type, value FROM events),
        |w AS (
        |  SELECT (us // 900000000) * 900000000 - k * 900000000 AS start_us,
        |         event_type, value
        |  FROM e, (SELECT unnest(range(0, 4)) k)
        |  WHERE (us // 900000000) * 900000000 - k * 900000000
        |        + 3600000000 > us)
        |SELECT start_us, event_type, count(*) AS n,
        |  round(sum(value), 4) AS sum_value
        |FROM w GROUP BY start_us, event_type""".stripMargin)),

    // LOCF gap-fill (last observation carried forward): every event carries
    // the user's most recent purchase value at or before it — the window
    // IGNORE NULLS vocabulary (`last(expr, ignoreNulls)` / SQL
    // `last_value(... IGNORE NULLS)`), and the standard feature-engineering
    // backfill. One shuffle on user_id; the running window is linear.
    GraftQuery(
      "events_locf",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        events(s, dir)
          .withColumn("ts_us", unix_micros(col("ts")))
          .withColumn("pv",
            when(col("event_type") === "purchase", col("value")))
          .select(col("user_id"), col("event_id"), col("ts_us"),
                  round(last(col("pv"), ignoreNulls = true).over(w), 4)
                    .as("last_purchase_value"))
      },
      Some("""SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |  round(last_value(CASE WHEN event_type = 'purchase' THEN value END
        |                   IGNORE NULLS)
        |        OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
        |    AS last_purchase_value
        |FROM events""".stripMargin)),

    // Funnel analysis: users progressing view → click → purchase, each
    // stage strictly after the previous one. Three stage-aggregations
    // joined per user; one row out.
    GraftQuery(
      "events_funnel",
      (s, dir) => {
        val ev = events(s, dir)
        val views = ev.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min(col("ts")).as("t_view"))
        val clicks = ev.filter(col("event_type") === "click").as("c")
          .join(views, "user_id")
          .filter(col("c.ts") > col("t_view"))
          .groupBy("user_id").agg(min(col("c.ts")).as("t_click"))
        val buys = ev.filter(col("event_type") === "purchase").as("p")
          .join(clicks, "user_id")
          .filter(col("p.ts") > col("t_click"))
          .groupBy("user_id").agg(min(col("p.ts")).as("t_buy"))
        views.agg(count("*").as("n_view")).crossJoin(
          clicks.agg(count("*").as("n_view_click"))).crossJoin(
          buys.agg(count("*").as("n_view_click_buy")))
      },
      Some("""WITH v AS (
        |  SELECT user_id, min(ts) t_view FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, min(e.ts) t_click
        |  FROM events e JOIN v USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > v.t_view
        |  GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, min(e.ts) t_buy
        |  FROM events e JOIN c USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        |  GROUP BY e.user_id)
        |SELECT (SELECT count(*) FROM v) AS n_view,
        |       (SELECT count(*) FROM c) AS n_view_click,
        |       (SELECT count(*) FROM p) AS n_view_click_buy""".stripMargin)),

    // Gap-based sessionization: a >30-minute silence starts a new session.
    // lag → flag → running sum (the classic sessionize plan); epoch-µs
    // comparisons keep the gap test engine-exact.
    GraftQuery(
      "events_sessionize",
      (s, dir) => {
        val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val run = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        events(s, dir)
          .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
          .withColumn("new_session",
            when(col("prev_us").isNull ||
                 unix_micros(col("ts")) - col("prev_us") > 1800000000L, 1L)
              .otherwise(0L))
          .withColumn("session_id", sum(col("new_session")).over(run))
          .groupBy("user_id", "session_id")
          // session_start_us is the session's stable identity — the same
          // key the streaming sessionizer emits (ordinal ids need unbounded
          // per-user state there; see EventStreams.SessionOut)
          .agg(min(unix_micros(col("ts"))).as("session_start_us"),
               count("*").as("n_events"),
               round(sum(col("value")), 4).as("sum_value"))
      },
      Some("""WITH flagged AS (
        |  SELECT user_id, value,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS new_session,
        |    ts, event_id
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, value, ts,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id, epoch_us(min(ts)) AS session_start_us,
        |  count(*) AS n_events,
        |  round(sum(value), 4) AS sum_value
        |FROM sess GROUP BY user_id, session_id""".stripMargin)),

    // Native session_window sessionization — same gap semantics as
    // events_sessionize but through Spark's built-in session-window
    // operator (UpdatingSessions/MergingSessionsExec — sort-based session
    // merge within the user partition, the same physical machinery the
    // streaming engine uses), not a hand-rolled lag/cumsum. Boundary
    // nuance: sessions merge on TOUCHING windows, so an event at EXACTLY
    // prev + gap still MERGES into the session (verified empirically on
    // Spark 4.1.2: two events exactly 30 min apart yield one session with
    // end = last ts + gap; StreamingSpec pins it) — the oracle flags
    // new_session on diff > gap, same boundary as the lag/cumsum twin.
    GraftQuery(
      "events_session_window",
      (s, dir) =>
        events(s, dir)
          .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
          .agg(count(lit(1)).as("n_events"),
               round(sum(col("value")), 4).as("sum_value"))
          .select(col("user_id"),
                  unix_micros(col("session_window.start")).as("start_us"),
                  unix_micros(col("session_window.end")).as("end_us"),
                  col("n_events"), col("sum_value")),
      Some("""WITH flagged AS (
        |  SELECT user_id, value, ts,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS new_session, event_id
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, value, ts,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS session_id
        |  FROM flagged)
        |SELECT user_id, epoch_us(min(ts)) AS start_us,
        |  epoch_us(max(ts)) + 1800000000 AS end_us,
        |  count(*) AS n_events, round(sum(value), 4) AS sum_value
        |FROM sess GROUP BY user_id, session_id""".stripMargin)),

    // AS-OF join: each purchase joined to the same user's most recent click
    // at or before it (attribution), through the reusable
    // `graft.implicits.asofJoin` operator — union + ordered window with
    // last(_, ignoreNulls): ONE shuffle on user_id, linear work, no
    // candidate-pair blowup regardless of how many clicks precede a
    // purchase. rightOrder=click_id makes the equal-timestamp pick the max
    // click_id, matching the oracle's per-(user, ts) max collapse.
    GraftQuery(
      "events_asof_join",
      (s, dir) => {
        import graft.implicits._
        val ev = events(s, dir).withColumn("ts_us", unix_micros(col("ts")))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts_us"), col("event_id").as("click_id"))
        val buys = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id"),
                  col("ts_us"))
        buys.asofJoin(clicks, on = Seq("user_id"),
                      leftTime = "ts_us", rightTime = "ts_us",
                      prefix = "c_", rightOrder = Seq("click_id"))
          .select(col("purchase_id"), col("user_id"), col("ts_us"),
                  col("c_click_id").as("click_id"),
                  col("c_ts_us").as("click_ts_us"))
      },
      Some("""WITH c AS (
        |  SELECT user_id, epoch_us(ts) ts_us, max(event_id) click_id
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |p AS (
        |  SELECT user_id, epoch_us(ts) ts_us, event_id
        |  FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id AS purchase_id, p.user_id, p.ts_us,
        |       c.click_id, c.ts_us AS click_ts_us
        |FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.user_id AND p.ts_us >= c.ts_us""".stripMargin)),

    // RANGE join: concurrent activity per session — count other users'
    // events inside each session's active window (start .. end + the 30-min
    // timeout). Spark would execute the raw inequality join as a
    // broadcast-nested-loop; the scale path is bin-bucketing: intervals
    // explode to the hour bins they cover, points map to exactly one bin,
    // the join is an equi-join on the bin plus an exact range filter. A
    // point lands in one bin, so no post-join dedup is needed. The oracle
    // runs the raw inequality join (DuckDB IEJoin).
    GraftQuery(
      "events_range_join",
      (s, dir) => {
        val binUs = 3600000000L // 1 h
        val ev = events(s, dir).withColumn("ts_us", unix_micros(col("ts")))
        val byUser = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        val run = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val sessions = ev
          .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
          .withColumn("new_session",
            when(col("prev_us").isNull ||
                 col("ts_us") - col("prev_us") > 1800000000L, 1L).otherwise(0L))
          .withColumn("session_id", sum(col("new_session")).over(run))
          .groupBy("user_id", "session_id")
          .agg(min("ts_us").as("start_us"),
               (max("ts_us") + 1800000000L).as("until_us"))
        import graft.implicits._
        val points = ev.select(col("user_id").as("p_user"), col("ts_us"))
        sessions.rangeJoinBinned(points, "start_us", "until_us", "ts_us",
                                 binWidth = binUs)
          .filter(col("p_user") =!= col("user_id"))
          .groupBy("user_id", "start_us")
          .agg(count("*").as("n_concurrent"))
      },
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) ts_us, event_id FROM events),
        |flagged AS (
        |  SELECT user_id, ts_us,
        |    CASE WHEN lag(ts_us) OVER w IS NULL
        |           OR ts_us - lag(ts_us) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |sess AS (
        |  SELECT user_id, ts_us,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM flagged),
        |iv AS (
        |  SELECT user_id, min(ts_us) start_us, max(ts_us) + 1800000000 until_us
        |  FROM sess GROUP BY user_id, session_id)
        |SELECT iv.user_id, iv.start_us, count(*) AS n_concurrent
        |FROM iv JOIN e p
        |  ON p.user_id != iv.user_id
        | AND p.ts_us >= iv.start_us AND p.ts_us <= iv.until_us
        |GROUP BY 1, 2""".stripMargin)),

    // Cohort retention: users grouped by their first-activity date, counted
    // distinctly in each subsequent week offset — the canonical
    // product-analytics cohort matrix. Two shuffles (first-touch per user,
    // then the cohort-cell aggregation); the user set per cell is a
    // count-distinct, partial-aggregated map-side.
    GraftQuery(
      "events_retention",
      (s, dir) => {
        val ev = events(s, dir)
          .select(col("user_id"), to_date(col("ts")).as("d"))
        val first = ev.groupBy("user_id").agg(min("d").as("cohort_d"))
        ev.join(first, "user_id")
          .withColumn("week_offset",
            floor(datediff(col("d"), col("cohort_d")) / 7).cast("long"))
          .groupBy("cohort_d", "week_offset")
          .agg(countDistinct("user_id").as("n_users"))
      },
      Some("""WITH ev AS (
        |  SELECT user_id, CAST(ts AS DATE) d FROM events),
        |f AS (SELECT user_id, min(d) cohort_d FROM ev GROUP BY 1)
        |SELECT cohort_d,
        |  CAST(date_diff('day', cohort_d, d) // 7 AS BIGINT) AS week_offset,
        |  count(DISTINCT user_id) AS n_users
        |FROM ev JOIN f USING (user_id)
        |GROUP BY 1, 2""".stripMargin)),

    // Event-type transition matrix (first-order Markov counts): consecutive
    // event-type pairs per user in time order — the sequence-model view of
    // a clickstream. One lag window on user_id, one aggregation; the
    // transition probability stays a ratio of the emitted integers.
    GraftQuery(
      "events_transitions",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        events(s, dir)
          .withColumn("ts_us", unix_micros(col("ts")))
          .withColumn("prev_type", lag("event_type", 1).over(w))
          .filter(col("prev_type").isNotNull)
          .groupBy(col("prev_type"), col("event_type").as("next_type"))
          .agg(count(lit(1)).as("n"))
      },
      Some("""WITH x AS (
        |  SELECT event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS prev_type
        |  FROM events)
        |SELECT prev_type, event_type AS next_type, count(*) AS n
        |FROM x WHERE prev_type IS NOT NULL
        |GROUP BY 1, 2""".stripMargin)),

    // Daily-volume anomaly days per event type — |z| > 2 against the
    // type's own daily distribution, computed ENTIRELY in exact integer
    // arithmetic: |x - μ| > 2σ  ⇔  (n·x − Σx)² · (n−1) > 4·n·(n·Σx² − (Σx)²)
    // (both sides scaled by n²·(n−1); sample variance). No float mean, no
    // stddev call, no rounding hazard — counts are ints, so the flag is
    // bit-identical in any engine. Two aggregations: daily counts, then
    // per-type moments broadcast back onto the (small) daily table.
    GraftQuery(
      "events_anomaly",
      (s, dir) => {
        val daily = events(s, dir)
          .groupBy(col("event_type"), to_date(col("ts")).as("d"))
          .agg(count(lit(1)).as("cnt"))
        val moments = daily.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("cnt").as("sx"),
               sum(col("cnt") * col("cnt")).as("sxx"))
        daily.join(broadcast(moments), "event_type")
          .withColumn("dev", col("n") * col("cnt") - col("sx"))
          .withColumn("is_anomaly",
            col("dev") * col("dev") * (col("n") - 1) >
              lit(4) * col("n") * (col("n") * col("sxx") - col("sx") * col("sx")))
          .select(col("event_type"), col("d"), col("cnt"), col("is_anomaly"))
      },
      Some("""WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) d, count(*) cnt
        |  FROM events GROUP BY 1, 2),
        |m AS (
        |  SELECT event_type, count(*) n, CAST(sum(cnt) AS BIGINT) sx,
        |    CAST(sum(cnt * cnt) AS BIGINT) sxx
        |  FROM daily GROUP BY 1)
        |SELECT event_type, d, cnt,
        |  (n * cnt - sx) * (n * cnt - sx) * (n - 1)
        |    > 4 * n * (n * sxx - sx * sx) AS is_anomaly
        |FROM daily JOIN m USING (event_type)""".stripMargin)),

    // Burst debounce: drop an event arriving within 30 min of the PREVIOUS
    // event of the same (user, type) — raw-predecessor semantics (the
    // predecessor counts even if it was itself dropped), the standard
    // telemetry-dedup variant that needs only one lag, no session chain.
    // One shuffle on (user, type); ties in ts break on event_id.
    GraftQuery(
      "events_dedup_burst",
      (s, dir) => {
        val w = Window.partitionBy("user_id", "event_type")
          .orderBy("ts_us", "event_id")
        events(s, dir)
          .withColumn("ts_us", unix_micros(col("ts")))
          .withColumn("prev_us", lag("ts_us", 1).over(w))
          .withColumn("kept",
            col("prev_us").isNull ||
              col("ts_us") - col("prev_us") >= lit(1800000000L))
          .groupBy("event_type")
          .agg(count(when(col("kept"), 1)).as("n_kept"),
               count(when(!col("kept"), 1)).as("n_dropped"),
               min(when(col("kept"), col("event_id"))).as("first_kept_id"))
      },
      Some("""WITH x AS (
        |  SELECT event_type, event_id,
        |    epoch_us(ts) - lag(epoch_us(ts)) OVER
        |      (PARTITION BY user_id, event_type
        |       ORDER BY epoch_us(ts), event_id) AS d
        |  FROM events)
        |SELECT event_type,
        |  count(*) FILTER (d IS NULL OR d >= 1800000000) AS n_kept,
        |  count(*) FILTER (d < 1800000000) AS n_dropped,
        |  min(event_id) FILTER (d IS NULL OR d >= 1800000000)
        |    AS first_kept_id
        |FROM x GROUP BY event_type""".stripMargin)),
  )
}
