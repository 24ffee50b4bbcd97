package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics in batch form — tumbling/sliding/session windows
  * over the `events` table. The reference has no streaming operators at
  * all (SURVEY.md §1.1: Kafka topics are scanned as bounded tables), so
  * these windows ARE the capability upgrade; graft.streaming.Streams runs
  * the same shapes incrementally with watermarks. Window starts are cast
  * to TIMESTAMP_NTZ so the DuckDB oracle's naive timestamps compare
  * byte-identically.
  */
object Events {

  val qs: Map[String, Q] = Map(

    // Tumbling 1-hour windows (Spark window(); duck time_bucket).
    "events_tumbling_window" -> Q.df(
      """SELECT CAST(time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS wstart,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(30,8))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY wstart ASC NULLS LAST, event_type ASC NULLS LAST""".stripMargin,
      headline = true) { (s, dir) =>
      Tables.t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          call_function("dsum8", col("value")).as("sum_value"))
        .select(col("window.start").cast("timestamp_ntz").as("wstart"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy(col("wstart").asc_nulls_last, col("event_type").asc_nulls_last)
    },

    // ---- 3-step conversion funnel (view → click → purchase) ----
    // Strictly-ordered steps per user, each within 7 days of the prior
    // step's FIRST occurrence — the standard funnel definition. Three
    // co-keyed aggregations chained by joins: every shuffle keys on
    // user_id, so the exchanges line up (AQE reuse) and per-user state is
    // one timestamp per stage — the plan a 100 TB event store wants
    // (never a per-user sort, never a cross of step events). Integer
    // outputs; the oracle replays the same chained-CTE funnel.
    "events_funnel_3step" -> Q.df(
      """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |v AS (SELECT user_id, MIN(ts) AS t_view FROM e
        |      WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, MIN(e.ts) AS t_click
        |      FROM e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v.t_view
        |        AND e.ts <= v.t_view + INTERVAL 7 DAY
        |      GROUP BY e.user_id),
        |p AS (SELECT e.user_id, MIN(e.ts) AS t_purchase
        |      FROM e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        |        AND e.ts <= c.t_click + INTERVAL 7 DAY
        |      GROUP BY e.user_id)
        |SELECT (SELECT COUNT(*) FROM v) AS n_view,
        |  (SELECT COUNT(*) FROM c) AS n_view_click,
        |  (SELECT COUNT(*) FROM p) AS n_view_click_purchase""".stripMargin) { (s, dir) =>
      val e = Tables.t(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("ts"))
      val v = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("t_view"))
      val c = e.filter(col("event_type") === "click").join(v, "user_id")
        .filter(col("ts") > col("t_view") &&
          col("ts") <= col("t_view") + expr("INTERVAL 7 DAY"))
        .groupBy("user_id").agg(min("ts").as("t_click"))
      val p = e.filter(col("event_type") === "purchase").join(c, "user_id")
        .filter(col("ts") > col("t_click") &&
          col("ts") <= col("t_click") + expr("INTERVAL 7 DAY"))
        .groupBy("user_id").agg(min("ts").as("t_purchase"))
      v.agg(count(lit(1)).as("n_view"))
        .crossJoin(c.agg(count(lit(1)).as("n_view_click")))
        .crossJoin(p.agg(count(lit(1)).as("n_view_click_purchase")))
    },

    // ---- weekly retention cohorts ----
    // Cohort = ISO week of each user's first event; the matrix counts
    // distinct users active again k weeks later (periods 0–3). Week
    // starts are Monday-aligned in both engines, so day-difference / 7
    // is an exact integer. Two co-keyed shuffles (first-week aggregate +
    // join back) and a sub-million-row matrix aggregate — per-user state
    // is one date, the cohort-report plan an event store runs at any n.
    "events_retention_cohorts" -> Q.df(
      """WITH e AS (SELECT user_id,
        |    date_trunc('week', CAST(ts AS TIMESTAMP)) AS wk FROM events),
        |coh AS (SELECT user_id, MIN(wk) AS cwk FROM e GROUP BY user_id),
        |act AS (SELECT DISTINCT user_id, cwk,
        |    CAST(date_diff('day', cwk, wk) / 7 AS BIGINT) AS period
        |  FROM e JOIN coh USING (user_id))
        |SELECT CAST(cwk AS TIMESTAMP) AS cohort_week, period, COUNT(*) AS n_users
        |FROM act WHERE period <= 3
        |GROUP BY 1, 2
        |ORDER BY cohort_week ASC NULLS LAST, period ASC NULLS LAST""".stripMargin) { (s, dir) =>
      val e = Tables.t(s, dir, "events")
        .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      val coh = e.groupBy("user_id").agg(min("wk").as("cwk"))
      val act = e.join(coh, "user_id")
        .select(col("user_id"), col("cwk"),
          (datediff(col("wk"), col("cwk")) / 7).cast("long").as("period"))
        .distinct()
      act.filter(col("period") <= 3)
        .groupBy(col("cwk"), col("period"))
        .agg(count(lit(1)).as("n_users"))
        .select(col("cwk").cast("timestamp_ntz").as("cohort_week"),
          col("period"), col("n_users"))
        .orderBy(col("cohort_week").asc_nulls_last, col("period").asc_nulls_last)
    },

    // Sliding 2-hour windows advancing hourly — every event lands in two
    // windows; the duck oracle unnests the two containing window starts.
    "events_sliding_window" -> Q.df(
      """SELECT wstart, COUNT(*) AS n
        |FROM (
        |  SELECT CAST(unnest([
        |      time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) - INTERVAL 1 HOUR,
        |      time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP))]) AS TIMESTAMP) AS wstart
        |  FROM events) t
        |GROUP BY wstart
        |ORDER BY wstart ASC NULLS LAST""".stripMargin) { (s, dir) =>
      Tables.t(s, dir, "events")
        .groupBy(window(col("ts"), "2 hours", "1 hour"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").cast("timestamp_ntz").as("wstart"), col("n"))
        .orderBy(col("wstart").asc_nulls_last)
    },

    // Session windows with a 4-hour inactivity gap per user
    // (session_window(); duck gaps-and-islands with lag()).
    "events_session_window" -> Q.df(
      """SELECT user_id, CAST(MIN(ts2) AS TIMESTAMP) AS session_start,
        |  COUNT(*) AS n_events
        |FROM (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts2,
        |    SUM(CASE WHEN prev_ts IS NULL
        |          OR CAST(ts AS TIMESTAMP) - prev_ts > INTERVAL 4 HOUR THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM (
        |    SELECT user_id, event_id, ts,
        |      lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC) AS prev_ts
        |    FROM events) x) y
        |GROUP BY user_id, session_id
        |ORDER BY user_id ASC NULLS LAST, session_start ASC NULLS LAST""".stripMargin) { (s, dir) =>
      Tables.t(s, dir, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "4 hours"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          col("session_window.start").cast("timestamp_ntz").as("session_start"),
          col("n_events"))
        .orderBy(col("user_id").asc_nulls_last, col("session_start").asc_nulls_last)
    },

    // Rolling event-time rate per user: a RANGE frame bounded by a TIME
    // interval (1 hour preceding) rather than a row count — the
    // per-entity rolling counter/limiter every event pipeline runs. The
    // frame is event-time-driven, so row-count frames cannot express it;
    // both engines bound the frame by ts arithmetic and include ts peers.
    // The windowed SUM rides the exact-decimal pattern so frame
    // accumulation order cannot perturb the double.
    "events_rolling_rate" -> Q.sql(
      spark = """SELECT user_id, event_id,
        |  CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
        |    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS BIGINT) AS events_last_hour,
        |  ROUND(CAST(SUM(CAST(value AS DECIMAL(30,8))) OVER (PARTITION BY user_id ORDER BY ts
        |    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS DOUBLE), 4) AS value_last_hour
        |FROM events
        |WHERE user_id < 10
        |ORDER BY user_id ASC NULLS LAST, event_id ASC NULLS LAST""".stripMargin,
      duck = """SELECT user_id, event_id,
        |  CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)
        |    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS BIGINT) AS events_last_hour,
        |  ROUND(CAST(SUM(CAST(value AS DECIMAL(30,8))) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)
        |    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS DOUBLE), 4) AS value_last_hour
        |FROM events
        |WHERE user_id < 10
        |ORDER BY user_id ASC NULLS LAST, event_id ASC NULLS LAST""".stripMargin),

    // Event-time top event per user per day: the enrichment join + window
    // pattern every event pipeline runs (events × customer-like dim would
    // go the same way; user ids are synthetic here).
    "events_daily_top_type" -> Q.sql(
      spark = """SELECT user_id, day, event_type, n FROM (
        |  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP_NTZ) AS day, event_type,
        |    COUNT(*) AS n,
        |    row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
        |      ORDER BY COUNT(*) DESC, event_type ASC) AS rk
        |  FROM events
        |  WHERE user_id < 20
        |  GROUP BY user_id, date_trunc('day', ts), event_type) t
        |WHERE rk = 1
        |ORDER BY user_id ASC NULLS LAST, day ASC NULLS LAST""".stripMargin,
      duck = """SELECT user_id, day, event_type, n FROM (
        |  SELECT user_id, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day, event_type,
        |    COUNT(*) AS n,
        |    row_number() OVER (PARTITION BY user_id, date_trunc('day', CAST(ts AS TIMESTAMP))
        |      ORDER BY COUNT(*) DESC, event_type ASC) AS rk
        |  FROM events
        |  WHERE user_id < 20
        |  GROUP BY user_id, date_trunc('day', CAST(ts AS TIMESTAMP)), event_type) t
        |WHERE rk = 1
        |ORDER BY user_id ASC NULLS LAST, day ASC NULLS LAST""".stripMargin),

    // Semi-structured event properties through the native Presto JSONPath
    // walker (functions/PrestoJson.scala's json_extract_scalar — the
    // reference's JsonExtract.java semantics) aggregated per event type;
    // DuckDB re-derives with its own JSON extension. The decode runs
    // inside the scan projection — no UDF boundary, stream-safe.
    // As-of join: each click paired with the user's most recent view at
    // or before it — the time-series lookup the prompt-level surveys file
    // under "as-of join" (DuckDB runs its native ASOF LEFT JOIN as the
    // oracle). Rides the first-class operators/AsofJoin.backward —
    // the SCALABLE as-of form: union both sides, one window per user
    // ordered by (time, side, tiebreak) carrying the last non-null view
    // id — never the click×view range product a naive range join
    // materializes (quadratic per user), and one shuffle on user_id
    // total. Views order before clicks at equal timestamps so the join
    // is inclusive (≤), matching ASOF semantics; -1 marks clicks with
    // no prior view (keeps the column int64 both engines). Tied view
    // timestamps per user are resolved deterministically on BOTH sides:
    // the operator's tiebreak picks the max view_id among equal-ts
    // views, and the oracle pre-dedupes views to max(event_id) per
    // (user_id, vts) before its ASOF join (ASOF is otherwise free to
    // pick any tied row).
    "events_asof_join" -> Q.df(duck =
      """WITH clicks AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS cts
        |  FROM events WHERE event_type = 'click'),
        |views AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS vts, MAX(event_id) AS view_id
        |  FROM events WHERE event_type = 'view'
        |  GROUP BY user_id, CAST(ts AS TIMESTAMP))
        |SELECT c.user_id AS user_id, c.event_id AS event_id,
        |  COALESCE(v.view_id, -1) AS view_id
        |FROM clicks c ASOF LEFT JOIN views v
        |  ON c.user_id = v.user_id AND v.vts <= c.cts
        |ORDER BY user_id ASC NULLS LAST, event_id ASC NULLS LAST""".stripMargin,
      headline = true) { (s, dir) =>
      val ev = Tables.t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("vts"), col("event_id").as("view_id"))
      // tiebreak = max view_id among equal-ts views, matching the oracle's
      // pre-dedupe of views to MAX(event_id) per (user_id, vts)
      graft.operators.AsofJoin.backward(clicks, views,
          on = Seq("user_id"), leftTime = "ts", rightTime = "vts",
          payload = Seq("view_id"), rightTiebreak = Seq("view_id"))
        .select(col("user_id"), col("event_id"),
          coalesce(col("view_id"), lit(-1L)).as("view_id"))
        .orderBy(col("user_id").asc_nulls_last, col("event_id").asc_nulls_last)
    },

    // The tie-dense as-of: timestamps truncated to the HOUR, so most
    // (user, time) groups carry many tied views and clicks — hammering
    // the inclusive bound (views sort before clicks at equal time) and
    // the deterministic max-tiebreak against DuckDB's native ASOF, which
    // needs the same pre-dedupe to be well-defined under ties.
    "events_asof_ties" -> Q.df(
      """WITH clicks AS (
        |  SELECT user_id, event_id,
        |    date_trunc('hour', CAST(ts AS TIMESTAMP)) AS cts
        |  FROM events WHERE event_type = 'click'),
        |views AS (
        |  SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS vts,
        |    MAX(event_id) AS view_id
        |  FROM events WHERE event_type = 'view'
        |  GROUP BY user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)))
        |SELECT c.user_id AS user_id, c.event_id AS event_id,
        |  COALESCE(v.view_id, -1) AS view_id
        |FROM clicks c ASOF LEFT JOIN views v
        |  ON c.user_id = v.user_id AND v.vts <= c.cts
        |ORDER BY user_id ASC NULLS LAST, event_id ASC NULLS LAST""".stripMargin) { (s, dir) =>
      val ev = Tables.t(s, dir, "events")
        .withColumn("hts", date_trunc("hour", col("ts")))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id"), col("hts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("hts").as("vts"), col("event_id").as("view_id"))
      graft.operators.AsofJoin.backward(clicks, views,
          on = Seq("user_id"), leftTime = "hts", rightTime = "vts",
          payload = Seq("view_id"), rightTiebreak = Seq("view_id"))
        .select(col("user_id"), col("event_id"),
          coalesce(col("view_id"), lit(-1L)).as("view_id"))
        .orderBy(col("user_id").asc_nulls_last, col("event_id").asc_nulls_last)
    },

    // The SLICED as-of arm (AsofJoin.backwardSliced — per-(user, 6h-slice)
    // windows + per-user boundary carry, the hot-key decomposition
    // rehearsed in SCALE_r14 `asofskew`) against the SAME DuckDB ASOF
    // oracle as events_asof_join: the skew arm is driver-gated
    // value-identical to the semantics, not just spec-locked against the
    // single-window arm.
    "events_asof_sliced" -> Q.df(
      """WITH clicks AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS cts
        |  FROM events WHERE event_type = 'click'),
        |views AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS vts, MAX(event_id) AS view_id
        |  FROM events WHERE event_type = 'view'
        |  GROUP BY user_id, CAST(ts AS TIMESTAMP))
        |SELECT c.user_id AS user_id, c.event_id AS event_id,
        |  COALESCE(v.view_id, -1) AS view_id
        |FROM clicks c ASOF LEFT JOIN views v
        |  ON c.user_id = v.user_id AND v.vts <= c.cts
        |ORDER BY user_id ASC NULLS LAST, event_id ASC NULLS LAST""".stripMargin) { (s, dir) =>
      val ev = Tables.t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("vts"), col("event_id").as("view_id"))
      graft.operators.AsofJoin.backwardSliced(clicks, views,
          on = Seq("user_id"), leftTime = "ts", rightTime = "vts",
          payload = Seq("view_id"), sliceWidth = 6 * 3600.0,
          rightTiebreak = Seq("view_id"))
        .select(col("user_id"), col("event_id"),
          coalesce(col("view_id"), lit(-1L)).as("view_id"))
        .orderBy(col("user_id").asc_nulls_last, col("event_id").asc_nulls_last)
    },

    // The AUTO as-of arm (AsofJoin.auto — one bounded per-key stats pass
    // picks single-window vs sliced and derives the slice width; verdict
    // r14 ask #2) against the SAME DuckDB ASOF oracle: whichever arm the
    // measurement picks at this scale must stay value-identical.
    "events_asof_auto" -> Q.df(
      """WITH clicks AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS cts
        |  FROM events WHERE event_type = 'click'),
        |views AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS vts, MAX(event_id) AS view_id
        |  FROM events WHERE event_type = 'view'
        |  GROUP BY user_id, CAST(ts AS TIMESTAMP))
        |SELECT c.user_id AS user_id, c.event_id AS event_id,
        |  COALESCE(v.view_id, -1) AS view_id
        |FROM clicks c ASOF LEFT JOIN views v
        |  ON c.user_id = v.user_id AND v.vts <= c.cts
        |ORDER BY user_id ASC NULLS LAST, event_id ASC NULLS LAST""".stripMargin) { (s, dir) =>
      val ev = Tables.t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("vts"), col("event_id").as("view_id"))
      graft.operators.AsofJoin.auto(clicks, views,
          on = Seq("user_id"), leftTime = "ts", rightTime = "vts",
          payload = Seq("view_id"), rightTiebreak = Seq("view_id"))
        .select(col("user_id"), col("event_id"),
          coalesce(col("view_id"), lit(-1L)).as("view_id"))
        .orderBy(col("user_id").asc_nulls_last, col("event_id").asc_nulls_last)
    },

    // The FORWARD as-of direction — each view paired with the user's
    // FIRST click at or after it (time-to-conversion shape). DuckDB's
    // ASOF accepts the <= inequality natively; the Spark side is
    // AsofJoin.forward, the same one-shuffle union+window with the time
    // ordering reversed. Same tie discipline as the backward query:
    // clicks pre-deduped to MAX(event_id) per (user, ts) in the oracle,
    // the operator's tiebreak picking the max click_id among equal-ts.
    "events_asof_forward" -> Q.df(
      """WITH views AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS vts
        |  FROM events WHERE event_type = 'view'),
        |clicks AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS cts, MAX(event_id) AS click_id
        |  FROM events WHERE event_type = 'click'
        |  GROUP BY user_id, CAST(ts AS TIMESTAMP))
        |SELECT v.user_id AS user_id, v.event_id AS event_id,
        |  COALESCE(c.click_id, -1) AS click_id
        |FROM views v ASOF LEFT JOIN clicks c
        |  ON v.user_id = c.user_id AND v.vts <= c.cts
        |ORDER BY user_id ASC NULLS LAST, event_id ASC NULLS LAST""".stripMargin) { (s, dir) =>
      val ev = Tables.t(s, dir, "events")
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("cts"), col("event_id").as("click_id"))
      graft.operators.AsofJoin.forward(views, clicks,
          on = Seq("user_id"), leftTime = "ts", rightTime = "cts",
          payload = Seq("click_id"), rightTiebreak = Seq("click_id"))
        .select(col("user_id"), col("event_id"),
          coalesce(col("click_id"), lit(-1L)).as("click_id"))
        .orderBy(col("user_id").asc_nulls_last, col("event_id").asc_nulls_last)
    },

    // The forward SLICED arm under the same forward-ASOF oracle — both
    // directions of the skew decomposition are driver-gated, not just
    // the backward one.
    "events_asof_fwd_sliced" -> Q.df(
      """WITH views AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS vts
        |  FROM events WHERE event_type = 'view'),
        |clicks AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS cts, MAX(event_id) AS click_id
        |  FROM events WHERE event_type = 'click'
        |  GROUP BY user_id, CAST(ts AS TIMESTAMP))
        |SELECT v.user_id AS user_id, v.event_id AS event_id,
        |  COALESCE(c.click_id, -1) AS click_id
        |FROM views v ASOF LEFT JOIN clicks c
        |  ON v.user_id = c.user_id AND v.vts <= c.cts
        |ORDER BY user_id ASC NULLS LAST, event_id ASC NULLS LAST""".stripMargin) { (s, dir) =>
      val ev = Tables.t(s, dir, "events")
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("cts"), col("event_id").as("click_id"))
      graft.operators.AsofJoin.forwardSliced(views, clicks,
          on = Seq("user_id"), leftTime = "ts", rightTime = "cts",
          payload = Seq("click_id"), sliceWidth = 6 * 3600.0,
          rightTiebreak = Seq("click_id"))
        .select(col("user_id"), col("event_id"),
          coalesce(col("click_id"), lit(-1L)).as("click_id"))
        .orderBy(col("user_id").asc_nulls_last, col("event_id").asc_nulls_last)
    },

    // Range join on a TEMPORAL domain end-to-end: event timestamps joined
    // into half-open-by-construction session windows (each hour's first
    // 30 minutes) through the bucketed point-in-interval path — timestamps
    // double-cast to epoch seconds for quantization, the exact BETWEEN
    // verified on the timestamp values themselves. The oracle runs the
    // raw theta join; events in an hour's back half match no window and
    // drop (inner semantics), which keeps the match signal honest.
    "events_time_in_window" -> Q.df(
      """SELECT w_start, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(30,8))) AS DOUBLE) AS sum_value
        |FROM (SELECT CAST(ts AS TIMESTAMP) AS ets, value FROM events) e
        |JOIN (SELECT DISTINCT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS w_start,
        |        date_trunc('hour', CAST(ts AS TIMESTAMP)) + INTERVAL 30 MINUTE AS w_end
        |      FROM events) w
        |  ON e.ets >= w.w_start AND e.ets <= w.w_end
        |GROUP BY w_start
        |ORDER BY w_start ASC NULLS LAST""".stripMargin) { (s, dir) =>
      val ev = Tables.t(s, dir, "events")
      val points = ev.select(col("ts").as("ets"), col("value"))
      val windows = ev
        .select(date_trunc("hour", col("ts")).as("w_start")).distinct()
        .withColumn("w_end", col("w_start") + expr("INTERVAL 30 MINUTES"))
      graft.operators.RangeJoin.pointInInterval(points, "ets", windows, "w_start", "w_end")
        .groupBy(col("w_start"))
        .agg(count(lit(1)).as("n"),
          call_function("dsum8", col("value")).as("sum_value"))
        .orderBy(col("w_start").asc_nulls_last)
    },

    "events_props_json" -> Q.sql(
      spark = """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(CAST(json_extract_scalar(props, '$.k') AS INT) AS DECIMAL(30,8))) AS DOUBLE) AS sum_k,
        |  MIN(CAST(json_extract_scalar(props, '$.k') AS INT)) AS min_k,
        |  MAX(CAST(json_extract_scalar(props, '$.k') AS INT)) AS max_k
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type ASC NULLS LAST""".stripMargin,
      duck = """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(CAST(json_extract(props, '$.k') AS INTEGER) AS DECIMAL(30,8))) AS DOUBLE) AS sum_k,
        |  MIN(CAST(json_extract(props, '$.k') AS INTEGER)) AS min_k,
        |  MAX(CAST(json_extract(props, '$.k') AS INTEGER)) AS max_k
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type ASC NULLS LAST""".stripMargin)
  )
}
