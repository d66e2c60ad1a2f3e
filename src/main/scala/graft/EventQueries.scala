package graft

import graft.operators.EventWindows._

/** Event-time windowing inventory (reference surface A1–A5, F1–F6).
  * Oracle notes: Spark's `window()` is epoch-aligned, so tumbling starts are
  * `date_trunc`/epoch arithmetic; sliding windows enumerate the 4 slides an
  * event belongs to via a VALUES cross join; sessions are gaps-and-islands.
  */
object EventQueries {

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q20_win_tumbling", (s, d) => tumbling(s, d), Some(
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start,
        |  COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signups,
        |  COUNT(*) AS n_events
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef("q21_win_tumbling_keyed", (s, d) => tumblingKeyed(s, d), Some(
      """SELECT event_type,
        |  CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    QueryDef("q22_win_sliding", (s, d) => sliding(s, d), Some(
      """SELECT ws AS window_start,
        |  COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signups,
        |  COUNT(*) AS n_events
        |FROM (
        |  SELECT e.*, (CAST(floor(epoch(ts) / 900) AS BIGINT) - t.i) * 900 AS ws
        |  FROM events e CROSS JOIN (VALUES (0),(1),(2),(3)) t(i)
        |) GROUP BY ws ORDER BY ws""".stripMargin)),

    QueryDef("q23_win_session", (s, d) => sessions(s, d), Some(
      """WITH marked AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |           OR ts >= lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |                + INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events),
        |ids AS (
        |  SELECT user_id, ts,
        |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        |  FROM marked)
        |SELECT user_id,
        |  epoch_ms(MIN(ts)) AS session_start_ms,
        |  epoch_ms(MAX(ts)) - epoch_ms(MIN(ts)) AS span_ms,
        |  COUNT(*) AS n_events
        |FROM ids GROUP BY user_id, sess
        |ORDER BY user_id, session_start_ms""".stripMargin)),

    QueryDef("q24_count_trigger", (s, d) => countTrigger(s, d), Some(
      """WITH o AS (
        |  SELECT ROW_NUMBER() OVER (ORDER BY ts, event_id) AS rn,
        |    CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
        |      OVER (ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_signups
        |  FROM events)
        |SELECT CAST(rn / 5 AS BIGINT) AS fire_seq, cum_signups
        |FROM o WHERE rn % 5 = 0 ORDER BY fire_seq""".stripMargin)),

    QueryDef("q25_props_extract", (s, d) => propsExtract(s, d), Some(
      """SELECT CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT) % 10 AS k_bucket,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef("q26_type_stats", (s, d) => typeStats(s, d), Some(
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  MIN(value) AS min_value, MAX(value) AS max_value,
        |  COUNT(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef("q28_asof_join", (s, d) => asofSignupToPurchase(s, d), Some(
      """SELECT p.user_id, epoch_ms(p.ts) AS ts_ms,
        |  epoch_ms(p.ts) - epoch_ms(s.ts) AS since_ms
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
        |  ON p.user_id = s.user_id AND s.ts <= p.ts
        |ORDER BY 1, 2""".stripMargin)),

    QueryDef("q29_range_join", (s, d) => signupFollowups(s, d), Some(
      """SELECT s.user_id, epoch_ms(s.ts) AS signup_ms, COUNT(e.ts) AS n_following
        |FROM (SELECT * FROM events WHERE event_type = 'signup') s
        |LEFT JOIN events e
        |  ON e.user_id = s.user_id AND e.ts > s.ts
        |    AND e.ts <= s.ts + INTERVAL 30 MINUTE
        |GROUP BY 1, epoch_ms(s.ts) ORDER BY 1, 2""".stripMargin)),

    // q149: the NO-equi-key range join — q29's missing half. The oracle
    // runs the literal quadratic inequality join (DuckDB IEJoin); Spark
    // runs the time-bucket spelling (fan probe to buckets b-1/b/b+1,
    // equi-join on bucket, exact cut in the aggregate), proving the
    // rewrite equivalent. Totality: the probe's own bucket always holds
    // the probe itself, so zero-neighbor errors report 0, never vanish.
    QueryDef("q149_global_range_join", (s, d) =>
      nearbyEventPressure(s, d), Some(
      """SELECT err.event_id, epoch_ms(err.ts) AS ts_ms,
        |  COUNT(CASE WHEN e.event_id IS NOT NULL THEN 1 END) AS n_nearby,
        |  COUNT(CASE WHEN e.event_type = 'error' THEN 1 END)
        |    AS n_errors_nearby
        |FROM (SELECT * FROM events WHERE event_type = 'error') err
        |LEFT JOIN events e
        |  ON e.event_id <> err.event_id
        | AND abs(epoch_ms(e.ts) - epoch_ms(err.ts)) <= 60000
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin)),

    QueryDef("q60_trailing_window", (s, d) => trailingUserActivity(s, d), Some(
      """SELECT user_id, event_id,
        |  CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ts_s,
        |  COUNT(*) OVER w AS n_trailing_1h,
        |  round(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE), 6)
        |    AS sum_trailing_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY date_trunc('second', ts)
        |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, ts_s, event_id""".stripMargin)),

    QueryDef("q27_top_purchasers", (s, d) => topPurchasers(s, d), Some(
      """SELECT user_id,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS purchase_total,
        |  COUNT(*) AS n_purchases
        |FROM events WHERE event_type = 'purchase'
        |GROUP BY user_id ORDER BY purchase_total DESC, user_id LIMIT 20""".stripMargin)),

    // q82: ordered conversion funnel — each stage requires an event
    // strictly after the user's previous stage's first completion.
    QueryDef("q82_funnel", (s, d) => funnel(s, d), Some(
      """WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
        |            WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, MIN(ts) AS t2
        |       FROM events e JOIN s1 USING (user_id)
        |       WHERE event_type = 'click' AND ts > t1 GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, MIN(ts) AS t3
        |       FROM events e JOIN s2 USING (user_id)
        |       WHERE event_type = 'purchase' AND ts > t2 GROUP BY e.user_id),
        |c AS (
        |  SELECT '1_view' AS stage, COUNT(*) AS n FROM s1
        |  UNION ALL SELECT '2_click', COUNT(*) FROM s2
        |  UNION ALL SELECT '3_purchase', COUNT(*) FROM s3)
        |SELECT stage, n AS n_users,
        |  COALESCE((n * 1000000) // lag(n) OVER (ORDER BY stage), 1000000)
        |    AS conv_from_prev_micro
        |FROM c ORDER BY stage""".stripMargin)),

    // q83: weekly cohort retention on integer weeks since the corpus
    // epoch (no engine-specific week-start conventions).
    QueryDef("q83_cohort_retention", (s, d) => cohortRetention(s, d), Some(
      """WITH uw AS (
        |  SELECT DISTINCT user_id,
        |    CAST((CAST(ts AS DATE) - DATE '2024-01-01') // 7 AS BIGINT) AS wk
        |  FROM events),
        |c AS (SELECT user_id, MIN(wk) AS cohort_wk FROM uw GROUP BY user_id)
        |SELECT cohort_wk, wk - cohort_wk AS week_offset, COUNT(*) AS n_users
        |FROM uw JOIN c USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // q84: next-event transition matrix with micro-unit row-conditional
    // probabilities (END marks a user's final event).
    QueryDef("q84_transitions", (s, d) => eventTransitions(s, d), Some(
      """WITH p AS (
        |  SELECT event_type,
        |    COALESCE(lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id), 'END') AS next_type
        |  FROM events),
        |n AS (SELECT event_type, next_type, COUNT(*) AS n FROM p GROUP BY 1, 2),
        |t AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS row_total
        |      FROM n GROUP BY event_type)
        |SELECT event_type, next_type, n, (n * 1000000) // row_total AS p_micro
        |FROM n JOIN t USING (event_type)
        |ORDER BY event_type, next_type""".stripMargin)),

    // q89: RFM quartile segmentation — exact global ranks via the q24
    // two-pass bucket-offset shape (the oracle can afford the naive
    // global ROW_NUMBER spelling; the ranks are identical).
    QueryDef("q89_rfm", (s, d) => rfmSegments(s, d), Some(
      """WITH p AS (SELECT user_id, ts, CAST(value AS DECIMAL(18,2)) AS v
        |           FROM events WHERE event_type = 'purchase'),
        |mx AS (SELECT MAX(ts) AS mx FROM p),
        |u0 AS (SELECT user_id, MAX(ts) AS last_ts, COUNT(*) AS f_cnt,
        |         SUM(v) AS m_total FROM p GROUP BY user_id),
        |u AS (SELECT user_id,
        |        (epoch_ms(mx) - epoch_ms(last_ts)) // 86400000 AS r_days,
        |        f_cnt, CAST(m_total * 100 AS BIGINT) AS m_cents
        |      FROM u0 CROSS JOIN mx),
        |n AS (SELECT COUNT(*) AS n_total FROM u),
        |r AS (SELECT user_id, m_cents,
        |        ROW_NUMBER() OVER (ORDER BY r_days, user_id) AS r_rank,
        |        ROW_NUMBER() OVER (ORDER BY f_cnt DESC, user_id) AS f_rank,
        |        ROW_NUMBER() OVER (ORDER BY m_cents DESC, user_id) AS m_rank
        |      FROM u)
        |SELECT concat('R', (4 * (r_rank - 1)) // n_total + 1,
        |              'F', (4 * (f_rank - 1)) // n_total + 1,
        |              'M', (4 * (m_rank - 1)) // n_total + 1) AS segment,
        |  COUNT(*) AS n_users, CAST(SUM(m_cents) AS BIGINT) AS sum_cents
        |FROM r CROSS JOIN n GROUP BY 1 ORDER BY 1""".stripMargin)),

    // q85: hourly volume anomalies — |c − μ| > 2σ as the exact integer
    // inequality (n·c − S)² > 4·(n·SS − S²), flagged identically by
    // both engines.
    QueryDef("q85_hourly_anomaly", (s, d) => hourlyAnomalies(s, d), Some(
      """WITH h AS (
        |  SELECT event_type, epoch_ms(ts) // 3600000 AS hr, COUNT(*) AS c
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type, COUNT(*) AS n_hours,
        |        CAST(SUM(c) AS BIGINT) AS s,
        |        CAST(SUM(c * c) AS BIGINT) AS ss
        |      FROM h GROUP BY event_type)
        |SELECT event_type, MAX(n_hours) AS n_hours,
        |  (MAX(s) * 1000000) // MAX(n_hours) AS mean_micro,
        |  CAST(SUM(CASE WHEN (n_hours * c - s) * (n_hours * c - s) >
        |    4 * (n_hours * ss - s * s) THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_anomalous
        |FROM h JOIN m USING (event_type)
        |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // q114: watermark-delay audit — late-drop rate per candidate delay;
    // arrival order = event_id, watermark = running max ts minus delay.
    QueryDef("q114_watermark_audit", (s, d) => watermarkAudit(s, d), Some(
      """WITH e AS (
        |  SELECT event_id, epoch_ms(ts) AS ms,
        |    epoch_ms(ts) + CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 10000 AS arrival
        |  FROM events),
        |r AS (
        |  SELECT event_id, ms,
        |    MAX(ms) OVER (ORDER BY arrival, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior
        |  FROM e),
        |ds AS (SELECT unnest(CAST([500, 1000, 5000, 30000] AS BIGINT[])) AS delay_ms)
        |SELECT delay_ms, COUNT(*) AS n_events,
        |  CAST(SUM(CASE WHEN prior IS NOT NULL AND ms < prior - delay_ms
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
        |  (CAST(SUM(CASE WHEN prior IS NOT NULL AND ms < prior - delay_ms
        |            THEN 1 ELSE 0 END) AS BIGINT) * 1000000) // COUNT(*)
        |    AS late_micro
        |FROM ds CROSS JOIN r
        |GROUP BY delay_ms ORDER BY delay_ms""".stripMargin)),

    // q109: inter-event gap percentiles per event type — the tuning
    // table for the q23 session gap and watermark delay. Gap = ms since
    // the same user's previous event, attributed to the later event.
    QueryDef("q109_gap_percentiles", (s, d) => gapPercentiles(s, d), Some(
      """WITH g AS (
        |  SELECT event_type,
        |    epoch_ms(ts) - epoch_ms(LAG(ts) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id)) AS gap_ms
        |  FROM events)
        |SELECT event_type, COUNT(*) AS n_gaps,
        |  round(quantile_cont(gap_ms, 0.5), 6) AS p50_ms,
        |  round(quantile_cont(gap_ms, 0.9), 6) AS p90_ms,
        |  round(quantile_cont(gap_ms, 0.99), 6) AS p99_ms,
        |  CAST(MAX(gap_ms) AS BIGINT) AS max_ms
        |FROM g WHERE gap_ms IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin))
  )
}
