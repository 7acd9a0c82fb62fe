package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch analytics over the `events` stream table. These are the batch
  * twins of [[graft.streaming.EventsStream]] — identical semantics, so the
  * streaming path is verified against the same oracle-checked results.
  *
  * The `ts` column reaches these operators as epoch-nanos LONG whatever
  * the parquet physical type: NANOS files are read losslessly as long
  * (see [[graft.GraftSession]]), µs TIMESTAMP/_NTZ files are widened by
  * [[graft.sources.Tables.normalizeTs]]. Flooring to seconds/hours is
  * exact integer arithmetic (double division would lose precision at
  * 1e18 ns). DuckDB's `epoch(ts)` sees the same second-floor values.
  */
object Events {

  /** Nanosecond long → floored epoch seconds (exact, integral `div`). */
  private def tsSeconds(c: String): org.apache.spark.sql.Column =
    expr(s"$c div 1000000000")

  /** Hourly tumbling aggregation per event type (map-side partial agg →
    * one shuffle on (hour, event_type)).
    */
  def hourly(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(
        timestamp_seconds(tsSeconds("ts") - (tsSeconds("ts") % 3600))
          .cast("timestamp_ntz").as("hour"),
        col("event_type"), col("value"))
      .groupBy("hour", "event_type")
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
      .orderBy("hour", "event_type")

  val hourlyOracle: String =
    """SELECT date_trunc('hour', ts) AS hour, event_type,
      |  count(*) AS n_events, round(sum(value), 2) AS total_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** Sliding-window aggregation — 1-hour windows every 15 minutes via
    * Spark's native `window(col, duration, slide)` fan-out (each event
    * lands in duration/slide = 4 windows, materialized MAP-SIDE by the
    * TimeWindow expression; the aggregation still shuffles once on
    * (window, event_type) with partial aggregation, so at 100 TB the
    * cost is 4× the map rows of [[hourly]], not 4 passes).
    * Window starts align to epoch multiples of the slide — the oracle
    * replays the same alignment in integer arithmetic.
    */
  def sliding(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(timestamp_seconds(tsSeconds("ts")).as("t"),
        col("event_type"), col("value"))
      .groupBy(window(col("t"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
      .select(col("w.start").cast("timestamp_ntz").as("win_start"),
        col("event_type"), col("n_events"), col("total_value"))
      .orderBy("win_start", "event_type")

  val slidingOracle: String =
    """WITH sec AS (
      |  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS s, event_type, value
      |  FROM events),
      |fan AS (
      |  SELECT make_timestamp((((s // 900) - k) * 900) * 1000000) AS win_start,
      |    event_type, value
      |  FROM sec, unnest([0, 1, 2, 3]) AS t(k))
      |SELECT win_start, event_type, count(*) AS n_events,
      |  round(sum(value), 2) AS total_value
      |FROM fan
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** Gap-based sessionization (30-min inactivity): lag + cumulative sum —
    * the classic two-window one-shuffle formulation. Partitioned by user,
    * so at 100 TB this scales with the user-key cardinality and AQE handles
    * hot users.
    */
  def sessionize(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), tsSeconds("ts").as("ts_s"))
      .withColumn("new_sess",
        when(col("ts_s") - lag("ts_s", 1).over(byUser) > 1800 ||
          lag("ts_s", 1).over(byUser).isNull, 1).otherwise(0))
      .withColumn("session_id", sum("new_sess").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        (max("ts_s") - min("ts_s")).as("duration_s"))
      .orderBy("user_id", "session_id")
  }

  /** Native `session_window` formulation of [[sessionize]] — the
    * built-in Catalyst session operator (MergingSessionsExec family)
    * instead of the two-window lag + cumulative-sum plan: one
    * aggregation keyed on (user, session), sessions merged by the
    * engine, no second windowing pass. Spark's merge rule is half-open
    * `[ts, ts + gap)`, so gap = 1801 s reproduces the lag form's
    * "strictly more than 1800 s apart closes" semantics exactly —
    * spec-pinned equal per user. The session end is `last + gap`, so
    * duration = end − start − gap.
    */
  def sessionizeNative(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("user_id"), timestamp_seconds(tsSeconds("ts")).as("t"))
      .groupBy(col("user_id"), session_window(col("t"), "1801 seconds").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").cast("long").as("start_s"),
        (col("w.end").cast("long") - col("w.start").cast("long") - 1801)
          .as("duration_s"),
        col("n_events"))
      .orderBy("user_id", "start_s")

  /** Semi-structured extraction: pull typed values out of the JSON props
    * column (codegen'd get_json_object — at scale this runs inside the
    * scan stage, no UDF).
    */
  def jsonExtract(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("bigint").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        round(avg(col("k").cast("double")), 4).as("avg_k"),
        max("k").as("max_k"))
      .orderBy("event_type")

  val jsonExtractOracle: String =
    """SELECT event_type, count(*) AS n_events,
      |  round(avg(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 4) AS avg_k,
      |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** Point-in-time (as-of) join: each event joined to the SAME user's most
    * recent purchase at-or-before it — the temporal-correctness join
    * feature stores need (no future leakage). Spark has no ASOF JOIN
    * operator; the scalable formulation is the union-marker trick: union
    * the probe and reference streams, ONE window over (user, time) carries
    * the last-seen reference value forward, filter back to probe rows.
    * Linear, a single shuffle on user_id — never a range join (a range
    * join would be O(events × purchases) per user at 100 TB) and never a
    * per-row subquery. Markers sort BEFORE probes at equal timestamps
    * (src 0 < 1) so an event at exactly the purchase time matches it,
    * matching DuckDB ASOF's `>=` semantics.
    */
  def asofLastPurchase(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), tsSeconds("ts").as("ts_s"),
        col("event_type"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_s").as("p_ts"))
    val tagged = ev
      .select(col("user_id"), col("ts_s"), col("event_id"),
        lit(null).cast("bigint").as("p_ts"), lit(1).as("src"))
      .unionByName(purchases.select(col("user_id"), col("p_ts").as("ts_s"),
        lit(null).cast("bigint").as("event_id"), col("p_ts"), lit(0).as("src")))
    val w = Window.partitionBy("user_id").orderBy("ts_s", "src")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("last_purchase_ts", last("p_ts", ignoreNulls = true).over(w))
      .filter(col("src") === 1)
      // INNER as-of for the oracle gate: events before the user's first
      // purchase drop out (oracle outputs stay null-free by policy —
      // SURVEY §6; left-join semantics = skip this filter, spec-covered)
      .filter(col("last_purchase_ts").isNotNull)
      .select(col("event_id"), col("user_id"), col("ts_s"),
        col("last_purchase_ts"),
        (col("ts_s") - col("last_purchase_ts")).as("secs_since_purchase"))
      .orderBy("event_id")
  }

  /** Oracle: DuckDB's native ASOF JOIN — an independent implementation
    * of the same point-in-time semantics.
    */
  val asofOracle: String =
    """WITH ev AS (
      |  SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
      |    event_type
      |  FROM events),
      |p AS (SELECT user_id, ts_s AS p_ts FROM ev WHERE event_type = 'purchase')
      |SELECT ev.event_id, ev.user_id, ev.ts_s,
      |  p.p_ts AS last_purchase_ts,
      |  ev.ts_s - p.p_ts AS secs_since_purchase
      |FROM ev ASOF JOIN p
      |  ON ev.user_id = p.user_id AND ev.ts_s >= p.p_ts
      |ORDER BY event_id""".stripMargin

  /** CDC-style latest-per-key compaction: collapse the event log to each
    * (user, event_type)'s most recent row — the upsert/compaction shape
    * every incrementally-maintained table (feature store, index refresh,
    * changelog materialization) needs.
    *
    * Scale design: `max(struct(ts, event_id, value))` is an ordinary
    * partial-aggregable aggregate — each map task keeps ONE candidate row
    * per key before the single shuffle, so 100 TB of history compacts
    * with no per-key sort and no window (the window formulation shuffles
    * AND sorts every historical row). `event_id` is unique, so the
    * struct comparison never reaches `value` — ties at the same second
    * resolve deterministically by event id in both engines.
    */
  def latest(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("user_id"), col("event_type"),
        struct(tsSeconds("ts").as("ts_s"), col("event_id"), col("value")).as("c"))
      .groupBy("user_id", "event_type")
      .agg(max("c").as("m"))
      .select(col("user_id"), col("event_type"),
        col("m.ts_s").as("last_ts_s"), col("m.event_id").as("last_event_id"),
        round(col("m.value"), 2).as("last_value"))
      .orderBy("user_id", "event_type")

  /** Cohort retention matrix — users cohorted by first-activity day,
    * each (cohort, day-offset) cell counting distinct users still
    * active, with the retention rate against the cohort's size. The
    * standard product-analytics rollup over an event stream.
    *
    * Scale design: activity first reduces to DISTINCT (user, day) —
    * partial-aggregable, one shuffle, and it makes the per-cell count a
    * plain count(*) (no countDistinct anywhere). First-day-per-user is
    * a min aggregate over that set (second keyed shuffle), rejoined on
    * user_id; cohort sizes are an offset-0 self-aggregate broadcast
    * back (|days| rows). Three keyed shuffles total, each with map-side
    * combine.
    */
  def cohortRetention(s: SparkSession, dir: String): DataFrame = {
    val epochDay = expr("ts div 1000000000 div 86400")
    val activity = Tables.events(s, dir)
      .select(col("user_id"), epochDay.as("day")).distinct()
    val firstDay = activity.groupBy("user_id").agg(min("day").as("cohort_day"))
    val cells = activity.join(firstDay, "user_id")
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
    val cohortSizes = cells.filter(col("day_offset") === 0)
      .select(col("cohort_day"), col("n_users").as("n_cohort"))
    cells.join(broadcast(cohortSizes), "cohort_day")
      .select(
        date_add(lit("1970-01-01").cast("date"), col("cohort_day").cast("int"))
          .cast("timestamp_ntz").as("cohort_date"),
        col("day_offset"), col("n_users"), col("n_cohort"),
        round(col("n_users").cast("double") / col("n_cohort"), 4).as("retention"))
      .orderBy("cohort_date", "day_offset")
  }

  val FunnelWindowS = 3600L

  /** Ordered funnel conversion (view → click → purchase): a user
    * completes step k only with a step-k event STRICTLY AFTER their
    * first step-(k-1) completion and within the [[FunnelWindowS]]
    * conversion window — the product-analytics funnel.
    *
    * Scale design: each stage is a type-filtered min aggregate re-keyed
    * on user (k keyed partial-agg shuffles for a k-step funnel) — never
    * a per-user event-sequence sort or a sessionized scan; the
    * type filters prune each stage's input at the parquet scan.
    */
  def funnel(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), tsSeconds("ts").as("ts_s"), col("event_type"))
    val t1 = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts_s").as("t1"))
    val t2 = ev.filter(col("event_type") === "click").join(t1, "user_id")
      .filter(col("ts_s") > col("t1") && col("ts_s") <= col("t1") + FunnelWindowS)
      .groupBy("user_id").agg(min("ts_s").as("t2"))
    val t3 = ev.filter(col("event_type") === "purchase").join(t2, "user_id")
      .filter(col("ts_s") > col("t2") && col("ts_s") <= col("t2") + FunnelWindowS)
      .groupBy("user_id").agg(min("ts_s").as("t3"))
    t1.agg(count(lit(1)).as("n_view"))
      .join(t2.agg(count(lit(1)).as("n_click")))
      .join(t3.agg(count(lit(1)).as("n_purchase")))
      .select(col("n_view"), col("n_click"), col("n_purchase"),
        // empty-stage conversion is DEFINED as 0.0 (Spark's null-on-/0
        // and DuckDB's IEEE NaN would otherwise diverge)
        when(col("n_view") === 0, 0.0).otherwise(
          round(col("n_click").cast("double") / col("n_view"), 4)).as("conv_click"),
        when(col("n_click") === 0, 0.0).otherwise(
          round(col("n_purchase").cast("double") / col("n_click"), 4)).as("conv_purchase"))
  }

  val funnelOracle: String =
    """WITH ev AS (
      |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, event_type
      |  FROM events),
      |t1 AS (
      |  SELECT user_id, min(ts_s) AS t1 FROM ev
      |  WHERE event_type = 'view' GROUP BY user_id),
      |t2 AS (
      |  SELECT ev.user_id, min(ts_s) AS t2
      |  FROM ev JOIN t1 USING (user_id)
      |  WHERE event_type = 'click' AND ts_s > t1 AND ts_s <= t1 + 3600
      |  GROUP BY ev.user_id),
      |t3 AS (
      |  SELECT ev.user_id, min(ts_s) AS t3
      |  FROM ev JOIN t2 USING (user_id)
      |  WHERE event_type = 'purchase' AND ts_s > t2 AND ts_s <= t2 + 3600
      |  GROUP BY ev.user_id)
      |SELECT (SELECT count(*) FROM t1) AS n_view,
      |  (SELECT count(*) FROM t2) AS n_click,
      |  (SELECT count(*) FROM t3) AS n_purchase,
      |  CASE WHEN (SELECT count(*) FROM t1) = 0 THEN 0.0
      |       ELSE round(CAST((SELECT count(*) FROM t2) AS DOUBLE) / (SELECT count(*) FROM t1), 4) END AS conv_click,
      |  CASE WHEN (SELECT count(*) FROM t2) = 0 THEN 0.0
      |       ELSE round(CAST((SELECT count(*) FROM t3) AS DOUBLE) / (SELECT count(*) FROM t2), 4) END AS conv_purchase""".stripMargin

  val cohortRetentionOracle: String =
    """WITH activity AS (
      |  SELECT DISTINCT user_id,
      |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
      |  FROM events),
      |first_day AS (
      |  SELECT user_id, min(day) AS cohort_day FROM activity GROUP BY user_id),
      |cells AS (
      |  SELECT cohort_day, day - cohort_day AS day_offset, count(*) AS n_users
      |  FROM activity JOIN first_day USING (user_id)
      |  GROUP BY 1, 2),
      |sizes AS (
      |  SELECT cohort_day, n_users AS n_cohort FROM cells WHERE day_offset = 0)
      |SELECT CAST(DATE '1970-01-01' + CAST(cohort_day AS INT) AS TIMESTAMP) AS cohort_date,
      |  day_offset, n_users, n_cohort,
      |  round(CAST(n_users AS DOUBLE) / n_cohort, 4) AS retention
      |FROM cells JOIN sizes USING (cohort_day)
      |ORDER BY cohort_date, day_offset""".stripMargin

  /** Oracle: independent window formulation (row_number over ts desc). */
  val latestOracle: String =
    """WITH ranked AS (
      |  SELECT user_id, event_type,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, event_id, value,
      |    row_number() OVER (PARTITION BY user_id, event_type
      |                       ORDER BY CAST(floor(epoch(ts)) AS BIGINT) DESC,
      |                                event_id DESC) AS rn
      |  FROM events)
      |SELECT user_id, event_type, ts_s AS last_ts_s,
      |  event_id AS last_event_id, round(value, 2) AS last_value
      |FROM ranked WHERE rn = 1
      |ORDER BY user_id, event_type""".stripMargin

  /** Oracle for the STREAMING exact-dedup twin
    * ([[graft.streaming.EventsStream.qStreamDedup]]): event_id is unique
    * in the table, so deduping a twice-replayed log must reproduce the
    * plain projection exactly.
    */
  val dedupedOracle: String =
    """SELECT event_id, user_id, event_type, value,
      |  CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
      |FROM events
      |ORDER BY event_id""".stripMargin

  val sessionizeOracle: String =
    """WITH base AS (
      |  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
      |  FROM events),
      |flagged AS (
      |  SELECT user_id, event_id, ts_s,
      |    CASE WHEN ts_s - lag(ts_s) OVER w > 1800
      |           OR lag(ts_s) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
      |  FROM base
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)),
      |sess AS (
      |  SELECT user_id, ts_s,
      |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
      |                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      |  FROM flagged)
      |SELECT user_id, session_id, count(*) AS n_events,
      |  max(ts_s) - min(ts_s) AS duration_s
      |FROM sess
      |GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin
}
