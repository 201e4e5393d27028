package graft.operators

import graft.Engine
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Relational.{dsum, davg, sqlDsum, sqlDavg}

/** Batch queries over the `events` table — the query-side of the HTAP
  * ingest path (the reference's delta store, core/delta_table.h:37, is
  * ingest-only; windowed analytics over it are our extension tier, see
  * SURVEY.md §2.12). The streaming variants live in graft.streaming; these
  * batch twins are the oracle-checkable semantics.
  */
object Events {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Engine.table(s, dir, n)

  /** Tumbling 1-hour aggregate: date_trunc is the batch-equivalent of
    * `window(ts, "1 hour")` and is directly comparable across engines. */
  def qEventsHourly(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("bucket"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        dsum(col("value")).as("sum_value"),
        davg(col("value")).as("avg_value"))

  val qEventsHourlySql: String =
    s"""SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket, event_type,
      |  COUNT(*) AS n_events,
      |  ${sqlDsum("value", "sum_value")},
      |  ${sqlDavg("value", "avg_value")}
      |FROM events
      |GROUP BY 1, 2""".stripMargin

  /** Property extraction from the JSON-ish `props` column (regexp, so the
    * oracle does not depend on a JSON extension). */
  def qEventsProps(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("k", regexp_extract(col("props"), "[0-9]+", 0)
        .cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))

  val qEventsPropsSql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(k) AS BIGINT) AS sum_k,
      |  CAST(MIN(k) AS BIGINT) AS min_k,
      |  CAST(MAX(k) AS BIGINT) AS max_k
      |FROM (
      |  SELECT event_type,
      |    CAST(regexp_extract(props, '[0-9]+', 0) AS BIGINT) AS k
      |  FROM events
      |)
      |GROUP BY event_type""".stripMargin

  /** JSON function surface (the reference evaluates MySQL's JSON_*
    * functions through its expression layer — cast_json_func.test;
    * SURVEY §2.9): real JSON-path extraction from `props` with
    * `get_json_object`, typed cast, aggregated. */
  def qEventsJson(s: SparkSession, dir: String): DataFrame =
    // NO rebalance (r20, reversing r19): unlike qJsonFuncs' 8 parses
    // per row, ONE get_json_object here does not clear the bar of a
    // full-data shuffle — adjacent-window A/B at sf0.1/32c measured
    // med 0.80 s / min 0.65 s without vs 1.44 / 1.11 with (and the
    // driver's r19 run had min-of-5 regress 0.545→0.610 s) — the
    // map-side partial agg after the scan shrinks rows to the group
    // count anyway, so the added exchange moved the whole props column
    // to parallelize work cheaper than the move (guide §2.5 contract:
    // shuffled bytes must be tiny next to the compute they unlock)
    t(s, dir, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n_with_k"),
        sum(col("k")).as("sum_k"),
        countDistinct(col("k")).as("n_distinct_k"))

  val qEventsJsonSql: String =
    """SELECT event_type, COUNT(k) AS n_with_k,
      |  CAST(SUM(k) AS BIGINT) AS sum_k,
      |  COUNT(DISTINCT k) AS n_distinct_k
      |FROM (SELECT event_type,
      |        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |      FROM events)
      |GROUP BY event_type""".stripMargin

  /** Wider JSON-function tier (cast_json_func.test analog beyond plain
    * path extraction): validity probing, JSON-array construction +
    * `json_array_length`, indexed `$[0]` extraction, `json_object_keys`,
    * and the typed `from_json` decode path — one scan, pure codegen
    * projections, every value cross-checked against DuckDB's JSON
    * extension. Half the rows are deliberately truncated to invalid
    * JSON for the validity probe (Spark: `get_json_object(probe,'$')`
    * IS NULL; DuckDB: `NOT json_valid`). */
  def qJsonFuncs(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val kStr = get_json_object(col("props"), "$.k")
    // rebalance: 8 JSON parses per row serialized on ONE scan task at
    // bench scale (single-row-group parquet); no-op at cluster scale
    // (Engine.rebalance contract). The `$.k` extraction is projected
    // ONCE (`__ks`) in a producing projection and reused by `k` and both
    // of `arr`'s repetitions — the original re-parsed props 3× per row
    // (get_json_object is CodegenFallback, so codegen subexpression
    // elimination never deduped it).
    Engine.rebalance(t(s, dir, "events"))
      .withColumn("__ks", kStr)
      .withColumn("k", col("__ks").cast("long"))
      // [k,...,k] with (k % 3) + 1 elements — varying array length
      .withColumn("arr",
        concat(lit("["),
          expr("repeat(concat(__ks, ','), " +
            "CAST(CAST(__ks AS BIGINT) % 3 AS INT))"),
          col("__ks"), lit("]")))
      // even k: drop the closing brace -> invalid JSON
      .withColumn("probe",
        when(col("k") % 2 === 0,
          expr("substring(props, 1, length(props) - 1)"))
          .otherwise(col("props")))
      .groupBy(col("event_type"))
      .agg(
        sum(json_array_length(col("arr"))).cast("long").as("sum_len"),
        sum(get_json_object(col("arr"), "$[0]").cast("long")).as("sum_first"),
        count(when(get_json_object(col("probe"), "$").isNull, 1))
          .as("n_invalid"),
        sum(from_json(col("props"),
          StructType(Seq(StructField("k", LongType)))).getField("k"))
          .as("sum_k_typed"),
        count(when(array_join(json_object_keys(col("props")), ",") === "k", 1))
          .as("n_key_k"))
  }

  val qJsonFuncsSql: String =
    """WITH base AS (
      |  SELECT event_type, props,
      |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
      |    '[' || repeat(json_extract_string(props, '$.k') || ',',
      |                  CAST(CAST(json_extract_string(props, '$.k') AS BIGINT)
      |                       % 3 AS INTEGER))
      |        || json_extract_string(props, '$.k') || ']' AS arr,
      |    CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) % 2 = 0
      |         THEN substring(props, 1, length(props) - 1) ELSE props
      |    END AS probe
      |  FROM events)
      |SELECT event_type,
      |  CAST(SUM(json_array_length(arr)) AS BIGINT) AS sum_len,
      |  CAST(SUM(CAST(json_extract_string(arr, '$[0]') AS BIGINT)) AS BIGINT)
      |    AS sum_first,
      |  CAST(COUNT(CASE WHEN NOT json_valid(probe) THEN 1 END) AS BIGINT)
      |    AS n_invalid,
      |  CAST(SUM(k) AS BIGINT) AS sum_k_typed,
      |  CAST(COUNT(CASE WHEN array_to_string(json_keys(props), ',') = 'k'
      |             THEN 1 END) AS BIGINT) AS n_key_k
      |FROM base GROUP BY event_type""".stripMargin

  /** Time-series resample + forward fill (gap-fill): per user, a dense
    * hourly spine from their first to last event hour; each bucket
    * carries its event count (0 in gaps) and the most recent observed
    * `value` at or before the bucket (forward fill via
    * `last(ignoreNulls)`), with the in-hour closing value picked by a
    * deterministic (ts, event_id) tie-break. The standard financial /
    * telemetry resample the reference's window-less engine cannot
    * express. Scale shape: the spine explode is bounded by each user's
    * time range, everything else is ONE shuffle keyed by user_id plus
    * per-user sorted windows — the same cost class as any keyed
    * aggregation at 100 TB. */
  def qEventsGapfill(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = t(s, dir, "events").where(col("user_id") < 20)
      .select(col("user_id"), col("event_id"),
        date_trunc("hour", col("ts")).as("h"), col("value"), col("ts"))
    val rn = Window.partitionBy(col("user_id"), col("h"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val hourly = ev
      .withColumn("rn", row_number().over(rn))
      .groupBy(col("user_id"), col("h"))
      .agg(count(lit(1)).as("n_events"),
        max(when(col("rn") === 1, col("value"))).as("close_value"))
    // distinct column names on the spine side keep the self-derived
    // join unambiguous (both frames share the events lineage)
    val spine = ev.groupBy(col("user_id"))
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(col("user_id").as("spine_user"),
        explode(expr("sequence(h0, h1, interval 1 hour)")).as("bucket"))
    val fill = Window.partitionBy(col("spine_user")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(hourly,
        col("spine_user") === col("user_id") && col("bucket") === col("h"),
        "left")
      .withColumn("filled_value",
        last(col("close_value"), ignoreNulls = true).over(fill))
      .select(col("spine_user").as("user_id"), col("bucket"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("filled_value"))
  }

  val qEventsGapfillSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, date_trunc('hour', ts) AS h, value, ts
      |  FROM events WHERE user_id < 20),
      |hourly AS (
      |  SELECT user_id, h, COUNT(*) AS n_events,
      |    MAX(CASE WHEN rn = 1 THEN value END) AS close_value
      |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, h
      |          ORDER BY ts DESC, event_id DESC) AS rn FROM ev)
      |  GROUP BY user_id, h),
      |spine AS (
      |  SELECT user_id,
      |    unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS bucket
      |  FROM (SELECT user_id, MIN(h) AS h0, MAX(h) AS h1
      |        FROM ev GROUP BY user_id)),
      |joined AS (
      |  SELECT s.user_id, s.bucket,
      |    COALESCE(h.n_events, 0) AS n_events, h.close_value
      |  FROM spine s LEFT JOIN hourly h
      |    ON s.user_id = h.user_id AND s.bucket = h.h)
      |SELECT user_id, CAST(bucket AS TIMESTAMP) AS bucket,
      |  CAST(n_events AS BIGINT) AS n_events,
      |  LAST_VALUE(close_value IGNORE NULLS) OVER (
      |    PARTITION BY user_id ORDER BY bucket
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
      |FROM joined""".stripMargin

  /** Sessionization-style gap analysis in batch: per user, time since the
    * previous event (lag window) — events >30min after the predecessor
    * start a new session; count sessions per user. */
  def qEventsSessions(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull
          || unix_micros(col("ts").cast("timestamp"))
             - unix_micros(col("prev_ts").cast("timestamp")) > 1800000000L,
          1).otherwise(0))
      .groupBy(col("user_id"))
      .agg(sum(col("new_session")).as("n_sessions"),
        count(lit(1)).as("n_events"))
  }

  val qEventsSessionsSql: String =
    """SELECT user_id,
      |  CAST(SUM(new_session) AS BIGINT) AS n_sessions,
      |  COUNT(*) AS n_events
      |FROM (
      |  SELECT user_id,
      |    CASE WHEN prev_ts IS NULL
      |           OR epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(CAST(prev_ts AS TIMESTAMP)) > 1800000000
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM (
      |    SELECT user_id, ts, event_id,
      |      LAG(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |    FROM events
      |  )
      |)
      |GROUP BY user_id""".stripMargin

  /** Ordered conversion funnel view → click → purchase: each stage's
    * timestamp must FOLLOW the previous stage's (a purchase before the
    * first view does not convert — the property plain per-type counts
    * get wrong). Three per-user conditional-min aggregates, every one
    * keyed on user_id, so at scale the whole funnel is one logical
    * shuffle key; the final report is a 1-row rollup with fixed-point
    * conversion rates. */
  def qEventsFunnel(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val s1 = ev.groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "view", col("ts"))).as("t_view"))
    val s2 = ev.join(s1, Seq("user_id"))
      .groupBy(col("user_id"), col("t_view"))
      .agg(min(when(col("event_type") === "click"
        && col("ts") > col("t_view"), col("ts"))).as("t_click"))
    val s3 = ev.join(s2, Seq("user_id"))
      .groupBy(col("user_id"), col("t_view"), col("t_click"))
      .agg(min(when(col("event_type") === "purchase"
        && col("ts") > col("t_click"), col("ts"))).as("t_purchase"))
    def rate(num: Column, den: Column): Column =
      floor(num.cast("double") / den * lit(1000000.0) + lit(0.5)) /
        lit(1000000.0)
    val n = count(lit(1))
    val nView = count(col("t_view"))
    val nClick = count(col("t_click"))
    val nPurchase = count(col("t_purchase"))
    s3.agg(n.as("n_users"), nView.as("n_view"),
      nClick.as("n_view_click"), nPurchase.as("n_full_funnel"),
      rate(count(col("t_click")), count(col("t_view"))).as("click_rate"),
      rate(count(col("t_purchase")), count(col("t_click")))
        .as("purchase_rate"))
  }

  val qEventsFunnelSql: String =
    """WITH s1 AS (
      |  SELECT user_id,
      |    MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view
      |  FROM events GROUP BY user_id
      |), s2 AS (
      |  SELECT e.user_id, s1.t_view,
      |    MIN(CASE WHEN e.event_type = 'click' AND e.ts > s1.t_view
      |             THEN e.ts END) AS t_click
      |  FROM events e JOIN s1 ON e.user_id = s1.user_id
      |  GROUP BY e.user_id, s1.t_view
      |), s3 AS (
      |  SELECT e.user_id, s2.t_view, s2.t_click,
      |    MIN(CASE WHEN e.event_type = 'purchase' AND e.ts > s2.t_click
      |             THEN e.ts END) AS t_purchase
      |  FROM events e JOIN s2 ON e.user_id = s2.user_id
      |  GROUP BY e.user_id, s2.t_view, s2.t_click
      |)
      |SELECT COUNT(*) AS n_users,
      |  COUNT(t_view) AS n_view,
      |  COUNT(t_click) AS n_view_click,
      |  COUNT(t_purchase) AS n_full_funnel,
      |  FLOOR(CAST(COUNT(t_click) AS DOUBLE) / COUNT(t_view)
      |        * 1000000.0 + 0.5) / 1000000.0 AS click_rate,
      |  FLOOR(CAST(COUNT(t_purchase) AS DOUBLE) / COUNT(t_click)
      |        * 1000000.0 + 0.5) / 1000000.0 AS purchase_rate
      |FROM s3""".stripMargin

  /** Cohort retention: users cohorted by first-activity day, retention =
    * distinct users active again k days later. Two keyed aggregates
    * (user_id, then (cohort_day, k)) — the corpus shuffles once per key;
    * distinct (user, day) activity collapses map-side before either. */
  def qEventsRetention(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val activity = ev
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val cohort = activity.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    activity.join(cohort, Seq("user_id"))
      .select(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).as("k"),
        col("user_id"))
      .groupBy(col("cohort_day"), col("k"))
      .agg(count(lit(1)).as("n_users"))
  }

  val qEventsRetentionSql: String =
    """WITH activity AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
      |), cohort AS (
      |  SELECT user_id, MIN(day) AS cohort_day FROM activity
      |  GROUP BY user_id
      |)
      |SELECT c.cohort_day, CAST(a.day - c.cohort_day AS INTEGER) AS k,
      |  COUNT(*) AS n_users
      |FROM activity a JOIN cohort c ON a.user_id = c.user_id
      |GROUP BY c.cohort_day, k""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_events_hourly" -> (qEventsHourly _),
    "q_events_props" -> (qEventsProps _),
    "q_events_json" -> (qEventsJson _),
    "q_json_funcs" -> (qJsonFuncs _),
    "q_events_gapfill" -> (qEventsGapfill _),
    "q_events_sessions" -> (qEventsSessions _),
    "q_events_funnel" -> (qEventsFunnel _),
    "q_events_retention" -> (qEventsRetention _))

  val oracles: Map[String, String] = Map(
    "q_events_hourly" -> qEventsHourlySql,
    "q_events_props" -> qEventsPropsSql,
    "q_events_json" -> qEventsJsonSql,
    "q_json_funcs" -> qJsonFuncsSql,
    "q_events_gapfill" -> qEventsGapfillSql,
    "q_events_sessions" -> qEventsSessionsSql,
    "q_events_funnel" -> qEventsFunnelSql,
    "q_events_retention" -> qEventsRetentionSql)
}
