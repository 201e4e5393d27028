package graft.operators

import graft.Engine
import org.apache.spark.sql.{DataFrame, SparkSession}
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_events_hourly" -> (qEventsHourly _),
    "q_events_props" -> (qEventsProps _),
    "q_events_json" -> (qEventsJson _),
    "q_events_sessions" -> (qEventsSessions _))

  val oracles: Map[String, String] = Map(
    "q_events_hourly" -> qEventsHourlySql,
    "q_events_props" -> qEventsPropsSql,
    "q_events_json" -> qEventsJsonSql,
    "q_events_sessions" -> qEventsSessionsSql)
}
