package graft.sources

import graft.Engine
import graft.operators.Relational.{sqlDsum}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interchange-format roundtrips beyond CSV ([[CsvLoader]] covers the
  * reference's LOAD DATA / INTO OUTFILE surface; real lakehouse ingest
  * also arrives as JSON lines and ORC). Each gate exports a table slice
  * in the format, reads it back with an EXPLICIT schema (schema
  * inference over 100 TB of JSONL is a full extra scan and a type-drift
  * hazard — governance supplies the schema, the reader enforces it),
  * and aggregates the reloaded frame; the DuckDB oracle aggregates the
  * ORIGINAL parquet, so a pass proves the roundtrip lossless, not just
  * self-consistent. */
object Formats {

  /** JSONL (newline-delimited JSON) roundtrip. `ts` is written with an
    * explicit microsecond pattern — Spark's default JSON timestamp
    * format carries milliseconds only, which would silently truncate
    * the µs event times (caught by the oracle's min/max µs check). */
  def qJsonlRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_jsonl").toString
    val ev = Engine.table(s, dir, "events")
      .where(col("event_id") % 5 === 0)
    val tsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
    ev.coalesce(4).write.mode("overwrite")
      .option("timestampNTZFormat", tsFmt)
      .json(s"$tmp/events_jsonl")
    val back = s.read.schema(ev.schema)
      .option("timestampNTZFormat", tsFmt)
      .json(s"$tmp/events_jsonl")
    aggregated(back)
  }

  /** ORC roundtrip (columnar sibling — timestamps are native). */
  def qOrcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_orc").toString
    val ev = Engine.table(s, dir, "events")
      .where(col("event_id") % 5 === 0)
    ev.coalesce(4).write.mode("overwrite").orc(s"$tmp/events_orc")
    aggregated(s.read.schema(ev.schema).orc(s"$tmp/events_orc"))
  }

  /** Shared roundtrip fingerprint: per event_type — row count, exact
    * fixed-point value sum, id sum (64-bit identity fold), and µs-exact
    * time bounds. A single dropped row, truncated timestamp, or
    * perturbed double flips at least one column. */
  private def aggregated(ev: DataFrame): DataFrame =
    ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(graft.operators.Relational.dec(col("value"))).cast("double")
          / 10000.0).as("sum_value"),
        sum(col("event_id")).as("id_sum"),
        min(unix_micros(col("ts").cast("timestamp"))).as("min_ts_us"),
        max(unix_micros(col("ts").cast("timestamp"))).as("max_ts_us"))

  private val roundtripSql: String =
    s"""SELECT event_type, COUNT(*) AS n,
      |  ${sqlDsum("value", "sum_value")},
      |  CAST(SUM(event_id) AS BIGINT) AS id_sum,
      |  MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS min_ts_us,
      |  MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS max_ts_us
      |FROM events
      |WHERE event_id % 5 = 0
      |GROUP BY event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_jsonl_roundtrip" -> (qJsonlRoundtrip _),
    "q_orc_roundtrip" -> (qOrcRoundtrip _))

  val oracles: Map[String, String] = Map(
    "q_jsonl_roundtrip" -> roundtripSql,
    "q_orc_roundtrip" -> roundtripSql)
}
