package graft.operators

import graft.Engine
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for a training-data pipeline (extension tier —
  * no reference analog; the pipeline ops mandate). Sampling at 100 TB
  * must be (a) a pure scan-side filter (no shuffle, no driver state) and
  * (b) reproducible run-to-run and engine-to-engine — random() is
  * neither. Both operators here are pure expressions over the data.
  */
object Sampling {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Engine.table(s, dir, n)

  /** Knuth-multiplicative hash-mod bucket in [0, 100): portable integer
    * arithmetic (fits int64 for keys < ~3.5e9), identical in any engine —
    * the seedable, join-stable "random" for sampling. */
  private def bucket(key: org.apache.spark.sql.Column) =
    pmod(pmod(key * lit(2654435761L), lit(4294967296L)), lit(100L))
  private def sqlBucket(key: String) =
    s"(($key * 2654435761) % 4294967296) % 100"

  /** 10% deterministic document sample with per-source counts — the
    * shape every corpus-downsampling job takes: a scan-side filter (the
    * bucket predicate pushes into codegen; nothing shuffles until the
    * tiny count agg). */
  def qSampleHashmod(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .filter(bucket(col("doc_id")) < 10)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_sampled"),
        min(col("doc_id")).as("min_id"),
        max(col("doc_id")).as("max_id"))

  val qSampleHashmodSql: String =
    s"""SELECT source, COUNT(*) AS n_sampled,
      |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
      |FROM documents
      |WHERE ${sqlBucket("doc_id")} < 10
      |GROUP BY source""".stripMargin

  /** Per-stratum head sample: first k docs per (lang, source) stratum in
    * deterministic doc_id order — row_number over a window, the
    * distributed "take k per group". One shuffle keyed on the stratum. */
  def qSamplePerStratum(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang"), col("source"))
      .orderBy(col("doc_id"))
    t(s, dir, "documents")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("lang"), col("source"), col("doc_id"), col("rn"))
  }

  val qSamplePerStratumSql: String =
    """SELECT lang, source, doc_id, rn
      |FROM (SELECT lang, source, doc_id,
      |        ROW_NUMBER() OVER (PARTITION BY lang, source ORDER BY doc_id)
      |          AS rn
      |      FROM documents)
      |WHERE rn <= 5""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sample_hashmod" -> (qSampleHashmod _),
    "q_sample_per_stratum" -> (qSamplePerStratum _))

  val oracles: Map[String, String] = Map(
    "q_sample_hashmod" -> qSampleHashmodSql,
    "q_sample_per_stratum" -> qSamplePerStratumSql)
}
