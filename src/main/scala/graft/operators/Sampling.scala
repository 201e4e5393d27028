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

  /** Knuth-multiplicative hash-mod bucket in [0, mod): portable integer
    * arithmetic (fits int64 for keys < ~3.5e9), identical in any engine —
    * the seedable, join-stable "random" for sampling. */
  private def bucketMod(key: org.apache.spark.sql.Column, mod: Long) =
    pmod(pmod(key * lit(2654435761L), lit(4294967296L)), lit(mod))
  private def sqlBucketMod(key: String, mod: Long) =
    s"(($key * 2654435761) % 4294967296) % $mod"
  private def bucket(key: org.apache.spark.sql.Column) = bucketMod(key, 100L)
  private def sqlBucket(key: String) = sqlBucketMod(key, 100L)

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

  /** Fine-grained bucket in [0, 1e6) for rate-proportional acceptance
    * (same Knuth hash as [[bucket]], more resolution). */
  private def bucket6(key: org.apache.spark.sql.Column) =
    bucketMod(key, 1000000L)
  private def sqlBucket6(key: String) = sqlBucketMod(key, 1000000L)

  /** Domain-mixture resampling — the training-data "data mixing" step:
    * given per-source target WEIGHTS, down-sample each source so the
    * output approximates the target mixture within a total budget of half
    * the corpus. Every quantity is integer arithmetic (weights, quotas,
    * acceptance test), so the sample is deterministic and engine-exact;
    * acceptance is `bucket6(doc_id) * n_source < quota * 1e6`, i.e. a
    * per-source rate applied by hash — reproducible, join-stable, and a
    * pure scan-side filter.
    *
    * Gate fixture weights: source `srcK` gets weight (K % 4) + 1.
    *
    * Scale shape (100 TB): per-source counts are one map-side-combined
    * agg (|sources| rows); quotas compute on that tiny frame; the corpus
    * is then filtered in-scan against the broadcast quota map — the data
    * itself never shuffles. Sources whose quota exceeds their size keep
    * everything (rate capped at 1 by the bucket range).
    */
  def qSampleMixture(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val weighted = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("weight",
        pmod(substring(col("source"), 4, 10).cast("long"), lit(4L)) + 1L)
    val totals = weighted.agg(
      sum(col("weight")).as("sum_w"), sum(col("n_docs")).as("n_total"))
    val quotas = weighted.crossJoin(broadcast(totals))
      .select(col("source"), col("n_docs"),
        // integral div end-to-end: a double quotient that rounds up to an
        // integer would truncate differently than floor division
        expr("(n_total div 2) * weight div sum_w").as("quota"))
    docs.join(broadcast(quotas), Seq("source"))
      .where(bucket6(col("doc_id")) * col("n_docs")
        < col("quota") * lit(1000000L))
      // group by the carried quota columns (as the oracle does) instead
      // of re-joining quotas — one reference to the per-source agg, not two
      .groupBy(col("source"), col("n_docs"), col("quota"))
      .agg(count(lit(1)).as("n_sampled"))
      .select(col("source"), col("n_docs"), col("quota"), col("n_sampled"))
  }

  val qSampleMixtureSql: String =
    s"""WITH weighted AS (
      |  SELECT source, COUNT(*) AS n_docs,
      |    (CAST(SUBSTR(source, 4) AS BIGINT) % 4) + 1 AS weight
      |  FROM documents GROUP BY source
      |), quotas AS (
      |  SELECT source, n_docs,
      |    CAST(CAST((SELECT SUM(n_docs) FROM weighted) // 2 AS BIGINT)
      |      * weight // (SELECT SUM(weight) FROM weighted) AS BIGINT)
      |      AS quota
      |  FROM weighted
      |)
      |SELECT q.source, q.n_docs, q.quota,
      |  COUNT(*) AS n_sampled
      |FROM documents d JOIN quotas q ON d.source = q.source
      |WHERE ${sqlBucket6("d.doc_id")} * q.n_docs < q.quota * 1000000
      |GROUP BY q.source, q.n_docs, q.quota""".stripMargin

  /** Temperature-scaled mixture sampling, α = 1/2: per-source sampling
    * weight w ∝ n^α — the multilingual/data-mixing convention
    * (Arivazhagan et al. 2019 §4; mT5, Xue et al. 2021 §3.1) that
    * upweights tail sources a proportional mix starves while damping
    * head dominance. Differs from [[qSampleMixture]] exactly where the
    * operator lives: the weights DERIVE from the observed counts via the
    * power law instead of arriving as externally-fixed targets.
    * Determinism: n^(1/2) is an IEEE sqrt (correctly rounded in any
    * engine), immediately floored to a ×10⁶ fixed-point integer weight —
    * everything after (quota split, acceptance test) is the integer
    * arithmetic of the mixture gate, so the sample is engine-exact.
    * Scale shape identical to [[qSampleMixture]]: |sources|-row weight
    * frame, broadcast quotas, scan-side acceptance — the corpus never
    * shuffles. */
  def qSampleTemperature(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val weighted = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("w6",
        floor(sqrt(col("n_docs").cast("double")) * lit(1000000.0))
          .cast("long"))
    val totals = weighted.agg(
      sum(col("w6")).as("sum_w6"), sum(col("n_docs")).as("n_total"))
    val quotas = weighted.crossJoin(broadcast(totals))
      .select(col("source"), col("n_docs"), col("w6"),
        expr("(n_total div 2) * w6 div sum_w6").as("quota"))
    docs.join(broadcast(quotas), Seq("source"))
      .where(bucket6(col("doc_id")) * col("n_docs")
        < col("quota") * lit(1000000L))
      .groupBy(col("source"), col("n_docs"), col("w6"), col("quota"))
      .agg(count(lit(1)).as("n_sampled"))
      .select(col("source"), col("n_docs"), col("w6"), col("quota"),
        col("n_sampled"))
  }

  val qSampleTemperatureSql: String =
    s"""WITH weighted AS (
      |  SELECT source, COUNT(*) AS n_docs,
      |    CAST(FLOOR(SQRT(CAST(COUNT(*) AS DOUBLE)) * 1000000.0) AS BIGINT)
      |      AS w6
      |  FROM documents GROUP BY source
      |), quotas AS (
      |  SELECT source, n_docs, w6,
      |    CAST(CAST((SELECT SUM(n_docs) FROM weighted) // 2 AS BIGINT)
      |      * w6 // (SELECT SUM(w6) FROM weighted) AS BIGINT) AS quota
      |  FROM weighted
      |)
      |SELECT q.source, q.n_docs, q.w6, q.quota,
      |  COUNT(*) AS n_sampled
      |FROM documents d JOIN quotas q ON d.source = q.source
      |WHERE ${sqlBucket6("d.doc_id")} * q.n_docs < q.quota * 1000000
      |GROUP BY q.source, q.n_docs, q.w6, q.quota""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sample_hashmod" -> (qSampleHashmod _),
    "q_sample_per_stratum" -> (qSamplePerStratum _),
    "q_sample_mixture" -> (qSampleMixture _),
    "q_sample_temperature" -> (qSampleTemperature _))

  val oracles: Map[String, String] = Map(
    "q_sample_hashmod" -> qSampleHashmodSql,
    "q_sample_per_stratum" -> qSamplePerStratumSql,
    "q_sample_mixture" -> qSampleMixtureSql,
    "q_sample_temperature" -> qSampleTemperatureSql)
}
