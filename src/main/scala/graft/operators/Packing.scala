package graft.operators

import graft.Engine
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sequence packing (LLM-pipeline tier, no reference analog —
  * the op every pretraining pipeline runs between curation and
  * tokenized shards): concatenate the corpus in a deterministic doc
  * order and cut it into fixed `budget`-token training sequences
  * ("concat-and-chunk", the GPT-2/3 packing scheme — Radford et al.
  * 2019 §2, Brown et al. 2020 §2.1; documents straddle sequence
  * boundaries rather than padding).
  *
  * The whole op is arithmetic over one global prefix sum of per-doc
  * token counts. The prefix sum does NOT use a global window (a
  * partition-less `Window.orderBy` serializes the corpus through one
  * task — at 100 TB that task IS the job): like [[graft.sources.Dml.autoIncrement]],
  * the frame is range-partitioned and sorted on doc_id, per-partition
  * token totals (one row per partition) are folded into offsets on the
  * driver, and the in-partition running sum is a window PARTITIONED by
  * the partition id — every task windows only its own slice. The
  * partitioned frame is STAGED to parquet ([[graft.sources.Staging]])
  * so the totals pass and the stamping pass see the same partition-id
  * assignment (repartitionByRange re-samples per execution) AND the
  * frozen frame survives executor loss — the `__pid` column is data
  * once staged, so downstream correctness is independent of how the
  * re-read splits files.
  *
  * Each doc spans chunks `start/B .. (end-1)/B`; exploding that
  * (bounded: a doc adds ≤ n_tok/B + 1 rows) and aggregating by chunk
  * yields the pack manifest: docs touched, tokens contributed, docs
  * starting per chunk. Every sequence holds exactly `budget` tokens
  * except the final partial one.
  */
object Packing {

  /** Tokens = whitespace split, the corpus's native convention
    * (TextOps token gates use the same base split). */
  private def tokCount(c: org.apache.spark.sql.Column) =
    size(split(c, " ")).cast("long")

  /** Pack manifest: one row per `budget`-token training sequence —
    * (chunk_id, n_docs, n_tokens, n_docs_starting). */
  def packPlan(docs: DataFrame, budget: Long): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(col("doc_id"), tokCount(col("text")).as("n_tok"))
    val parted = graft.sources.Staging.stage(
      toks.repartitionByRange(col("doc_id"))
        .sortWithinPartitions("doc_id")
        .withColumn("__pid", spark_partition_id().cast("long")),
      "packing")
    val partTotals = parted.groupBy(col("__pid"))
      .agg(sum(col("n_tok")).as("t"))
      .orderBy(col("__pid")).collect()
    var acc = 0L
    val offsets = partTotals.map { r =>
      val o = (r.getLong(0), acc); acc += r.getLong(1); o
    }.toSeq.toDF("__pid", "__off")
    val w = Window.partitionBy(col("__pid")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val spans = parted
      .join(broadcast(offsets), Seq("__pid"))
      .select(col("doc_id"), col("n_tok"),
        (coalesce(sum(col("n_tok")).over(w), lit(0L)) + col("__off"))
          .as("start"))
      .withColumn("end", col("start") + col("n_tok"))
      // split("") yields [""] so n_tok ≥ 1 and the range is never empty
      .withColumn("first_c", expr(s"start div $budget"))
      .withColumn("last_c", expr(s"(`end` - 1) div $budget"))
    spans
      .select(col("doc_id"), col("start"), col("end"),
        explode(sequence(col("first_c"), col("last_c"))).as("chunk_id"))
      .groupBy(col("chunk_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(least(col("end"), (col("chunk_id") + 1) * budget)
          - greatest(col("start"), col("chunk_id") * budget))
          .as("n_tokens"),
        sum(when(col("start") >= col("chunk_id") * budget, 1L)
          .otherwise(0L)).as("n_docs_starting"))
      .orderBy(col("chunk_id"))
  }

  val PackBudget = 2048L

  def qSeqPack(s: SparkSession, dir: String): DataFrame =
    packPlan(Engine.table(s, dir, "documents"), PackBudget)

  /** Reusable oracle CTE chain over a source CTE exposing
    * (doc_id, text): DuckDB MAY use the global window — it is
    * single-node by design; equality proves the distributed offset
    * scheme computes the same prefix sum. Defines
    * pktoks/pkcum/pkspans/pkx; the final aggregate is
    * [[packSelectSql]]. */
  def packCtes(src: String): String =
    s"""pktoks AS (
      |  SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      |  FROM $src
      |), pkcum AS (
      |  SELECT doc_id, n_tok,
      |    COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS st
      |  FROM pktoks
      |), pkspans AS (
      |  SELECT doc_id, st, st + n_tok AS en,
      |    CAST(st // $PackBudget AS BIGINT) AS fc,
      |    CAST((st + n_tok - 1) // $PackBudget AS BIGINT) AS lc
      |  FROM pkcum
      |), pkx AS (
      |  SELECT doc_id, st, en, k AS chunk_id
      |  FROM pkspans, unnest(range(fc, lc + 1)) AS u(k)
      |)""".stripMargin

  val packSelectSql: String =
    s"""SELECT chunk_id, COUNT(*) AS n_docs,
      |  CAST(SUM(LEAST(en, (chunk_id + 1) * $PackBudget)
      |    - GREATEST(st, chunk_id * $PackBudget)) AS BIGINT) AS n_tokens,
      |  CAST(SUM(CASE WHEN st >= chunk_id * $PackBudget THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_docs_starting
      |FROM pkx GROUP BY chunk_id ORDER BY chunk_id""".stripMargin

  val qSeqPackSql: String =
    s"""WITH ${packCtes("documents")}
      |$packSelectSql""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_seq_pack" -> (qSeqPack _))

  val oracles: Map[String, String] = Map(
    "q_seq_pack" -> qSeqPackSql)
}
