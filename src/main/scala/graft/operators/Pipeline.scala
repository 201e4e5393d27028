package graft.operators

import graft.Engine
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end training-corpus cleaning — the north-star composition of
  * the library's tiers into one `DataFrame => DataFrame` pipeline:
  *
  *   1. quality gate: drop 'low'-band documents
  *      ([[TextOps.qTextQuality]]'s alpha/stopword/length heuristic);
  *   2. exact dedup: one keeper (min doc_id) per identical text
  *      ([[Dedup.qDedupExact]]'s fingerprint groups);
  *   3. near-dup dedup: one keeper per MinHash-LSH connected component
  *      ([[Dedup.qDedupCorpus]]);
  *   4. token accounting for the surviving corpus.
  *
  * Every stage is a join/filter over the operators' own outputs — no
  * stage re-implements another's logic, so the pipeline inherits each
  * operator's scale shape (the quality gate is a scan, both dedups are
  * the blocked/bucketed plans documented in [[Dedup]]). Order matters
  * for cost, not correctness: the cheap scan-side quality gate runs
  * before the near-dup machinery only as a candidate-count reducer in a
  * production run; here stages filter independently so their effects
  * are auditable per `drop_reason`.
  */
object Pipeline {

  /** Kept corpus with accounting: (doc_id, n_tokens, quality) for every
    * surviving document. */
  def cleanCorpus(s: SparkSession, dir: String): DataFrame = {
    val docs = Engine.table(s, dir, "documents")

    val quality = TextOps.qTextQuality(s, dir)
      .filter(col("quality_band") =!= "low")
      .select(col("doc_id"), col("quality"))

    // exact keepers: the representative of each identical-text group
    val exactKeepers = Dedup.qDedupExact(s, dir)
      .select(col("keeper").as("doc_id"))

    // near-dup keepers: component representative (singletons keep
    // themselves)
    val nearKeepers = Dedup.qDedupCorpus(s, dir)
      .filter(col("doc_id") === col("keeper"))
      .select(col("doc_id"))

    docs.select(col("doc_id"),
        TextOps.tokenCount(col("text")).as("n_tokens"))
      .join(quality, Seq("doc_id"))
      .join(exactKeepers, Seq("doc_id"), "left_semi")
      .join(nearKeepers, Seq("doc_id"), "left_semi")
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pipeline_clean" -> (cleanCorpus _))

  /** Not SQL-expressible (the near-dup stage needs iterative connected
    * components) — rows-only; PipelineSpec pins the invariants. */
  val oracles: Map[String, String] = Map.empty
}
