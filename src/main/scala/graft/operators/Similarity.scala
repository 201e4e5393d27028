package graft.operators

import graft.Engine
import graft.functions.Vectors.dot
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`embedding: array<float>`, unit-normalized → dot = cosine).
  *
  * Two tiers, per the training-pipeline mandate:
  *  - brute force: broadcast the query vector, score every row, top-k via
  *    TakeOrderedAndProject — exact, one scan, no shuffle; the baseline
  *    and the in-partition kernel of every ANN scheme.
  *  - IVF: coarse quantizer = per-cluster centroids (here the `label`
  *    column stands in for a k-means assignment — the partition/probe
  *    plumbing is identical); score the query against centroids, probe the
  *    top-`nprobe` clusters, brute-force only inside them. At 100 TB the
  *    table is partitioned by cluster id, so a probe reads only its
  *    clusters' files (partition pruning).
  */
object Similarity {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Engine.table(s, dir, n)

  private def r6(c: Column): Column =
    floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)

  /** The query vector: embedding of the smallest vec_id (deterministic,
    * data-derived — no synthetic inputs). */
  private def queryVec(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val minId = e.agg(min(col("vec_id")).as("qid"))
    e.join(broadcast(minId), col("vec_id") === col("qid"))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
  }

  /** Exact top-20 cosine neighbors by full scan. */
  def qSimBruteForce(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    e.crossJoin(broadcast(queryVec(s, dir)))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("vec_id"), col("label"),
        r6(dot(col("embedding"), col("q_emb"))).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(20)
  }

  /** Per-label centroids via positional explode → elementwise mean →
    * re-assembled array (pure builtins; one shuffle keyed by
    * (label, pos)). */
  def centroids(e: DataFrame): DataFrame =
    e.select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(avg(col("v")).as("v"))
      .groupBy(col("label"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("v")))),
        s => s.getField("v")).as("centroid"))

  /** IVF search: probe the nprobe=3 closest centroids, exact re-rank
    * inside the probed clusters only. */
  def qSimIvf(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val q = queryVec(s, dir)
    val probed = centroids(e)
      .crossJoin(broadcast(q))
      .select(col("label"), dot(col("centroid"), col("q_emb")).as("cscore"))
      .orderBy(col("cscore").desc, col("label"))
      .limit(3)
      .select(col("label"))
    e.join(broadcast(probed), Seq("label"))
      .crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("vec_id"), col("label"),
        r6(dot(col("embedding"), col("q_emb"))).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(20)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sim_bruteforce_topk" -> (qSimBruteForce _),
    "q_sim_ivf_topk" -> (qSimIvf _))

  /** ANN results are not ANSI-SQL-expressible portably (list ops) —
    * rows-only checks; correctness is covered by SimilaritySpec (IVF
    * recall vs. brute force, monotone scores). */
  val oracles: Map[String, String] = Map.empty
}
