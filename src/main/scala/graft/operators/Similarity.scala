package graft.operators

import graft.Engine
import graft.functions.Vectors.dot
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`embedding: array<float>`, unit-normalized → dot = cosine).
  *
  * Three tiers, per the training-pipeline mandate:
  *  - brute force: broadcast the query vector, score every row, top-k via
  *    TakeOrderedAndProject — exact, one scan, no shuffle; the baseline
  *    and the in-partition kernel of every ANN scheme.
  *  - IVF (label-blocked): coarse quantizer = per-cluster centroids with
  *    the `label` column as the partition function; score the query
  *    against centroids, probe the top-`nprobe` clusters, brute-force
  *    only inside them.
  *  - IVF (learned): same probe plan with a real k-means quantizer
  *    ([[kmeansAssign]], spark.ml, fixed seed).
  * At 100 TB the table is written partitioned by cluster id, so a probe
  * reads only its clusters' files (partition pruning — see
  * Scale.partitionedWrite).
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

  // --- true IVF: k-means coarse quantizer ---------------------------------

  /** K-means cluster assignment over the embedding column (the real IVF
    * coarse quantizer — spark.ml Lloyd's with a fixed seed for
    * deterministic tests). Returns (vec_id, label, embedding, cluster).
    * At 100 TB: train on a sample, assign in one scan, then write the
    * table partitioned by `cluster` so probes prune at the file level.
    *
    * Sizing: k = 8 suits the smoke corpus (5k vectors → ~600/cluster).
    * Production IVF sizes the cluster count ≈ √N with probes scaled to
    * the recall target (the standard IVF-flat guideline — Jégou et al.,
    * "Product Quantization for Nearest Neighbor Search", TPAMI 2011) —
    * at 1e9 vectors that is k ≈ 32768, nprobe 32-128; only these two
    * numbers change, the plan shape (centroid broadcast → probe →
    * in-cluster rerank) is scale-invariant. */
  def kmeansAssign(e: DataFrame, k: Int = 8): DataFrame = {
    val withVec = e.withColumn("features",
      org.apache.spark.ml.functions.array_to_vector(col("embedding")))
    val model = new org.apache.spark.ml.clustering.KMeans()
      .setK(k).setSeed(42L).setMaxIter(10).setFeaturesCol("features")
      .fit(withVec)
    model.transform(withVec)
      .withColumnRenamed("prediction", "cluster")
      .drop("features")
  }

  /** IVF with the k-means quantizer: score the query against the k
    * centroids (tiny — computed from the assignment), probe the top-4
    * clusters, exact re-rank inside them. Same plan shape as
    * [[qSimIvf]], with a learned partition function instead of the label
    * stand-in. */
  def qSimIvfKmeans(s: SparkSession, dir: String): DataFrame = {
    // no persist: the expensive step (KMeans.fit) is eager and internal
    // to kmeansAssign; the assignment itself is one narrow scan +
    // broadcast-model predict, cheaper to recompute for the two
    // consumers than to cache corpus-wide (and a persist here leaked —
    // registry callers have no unpersist hook)
    val assigned = kmeansAssign(t(s, dir, "embeddings"))
    val q = queryVec(s, dir)
    val cents = centroids(assigned.drop("label")
        .withColumnRenamed("cluster", "label"))
      .withColumnRenamed("label", "cluster")
    val probed = cents.crossJoin(broadcast(q))
      .select(col("cluster"), dot(col("centroid"), col("q_emb")).as("cscore"))
      .orderBy(col("cscore").desc, col("cluster"))
      .limit(4)
      .select(col("cluster"))
    assigned.join(broadcast(probed), Seq("cluster"))
      .crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("vec_id"), col("cluster"),
        r6(dot(col("embedding"), col("q_emb"))).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(20)
  }

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

  /** Oracle fragment: the query vector (embedding of min vec_id) as a
    * one-row CTE — DuckDB's `list_dot_product` over float→double casts
    * is IEEE-identical to the native VecDot loop (proven by
    * q_dedup_embed's hash-exact gate, Dedup.qDedupEmbedSql). */
  private val qvCte: String =
    """qv AS (
      |  SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS q_emb
      |  FROM embeddings ORDER BY vec_id LIMIT 1
      |)""".stripMargin

  val qSimBruteForceSql: String =
    s"""WITH $qvCte
      |SELECT e.vec_id, e.label,
      |  floor(list_dot_product(CAST(e.embedding AS DOUBLE[]), qv.q_emb)
      |        * 1000000.0 + 0.5) / 1000000.0 AS cos
      |FROM embeddings e, qv
      |WHERE e.vec_id <> qv.q_id
      |ORDER BY cos DESC, e.vec_id
      |LIMIT 20""".stripMargin

  /** IVF oracle mirrors the plan stage by stage: per-label positional-
    * mean centroids, probe = top-3 centroid scores, exact re-rank inside
    * the probed labels. Centroid averaging order differs between engines
    * at ~1e-16 — it only feeds probe SELECTION (never output values), and
    * the label scores are far from ties at gate scale. */
  val qSimIvfSql: String =
    s"""WITH $qvCte,
      |pos AS (
      |  SELECT label,
      |    UNNEST(CAST(embedding AS DOUBLE[])) AS v,
      |    UNNEST(range(len(embedding))) AS pos
      |  FROM embeddings
      |),
      |carr AS (
      |  SELECT label, list(v ORDER BY pos) AS centroid FROM (
      |    SELECT label, pos, AVG(v) AS v FROM pos GROUP BY label, pos
      |  ) GROUP BY label
      |),
      |probed AS (
      |  SELECT c.label
      |  FROM carr c, qv
      |  ORDER BY list_dot_product(c.centroid, qv.q_emb) DESC, c.label
      |  LIMIT 3
      |)
      |SELECT e.vec_id, e.label,
      |  floor(list_dot_product(CAST(e.embedding AS DOUBLE[]), qv.q_emb)
      |        * 1000000.0 + 0.5) / 1000000.0 AS cos
      |FROM embeddings e
      |JOIN probed p ON e.label = p.label, qv
      |WHERE e.vec_id <> qv.q_id
      |ORDER BY cos DESC, e.vec_id
      |LIMIT 20""".stripMargin

  /** Driver-gated recall certificate for the learned-quantizer IVF. The
    * k-means assignment itself is not SQL-expressible, so the TOP-K list
    * stays a rows-only gate — but the CLAIMS about it are checkable:
    * result count, recall@20 against brute force (bounded in-query, the
    * q_agg_approx pattern), whether the true nearest neighbor was found,
    * and the brute-force top score (DuckDB recomputes it exactly). A
    * quantizer regression (bad seed handling, probe ordering bug,
    * cluster starvation) now fails the driver gate, not just a spec. */
  def qSimIvfKmeansRecall(s: SparkSession, dir: String): DataFrame = {
    val ivf = qSimIvfKmeans(s, dir).select(col("vec_id"), col("cos"))
    val bf = qSimBruteForce(s, dir).select(col("vec_id"), col("cos"))
    val nIvf = ivf.agg(count(lit(1)).as("n_ivf"))
    val hits = ivf.select(col("vec_id"))
      .join(bf.select(col("vec_id")), Seq("vec_id"), "left_semi")
      .agg(count(lit(1)).as("n_hits"))
    val ivfTop = ivf.orderBy(col("cos").desc, col("vec_id")).limit(1)
      .select(col("vec_id").as("ivf_top_id"))
    val bfTop = bf.orderBy(col("cos").desc, col("vec_id")).limit(1)
      .select(col("vec_id").as("bf_top_id"), col("cos").as("bf_top1_cos"))
    nIvf.crossJoin(hits).crossJoin(ivfTop).crossJoin(bfTop)
      .select(col("n_ivf"),
        (col("n_hits").cast("double") / col("n_ivf") >= 0.5).as("recall_ok"),
        (col("ivf_top_id") === col("bf_top_id")).as("best_found"),
        col("bf_top1_cos"))
  }

  val qSimIvfKmeansRecallSql: String =
    s"""WITH $qvCte,
      |bf AS (
      |  SELECT e.vec_id,
      |    floor(list_dot_product(CAST(e.embedding AS DOUBLE[]), qv.q_emb)
      |          * 1000000.0 + 0.5) / 1000000.0 AS cos
      |  FROM embeddings e, qv
      |  WHERE e.vec_id <> qv.q_id
      |  ORDER BY cos DESC, e.vec_id
      |  LIMIT 20
      |)
      |SELECT CAST(20 AS BIGINT) AS n_ivf,
      |  TRUE AS recall_ok,
      |  TRUE AS best_found,
      |  (SELECT max(cos) FROM bf) AS bf_top1_cos""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sim_bruteforce_topk" -> (qSimBruteForce _),
    "q_sim_ivf_topk" -> (qSimIvf _),
    "q_sim_ivf_kmeans_topk" -> (qSimIvfKmeans _),
    "q_sim_ivf_kmeans_recall" -> (qSimIvfKmeansRecall _))

  /** The learned-quantizer variant stays rows-only (k-means is not
    * SQL-expressible; its arithmetic is pinned by the two oracles above
    * plus SimilaritySpec's recall checks). */
  val oracles: Map[String, String] = Map(
    "q_sim_bruteforce_topk" -> qSimBruteForceSql,
    "q_sim_ivf_topk" -> qSimIvfSql,
    "q_sim_ivf_kmeans_recall" -> qSimIvfKmeansRecallSql)
}
