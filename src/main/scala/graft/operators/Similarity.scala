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
  *
  * QUANTIZER BUILD IS OFFLINE: [[buildLabelQuantizer]] /
  * [[buildKmeansQuantizer]] materialize the centroid table (and, for
  * k-means, the corpus hive-partitioned by cluster id) once per corpus;
  * the search queries are probe-only — they read the stored quantizer,
  * never refit or re-aggregate it. At 100 TB a probe therefore touches
  * the tiny centroid table plus only the probed clusters' files
  * (partition pruning — see Scale.partitionedWrite).
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
    * (label, pos)). This is the QUANTIZER BUILD computation — called from
    * the offline [[buildLabelQuantizer]] / [[buildKmeansQuantizer]] store
    * builders, never from the per-query probe path (a full-corpus
    * dim×row explode per probe is a scale-killer at 100 TB). */
  def centroids(e: DataFrame): DataFrame =
    e.select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(avg(col("v")).as("v"))
      .groupBy(col("label"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("v")))),
        s => s.getField("v")).as("centroid"))

  // --- offline quantizer store ---------------------------------------------
  //
  // Index build is an OFFLINE step, separate from search: the store is
  // built once per corpus and every probe query reads the materialized
  // quantizer. The publish protocol (atomic move, idempotent, crash-safe,
  // version-keyed) is the shared [[graft.sources.ArtifactStore]] — the
  // same discipline the BPE tokenizer and winnowing index stores use.

  /** Bump when the build computation changes, so probes never read a
    * store built by older code. */
  private val StoreVersion = "v1"

  private def storeRoot(dir: String, kind: String): String =
    graft.sources.ArtifactStore.root(s"ivf-$kind", StoreVersion, dir)

  /** The corpus dir the driver's correctness gate verifies at (the t2
    * DuckDB-oracle scale — TESTDATA.md/driver contract: always sf0.01).
    * The ANN top-k oracles REPLAY the probe from the artifact store the
    * gate run published for this dir: the learned quantizers are not
    * SQL-expressible, but once materialized (centroids / codebooks /
    * cluster-partitioned codes) the probe is pure relational algebra +
    * integer-exact ADC arithmetic DuckDB reproduces hash-exactly via
    * read_parquet over the same files. */
  val OracleDir = "/root/testdata/sf0.01"

  /** Store root as seen by BOTH the gate run and the oracle replay
    * (same JVM computes both strings — Verify dumps oracle_sql.json in
    * the process that ran the gates, so java.io.tmpdir agrees). */
  def oracleRoot(kind: String): String =
    graft.sources.ArtifactStore.root(kind, StoreVersion, OracleDir)

  private def ensureBuilt(root: String)(build: String => Unit): Unit =
    graft.sources.ArtifactStore.ensureBuilt(root)(build)

  /** OFFLINE BUILD, label quantizer: materialize the per-label centroid
    * table. Idempotent; returns the store root. */
  def buildLabelQuantizer(s: SparkSession, dir: String): String = {
    val root = storeRoot(dir, "label")
    ensureBuilt(root) { staging =>
      centroids(t(s, dir, "embeddings"))
        .coalesce(1).write.parquet(s"$staging/centroids")
    }
    root
  }

  /** OFFLINE BUILD, learned quantizer: fit k-means once, materialize the
    * centroid table AND the assigned corpus hive-partitioned by cluster
    * id — the partitioned IVF store, so probes prune unprobed clusters
    * at the file level (PartitionFilters, verified in LlmOpsSpec).
    * Idempotent; returns the store root. */
  def buildKmeansQuantizer(s: SparkSession, dir: String): String = {
    val root = storeRoot(dir, "kmeans")
    ensureBuilt(root) { staging =>
      val assigned = kmeansAssign(t(s, dir, "embeddings")).persist()
      try {
        assigned.write.partitionBy("cluster").parquet(s"$staging/assign")
        centroids(assigned.drop("label").withColumnRenamed("cluster", "label"))
          .withColumnRenamed("label", "cluster")
          .coalesce(1).write.parquet(s"$staging/centroids")
      } finally assigned.unpersist()
    }
    root
  }

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

  /** IVF search with the k-means quantizer, PROBE ONLY: the quantizer
    * comes from the materialized store ([[buildKmeansQuantizer]] — built
    * once, offline; the first call in a fresh environment triggers the
    * build). Probe plan: score the query against the k stored centroids
    * (tiny scan), pick the top-4 clusters, then exact re-rank reading
    * ONLY those clusters' files from the cluster-partitioned store —
    * the probe list is ≤nprobe ids (bounded, like Lexicon's 20-row probe
    * collect), inlined as a partition filter so pruning happens before
    * file listing. No KMeans.fit, no corpus-wide shuffle anywhere in the
    * query path. */
  def qSimIvfKmeans(s: SparkSession, dir: String): DataFrame =
    probeKmeansStore(s, buildKmeansQuantizer(s, dir), queryVec(s, dir))

  /** Probe an existing kmeans IVF store with a 1-row query frame
    * (q_id, q_emb). Same plan as [[qSimIvfKmeans]] documents; exposed
    * separately so ad-hoc stores (tests, incremental-ingest jobs) probe
    * through the identical code path. */
  def probeKmeansStore(s: SparkSession, root: String, q: DataFrame,
                       nprobe: Int = 4, topk: Int = 20): DataFrame = {
    val cents = s.read.parquet(s"$root/centroids")
    val probedIds = cents.crossJoin(broadcast(q))
      .select(col("cluster"), dot(col("centroid"), col("q_emb")).as("cscore"))
      .orderBy(col("cscore").desc, col("cluster"))
      .limit(nprobe)
      .select(col("cluster"))
      .collect().map(_.get(0)).toSeq // ≤nprobe rows — bounded
    s.read.parquet(s"$root/assign")
      .where(col("cluster").isin(probedIds: _*))
      .crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("vec_id"), col("cluster"),
        r6(dot(col("embedding"), col("q_emb"))).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(topk)
  }

  /** INCREMENTAL INDEX ADD — keep the IVF store fresh between rebuilds:
    * assign each incoming vector to its nearest STORED centroid (the
    * build metric, squared Euclidean) and append it into the
    * cluster-partitioned assign table. One broadcast of k centroids ×
    * one scan of the batch — no KMeans.fit, no touch of existing
    * segments, partition pruning for probes unchanged (appends land as
    * new files inside the existing cluster=N dirs). Centroids drift as
    * the corpus grows; the standard IVF regime applies — periodic
    * offline rebuild, incremental adds in between (the reference's
    * insert-buffer → background-merge shape, engine.h:210, transposed
    * to index maintenance). */
  def appendToKmeansStore(s: SparkSession, root: String,
                          newVecs: DataFrame): Unit = {
    val cents = s.read.parquet(s"$root/centroids")
      .select(col("cluster").as("__c"), col("centroid"))
    val assigned = newVecs
      .crossJoin(broadcast(cents))
      .withColumn("__d", expr(
        """aggregate(zip_with(embedding, centroid,
          |  (a, b) -> (CAST(a AS DOUBLE) - b) * (CAST(a AS DOUBLE) - b)),
          |  0D, (acc, x) -> acc + x)""".stripMargin))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("__d"), col("__c"))).as("__w"),
        first(col("label")).as("label"),
        first(col("embedding")).as("embedding"))
      .select(col("vec_id"), col("label"), col("embedding"),
        col("__w.__c").as("cluster"))
    assigned.write.mode("append").partitionBy("cluster")
      .parquet(s"$root/assign")
  }

  /** IVF search (label quantizer), PROBE ONLY: centroids come from the
    * materialized store ([[buildLabelQuantizer]]); probe the nprobe=3
    * closest, exact re-rank inside the probed labels only — the label
    * list is inlined as a pushed-down scan filter, so parquet row-group
    * stats skip unprobed labels. The per-probe full-corpus centroid
    * rebuild this replaced was the r7 scale-killer. */
  def qSimIvf(s: SparkSession, dir: String): DataFrame = {
    val root = buildLabelQuantizer(s, dir)
    val q = queryVec(s, dir)
    val probedLabels = s.read.parquet(s"$root/centroids")
      .crossJoin(broadcast(q))
      .select(col("label"), dot(col("centroid"), col("q_emb")).as("cscore"))
      .orderBy(col("cscore").desc, col("label"))
      .limit(3)
      .select(col("label"))
      .collect().map(_.get(0)).toSeq // ≤nprobe rows — bounded
    t(s, dir, "embeddings")
      .where(col("label").isin(probedLabels: _*))
      .crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("vec_id"), col("label"),
        r6(dot(col("embedding"), col("q_emb"))).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(20)
  }

  // --- LSH-bucketed ANN (sign random projection / hyperplane LSH) ---------

  /** Number of hyperplanes → 2^bits buckets. 6 bits = 64 buckets sizes
    * the smoke corpus (500-5k vectors → 8-80/bucket); production sizes
    * bits ≈ log2(N / target_bucket_size) and adds independent tables
    * for recall (Charikar 2002 sign-random-projection; Indyk-Motwani
    * LSH framework) — only these constants change, the plan shape is
    * scale-invariant. */
  val LshBits = 6
  private val LshDim = 64

  /** Deterministic pseudo-random hyperplane j: weights in [-1, 1] from
    * pure integer arithmetic BOTH engines evaluate identically (Knuth
    * multiplicative constants; products stay ≪ 2^63 so neither engine
    * overflows). A learned/random matrix would broadcast instead — the
    * derivation is the deterministic stand-in, the plumbing is real. */
  private def lshPlane(j: Int): Column =
    expr(s"transform(sequence(0, ${LshDim - 1}), i -> " +
      s"CAST((i * 1315423911L + $j * 2654435761L) % 2001 - 1000 AS DOUBLE)" +
      " / 1000.0)")

  /** 6-bit signature: bit j = sign(v · plane_j). Constant-folded plane
    * arrays, native VecDot — a pure codegen projection, one scan. */
  def lshSig(v: Column): Column =
    (0 until LshBits).map(j =>
      when(dot(v, lshPlane(j)) > 0.0, lit(1 << j)).otherwise(lit(0)))
      .reduce(_ + _)

  /** LSH ANN probe, multiprobe hamming ≤ 1: candidates = vectors whose
    * signature matches the query's bucket or any 1-bit flip (the
    * standard multiprobe sequence), exact cosine re-rank inside the
    * candidate set only. Scale shape: signatures are a scan-side
    * projection; the probe list is bits+1 signatures broadcast as a
    * tiny join side; with the corpus WRITTEN bucketed by `sig` (the
    * IVF-store pattern) the rerank scan prunes all unprobed buckets at
    * the file level. */
  def qSimLsh(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val sigs = e.select(col("vec_id"), col("embedding"),
      lshSig(col("embedding")).as("sig"))
    val q = queryVec(s, dir).withColumn("qsig", lshSig(col("q_emb")))
    val probes = q.select(col("q_id"), col("q_emb"),
      explode(array(col("qsig") +: (0 until LshBits).map(b =>
        col("qsig").bitwiseXOR(lit(1 << b))): _*)).as("sig"))
    sigs.join(broadcast(probes), "sig")
      .where(col("vec_id") =!= col("q_id"))
      .select(col("vec_id"), col("sig").cast("long").as("sig"),
        r6(dot(col("embedding"), col("q_emb"))).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(20)
  }

  /** Oracle: the identical algorithm — signature arithmetic, multiprobe
    * list, rerank — in DuckDB; hash-exact, so bucketing AND recall
    * behavior are both pinned. */
  val qSimLshSql: String = {
    def planeSql(j: Int): String =
      s"list_transform(range(0, $LshDim), i -> " +
        s"CAST((i * 1315423911 + $j * 2654435761) % 2001 - 1000 AS DOUBLE)" +
        " / 1000.0)"
    def sigSql(v: String): String = (0 until LshBits).map(j =>
      s"(CASE WHEN list_dot_product($v, ${planeSql(j)}) > 0.0 " +
        s"THEN ${1 << j} ELSE 0 END)").mkString(" + ")
    val flips = (0 until LshBits).map(b => s"xor(qsig, ${1 << b})")
      .mkString(", ")
    s"""WITH qv AS (
      |  SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS q_emb
      |  FROM embeddings ORDER BY vec_id LIMIT 1
      |), sigs AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
      |    ${sigSql("CAST(embedding AS DOUBLE[])")} AS sig
      |  FROM embeddings
      |), qs AS (
      |  SELECT q_id, q_emb, ${sigSql("q_emb")} AS qsig FROM qv
      |), probes AS (
      |  SELECT q_id, q_emb, u.s AS sig
      |  FROM qs, unnest([qsig, $flips]) AS u(s)
      |)
      |SELECT s.vec_id, CAST(s.sig AS BIGINT) AS sig,
      |  floor(list_dot_product(s.emb, p.q_emb)
      |        * 1000000.0 + 0.5) / 1000000.0 AS cos
      |FROM sigs s JOIN probes p ON s.sig = p.sig
      |WHERE s.vec_id <> p.q_id
      |ORDER BY cos DESC, s.vec_id
      |LIMIT 20""".stripMargin
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

  /** Oracle for the learned-quantizer IVF top-k: replay the probe from
    * the PUBLISHED store (k-means itself is not SQL-expressible, but its
    * materialized centroids + cluster-partitioned assignment are plain
    * parquet) — probe selection and rerank are then the same relational
    * algebra DuckDB computes hash-exactly. Centroid scores feed
    * SELECTION only (the qSimIvfSql precedent); output values come from
    * the fixed-point-rounded rerank dot products. */
  val qSimIvfKmeansSql: String = {
    val root = oracleRoot("ivf-kmeans")
    s"""WITH $qvCte,
      |cents AS (
      |  SELECT CAST(cluster AS INT) AS cluster, centroid
      |  FROM read_parquet('$root/centroids/*.parquet')
      |), probed AS (
      |  SELECT c.cluster FROM cents c, qv
      |  ORDER BY list_dot_product(c.centroid, qv.q_emb) DESC, c.cluster
      |  LIMIT 4
      |), assign AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
      |    CAST(cluster AS INT) AS cluster
      |  FROM read_parquet('$root/assign/*/*.parquet', hive_partitioning = 1)
      |)
      |SELECT a.vec_id, a.cluster,
      |  floor(list_dot_product(a.emb, qv.q_emb) * 1000000.0 + 0.5)
      |    / 1000000.0 AS cos
      |FROM assign a JOIN probed p ON a.cluster = p.cluster, qv
      |WHERE a.vec_id <> qv.q_id
      |ORDER BY cos DESC, a.vec_id
      |LIMIT 20""".stripMargin
  }

  /** Driver-gated recall certificate for the learned-quantizer IVF. The
    * k-means assignment itself is not SQL-expressible, so the TOP-K list
    * is oracled by STORE REPLAY ([[qSimIvfKmeansSql]]) — and the CLAIMS
    * about it are independently checkable:
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

  // --- product quantization (PQ / ADC) -------------------------------------

  /** PQ geometry (Jégou et al., "Product Quantization for Nearest
    * Neighbor Search", TPAMI 2011): the 64-dim embedding splits into
    * M = 8 subspaces of 8 dims; each subspace gets its own K = 16-code
    * codebook → one byte-sized code per subspace, an 8-code word per
    * vector — 32× smaller than the float vector. At 1e9+ vectors the
    * codes table is what fits in memory/fast storage while the raw
    * vectors stay cold; production PQ uses K = 256 and composes with the
    * IVF coarse quantizer (IVFADC) — only the constants change. */
  val PqM = 8
  val PqK = 16
  private val PqDim = 64
  private val PqSub = PqDim / PqM

  private def subVec(v: Column, m: Int): Column =
    slice(v, m * PqSub + 1, PqSub)

  /** OFFLINE BUILD: train the M per-subspace codebooks (independent
    * seeded k-means fits over 8-dim subvectors — at 100 TB each fit
    * trains on a bounded sample; a codebook is 16×8 doubles, model-
    * sized) and encode the corpus: nearest code per (vector, subspace)
    * by the train metric (squared L2), via ONE posexplode scan joined
    * against the broadcast codebook — corpus-sized work is a single
    * scan + the per-vector code reassembly aggregate. Published via
    * [[graft.sources.ArtifactStore]] (atomic, idempotent, versioned). */
  /** Train the M per-subspace codebooks over `e.embedding` (each fit is
    * model-sized output; at 100 TB each trains on a bounded sample). */
  def trainPqCodebooks(s: SparkSession, e: DataFrame): DataFrame = {
    val rows = (0 until PqM).flatMap { m =>
      val sub = e.select(org.apache.spark.ml.functions
        .array_to_vector(subVec(col("embedding"), m)).as("features"))
      val model = new org.apache.spark.ml.clustering.KMeans()
        .setK(PqK).setSeed(42L + m).setMaxIter(10).fit(sub)
      model.clusterCenters.zipWithIndex.map { case (c, code) =>
        (m, code, c.toArray)
      }
    }
    s.createDataFrame(rows).toDF("m", "code", "centroid")
  }

  /** Encode the corpus against a codebook: nearest code per (vector,
    * subspace) by the train metric (squared L2), via ONE posexplode scan
    * joined to the broadcast codebook. `carry` columns ride through the
    * reassembly aggregate (e.g. the IVF cluster id). */
  def pqEncode(e: DataFrame, cb: DataFrame,
               carry: Seq[String] = Nil): DataFrame = {
    val subs = e.select(
      (col("vec_id") +: carry.map(col)) :+ posexplode(array(
        (0 until PqM).map(m => subVec(col("embedding"), m)): _*))
        .as(Seq("m", "sv")): _*)
    val aggs = min(struct(col("__d"), col("code"))).as("__w") +:
      carry.map(c => first(col(c)).as(c))
    val perSub = subs.join(broadcast(cb), Seq("m"))
      .withColumn("__d", expr(
        """aggregate(zip_with(sv, centroid,
          |  (a, b) -> (CAST(a AS DOUBLE) - b) * (CAST(a AS DOUBLE) - b)),
          |  0D, (acc, x) -> acc + x)""".stripMargin))
      .groupBy(col("vec_id"), col("m"))
      .agg(aggs.head, aggs.tail: _*)
    val reAggs = transform(
      array_sort(collect_list(struct(col("m"), col("__w.code").as("c")))),
      x => x.getField("c")).as("codes") +:
      carry.map(c => first(col(c)).as(c))
    perSub.groupBy(col("vec_id")).agg(reAggs.head, reAggs.tail: _*)
  }

  def buildPqStore(s: SparkSession, dir: String): String = {
    val root = graft.sources.ArtifactStore.root("pq", StoreVersion, dir)
    ensureBuilt(root) { staging =>
      val e = t(s, dir, "embeddings")
      val cb = trainPqCodebooks(s, e)
      cb.coalesce(1).write.parquet(s"$staging/codebook")
      pqEncode(e, cb).write.parquet(s"$staging/codes")
    }
    root
  }

  /** PQ probe — asymmetric distance computation (ADC): the query builds
    * an M×K inner-product lookup table against the stored codebooks
    * (128 rows — broadcast), every encoded vector's approximate score is
    * the sum of its M table hits (codes scan + broadcast join + one
    * aggregate; the raw vectors are NOT read), the ADC top-`shortlist`
    * is then exactly re-ranked against the real embeddings (bounded
    * candidate join). LUT entries are ×10⁶ fixed-point LONGs so the
    * 8-term ADC sum is integer-exact and order-independent —
    * deterministic across shuffles. */
  def probePqStore(s: SparkSession, root: String, q: DataFrame,
                   e: DataFrame, shortlist: Int = 100,
                   topk: Int = 20): DataFrame = {
    val cb = s.read.parquet(s"$root/codebook")
    val lut = cb.crossJoin(broadcast(q))
      .select(col("m"), col("code"),
        floor(dot(col("centroid"),
          expr(s"slice(q_emb, m * $PqSub + 1, $PqSub)"))
          * lit(1000000.0) + lit(0.5)).cast("long").as("ip6"))
    val adcShort = s.read.parquet(s"$root/codes")
      .select(col("vec_id"), posexplode(col("codes")).as(Seq("m", "code")))
      .join(broadcast(lut), Seq("m", "code"))
      .groupBy(col("vec_id"))
      .agg(sum(col("ip6")).as("adc6"))
      .orderBy(col("adc6").desc, col("vec_id"))
      .limit(shortlist)
      .select(col("vec_id"),
        (col("adc6").cast("double") / 1000000.0).as("adc"))
    e.join(broadcast(adcShort), Seq("vec_id"))
      .crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("vec_id"), col("adc"),
        r6(dot(col("embedding"), col("q_emb"))).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(topk)
  }

  /** PQ/ADC top-k for the gate query vector. Learned codebooks are not
    * SQL-expressible, but the probe against the PUBLISHED store is —
    * [[qSimPqSql]] replays it; [[qSimPqRecall]] carries the independent
    * claims and PqSpec pins encode/probe semantics. */
  def qSimPq(s: SparkSession, dir: String): DataFrame =
    probePqStore(s, buildPqStore(s, dir), queryVec(s, dir),
      t(s, dir, "embeddings"))

  /** Oracle for the PQ top-k: replay ADC from the stored codebook +
    * codes. The ×10⁶ fixed-point LUT makes every ADC sum an exact
    * integer (order-independent), so shortlist membership AND the
    * reported `adc` values are bit-identical; the rerank stage is the
    * same fixed-point cosine every other ANN oracle uses. */
  val qSimPqSql: String = {
    val root = oracleRoot("pq")
    s"""WITH $qvCte,
      |lut AS (
      |  SELECT m, code,
      |    CAST(floor(list_dot_product(centroid,
      |        qv.q_emb[m * $PqSub + 1 : m * $PqSub + $PqSub])
      |      * 1000000.0 + 0.5) AS BIGINT) AS ip6
      |  FROM read_parquet('$root/codebook/*.parquet'), qv
      |), expl AS (
      |  SELECT vec_id, CAST(u.i AS INT) - 1 AS m,
      |    codes[CAST(u.i AS INT)] AS code
      |  FROM read_parquet('$root/codes/*.parquet'),
      |    UNNEST(range(1, len(codes) + 1)) AS u(i)
      |), shortlist AS (
      |  SELECT x.vec_id, SUM(l.ip6) AS adc6
      |  FROM expl x JOIN lut l ON x.m = l.m AND x.code = l.code
      |  GROUP BY x.vec_id
      |  ORDER BY adc6 DESC, x.vec_id
      |  LIMIT 100
      |)
      |SELECT e.vec_id, CAST(s.adc6 AS DOUBLE) / 1000000.0 AS adc,
      |  floor(list_dot_product(CAST(e.embedding AS DOUBLE[]), qv.q_emb)
      |        * 1000000.0 + 0.5) / 1000000.0 AS cos
      |FROM embeddings e JOIN shortlist s ON e.vec_id = s.vec_id, qv
      |WHERE e.vec_id <> qv.q_id
      |ORDER BY cos DESC, e.vec_id
      |LIMIT 20""".stripMargin
  }

  /** Driver-gated certificate for the PQ path (the qSimIvfKmeansRecall
    * pattern): result count, recall@20 against brute force, whether the
    * true nearest neighbor survived quantization, and the brute-force
    * top score (recomputed exactly by DuckDB). */
  def qSimPqRecall(s: SparkSession, dir: String): DataFrame = {
    val pq = qSimPq(s, dir).select(col("vec_id"), col("cos"))
    val bf = qSimBruteForce(s, dir).select(col("vec_id"), col("cos"))
    val nPq = pq.agg(count(lit(1)).as("n_pq"))
    val hits = pq.select(col("vec_id"))
      .join(bf.select(col("vec_id")), Seq("vec_id"), "left_semi")
      .agg(count(lit(1)).as("n_hits"))
    val pqTop = pq.orderBy(col("cos").desc, col("vec_id")).limit(1)
      .select(col("vec_id").as("pq_top_id"))
    val bfTop = bf.orderBy(col("cos").desc, col("vec_id")).limit(1)
      .select(col("vec_id").as("bf_top_id"), col("cos").as("bf_top1_cos"))
    nPq.crossJoin(hits).crossJoin(pqTop).crossJoin(bfTop)
      .select(col("n_pq"),
        (col("n_hits").cast("double") / col("n_pq") >= 0.5).as("recall_ok"),
        (col("pq_top_id") === col("bf_top_id")).as("best_found"),
        col("bf_top1_cos"))
  }

  val qSimPqRecallSql: String =
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
      |SELECT CAST(20 AS BIGINT) AS n_pq,
      |  TRUE AS recall_ok,
      |  TRUE AS best_found,
      |  (SELECT max(cos) FROM bf) AS bf_top1_cos""".stripMargin

  // --- hard-negative mining -------------------------------------------------

  /** Cosine band defining a "hard" negative: similar enough to teach the
    * model a boundary, below the near-duplicate zone (a near-dup used as
    * a negative poisons contrastive training — it is secretly a
    * positive). Bounds sit inside the testdata's cosine range so the
    * gate exercises both cutoffs. */
  val HardNegLo = 0.25
  val HardNegHi = 0.45

  /** Hard-negative mining for contrastive/embedding-model training
    * (in-batch negatives are mostly easy; training signal comes from
    * negatives NEAR the anchor — the ANCE/DPR mining step): for each
    * anchor, the top-5 candidates inside the [lo, hi) cosine band.
    *
    * Scale shape: the anchor set is training-batch-sized and BROADCASTS;
    * the corpus streams through one scan scoring against every anchor
    * (broadcast nested-loop — the decontaminateEmbed contract), the band
    * filter cuts in-scan, and the per-anchor top-5 runs as a
    * WindowGroupLimit heap over bounded (anchor-keyed) partitions. At
    * 1e9 vectors the scan side swaps for an ANN probe (the IVF/PQ stores
    * above) feeding the same band filter — the downstream contract is
    * unchanged. */
  def qHardNegatives(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = t(s, dir, "embeddings")
    val anchors = broadcast(e.where(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("anchor_id"), col("embedding").as("a_emb")))
    val w = Window.partitionBy(col("anchor_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    e.join(anchors, col("vec_id") =!= col("anchor_id"))
      .select(col("anchor_id"), col("vec_id"),
        r6(dot(col("embedding"), col("a_emb"))).as("cos"))
      .where(col("cos") >= HardNegLo && col("cos") < HardNegHi)
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 5)
      .select(col("anchor_id"), col("rk"), col("vec_id"), col("cos"))
  }

  val qHardNegativesSql: String =
    s"""WITH anchors AS (
      |  SELECT vec_id AS anchor_id, CAST(embedding AS DOUBLE[]) AS a_emb
      |  FROM embeddings WHERE vec_id % 100 = 0
      |), banded AS (
      |  SELECT a.anchor_id, e.vec_id,
      |    floor(list_dot_product(CAST(e.embedding AS DOUBLE[]), a.a_emb)
      |          * 1000000.0 + 0.5) / 1000000.0 AS cos
      |  FROM embeddings e JOIN anchors a ON e.vec_id <> a.anchor_id
      |), ranked AS (
      |  SELECT anchor_id, vec_id, cos,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY anchor_id
      |                            ORDER BY cos DESC, vec_id) AS INTEGER)
      |      AS rk
      |  FROM banded
      |  WHERE cos >= $HardNegLo AND cos < $HardNegHi
      |)
      |SELECT anchor_id, rk, vec_id, cos FROM ranked WHERE rk <= 5""".stripMargin

  // --- IVF-PQ composition (IVFADC shape) -----------------------------------

  /** OFFLINE BUILD, composed index: the k-means coarse quantizer
    * partitions the corpus into clusters AND the PQ codebooks compress
    * every vector to an 8-code word; codes and raw vectors are both
    * stored hive-partitioned by cluster. This is the IVFADC layout
    * (Jégou et al. 2011 §IV) minus residual encoding — codes quantize
    * the raw vector, not (v − centroid); the probe's exact-rerank tail
    * absorbs the recall the simplification costs, and the certificate
    * gate measures it. At 1e9+ vectors this is THE serving layout:
    * probes touch nprobe/k of the codes files (partition pruning), ADC
    * never reads a float vector, and only the shortlist hits the raw
    * store. */
  def buildIvfPqStore(s: SparkSession, dir: String): String = {
    val root = graft.sources.ArtifactStore.root("ivfpq", StoreVersion, dir)
    ensureBuilt(root) { staging =>
      val assigned = kmeansAssign(t(s, dir, "embeddings")).persist()
      try {
        assigned.write.partitionBy("cluster").parquet(s"$staging/assign")
        centroids(assigned.drop("label").withColumnRenamed("cluster", "label"))
          .withColumnRenamed("label", "cluster")
          .coalesce(1).write.parquet(s"$staging/centroids")
        val cb = trainPqCodebooks(s, assigned)
        cb.coalesce(1).write.parquet(s"$staging/codebook")
        pqEncode(assigned, cb, carry = Seq("cluster"))
          .write.partitionBy("cluster").parquet(s"$staging/codes")
      } finally assigned.unpersist()
    }
    root
  }

  /** IVF-PQ probe: pick the top-`nprobe` clusters against the stored
    * centroids (tiny scan, bounded collect — the probeKmeansStore
    * discipline), ADC-score ONLY those clusters' code files (partition
    * pruning before file listing), exact-rerank the bounded shortlist
    * from the equally-pruned raw store. */
  def probeIvfPqStore(s: SparkSession, root: String, q: DataFrame,
                      nprobe: Int = 4, shortlist: Int = 100,
                      topk: Int = 20): DataFrame = {
    val probedIds = s.read.parquet(s"$root/centroids")
      .crossJoin(broadcast(q))
      .select(col("cluster"), dot(col("centroid"), col("q_emb")).as("cscore"))
      .orderBy(col("cscore").desc, col("cluster"))
      .limit(nprobe)
      .select(col("cluster"))
      .collect().map(_.get(0)).toSeq // ≤nprobe rows — bounded
    val cb = s.read.parquet(s"$root/codebook")
    val lut = cb.crossJoin(broadcast(q))
      .select(col("m"), col("code"),
        floor(dot(col("centroid"),
          expr(s"slice(q_emb, m * $PqSub + 1, $PqSub)"))
          * lit(1000000.0) + lit(0.5)).cast("long").as("ip6"))
    val adcShort = s.read.parquet(s"$root/codes")
      .where(col("cluster").isin(probedIds: _*))
      .select(col("vec_id"), posexplode(col("codes")).as(Seq("m", "code")))
      .join(broadcast(lut), Seq("m", "code"))
      .groupBy(col("vec_id"))
      .agg(sum(col("ip6")).as("adc6"))
      .orderBy(col("adc6").desc, col("vec_id"))
      .limit(shortlist)
      .select(col("vec_id"),
        (col("adc6").cast("double") / 1000000.0).as("adc"))
    s.read.parquet(s"$root/assign")
      .where(col("cluster").isin(probedIds: _*))
      .join(broadcast(adcShort), Seq("vec_id"))
      .crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("vec_id"), col("cluster"), col("adc"),
        r6(dot(col("embedding"), col("q_emb"))).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(topk)
  }

  /** IVF-PQ top-k for the gate query — both learned quantizers are
    * replayed from the published store by [[qSimIvfPqSql]];
    * [[qSimIvfPqRecall]] carries the independent claims. */
  def qSimIvfPq(s: SparkSession, dir: String): DataFrame =
    probeIvfPqStore(s, buildIvfPqStore(s, dir), queryVec(s, dir))

  /** Oracle for the composed IVF-PQ top-k: cluster probe from the stored
    * centroids, integer-exact ADC over ONLY the probed clusters' codes
    * (the hive-partition filter becomes a WHERE on the partition
    * column), exact rerank from the equally-filtered raw store. */
  val qSimIvfPqSql: String = {
    val root = oracleRoot("ivfpq")
    s"""WITH $qvCte,
      |cents AS (
      |  SELECT CAST(cluster AS INT) AS cluster, centroid
      |  FROM read_parquet('$root/centroids/*.parquet')
      |), probed AS (
      |  SELECT c.cluster FROM cents c, qv
      |  ORDER BY list_dot_product(c.centroid, qv.q_emb) DESC, c.cluster
      |  LIMIT 4
      |), lut AS (
      |  SELECT m, code,
      |    CAST(floor(list_dot_product(centroid,
      |        qv.q_emb[m * $PqSub + 1 : m * $PqSub + $PqSub])
      |      * 1000000.0 + 0.5) AS BIGINT) AS ip6
      |  FROM read_parquet('$root/codebook/*.parquet'), qv
      |), codes AS (
      |  SELECT c.vec_id, c.codes
      |  FROM read_parquet('$root/codes/*/*.parquet',
      |    hive_partitioning = 1) c
      |  JOIN probed p ON CAST(c.cluster AS INT) = p.cluster
      |), expl AS (
      |  SELECT vec_id, CAST(u.i AS INT) - 1 AS m,
      |    codes[CAST(u.i AS INT)] AS code
      |  FROM codes, UNNEST(range(1, len(codes) + 1)) AS u(i)
      |), shortlist AS (
      |  SELECT x.vec_id, SUM(l.ip6) AS adc6
      |  FROM expl x JOIN lut l ON x.m = l.m AND x.code = l.code
      |  GROUP BY x.vec_id
      |  ORDER BY adc6 DESC, x.vec_id
      |  LIMIT 100
      |), assign AS (
      |  SELECT a.vec_id, CAST(a.embedding AS DOUBLE[]) AS emb,
      |    CAST(a.cluster AS INT) AS cluster
      |  FROM read_parquet('$root/assign/*/*.parquet',
      |    hive_partitioning = 1) a
      |  JOIN probed p ON CAST(a.cluster AS INT) = p.cluster
      |)
      |SELECT a.vec_id, a.cluster, CAST(s.adc6 AS DOUBLE) / 1000000.0 AS adc,
      |  floor(list_dot_product(a.emb, qv.q_emb) * 1000000.0 + 0.5)
      |    / 1000000.0 AS cos
      |FROM assign a JOIN shortlist s ON a.vec_id = s.vec_id, qv
      |WHERE a.vec_id <> qv.q_id
      |ORDER BY cos DESC, a.vec_id
      |LIMIT 20""".stripMargin
  }

  /** Certificate for the composed index: both quantization stages are in
    * the loop, so this measures what cluster pruning AND code
    * compression together cost against brute force. */
  def qSimIvfPqRecall(s: SparkSession, dir: String): DataFrame = {
    val ivfpq = qSimIvfPq(s, dir).select(col("vec_id"), col("cos"))
    val bf = qSimBruteForce(s, dir).select(col("vec_id"), col("cos"))
    val n = ivfpq.agg(count(lit(1)).as("n_ivfpq"))
    val hits = ivfpq.select(col("vec_id"))
      .join(bf.select(col("vec_id")), Seq("vec_id"), "left_semi")
      .agg(count(lit(1)).as("n_hits"))
    val top = ivfpq.orderBy(col("cos").desc, col("vec_id")).limit(1)
      .select(col("vec_id").as("pq_top_id"))
    val bfTop = bf.orderBy(col("cos").desc, col("vec_id")).limit(1)
      .select(col("vec_id").as("bf_top_id"), col("cos").as("bf_top1_cos"))
    n.crossJoin(hits).crossJoin(top).crossJoin(bfTop)
      .select(col("n_ivfpq"),
        (col("n_hits").cast("double") / col("n_ivfpq") >= 0.5)
          .as("recall_ok"),
        (col("pq_top_id") === col("bf_top_id")).as("best_found"),
        col("bf_top1_cos"))
  }

  val qSimIvfPqRecallSql: String =
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
      |SELECT CAST(20 AS BIGINT) AS n_ivfpq,
      |  TRUE AS recall_ok,
      |  TRUE AS best_found,
      |  (SELECT max(cos) FROM bf) AS bf_top1_cos""".stripMargin

  // --- hybrid retrieval (vector recall + lexical rerank) -------------------

  /** The fixed lexical query for the hybrid gate (terms present in the
    * corpus vocabulary; a real system parameterizes them). */
  val HybridTerms: Seq[String] = Seq("hash", "join")

  /** Hybrid retrieval — the RAG serving shape: ANN vector recall, then
    * chunk-level lexical rerank of ONLY the recalled documents.
    *
    *   1. vector stage: exact top-10 cosine docs for the query vector
    *      (brute-force here; [[probeKmeansStore]] / the LSH bucket path
    *      are drop-in replacements at scale — same output contract);
    *   2. chunk fan-out on the 10 candidates only (embeddings align
    *      vec_id = doc_id): [[Corpus.chunkTokens]] behind a broadcast
    *      join, so the corpus-wide chunk explosion never happens in the
    *      serving path;
    *   3. lexical stage: query-term occurrences per chunk
    *      (`filter(chunk_toks, _ ∈ terms)` — codegen'd array op), best
    *      chunk per doc by (hits, chunk_idx), hybrid score =
    *      cos/2 + min(hits/4, 1)/2, fixed-point rounded.
    *
    * Scale shape: every stage after the recall operates on k=10 docs —
    * the only corpus-sized work is the vector scan, which is exactly the
    * part the IVF/LSH stores already reduce to probed partitions. */
  def qRetrievalHybrid(s: SparkSession, dir: String): DataFrame = {
    // 10-row recall result, materialized once: its lineage is the
    // corpus-sized vector scan and it feeds both the chunk fan-out and
    // the final score join
    val cand = qSimBruteForce(s, dir)
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(10)
      .select(col("vec_id").as("doc_id"), col("cos"))
      .localCheckpoint(true)
    val candDocs = t(s, dir, "documents")
      .join(broadcast(cand), Seq("doc_id"))
    val hits = size(filter(col("chunk_toks"),
      tok => HybridTerms.map(tok === _).reduce(_ || _))).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("term_hits").desc, col("chunk_idx"))
    Corpus.chunkTokens(candDocs)
      .select(col("doc_id"), col("chunk_idx"), hits.as("term_hits"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .join(broadcast(cand), Seq("doc_id"))
      .select(col("doc_id"), col("cos"),
        col("chunk_idx").as("best_chunk"), col("term_hits"),
        r6(col("cos") * 0.5
          + least(col("term_hits") / lit(4.0), lit(1.0)) * 0.5)
          .as("hybrid_score"))
  }

  val qRetrievalHybridSql: String = {
    val termList = HybridTerms.map(t => s"'$t'").mkString(", ")
    s"""WITH $qvCte,
      |cand AS (
      |  SELECT e.vec_id AS doc_id,
      |    floor(list_dot_product(CAST(e.embedding AS DOUBLE[]), qv.q_emb)
      |          * 1000000.0 + 0.5) / 1000000.0 AS cos
      |  FROM embeddings e, qv
      |  WHERE e.vec_id <> qv.q_id
      |  ORDER BY cos DESC, e.vec_id
      |  LIMIT 10
      |),
      |c AS (
      |${Corpus.sqlChunkTokensFrom(
        "(SELECT doc_id, text FROM documents JOIN cand USING (doc_id))")}
      |),
      |h AS (
      |  SELECT doc_id, chunk_idx,
      |    CAST(len(list_filter(${Corpus.sqlChunkSlice},
      |      x -> x IN ($termList))) AS BIGINT) AS term_hits
      |  FROM c
      |),
      |best AS (
      |  SELECT doc_id, chunk_idx AS best_chunk, term_hits,
      |    ROW_NUMBER() OVER (PARTITION BY doc_id
      |      ORDER BY term_hits DESC, chunk_idx) AS rn
      |  FROM h
      |)
      |SELECT b.doc_id, cand.cos, b.best_chunk, b.term_hits,
      |  floor((cand.cos * 0.5 + LEAST(b.term_hits / 4.0, 1.0) * 0.5)
      |        * 1000000.0 + 0.5) / 1000000.0 AS hybrid_score
      |FROM best b JOIN cand USING (doc_id)
      |WHERE b.rn = 1""".stripMargin
  }

  // --- reciprocal-rank fusion (vector list + BM25 list) ---------------------

  /** RRF dampening constant (Cormack, Clarke & Buettcher, SIGIR 2009 —
    * k=60 is the paper's recommendation and the industry default). */
  val RrfK = 60

  /** Reciprocal-rank fusion — the OTHER standard hybrid-retrieval
    * combiner (vs [[qRetrievalHybrid]]'s score mixing): fuse the vector
    * top-10 and the BM25 top-10 by summed 1/(k + rank), which needs no
    * score calibration between the two modalities.
    *
    * Scale shape: each input list is top-k'd FIRST (vector scan →
    * TakeOrderedAndProject; BM25's two-scan zero-shuffle plan), so the
    * rank windows and the full-outer join all run on ≤k-row frames —
    * nothing after the per-modality recall touches corpus-sized data.
    * Contributions are fixed-point longs (1e6/(k+rank) floored), so the
    * fused score is engine-exact. */
  def qRetrievalRrf(s: SparkSession, dir: String): DataFrame = {
    def contrib(rank: Column): Column =
      coalesce(floor(lit(1000000.0) / (lit(RrfK) + rank) + lit(0.5))
        .cast("long"), lit(0L))
    val vec = qSimBruteForce(s, dir)
      .orderBy(col("cos").desc, col("vec_id")).limit(10)
      .select(col("vec_id").as("doc_id"), col("cos"))
      .withColumn("vec_rank",
        row_number()
          .over(Scale.boundedWindow(col("cos").desc, col("doc_id")))
          .cast("long"))
      .drop("cos")
    val lex = Lexicon.bm25TopK(t(s, dir, "documents"), Lexicon.Bm25Terms)
      .withColumn("lex_rank",
        row_number()
          .over(Scale.boundedWindow(col("bm25").desc, col("doc_id")))
          .cast("long"))
      .select(col("doc_id"), col("lex_rank"))
    vec.join(lex, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("vec_rank"), col("lex_rank"),
        ((contrib(col("vec_rank")) + contrib(col("lex_rank")))
          .cast("double") / lit(1000000.0)).as("rrf_score"))
  }

  val qRetrievalRrfSql: String =
    s"""WITH $qvCte,
      |${Lexicon.sqlBm25Ctes(Lexicon.Bm25Terms)},
      |vecscore AS (
      |  SELECT e.vec_id AS doc_id,
      |    floor(list_dot_product(CAST(e.embedding AS DOUBLE[]), qv.q_emb)
      |          * 1000000.0 + 0.5) / 1000000.0 AS cos
      |  FROM embeddings e, qv
      |  WHERE e.vec_id <> qv.q_id
      |  ORDER BY cos DESC, doc_id
      |  LIMIT 10
      |),
      |vec AS (
      |  SELECT doc_id, CAST(ROW_NUMBER() OVER
      |    (ORDER BY cos DESC, doc_id) AS BIGINT) AS vec_rank
      |  FROM vecscore
      |),
      |lexlist AS (
      |  SELECT doc_id, score6 FROM bm25ranked
      |  WHERE score6 > 0
      |  ORDER BY score6 DESC, doc_id
      |  LIMIT 10
      |),
      |lex AS (
      |  SELECT doc_id, CAST(ROW_NUMBER() OVER
      |    (ORDER BY score6 DESC, doc_id) AS BIGINT) AS lex_rank
      |  FROM lexlist
      |)
      |SELECT COALESCE(v.doc_id, l.doc_id) AS doc_id, v.vec_rank, l.lex_rank,
      |  CAST(COALESCE(CAST(FLOOR(1000000.0 / ($RrfK + v.vec_rank) + 0.5)
      |                     AS BIGINT), 0)
      |     + COALESCE(CAST(FLOOR(1000000.0 / ($RrfK + l.lex_rank) + 0.5)
      |                     AS BIGINT), 0) AS DOUBLE) / 1000000.0 AS rrf_score
      |FROM vec v FULL OUTER JOIN lex l ON v.doc_id = l.doc_id""".stripMargin

  // --- int8 scalar quantization (embedding storage compression) ------------

  /** Symmetric per-vector int8 scalar quantization — the 4× storage
    * compression an embedding store applies before ANN at 100 TB
    * (per-vector scale = max|v|/127; code = round-half-up of v/scale;
    * reconstruction = code·scale). The gate reports per vector the
    * scale, the cosine between original and reconstruction, and the max
    * absolute reconstruction error — the numbers a deployment uses to
    * accept the compression.
    *
    * Pure scan-side projection (zero shuffles; the only exchange is the
    * presentation sort). Element order is identical in both engines, so
    * the ordered double summations match bit-for-bit (the
    * qSimBruteForce precedent). Assumes nonzero vectors (the table's
    * unit-norm contract); an all-zero vector would null its scale. */
  def qEmbedQuantize(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .withColumn("v", expr("transform(embedding, x -> cast(x as double))"))
      .withColumn("sc", expr("array_max(transform(v, x -> abs(x))) / 127.0"))
      .withColumn("r", expr("transform(v, x -> floor(x / sc + 0.5) * sc)"))
      .select(col("vec_id"),
        r6(col("sc")).as("scale"),
        r6(expr("aggregate(zip_with(v, r, (a, b) -> a * b), 0D, (acc, x) -> acc + x)")
          / sqrt(expr("aggregate(zip_with(r, r, (a, b) -> a * b), 0D, (acc, x) -> acc + x)")))
          .as("recon_cos"),
        r6(expr("array_max(zip_with(v, r, (a, b) -> abs(a - b)))"))
          .as("max_err"))
      .orderBy(col("vec_id"))

  val qEmbedQuantizeSql: String =
    s"""WITH e AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      |), sc AS (
      |  SELECT vec_id, v,
      |    list_max(list_transform(v, x -> abs(x))) / 127.0 AS sc
      |  FROM e
      |), q AS (
      |  SELECT vec_id, v, sc,
      |    list_transform(v, x -> FLOOR(x / sc + 0.5) * sc) AS r
      |  FROM sc
      |)
      |SELECT vec_id,
      |  FLOOR(sc * 1000000.0 + 0.5) / 1000000.0 AS scale,
      |  FLOOR(list_dot_product(v, r) / sqrt(list_dot_product(r, r))
      |        * 1000000.0 + 0.5) / 1000000.0 AS recon_cos,
      |  FLOOR(list_max(list_transform(range(1, len(v) + 1),
      |          i -> abs(v[CAST(i AS INT)] - r[CAST(i AS INT)])))
      |        * 1000000.0 + 0.5) / 1000000.0 AS max_err
      |FROM q
      |ORDER BY vec_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_embed_quantize" -> (qEmbedQuantize _),
    "q_sim_bruteforce_topk" -> (qSimBruteForce _),
    "q_sim_ivf_topk" -> (qSimIvf _),
    "q_sim_ivf_kmeans_topk" -> (qSimIvfKmeans _),
    "q_sim_ivf_kmeans_recall" -> (qSimIvfKmeansRecall _),
    "q_sim_lsh_topk" -> (qSimLsh _),
    "q_sim_pq_topk" -> (qSimPq _),
    "q_sim_pq_recall" -> (qSimPqRecall _),
    "q_sim_ivfpq_topk" -> (qSimIvfPq _),
    "q_hard_negatives" -> (qHardNegatives _),
    "q_sim_ivfpq_recall" -> (qSimIvfPqRecall _),
    "q_retrieval_hybrid" -> (qRetrievalHybrid _),
    "q_retrieval_rrf" -> (qRetrievalRrf _))

  /** The learned-quantizer top-k variants are oracled by STORE REPLAY:
    * the fit itself is not SQL-expressible, but the probe against the
    * published artifacts (centroids / codebooks / partitioned codes) is
    * — DuckDB reads the same parquet the gate run wrote ([[OracleDir]])
    * and reproduces selection + scoring hash-exactly. */
  val oracles: Map[String, String] = Map(
    "q_embed_quantize" -> qEmbedQuantizeSql,
    "q_sim_bruteforce_topk" -> qSimBruteForceSql,
    "q_sim_ivf_topk" -> qSimIvfSql,
    "q_sim_ivf_kmeans_topk" -> qSimIvfKmeansSql,
    "q_sim_ivf_kmeans_recall" -> qSimIvfKmeansRecallSql,
    "q_sim_lsh_topk" -> qSimLshSql,
    "q_sim_pq_topk" -> qSimPqSql,
    "q_sim_pq_recall" -> qSimPqRecallSql,
    "q_sim_ivfpq_topk" -> qSimIvfPqSql,
    "q_sim_ivfpq_recall" -> qSimIvfPqRecallSql,
    "q_hard_negatives" -> qHardNegativesSql,
    "q_retrieval_hybrid" -> qRetrievalHybridSql,
    "q_retrieval_rrf" -> qRetrievalRrfSql)
}
