package graft.operators

import graft.Engine
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end training-corpus cleaning — the north-star composition of
  * the library's tiers into one `DataFrame => DataFrame` pipeline, in
  * the production (C4/Gopher-style) stage order:
  *
  *   1. quality gate: drop 'low'-band documents
  *      ([[TextOps.qualityOf]]'s alpha/stopword/length heuristic);
  *   2. exact dedup over the SURVIVORS: one keeper (min surviving
  *      doc_id) per identical text;
  *   3. near-dup dedup over the exact-unique survivors: one keeper (min
  *      doc_id) per MinHash-LSH connected component;
  *   4. token accounting for the surviving corpus.
  *
  * Stage order is semantic, not just cost: keepers are chosen among the
  * quality-passing docs, so a content cluster whose minimum doc_id
  * happens to be low-quality still retains its best surviving
  * representative (choosing keepers over the full corpus would let the
  * quality gate delete the keeper and the dedup stages delete every
  * other copy — the whole cluster would vanish). Every drop is
  * attributed to exactly one rule in [[auditOf]]'s `drop_reason` column
  * ('quality' | 'exact_dup' | 'near_dup' | 'kept').
  *
  * Every stage is a join/filter over the operators' own outputs — no
  * stage re-implements another's logic, so the pipeline inherits each
  * operator's scale shape (the quality gate is a scan, both dedups are
  * the blocked/bucketed plans documented in [[Dedup]]), and the quality
  * gate running first shrinks the candidate set the near-dup machinery
  * sees.
  */
object Pipeline {

  /** Per-document audit: (doc_id, quality, drop_reason) for EVERY input
    * document, where drop_reason is 'quality' (failed the quality gate),
    * 'exact_dup' (identical text to a lower surviving doc_id),
    * 'near_dup' (same LSH connected component as a lower exact-unique
    * survivor), or 'kept'. */
  def auditOf(docs: DataFrame): DataFrame = {
    val q = TextOps.qualityOf(docs)
    val scored = docs.select(col("doc_id"), col("text"))
      .join(q, Seq("doc_id"))

    // stage 1: quality gate
    val surv = scored.filter(col("quality_band") =!= "low")

    // stage 2: exact keepers among survivors (min surviving doc_id per
    // identical-text group)
    val fp = surv.select(col("doc_id"), md5(col("text")).as("fp"))
    val ex = fp.groupBy(col("fp")).agg(min(col("doc_id")).as("ex_keeper"))
    val exmap = fp.join(ex, Seq("fp")).select(col("doc_id"), col("ex_keeper"))
    val uniq = surv.join(
        exmap.filter(col("doc_id") === col("ex_keeper")).select("doc_id"),
        Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("text"))

    // stage 3: near-dup components among the exact-unique survivors
    // (rebalance=false — `uniq` sits downstream of a shuffle already).
    // Same cache hygiene as Dedup.qDedupCorpus: checkpoint the tiny
    // label frame, release the loop's persisted lineage.
    val pairs = Dedup.minhashPairs(uniq, rebalance = false)
      .select("doc_a", "doc_b")
    val labels = Dedup.connectedComponents(pairs)
    val comp = labels.localCheckpoint(true)
      .withColumnRenamed("label", "near_keeper")
    labels.unpersist()

    scored.join(exmap, Seq("doc_id"), "left")
      .join(comp, Seq("doc_id"), "left")
      .select(col("doc_id"), col("quality"),
        when(col("quality_band") === "low", "quality")
          .when(col("ex_keeper") =!= col("doc_id"), "exact_dup")
          .when(col("near_keeper").isNotNull
            && col("near_keeper") =!= col("doc_id"), "near_dup")
          .otherwise("kept").as("drop_reason"))
  }

  /** Kept corpus with accounting: (doc_id, n_tokens, quality) for every
    * surviving document. */
  def cleanOf(docs: DataFrame): DataFrame =
    auditOf(docs).filter(col("drop_reason") === "kept")
      .join(docs.select(col("doc_id"),
        TextOps.tokenCount(col("text")).as("n_tokens")), Seq("doc_id"))
      .select(col("doc_id"), col("n_tokens"), col("quality"))
      .orderBy(col("doc_id"))

  def cleanCorpus(s: SparkSession, dir: String): DataFrame =
    cleanOf(Engine.table(s, dir, "documents"))

  def auditCorpus(s: SparkSession, dir: String): DataFrame =
    auditOf(Engine.table(s, dir, "documents"))
      .select(col("doc_id"), col("drop_reason"))
      .orderBy(col("doc_id"))

  /** Shared oracle CTE chain mirroring the three stages: quality gate →
    * exact keepers among survivors → recursive-CTE transitive closure
    * over the TRUE (blocking-free) near-dup pairs of the exact-unique
    * survivors. Independent of the Spark LSH + label-propagation path on
    * every axis (candidate generation, components algorithm, stage
    * wiring) — the gate therefore also pins LSH recall on the survivor
    * subset, as q_dedup_corpus does on the full corpus. */
  private val oracleStages: String =
    s"""q AS (
      |${TextOps.qTextQualitySql}
      |),
      |surv AS (
      |  SELECT d.doc_id, d.text, q.quality FROM documents d
      |  JOIN q ON d.doc_id = q.doc_id
      |  WHERE q.quality_band <> 'low'
      |),
      |ex AS (
      |  SELECT md5(text) AS fp, MIN(doc_id) AS keeper FROM surv GROUP BY 1
      |),
      |exmap AS (
      |  SELECT s.doc_id, ex.keeper FROM surv s JOIN ex ON md5(s.text) = ex.fp
      |),
      |uniq AS (
      |  SELECT s.doc_id, s.text, s.quality FROM surv s
      |  JOIN ex ON s.doc_id = ex.keeper
      |),
      |d AS (
      |${Dedup.shingleCteFrom("uniq")}
      |),
      |p AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM d a JOIN d b ON a.doc_id < b.doc_id
      |  WHERE ${Dedup.jaccardExpr} >= 0.5
      |),
      |edges AS (
      |  SELECT doc_a AS src, doc_b AS dst FROM p
      |  UNION ALL
      |  SELECT doc_b AS src, doc_a AS dst FROM p
      |),
      |reach(src, dst) AS (
      |  SELECT src, dst FROM edges
      |  UNION
      |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
      |),
      |labels AS (
      |  SELECT src AS doc_id, least(src, min(dst)) AS keeper
      |  FROM reach GROUP BY src
      |)""".stripMargin

  val qPipelineCleanSql: String =
    s"""WITH RECURSIVE $oracleStages
      |SELECT u.doc_id,
      |  ${TextOps.sqlTokenCountOf("u.text")} AS n_tokens,
      |  u.quality
      |FROM uniq u
      |LEFT JOIN labels l ON u.doc_id = l.doc_id
      |WHERE l.keeper IS NULL OR l.keeper = u.doc_id
      |ORDER BY u.doc_id""".stripMargin

  val qPipelineAuditSql: String =
    s"""WITH RECURSIVE $oracleStages
      |SELECT doc.doc_id,
      |  CASE WHEN q.quality_band = 'low' THEN 'quality'
      |       WHEN em.keeper <> doc.doc_id THEN 'exact_dup'
      |       WHEN l.keeper IS NOT NULL AND l.keeper <> doc.doc_id
      |         THEN 'near_dup'
      |       ELSE 'kept' END AS drop_reason
      |FROM documents doc
      |JOIN q ON doc.doc_id = q.doc_id
      |LEFT JOIN exmap em ON doc.doc_id = em.doc_id
      |LEFT JOIN labels l ON doc.doc_id = l.doc_id
      |ORDER BY doc.doc_id""".stripMargin

  /** The train-ready tail of the pipeline — the stages between a
    * cleaned corpus and tokenized shards, composed from this round's
    * operators in production order:
    *
    *   1. classifier gate: keep docs the hashed linear quality model
    *      scores positive ([[TextOps.scoreMicro]] — a pure scan
    *      predicate, no join);
    *   2. cross-document span dedup, keep-first
    *      ([[Curation.dedupSpansKeepFirst]]);
    *   3. sequence packing of the cleaned text
    *      ([[Packing.packPlan]], 2048-token budget).
    *
    * Output is the pack manifest: one row per training sequence. Each
    * stage is the operator's own code — the pipeline inherits each
    * plan's scale shape (scan predicate → one span-keyed shuffle →
    * offset-scheme prefix sum), and the oracle is the composition of
    * each operator's own CTE mirror, so stage WIRING is hash-checked
    * too.
    *
    * Lazy-composition fine print: span dedup consumes its input twice
    * (segments + doc spine), so the classifier predicate evaluates
    * twice here; packing's own localCheckpoint stops the re-execution
    * cascade there. A 100 TB run materializes `kept` (and usually
    * `cleaned`) between stages — production pipelines checkpoint stage
    * outputs anyway for restartability; pass a materialized frame and
    * the composition is single-evaluation. */
  def trainReady(docs: DataFrame, budget: Long): DataFrame = {
    val kept = docs.where(TextOps.scoreMicro("text") > 0L)
      .select(col("doc_id"), col("text"))
    val cleaned = Curation.dedupSpansKeepFirst(kept)
      .select(col("doc_id"), col("text_clean").as("text"))
    Packing.packPlan(cleaned, budget)
  }

  def qPipelineTrainReady(s: SparkSession, dir: String): DataFrame =
    trainReady(Engine.rebalance(
      Engine.table(s, dir, "documents")), Packing.PackBudget)

  val qPipelineTrainReadySql: String =
    s"""WITH kept AS (
      |  SELECT doc_id, text FROM documents
      |  WHERE ${TextOps.scoreMicroSql("text")} > 0
      |), ${Curation.spanDedupCtes("kept")},
      |cleaned AS (
      |  SELECT doc_id, text_clean AS text FROM sdclean
      |), ${Packing.packCtes("cleaned")}
      |${Packing.packSelectSql}""".stripMargin

  /** The curated-training-mix head of the pipeline — the Corpus-tier
    * stages between a raw corpus and a training manifest, in production
    * order:
    *
    *   1. domain filter: drop every document from a source whose
    *      [[Corpus.sourceStats]] verdict is 'drop' (dup-rate / mean-
    *      quality thresholds);
    *   2. token-budget selection over the SURVIVORS
    *      ([[Corpus.tokenBudgetKept]] — budget is recomputed as half the
    *      surviving corpus, so the two stages compose rather than
    *      pre-commit to a raw-corpus budget);
    *   3. leakage-safe split accounting of the selected set
    *      ([[Corpus.splitCol]] on the content fingerprint).
    *
    * Output: (split, source, n_docs, n_tokens) — the mix manifest a
    * training run consumes. Each stage is the operator's own code; the
    * verdict frame is |sources| rows and broadcasts, selection inherits
    * the bucket-cumulative plan, and the split is a scan-side
    * expression, so the composition adds no new corpus-sized shuffle.
    * The oracle composes each operator's own CTE mirror — stage WIRING
    * is hash-checked. */
  def mixOf(docs: DataFrame): DataFrame = {
    // |sources|-row verdict frame, materialized once: its lineage is a
    // corpus-wide agg and it feeds every downstream branch (budget path,
    // full-bucket probe, boundary probe)
    val keepSrc = Corpus.sourceStats(docs)
      .filter(col("verdict") === "keep").select("source")
      .localCheckpoint(true)
    val kept = docs.join(broadcast(keepSrc), Seq("source"))
    val selected = Corpus.tokenBudgetKept(kept)
    docs.select(col("doc_id"), Corpus.splitCol(col("text")).as("split"))
      .join(selected, Seq("doc_id"))
      .groupBy(col("split"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_tokens"))
  }

  def qPipelineMix(s: SparkSession, dir: String): DataFrame =
    // rebalance: mixOf scans the corpus three times (source stats,
    // budget selection, split assignment), each with regex/md5-heavy
    // projections — one task each at bench scale on the raw scan; the
    // one repartition exchange is reused by all three consumers
    // (ReuseExchange). No-op at cluster scale (Engine.rebalance).
    mixOf(Engine.rebalance(Engine.table(s, dir, "documents")))

  val qPipelineMixSql: String =
    s"""WITH ${Corpus.sqlSourceStatsCtes},
      |kept AS (
      |  SELECT d.* FROM documents d
      |  JOIN src_verdict v ON d.source = v.source
      |  WHERE v.verdict = 'keep'
      |), scored AS (
      |  SELECT doc_id, source, text,
      |    ${TextOps.sqlQualityScoreOf("text")} AS q,
      |    ${TextOps.sqlTokenCountOf("text")} AS n
      |  FROM kept
      |), b AS (SELECT SUM(n) // 2 AS budget FROM scored),
      |r AS (
      |  SELECT *, SUM(n) OVER (ORDER BY q DESC, doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
      |  FROM scored
      |)
      |SELECT ${Corpus.sqlSplitOf("r.text")} AS split, r.source,
      |  COUNT(*) AS n_docs, CAST(SUM(r.n) AS BIGINT) AS n_tokens
      |FROM r, b WHERE r.run <= b.budget
      |GROUP BY 1, 2""".stripMargin

  /** Pretraining-data RELEASE composition wiring this round's operators:
    * semantic decontamination (embedding cosine vs the mod-9 benchmark,
    * [[Curation.decontaminateEmbed]], vec_id = doc_id alignment) →
    * quality gate ([[TextOps.qualityOf]], drop 'low') → exact dedup
    * (keep-min per text fingerprint) → temperature-scaled mixture
    * sampling (w ∝ √n, the Sampling gate's integer arithmetic) → a
    * per-source release manifest (docs in, quota, sampled, tokens).
    * Each stage is the operator's own plan; the oracle composes each
    * stage's own SQL mirror, so the WIRING is hash-checked (the
    * q_pipeline_mix discipline). Scale: the embed/bench and quota frames
    * broadcast; the corpus shuffles once for dedup and once per final
    * manifest aggregate. */
  def qPipelineRelease(s: SparkSession, dir: String): DataFrame = {
    val docs = Engine.rebalance(
      Engine.table(s, dir, "documents"))
    val emb = Engine.table(s, dir, "embeddings")
    val m = Curation.BenchmarkMod
    // stage 1: drop semantic eval-leaks (and the benchmark docs
    // themselves — they are the eval set)
    // flagged ids are a handful of rows but their lineage is the full
    // embeddings × benchmark dot-product scan; the release tail consumes
    // the corpus chain twice (manifest agg + sampled join), so without a
    // checkpoint the decontamination scan ran once per consumer.
    val flaggedIds = Curation.decontaminateEmbed(
        emb.where(col("vec_id") % m =!= 0),
        emb.where(col("vec_id") % m === 0))
      .where(col("flagged")).select(col("doc_id"))
      .localCheckpoint(true)
    val clean = docs.where(col("doc_id") % m =!= 0)
      .join(flaggedIds, Seq("doc_id"), "left_anti")
    // stage 2: quality gate — a pure scan predicate. band ≠ 'low' ⇔
    // quality ≥ 0.45 (TextOps.qualityOf's banding; qualityScore is total,
    // never NULL), exactly the oracle's `WHERE score >= 0.45`. The
    // original derived doc_ids from qualityOf and LEFT-SEMI-joined them
    // back, which evaluated `clean` (scan + anti join) twice and paid a
    // join for what is a filter (guide §2.4: remove shuffles outright).
    val qual = clean.where(TextOps.qualityScore(col("text")) >= 0.45)
    // stage 3: exact dedup, keep-min per fingerprint — one window
    // shuffle on fp (the oracle's own MIN(doc_id) OVER (PARTITION BY
    // md5(text)) formulation). Text itself never crosses the shuffle:
    // everything downstream needs only (doc_id, source, n) where n =
    // tokenCount(text) — a deterministic per-row function computed HERE,
    // inside the one scan-side pass, so the window shuffles ~24-byte
    // metadata rows instead of documents (guide §2.3/§8: shuffle keys
    // and metadata, decide on small rows). The r19 shape carried text
    // through the fp window AND re-evaluated the whole decontam →
    // quality → dedup chain for the final sampled join (2 evaluations);
    // the eager checkpoint of the narrow survivor frame makes the chain
    // run ONCE and both remaining consumers (manifest agg + sampled
    // agg) read the materialized rows (guide §5).
    val wfp = org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
    val uniq = qual
      .select(col("doc_id"), col("source"),
        md5(col("text")).as("fp"),
        TextOps.tokenCount(col("text")).as("n"))
      .withColumn("k", min(col("doc_id")).over(wfp))
      .where(col("doc_id") === col("k"))
      .select(col("doc_id"), col("source"), col("n"))
      .localCheckpoint(true)
    // stage 4: temperature mix over survivors (Sampling's integer math).
    // `weighted` is |sources| rows and feeds BOTH `totals` and `quotas`.
    val weighted = uniq.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("w6",
        floor(sqrt(col("n_docs").cast("double")) * lit(1000000.0))
          .cast("long"))
      .localCheckpoint(true)
    val totals = weighted.agg(
      sum(col("w6")).as("sum_w6"), sum(col("n_docs")).as("n_total"))
    val quotas = weighted.crossJoin(broadcast(totals))
      .select(col("source"), col("n_docs"), col("w6"),
        expr("(n_total div 2) * w6 div sum_w6").as("quota"))
    val bucket6 = pmod(pmod(col("doc_id") * lit(2654435761L),
      lit(4294967296L)), lit(1000000L))
    uniq.join(broadcast(quotas), Seq("source"))
      .where(bucket6 * col("n_docs") < col("quota") * lit(1000000L))
      .groupBy(col("source"), col("n_docs"), col("quota"))
      .agg(count(lit(1)).as("n_sampled"),
        sum(col("n")).as("n_tokens"))
      .select(col("source"), col("n_docs"), col("quota"),
        col("n_sampled"), col("n_tokens").cast("long").as("n_tokens"))
  }

  val qPipelineReleaseSql: String = {
    val m = Curation.BenchmarkMod
    s"""WITH pairs AS (
      |  SELECT c.vec_id AS doc_id,
      |    FLOOR(list_dot_product(CAST(c.embedding AS DOUBLE[]),
      |                           CAST(b.embedding AS DOUBLE[]))
      |          * 1000000.0 + 0.5) / 1000000.0 AS cos
      |  FROM embeddings c JOIN embeddings b
      |    ON c.vec_id % $m <> 0 AND b.vec_id % $m = 0
      |), leaked AS (
      |  SELECT DISTINCT doc_id FROM pairs
      |  WHERE cos >= ${Curation.EmbedContamThreshold}
      |), clean AS (
      |  SELECT d.* FROM documents d
      |  WHERE d.doc_id % $m <> 0
      |    AND d.doc_id NOT IN (SELECT doc_id FROM leaked)
      |), qual AS (
      |  SELECT * FROM clean
      |  WHERE ${TextOps.sqlQualityScoreOf("text")} >= 0.45
      |), uniq AS (
      |  SELECT doc_id, source, text FROM (
      |    SELECT doc_id, source, text,
      |      MIN(doc_id) OVER (PARTITION BY md5(text)) AS k
      |    FROM qual)
      |  WHERE doc_id = k
      |), weighted AS (
      |  SELECT source, COUNT(*) AS n_docs,
      |    CAST(FLOOR(SQRT(CAST(COUNT(*) AS DOUBLE)) * 1000000.0) AS BIGINT)
      |      AS w6
      |  FROM uniq GROUP BY source
      |), quotas AS (
      |  SELECT source, n_docs, w6,
      |    CAST(CAST((SELECT SUM(n_docs) FROM weighted) // 2 AS BIGINT)
      |      * w6 // (SELECT SUM(w6) FROM weighted) AS BIGINT) AS quota
      |  FROM weighted
      |)
      |SELECT q.source, q.n_docs, q.quota, COUNT(*) AS n_sampled,
      |  CAST(SUM(${TextOps.sqlTokenCountOf("u.text")}) AS BIGINT)
      |    AS n_tokens
      |FROM uniq u JOIN quotas q ON u.source = q.source
      |WHERE ((u.doc_id * 2654435761) % 4294967296) % 1000000 * q.n_docs
      |      < q.quota * 1000000
      |GROUP BY q.source, q.n_docs, q.quota""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pipeline_clean" -> (cleanCorpus _),
    "q_pipeline_audit" -> (auditCorpus _),
    "q_pipeline_train_ready" -> (qPipelineTrainReady _),
    "q_pipeline_mix" -> (qPipelineMix _),
    "q_pipeline_release" -> (qPipelineRelease _))

  val oracles: Map[String, String] = Map(
    "q_pipeline_clean" -> qPipelineCleanSql,
    "q_pipeline_audit" -> qPipelineAuditSql,
    "q_pipeline_train_ready" -> qPipelineTrainReadySql,
    "q_pipeline_mix" -> qPipelineMixSql,
    "q_pipeline_release" -> qPipelineReleaseSql)
}
