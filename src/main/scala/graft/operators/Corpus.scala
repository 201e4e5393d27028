package graft.operators

import graft.Engine
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus layout & selection for a training-data pipeline (extension tier —
  * no reference analog; the pipeline-ops mandate): context-window document
  * chunking, leakage-safe train/val/test splits, quality-ranked token-budget
  * selection, and per-source (domain-level) curation stats. Everything is
  * deterministic integer/fixed-point arithmetic so each gate is oracle-exact
  * against DuckDB, and every operator is designed scan-side-first: the corpus
  * text itself never shuffles in any of them.
  */
object Corpus {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Engine.table(s, dir, n)

  private def r6(c: Column): Column =
    floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
  private def sqlR6(e: String): String =
    s"FLOOR(($e) * 1000000.0 + 0.5) / 1000000.0"

  // --- context-window chunking ---------------------------------------------

  /** Chunk size / stride in whitespace tokens (overlap = 64 − 48 = 16) —
    * the RAG / context-length-split shape. */
  val ChunkTokens = 64
  val ChunkStride = 48

  /** Split each document into overlapping [[ChunkTokens]]-token windows
    * at [[ChunkStride]] spacing; a document shorter than one window is
    * one chunk. Emits (doc_id, chunk_idx, chunk_toks) — the raw token
    * arrays, so downstream consumers (lexical rerank in
    * [[Similarity.qRetrievalHybrid]]) can score without re-splitting.
    *
    * Shape (the 100 TB concern): a pure per-row generate — `split` once,
    * `explode(sequence)` by the per-doc chunk count, `slice` each window
    * out of the one tokens array. No shuffle at all; output size is the
    * intrinsic ~1.33× token duplication of the overlap.
    */
  def chunkTokens(docs: DataFrame): DataFrame = {
    val n = TextOps.tokenCount(col("text"))
    val nChunks = when(n <= ChunkTokens, lit(1L)).otherwise(
      // floor-div of positives == ceil((n - chunk) / stride); floor()
      // because Column./ is double division
      floor((n - ChunkTokens + (ChunkStride - 1)) / lit(ChunkStride)) + 1L)
    docs
      .select(col("doc_id"), split(col("text"), " ").as("tk"),
        nChunks.cast("long").as("n_chunks"))
      .select(col("doc_id"), col("tk"),
        explode(sequence(lit(0L), col("n_chunks") - 1L)).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        slice(col("tk"), (col("chunk_idx") * ChunkStride + 1).cast("int"),
          lit(ChunkTokens)).as("chunk_toks"))
  }

  /** The chunk manifest gate shape: (doc_id, chunk_idx, n_chunk_tokens,
    * chunk_fp) — the md5 fingerprint keeps emitted rows narrow (chunk
    * text never leaves the scan task). */
  def chunksOf(docs: DataFrame): DataFrame =
    chunkTokens(docs)
      .select(col("doc_id"), col("chunk_idx"),
        size(col("chunk_toks")).cast("long").as("n_chunk_tokens"),
        md5(array_join(col("chunk_toks"), " ")).as("chunk_fp"))

  /** DuckDB mirror of [[chunkTokens]] as a CTE body over `from` (needs
    * doc_id + text): emits doc_id, chunk_idx, chunk_toks. */
  private[operators] def sqlChunkTokensFrom(from: String): String = {
    val n = TextOps.sqlTokenCountOf("text")
    val nChunks =
      s"CASE WHEN $n <= $ChunkTokens THEN 1 ELSE ($n - $ChunkTokens + ${ChunkStride - 1}) // $ChunkStride + 1 END"
    s"""SELECT doc_id,
       |  unnest(range(0, $nChunks)) AS chunk_idx,
       |  string_split(text, ' ') AS tk0
       |FROM $from""".stripMargin
  }
  private[operators] val sqlChunkSlice: String =
    s"tk0[CAST(chunk_idx * $ChunkStride + 1 AS BIGINT) : CAST(chunk_idx * $ChunkStride + $ChunkTokens AS BIGINT)]"

  def qChunkDocs(s: SparkSession, dir: String): DataFrame =
    chunksOf(t(s, dir, "documents"))

  val qChunkDocsSql: String =
    s"""WITH c AS (
      |${sqlChunkTokensFrom("documents")}
      |)
      |SELECT doc_id, chunk_idx,
      |  CAST(len($sqlChunkSlice) AS BIGINT) AS n_chunk_tokens,
      |  md5(array_to_string($sqlChunkSlice, ' ')) AS chunk_fp
      |FROM c""".stripMargin

  // --- leakage-safe split --------------------------------------------------

  /** Train/val/test assignment keyed on the CONTENT fingerprint, not the
    * doc id: exact duplicates always land in the same split, so a val/test
    * document can never leak a training duplicate. 80/10/10 by the first
    * 48 bits of md5(text) mod 100 (uniform, engine-portable, join-stable).
    */
  private[operators] def splitCol(text: Column): Column = {
    val bucket = conv(substring(md5(text), 1, 12), 16, 10)
      .cast("long") % 100
    when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
  }
  private[operators] def sqlSplitOf(c: String): String =
    s"""CASE WHEN CAST(('0x' || substr(md5($c), 1, 12)) AS BIGINT) % 100 < 80 THEN 'train'
       |     WHEN CAST(('0x' || substr(md5($c), 1, 12)) AS BIGINT) % 100 < 90 THEN 'val'
       |     ELSE 'test' END""".stripMargin

  /** Frame-level split assignment: (doc_id, source, split). */
  def splitOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"),
      splitCol(col("text")).as("split"))

  /** Per (split, source) accounting: doc count, distinct content groups,
    * token total. One scan + one agg shuffle on the (split, source) keys;
    * the distinct-group count rides the same exchange. */
  def qSplitLeakfree(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("source"), splitCol(col("text")).as("split"),
        md5(col("text")).as("fp"),
        TextOps.tokenCount(col("text")).as("n"))
      .groupBy(col("split"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("fp")).as("n_groups"),
        sum(col("n")).as("n_tokens"))

  val qSplitLeakfreeSql: String =
    s"""SELECT split, source, COUNT(*) AS n_docs,
      |  COUNT(DISTINCT fp) AS n_groups, CAST(SUM(n) AS BIGINT) AS n_tokens
      |FROM (SELECT source, ${sqlSplitOf("text")} AS split,
      |        md5(text) AS fp, ${TextOps.sqlTokenCountOf("text")} AS n
      |      FROM documents)
      |GROUP BY split, source""".stripMargin

  // --- token-budget selection ----------------------------------------------

  /** (doc_id, source, q, n): the selection-ranking frame — quality score
    * and whitespace token count per document. */
  def scoredDocs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"),
      TextOps.qualityScore(col("text")).as("q"),
      TextOps.tokenCount(col("text")).as("n"))

  /** Keep the highest-quality documents until a token budget (half the
    * corpus) is exhausted — the data-selection step of a token-budgeted
    * training run. Selection order is (quality DESC, doc_id ASC); a
    * document is kept iff the inclusive running token total at its
    * position fits the budget.
    *
    * Shape (the 100 TB concern): the naive form — one running sum over
    * the globally-ordered corpus — is a single-partition window over
    * every row. Instead the cutoff is found on an aggregate: per-QUALITY
    * token totals (quality is fixed-point with ≤1e6+1 distinct values, so
    * this frame is small by construction) carry a running sum that
    * identifies full buckets and THE one boundary bucket; whole buckets
    * need no per-row window at all, and only boundary-quality rows flow
    * through a per-row running sum (partitioned, bounded by one bucket).
    * The corpus is scanned twice (score+count, then filter) and shuffles
    * only bucket totals. Equivalence to the naive prefix rule is pinned by
    * CorpusSpec; the oracle IS the naive form.
    */
  def tokenBudgetKept(docs: DataFrame): DataFrame = {
    // The scored frame feeds THREE consumers (the per-quality agg, the
    // full-bucket branch, the boundary branch); left lazy, each one
    // re-ran the 5-regex-pass quality scoring over the corpus text
    // (measured: 3 scoring scans per run). Materialize the narrow
    // (doc_id, source, q, n) decision frame ONCE — the guide-§8
    // "decide on small rows" discipline: the corpus text is read once
    // and only per-doc metadata persists (corpus-metadata-sized at
    // 100 TB, the same class as the staged packing frame).
    // Durability trade-off (r19 advice): localCheckpoint pins
    // non-replicated blocks, so one executor loss fails the job instead
    // of recomputing — acceptable for a single-query bench contract; a
    // long-running deployment that must survive executor churn should
    // stage this frame through parquet (sources.Staging) or
    // persist(MEMORY_AND_DISK), trading a write for kept lineage.
    val scored = scoredDocs(docs).localCheckpoint(true)
    val perQ = scored.groupBy(col("q"))
      .agg(sum(col("n")).as("bucket_tokens"))
    // running total over per-quality buckets: ≤1e6+1 rows by fixed-point
    // construction, so the unpartitioned window is a bounded frame, not a
    // corpus-sized one. localCheckpoint(eager) materializes the bucket
    // frame ONCE: it feeds three consumers (budget, full-bucket filter,
    // boundary filter) and would otherwise re-run the corpus scoring agg
    // per consumer (measured: 6 corpus scans → 3).
    val wq = Scale.boundedWindow(col("q").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCum = perQ
      .withColumn("cum", sum(col("bucket_tokens")).over(wq))
      .withColumn("prev", col("cum") - col("bucket_tokens"))
      .localCheckpoint(true)
    // the budget derives from the bucket totals (same integer sum as the
    // corpus-level sum), so it costs no extra corpus scan
    val budget = withCum.agg(expr("sum(bucket_tokens) div 2").as("budget"))
    val cums = withCum.crossJoin(broadcast(budget))
    val full = cums.filter(col("cum") <= col("budget")).select(col("q"))
    val boundary = cums
      .filter(col("prev") <= col("budget") && col("cum") > col("budget"))
      .select(col("q"), col("prev"), col("budget"))
    val keptFull = scored.join(broadcast(full), Seq("q"))
      .select(col("doc_id"), col("source"), col("q"), col("n"))
    val wd = Window.partitionBy(col("q")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val keptBoundary = scored.join(broadcast(boundary), Seq("q"))
      .withColumn("run", sum(col("n")).over(wd))
      .filter(col("prev") + col("run") <= col("budget"))
      .select(col("doc_id"), col("source"), col("q"), col("n"))
    keptFull.unionByName(keptBoundary)
  }

  def qTokenBudgetSelect(s: SparkSession, dir: String): DataFrame =
    // rebalance: the one remaining scoring scan is regex-bound and the
    // raw scan is one task at bench scale; no-op at cluster scale
    tokenBudgetKept(Engine.rebalance(t(s, dir, "documents")))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n")).as("tokens_kept"),
        min(col("q")).as("min_quality_kept"))

  val qTokenBudgetSelectSql: String = {
    val score = TextOps.sqlQualityScoreOf("text")
    val n = TextOps.sqlTokenCountOf("text")
    s"""WITH scored AS (
      |  SELECT doc_id, source, $score AS q, $n AS n FROM documents
      |), b AS (SELECT SUM(n) // 2 AS budget FROM scored),
      |r AS (
      |  SELECT *, SUM(n) OVER (ORDER BY q DESC, doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
      |  FROM scored
      |)
      |SELECT source, COUNT(*) AS n_kept, CAST(SUM(n) AS BIGINT) AS tokens_kept,
      |  MIN(q) AS min_quality_kept
      |FROM r, b WHERE r.run <= b.budget
      |GROUP BY source""".stripMargin
  }

  // --- per-source curation stats -------------------------------------------

  /** Domain-level curation: per source, doc count, distinct-content count,
    * duplication rate, mean quality and mean length, and a keep/drop
    * verdict (the RefinedWeb-style domain filter step). One scan + one
    * per-source agg; quality means go through the scaled-BIGINT sum
    * convention so they are order-independent and engine-exact. */
  /** Per-source stats + keep/drop verdict as a reusable frame (the
    * curated-mix pipeline filters on it; the gate query selects it). */
  def sourceStats(docs: DataFrame): DataFrame = {
    val scaledQ = floor(TextOps.qualityScore(col("text")) * 1000000.0 + 0.5)
      .cast("long")
    val agg = docs
      .select(col("source"), md5(col("text")).as("fp"),
        scaledQ.as("q6"), TextOps.tokenCount(col("text")).as("n"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("fp")).as("n_unique"),
        sum(col("q6")).as("sum_q6"), sum(col("n")).as("sum_n"))
    agg.select(col("source"), col("n_docs"), col("n_unique"),
      r6(lit(1.0) - col("n_unique").cast("double") / col("n_docs"))
        .as("dup_rate"),
      r6(col("sum_q6").cast("double") / 1000000.0 / col("n_docs"))
        .as("mean_quality"),
      r6(col("sum_n").cast("double") / col("n_docs")).as("mean_tokens"))
      .withColumn("verdict",
        when(col("dup_rate") <= 0.2 && col("mean_quality") >= 0.4, "keep")
          .otherwise("drop"))
  }

  def qSourceCuration(s: SparkSession, dir: String): DataFrame =
    sourceStats(t(s, dir, "documents"))

  /** DuckDB mirror of [[sourceStats]] as CTEs ending in `src_verdict`
    * (source, n_docs, n_unique, dup_rate, mean_quality, mean_tokens,
    * verdict). */
  private[operators] val sqlSourceStatsCtes: String = {
    val score = TextOps.sqlQualityScoreOf("text")
    val n = TextOps.sqlTokenCountOf("text")
    val dup = sqlR6("1.0 - CAST(n_unique AS DOUBLE) / n_docs")
    val mq = sqlR6("CAST(sum_q6 AS DOUBLE) / 1000000.0 / n_docs")
    val mt = sqlR6("CAST(sum_n AS DOUBLE) / n_docs")
    s"""src_agg AS (
      |  SELECT source, COUNT(*) AS n_docs, COUNT(DISTINCT fp) AS n_unique,
      |    SUM(q6) AS sum_q6, SUM(n) AS sum_n
      |  FROM (SELECT source, md5(text) AS fp,
      |          CAST(FLOOR(($score) * 1000000.0 + 0.5) AS BIGINT) AS q6,
      |          $n AS n
      |        FROM documents)
      |  GROUP BY source
      |),
      |src_verdict AS (
      |  SELECT source, n_docs, n_unique, dup_rate, mean_quality,
      |    mean_tokens,
      |    CASE WHEN dup_rate <= 0.2 AND mean_quality >= 0.4
      |      THEN 'keep' ELSE 'drop' END AS verdict
      |  FROM (SELECT source, n_docs, n_unique, $dup AS dup_rate,
      |          $mq AS mean_quality, $mt AS mean_tokens
      |        FROM src_agg)
      |)""".stripMargin
  }

  val qSourceCurationSql: String =
    s"""WITH $sqlSourceStatsCtes
      |SELECT source, n_docs, n_unique, dup_rate, mean_quality,
      |  mean_tokens, verdict
      |FROM src_verdict""".stripMargin

  // --- DSIR importance weighting (hashed n-gram likelihood ratio) ----------

  /** Feature-hash dimensionality for the DSIR bag models (small on
    * purpose: the fitted artifact must broadcast as a literal). */
  val DsirDim = 256

  /** Fit the DSIR bucket models: hashed-unigram counts under the TARGET
    * distribution (here: `lang = 'en'` documents — "data that looks like
    * what I want to train on") and the SOURCE distribution (the whole
    * corpus), reduced to one per-bucket importance contribution
    * `floor((ln p_target(b) − ln p_source(b)) · 1e6 + 0.5)` with +1
    * Laplace smoothing (Xie et al. 2023, "Data Selection for Language
    * Models via Importance Resampling", §3 — hashed n-gram features and
    * the log-likelihood-ratio weight).
    *
    * Scale shape: the ONLY corpus-sized work is one exploded-token scan
    * map-side-combined into a [[DsirDim]]-row aggregate; the collect is
    * 256 rows (bounded artifact, the Lexicon probe-set precedent). In a
    * production pipeline this fit is an offline step — the returned
    * array IS the model, and [[dsirScore]] consumes it as a literal. */
  def dsirContrib(docs: DataFrame, targetLang: String = "en"): Array[Long] = {
    val toks = docs.select(col("lang"),
      explode(expr("filter(split(lower(text), ' '), x -> length(x) > 0)"))
        .as("tok"))
    val bucket = (conv(substring(md5(col("tok")), 1, 12), 16, 10)
      .cast("long") % DsirDim)
    val bc = toks.groupBy(bucket.as("b"))
      .agg(sum(when(col("lang") === targetLang, 1L).otherwise(0L)).as("ct"),
        count(lit(1)).as("cs"))
      .collect()
    val nt = bc.map(_.getLong(1)).sum.toDouble + DsirDim
    val ns = bc.map(_.getLong(2)).sum.toDouble + DsirDim
    val arr = Array.fill(DsirDim)(0L)
    bc.foreach { r =>
      // same double→fixed-point convention as the unigram-LM gate; ln is
      // IEEE libm on both engines (sub-ulp differences absorbed by the
      // 1e-6 floor, the convention proven by q_unigram_logprob)
      arr(r.getLong(0).toInt) = math.floor(
        (math.log((r.getLong(1) + 1.0) / nt)
          - math.log((r.getLong(2) + 1.0) / ns)) * 1e6 + 0.5).toLong
    }
    arr
  }

  /** Per-document DSIR weight as a scan-side column: sum of the
    * broadcast per-bucket contributions over the document's tokens —
    * integer micro-units reduced with `aggregate` (order-independent),
    * ZERO shuffle. */
  def dsirScore(contrib: Array[Long], textCol: String): Column = {
    val arrSql = contrib.mkString("array(", "L,", "L)")
    expr(
      s"""aggregate(
         |  filter(split(lower($textCol), ' '), x -> length(x) > 0),
         |  0L,
         |  (acc, tok) -> acc + element_at($arrSql,
         |    CAST((cast(conv(substring(md5(tok), 1, 12), 16, 10) as bigint)
         |            % $DsirDim) + 1 AS INT)),
         |  acc -> acc)""".stripMargin)
  }

  /** Gate: fit the DSIR models on the corpus, score every document, and
    * keep the top-20 by importance weight (weight DESC, doc_id ASC) —
    * the selection shape a target-matched training mix uses. The fit is
    * recomputed inside the gate only so the gate is self-contained; the
    * build/score split is the two public functions above. */
  def qDsirSelect(s: SparkSession, dir: String): DataFrame = {
    // rebalance: both the fit's exploded-token agg and the scoring pass
    // run per-token md5 — one scan task at bench scale serialized all of
    // it; no-op at cluster scale (Engine.rebalance contract)
    val docs = Engine.rebalance(t(s, dir, "documents"))
    val contrib = dsirContrib(docs)
    docs.select(col("doc_id"), col("lang"),
      expr("CAST(size(filter(split(lower(text), ' '), x -> length(x) > 0)) AS BIGINT)")
        .as("n_toks"),
      dsirScore(contrib, "text").as("dsir_micro"))
      .orderBy(col("dsir_micro").desc, col("doc_id"))
      .limit(20)
  }

  val qDsirSelectSql: String =
    s"""WITH tok AS (
      |  SELECT doc_id, lang,
      |    unnest(list_filter(string_split(lower(text), ' '),
      |                       x -> len(x) > 0)) AS tok
      |  FROM documents
      |),
      |btok AS (
      |  SELECT doc_id, lang,
      |    (CAST(('0x' || substr(md5(tok), 1, 12)) AS BIGINT) % $DsirDim) AS b
      |  FROM tok
      |),
      |bc AS (
      |  SELECT b,
      |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ct,
      |    COUNT(*) AS cs
      |  FROM btok GROUP BY b
      |),
      |tot AS (
      |  SELECT CAST(SUM(ct) AS BIGINT) AS nt, CAST(SUM(cs) AS BIGINT) AS ns
      |  FROM bc
      |),
      |contrib AS (
      |  SELECT b,
      |    CAST(FLOOR((ln((ct + 1.0) / (nt + $DsirDim.0))
      |              - ln((cs + 1.0) / (ns + $DsirDim.0))) * 1000000.0 + 0.5)
      |         AS BIGINT) AS c
      |  FROM bc, tot
      |),
      |score AS (
      |  SELECT t.doc_id, CAST(SUM(c.c) AS BIGINT) AS dsir_micro
      |  FROM btok t JOIN contrib c ON t.b = c.b
      |  GROUP BY t.doc_id
      |)
      |SELECT d.doc_id, d.lang,
      |  CAST(len(list_filter(string_split(lower(d.text), ' '),
      |                       x -> len(x) > 0)) AS BIGINT) AS n_toks,
      |  COALESCE(s.dsir_micro, 0) AS dsir_micro
      |FROM documents d LEFT JOIN score s ON d.doc_id = s.doc_id
      |ORDER BY dsir_micro DESC, d.doc_id
      |LIMIT 20""".stripMargin

  // --- capacity-capped mix allocation (waterfilling) -----------------------

  /** Target-weighted token allocation under per-source capacity caps —
    * the mix-planning step of a training run ("give source s a share
    * ∝ w_s of the B-token budget, but a source can't contribute more
    * tokens than it has"; the Pile/LLaMA-style per-domain epoch-cap
    * shape). Exact waterfilling, not iteration: sort sources by
    * capacity-per-weight, find the saturation breakpoint with prefix
    * sums, allocate `min(capacity, floor(w·T*))`.
    *
    * Weights here are the source's mean quality in micro units
    * (quality-weighted target mix); budget B = half the corpus tokens,
    * the [[tokenBudgetKept]] convention.
    *
    * Scale shape: everything after the per-source aggregate runs on a
    * |sources|-row frame — the sort/windows are metadata-sized by
    * construction (same stance as sourceStats), and the one corpus-sized
    * exchange is that aggregate. Determinism: T* is a double ratio of
    * identical integers in both engines; allocations floor to BIGINT. */
  /** Waterfilling over a prepared (source, capacity, w6) frame; budget
    * = half the total capacity. Kept frame-level so the saturation
    * branch is spec-testable on hand-built skew. */
  def waterfillAlloc(per: DataFrame): DataFrame = {
    // zero-weight sources allocate 0 and are EXCLUDED from the
    // breakpoint math: their capacity/0 ratio is NULL under Spark's
    // non-ANSI divide (DuckDB gives Inf — a cross-engine divergence),
    // and NULL sorts first, which silently counted them as
    // already-saturated and stole budget from real sources (caught by
    // the zero-weight spec). Budget stays corpus-derived (half of ALL
    // capacity); weighted totals cover only the participating sources.
    val pos = per.where(col("w6") > 0)
    val tot = per.agg(sum(col("capacity")).as("tc"))
      .crossJoin(pos.agg(sum(col("w6")).as("tw")))
    val w = Scale.boundedWindow(col("ratio"), col("source"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = pos.crossJoin(broadcast(tot))
      .withColumn("budget", expr("tc div 2"))
      .withColumn("ratio",
        col("capacity").cast("double") / col("w6"))
      .withColumn("sat_c", coalesce(sum(col("capacity")).over(w), lit(0L)))
      .withColumn("sat_w", coalesce(sum(col("w6")).over(w), lit(0L)))
      .withColumn("t_cand",
        (col("budget") - col("sat_c")).cast("double")
          / (col("tw") - col("sat_w")))
    // T* = the first candidate (in ratio order) that does not saturate
    // its own row. The agg ALWAYS yields one row (null b when every row
    // saturates, i.e. budget >= total capacity) — a filtered frame here
    // would make the final cross join empty in that case
    // tie-break by SOURCE (the window's own order), not by t_cand: at
    // equal ratios a later row's candidate can be smaller (even
    // negative, budget already spent) and must not win
    val tStar = ranked
      .agg(min(when(col("t_cand") <= col("ratio"),
        struct(col("ratio"), col("source"), col("t_cand")))).as("b"))
      .select(col("b.t_cand").as("t_star"))
    ranked.crossJoin(broadcast(tStar))
      .select(col("source"), col("capacity"), col("w6"),
        least(col("capacity"),
          floor(col("w6")
            * coalesce(col("t_star"), col("budget").cast("double")))
            .cast("long")).as("alloc"))
      .unionByName(per.where(!(col("w6") > 0))
        .select(col("source"), col("capacity"), col("w6"),
          lit(0L).as("alloc")))
      .orderBy(col("source"))
  }

  def qMixWaterfill(s: SparkSession, dir: String): DataFrame =
    // w6 = floor(mean quality micro) via EXACT integer arithmetic:
    // per-row fixed-point longs summed (order-independent), then
    // integer division — a double avg() would be summation-order-
    // dependent and could flip the floor at the boundary
    waterfillAlloc(scoredDocs(Engine.rebalance(t(s, dir, "documents")))
      .groupBy(col("source"))
      .agg(sum(col("n")).cast("long").as("capacity"),
        expr("sum(cast(floor(q * 1000000.0 + 0.5) as bigint)) div count(1)")
          .as("w6")))

  val qMixWaterfillSql: String = {
    val score = TextOps.sqlQualityScoreOf("text")
    val n = TextOps.sqlTokenCountOf("text")
    s"""WITH per AS (
      |  SELECT source, CAST(SUM(n) AS BIGINT) AS capacity,
      |    CAST(SUM(CAST(FLOOR(q * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
      |      // COUNT(*) AS w6
      |  FROM (SELECT source, $score AS q, $n AS n FROM documents)
      |  GROUP BY source
      |), pos AS (
      |  SELECT * FROM per WHERE w6 > 0
      |), tot AS (
      |  SELECT (SELECT CAST(SUM(capacity) AS BIGINT) FROM per) AS tc,
      |    (SELECT CAST(SUM(w6) AS BIGINT) FROM pos) AS tw
      |), ranked AS (
      |  SELECT pos.*, tot.tc, tot.tw, tot.tc // 2 AS budget,
      |    CAST(capacity AS DOUBLE) / w6 AS ratio,
      |    COALESCE(CAST(SUM(capacity) OVER (ORDER BY CAST(capacity AS DOUBLE) / w6, source
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS sat_c,
      |    COALESCE(CAST(SUM(w6) OVER (ORDER BY CAST(capacity AS DOUBLE) / w6, source
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS sat_w
      |  FROM pos, tot
      |), tstar AS (
      |  SELECT CAST(budget - sat_c AS DOUBLE) / (tw - sat_w) AS t_star,
      |    ratio
      |  FROM ranked
      |  WHERE CAST(budget - sat_c AS DOUBLE) / (tw - sat_w) <= ratio
      |  ORDER BY ratio, source LIMIT 1
      |)
      |SELECT source, capacity, w6, alloc FROM (
      |  SELECT r.source, r.capacity, r.w6,
      |    LEAST(r.capacity,
      |      CAST(FLOOR(r.w6 * COALESCE(t.t_star,
      |        CAST(r.budget AS DOUBLE))) AS BIGINT)) AS alloc
      |  FROM ranked r LEFT JOIN tstar t ON TRUE
      |  UNION ALL
      |  SELECT source, capacity, w6, CAST(0 AS BIGINT) AS alloc
      |  FROM per WHERE NOT (w6 > 0)
      |)
      |ORDER BY source""".stripMargin
  }

  // --- corpus composition by learned topic cluster ---------------------------

  /** Corpus composition analysis — the data-mixing diagnostic every
    * pretraining run consults before setting mixture weights: bucket
    * the corpus by LEARNED topic cluster (the k-means quantizer the ANN
    * tier already maintains — one build serves search, dedup blocking,
    * AND composition reporting) and report, per cluster, its size, how
    * many sources feed it, and the dominant source with its share.
    *
    * Plan shape: the cluster assignment is read from the PUBLISHED
    * store (no refit — the [[graft.operators.Similarity]] probe
    * discipline), one broadcast-sized join against the documents'
    * (doc_id, source) projection, a (cluster, source) partial agg, and
    * a cluster-keyed argmax via `max(struct(n, source))` — no window,
    * no second corpus scan. At 100 TB every stage is agg-sized after
    * the one joined scan. Oracle: store replay (the assignment is
    * parquet; the rest is relational algebra DuckDB mirrors). */
  def qCorpusTopics(s: SparkSession, dir: String): DataFrame = {
    val root = Similarity.buildKmeansQuantizer(s, dir)
    val assign = s.read.parquet(s"$root/assign")
      .select(col("cluster").cast("int").as("cluster"),
        col("vec_id").as("doc_id"))
    val docs = Engine.table(s, dir, "documents")
      .select(col("doc_id"), col("source"))
    val perSource = assign.join(docs, Seq("doc_id"))
      .groupBy(col("cluster"), col("source"))
      .agg(count(lit(1)).as("n"))
    perSource.groupBy(col("cluster"))
      .agg(sum(col("n")).as("n_docs"),
        count(lit(1)).as("n_sources"),
        max(struct(col("n"), col("source"))).as("__top"))
      .select(col("cluster"), col("n_docs"), col("n_sources"),
        col("__top.source").as("top_source"),
        col("__top.n").as("top_source_docs"))
      .orderBy(col("cluster"))
  }

  /** Oracle: replay the blocking from the stored assignment — ties on
    * the per-cluster max break by the larger source string, exactly the
    * `max(struct(n, source))` rule. */
  val qCorpusTopicsSql: String = {
    val root = Similarity.oracleRoot("ivf-kmeans")
    s"""WITH assign AS (
      |  SELECT CAST(cluster AS INT) AS cluster, vec_id AS doc_id
      |  FROM read_parquet('$root/assign/*/*.parquet', hive_partitioning = 1)
      |), per AS (
      |  SELECT a.cluster, d.source, COUNT(*) AS n
      |  FROM assign a JOIN documents d USING (doc_id)
      |  GROUP BY a.cluster, d.source
      |), ranked AS (
      |  SELECT cluster, source, n,
      |    ROW_NUMBER() OVER (PARTITION BY cluster
      |                       ORDER BY n DESC, source DESC) AS rk
      |  FROM per
      |)
      |SELECT p.cluster,
      |  CAST(SUM(p.n) AS BIGINT) AS n_docs,
      |  CAST(COUNT(*) AS BIGINT) AS n_sources,
      |  MAX(r.source) AS top_source,
      |  CAST(MAX(r.n) AS BIGINT) AS top_source_docs
      |FROM per p JOIN ranked r ON p.cluster = r.cluster AND r.rk = 1
      |GROUP BY p.cluster
      |ORDER BY p.cluster""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_chunk_docs" -> (qChunkDocs _),
    "q_split_leakfree" -> (qSplitLeakfree _),
    "q_token_budget_select" -> (qTokenBudgetSelect _),
    "q_source_curation" -> (qSourceCuration _),
    "q_dsir_select" -> (qDsirSelect _),
    "q_mix_waterfill" -> (qMixWaterfill _),
    "q_corpus_topics" -> (qCorpusTopics _))

  val oracles: Map[String, String] = Map(
    "q_chunk_docs" -> qChunkDocsSql,
    "q_split_leakfree" -> qSplitLeakfreeSql,
    "q_token_budget_select" -> qTokenBudgetSelectSql,
    "q_source_curation" -> qSourceCurationSql,
    "q_dsir_select" -> qDsirSelectSql,
    "q_mix_waterfill" -> qMixWaterfillSql,
    "q_corpus_topics" -> qCorpusTopicsSql)
}
