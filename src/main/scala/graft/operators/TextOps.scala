package graft.operators

import graft.Engine
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over the
  * `documents` table: token counting, quality scoring, language-ID
  * heuristics, fingerprinting. Pure column expressions (no UDFs) — each is
  * a narrow projection + aggregation, so at 100 TB it is a single scan
  * with full pushdown and no shuffle beyond the final group-by.
  *
  * No reference analog (the reference is a SQL OLAP engine); these are the
  * extension tier mandated by BASELINE.json's north star.
  */
object TextOps {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Engine.table(s, dir, n)

  /** Engine-portable fixed-point rounding of a double expression (see
    * Relational.dec — same IEEE-only trick, scale 6). */
  private def r6(c: Column): Column =
    floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
  private def sqlR6(e: String): String =
    s"FLOOR(($e) * 1000000.0 + 0.5) / 1000000.0"

  /** Whitespace token count — the texts are single-space tokenised, so
    * `#spaces + 1` is exact and engine-portable. `translate` (plain char
    * strip) replaces the original `regexp_replace(c, " ", "")`: the
    * pattern is a literal single char, so the value is identical while
    * the per-row cost drops from regex-engine matching to one linear
    * char scan (optimization guide §1.2 step 2 — this expression is on
    * the hot path of a dozen scoring/selection queries). */
  private[operators] def tokenCount(c: Column): Column =
    (length(c) - length(translate(c, " ", "")) + 1).cast("long")
  private[operators] def sqlTokenCountOf(c: String): String =
    s"CAST(LENGTH($c) - LENGTH(REPLACE($c, ' ', '')) + 1 AS BIGINT)"
  private val sqlTokenCount = sqlTokenCountOf("text")

  /** Occurrences of word `w` (space-delimited) via replace-shrinkage —
    * portable across engines (both scan left-to-right non-overlapping). */
  private[operators] def wordHits(c: Column, w: String): Column = {
    val padded = concat(lit(" "), c, lit(" "))
    // literal (non-regex) replace: same left-to-right non-overlapping
    // semantics as regexp_replace on this metachar-free pattern — and
    // the same builtin the DuckDB mirror already uses (REPLACE) — minus
    // the regex engine on a per-row hot path (guide §1.2 step 2)
    (length(padded) - length(replace(padded, lit(s" ${w} "), lit(" "))))
      .cast("double") / (w.length + 1)
  }
  private[operators] def sqlWordHitsOf(c: String, w: String): String =
    s"CAST(LENGTH(' ' || $c || ' ') - LENGTH(REPLACE(' ' || $c || ' ', ' $w ', ' ')) AS DOUBLE) / ${w.length + 1}"
  private def sqlWordHits(w: String): String = sqlWordHitsOf("text", w)

  /** The length/alpha-ratio/stopword quality score as a reusable column
    * expression (and its DuckDB mirror) so downstream selection operators
    * ([[Corpus]]) rank by exactly the score the quality gate pins.
    *
    * Total on every string: tokenCount is ≥ 1 by construction (chars −
    * nonspace + 1), and the alpha-ratio divisor is floored at 1, so an
    * empty document scores exactly 0.0 rather than NULL (a NULL q would
    * silently vanish from downstream bucket equi-joins — see
    * [[Corpus.tokenBudgetKept]]). */
  private[operators] def qualityScore(c: Column): Column = {
    val toks = tokenCount(c)
    val alphaRatio =
      length(regexp_replace(lower(c), "[^a-z ]", ""))
        .cast("double") / greatest(length(c), lit(1))
    val stopRatio =
      (wordHits(c, "the") + wordHits(c, "and") + wordHits(c, "of")) /
        toks.cast("double")
    r6(alphaRatio * 0.5 + least(stopRatio * lit(2.0), lit(1.0)) * 0.3
      + when(toks.between(10, 400), 0.2).otherwise(0.0))
  }
  private[operators] def sqlQualityScoreOf(c: String): String = {
    val toks = sqlTokenCountOf(c)
    val alpha = s"CAST(LENGTH(REGEXP_REPLACE(LOWER($c), '[^a-z ]', '', 'g')) AS DOUBLE) / GREATEST(LENGTH($c), 1)"
    val stop = s"(${sqlWordHitsOf(c, "the")} + ${sqlWordHitsOf(c, "and")} + ${sqlWordHitsOf(c, "of")}) / CAST($toks AS DOUBLE)"
    sqlR6(s"$alpha * 0.5 + LEAST($stop * 2.0, 1.0) * 0.3 + CASE WHEN $toks BETWEEN 10 AND 400 THEN 0.2 ELSE 0.0 END")
  }

  // --- token/char statistics ---------------------------------------------

  def qTextStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      // strip-spaces regex evaluated once; token count and word length
      // derive from it arithmetically (tokenCount = chars − nonspace + 1)
      .select(col("doc_id"), col("lang"),
        length(col("text")).cast("long").as("n_chars_obs"),
        length(translate(col("text"), " ", "")).cast("long")
          .as("__n_nonspace"))
      .select(col("doc_id"), col("lang"),
        (col("n_chars_obs") - col("__n_nonspace") + 1).as("n_tokens"),
        col("n_chars_obs"),
        r6(col("__n_nonspace").cast("double")
          / (col("n_chars_obs") - col("__n_nonspace") + 1))
          .as("avg_word_len"))

  val qTextStatsSql: String =
    s"""SELECT doc_id, lang,
      |  $sqlTokenCount AS n_tokens,
      |  CAST(LENGTH(text) AS BIGINT) AS n_chars_obs,
      |  ${sqlR6(s"CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE) / $sqlTokenCount")} AS avg_word_len
      |FROM documents""".stripMargin

  // --- BPE-ish token estimate ----------------------------------------------

  /** GPT-2-style pre-tokenizer pattern (contractions, letter runs, digit
    * runs, punctuation runs, space runs — Radford et al. 2019 / public
    * tiktoken pattern, simplified to ASCII with no lookahead so Java and
    * RE2 agree). Match count ≈ BPE token count upper bound. */
  private val BpePattern =
    "'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ']+| +"

  /** Token counting, both tiers the pipeline brief asks for: whitespace
    * tokens and a BPE-ish regex piece count, plus their ratio (a cheap
    * "tokens per word" fertility signal). One scan, codegen'd regex. */
  def qTextTokens(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      // two-step projection on purpose: the BPE regex is the expensive
      // expression and is referenced twice (count + ratio); a separate
      // producing projection makes Catalyst evaluate it once per row
      // (CollapseProject keeps non-cheap multi-referenced projections),
      // instead of relying on codegen subexpression elimination
      .select(col("doc_id"),
        tokenCount(col("text")).as("n_ws_tokens"),
        regexp_count(col("text"), lit(BpePattern)).cast("long")
          .as("n_bpe_pieces"))
      .select(col("doc_id"), col("n_ws_tokens"), col("n_bpe_pieces"),
        r6(col("n_bpe_pieces").cast("double") / col("n_ws_tokens"))
          .as("pieces_per_word"))

  val qTextTokensSql: String = {
    val p = BpePattern.replace("'", "''") // SQL string-literal escaping
    s"""SELECT doc_id,
      |  $sqlTokenCount AS n_ws_tokens,
      |  CAST(LEN(regexp_extract_all(text, '$p')) AS BIGINT)
      |    AS n_bpe_pieces,
      |  ${sqlR6(s"CAST(LEN(regexp_extract_all(text, '$p')) AS DOUBLE) / $sqlTokenCount")}
      |    AS pieces_per_word
      |FROM documents""".stripMargin
  }

  // --- quality scoring -----------------------------------------------------

  /** Length / alpha-ratio / stopword-ratio quality heuristic, bucketed —
    * frame-level form so the corpus pipeline (and its adversarial specs)
    * can score arbitrary (doc_id, text) frames. */
  def qualityOf(d: DataFrame): DataFrame = {
    val score = qualityScore(col("text"))
    // producing projection first: `score` carries four codegen'd regex
    // passes and feeds both output columns — one evaluation per row
    // (same CollapseProject reasoning as qTextTokens)
    d.select(col("doc_id"), score.as("quality"))
      .select(col("doc_id"), col("quality"),
        when(col("quality") >= 0.6, "good")
          .when(col("quality") >= 0.45, "ok")
          .otherwise("low").as("quality_band"))
  }

  def qTextQuality(s: SparkSession, dir: String): DataFrame =
    qualityOf(t(s, dir, "documents"))

  val qTextQualitySql: String = {
    val score = sqlQualityScoreOf("text")
    s"""SELECT doc_id, $score AS quality,
      |  CASE WHEN $score >= 0.6 THEN 'good'
      |       WHEN $score >= 0.45 THEN 'ok'
      |       ELSE 'low' END AS quality_band
      |FROM documents""".stripMargin
  }

  // --- language ID heuristic ----------------------------------------------

  /** Stopword-hit language ID (n-gram/stopword heuristic tier). Scores a
    * few high-frequency function words per language; ties broken by a
    * fixed language order. The `lang` column is NOT consulted — this is a
    * content classifier; the driver-visible output compares guess vs
    * label. */
  def qTextLangid(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val en = wordHits(col("text"), "the") + wordHits(col("text"), "and")
    val de = wordHits(col("text"), "der") + wordHits(col("text"), "und")
    val fr = wordHits(col("text"), "le") + wordHits(col("text"), "et")
    val es = wordHits(col("text"), "el") + wordHits(col("text"), "y")
    val guess = when(en >= de && en >= fr && en >= es && en > 0, "en")
      .when(de >= fr && de >= es && de > 0, "de")
      .when(fr >= es && fr > 0, "fr")
      .when(es > 0, "es")
      .otherwise("unknown")
    d.groupBy(col("lang"), guess.as("lang_guess"))
      .agg(count(lit(1)).as("n_docs"))
  }

  val qTextLangidSql: String = {
    val en = s"${sqlWordHits("the")} + ${sqlWordHits("and")}"
    val de = s"${sqlWordHits("der")} + ${sqlWordHits("und")}"
    val fr = s"${sqlWordHits("le")} + ${sqlWordHits("et")}"
    val es = s"${sqlWordHits("el")} + ${sqlWordHits("y")}"
    s"""SELECT lang,
      |  CASE WHEN ($en) >= ($de) AND ($en) >= ($fr) AND ($en) >= ($es) AND ($en) > 0 THEN 'en'
      |       WHEN ($de) >= ($fr) AND ($de) >= ($es) AND ($de) > 0 THEN 'de'
      |       WHEN ($fr) >= ($es) AND ($fr) > 0 THEN 'fr'
      |       WHEN ($es) > 0 THEN 'es'
      |       ELSE 'unknown' END AS lang_guess,
      |  COUNT(*) AS n_docs
      |FROM documents
      |GROUP BY 1, 2""".stripMargin
  }

  // --- fingerprinting ------------------------------------------------------

  /** Normalized-content fingerprint (md5 of lowercased text) + per-source
    * distinct-fingerprint stats — the cheap "document identity" primitive
    * exact dedup builds on. */
  def qTextFingerprint(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("source"), md5(lower(col("text"))).as("fp"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("fp")).as("n_unique"))

  val qTextFingerprintSql: String =
    """SELECT source, COUNT(*) AS n_docs,
      |  COUNT(DISTINCT md5(LOWER(text))) AS n_unique
      |FROM documents
      |GROUP BY source""".stripMargin

  /** Word-repetition ratio (Gopher/C4-style quality signal): the
    * fraction of word occurrences that are repeats of an earlier word —
    * high values flag boilerplate/spam for corpus filtering. Pure
    * builtins (split → size / array_distinct). */
  def qTextRepetition(s: SparkSession, dir: String): DataFrame = {
    val words = split(col("text"), " ")
    t(s, dir, "documents")
      .select(col("doc_id"),
        size(words).cast("long").as("n_words"),
        size(array_distinct(words)).cast("long").as("n_distinct_words"))
      .select(col("doc_id"), col("n_words"), col("n_distinct_words"),
        r6(lit(1.0) - col("n_distinct_words").cast("double")
          / col("n_words")).as("repetition_ratio"))
  }

  val qTextRepetitionSql: String =
    s"""SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
      |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
      |    AS n_distinct_words,
      |  ${sqlR6("1.0 - CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)" +
        " / len(string_split(text, ' '))")} AS repetition_ratio
      |FROM documents""".stripMargin

  /** Hashed linear text classifier scoring (fastText-shaped quality
    * filter — Joulin et al. 2016: score = Σ_tok w[h(tok) mod D]; the
    * GPT-3/CCNet pipelines run exactly this shape as their quality
    * gate, Brown et al. 2020 appendix A). The Spark-side plumbing is
    * the real contract: per-token bucket via a hash both engines
    * compute identically (md5 → first 12 hex digits → mod D, the
    * [[Dedup]] md5-twin idiom), weight lookup as pure arithmetic, and
    * the per-doc reduction kept in integer micro-units so token order
    * cannot perturb the sum (the repo's fixed-point convention). The
    * WEIGHTS are a deterministic stub (Knuth-hash of the bucket id →
    * [-0.5, 0.5) micro-units) — a trained model would broadcast a real
    * weight array; swapping it in changes one line. Zero shuffles: the
    * whole score is a codegen'd projection (aggregate over the token
    * array inside the row), so at 100 TB this is scan-speed. */
  val QualityDim = 4096L

  /** The classifier's integer micro-unit score as a column expression
    * over a text column — shared by the scoring gate and pipeline
    * compositions (filtering on it is a pure scan predicate). */
  def scoreMicro(textCol: String): Column =
    expr(
      s"""aggregate(
         |  filter(split(lower($textCol), ' '), x -> length(x) > 0),
         |  0L,
         |  (acc, tok) -> acc +
         |    ((cast(conv(substring(md5(tok), 1, 12), 16, 10) as bigint)
         |        % $QualityDim)
         |       * 2654435761L % 1000000L - 500000L),
         |  acc -> acc)""".stripMargin)

  /** DuckDB mirror of [[scoreMicro]]. */
  def scoreMicroSql(textCol: String): String =
    s"""COALESCE(list_sum(list_transform(
       |      list_filter(string_split(lower($textCol), ' '), x -> len(x) > 0),
       |      tok -> (CAST(('0x' || substr(md5(tok), 1, 12)) AS BIGINT)
       |                % $QualityDim)
       |               * 2654435761 % 1000000 - 500000)), 0)""".stripMargin

  def qualityLinearScore(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), scoreMicro("text").as("score_micro"))
      .select(col("doc_id"),
        (col("score_micro") / lit(1000000.0)).as("score"),
        (col("score_micro") > 0L).as("keep"))

  def qTextClassifierScore(s: SparkSession, dir: String): DataFrame =
    qualityLinearScore(t(s, dir, "documents")).orderBy(col("doc_id"))

  /** Oracle: same bucket/weight arithmetic via list_transform; DuckDB
    * md5 agrees with Spark's, and the 12-hex-digit prefix (48 bits)
    * fits BIGINT exactly on both engines. */
  val qTextClassifierScoreSql: String =
    s"""WITH scored AS (
      |  SELECT doc_id, ${scoreMicroSql("text")} AS score_micro
      |  FROM documents
      |)
      |SELECT doc_id, score_micro / 1000000.0 AS score,
      |  score_micro > 0 AS keep
      |FROM scored ORDER BY doc_id""".stripMargin

  // --- Gopher rule battery -------------------------------------------------

  /** Distinct "required stopwords" present — the Gopher rule asks for at
    * least 2 of a small closed set (Rae et al. 2021, A1.1: the/be/to/
    * of/and/that/have/with). The rule is PARAMETRIC on the set; English
    * prose uses the paper's list, and this gate instantiates it with
    * "the" plus this corpus's own highest-frequency function-word
    * stand-ins (the testdata vocabulary contains no English stopwords
    * beyond "the" — with the paper's literal list the rule would be
    * vacuously false on every row and the gate would pin nothing). */
  private val GopherStops = Seq("the", "join", "hash", "row", "scan")

  /** The Gopher quality-rule battery (Rae et al. 2021, Table A1 — the
    * MassiveWeb filter heuristics), restricted to the rules this
    * corpus's shape exercises (word-soup text has no line structure, so
    * the bullet/ellipsis-line rules are vacuous here and omitted):
    * word count in [50, 100000]; mean word length in [3, 10]; fraction
    * of words containing an alphabetic character ≥ 0.8; at least 2 of
    * the parametric [[GopherStops]] stopword set present (see that
    * val's note on why this corpus instantiates it with non-English
    * stand-ins); symbol-to-word ratio (`#`) ≤ 0.1.
    * `keep` is the conjunction.
    *
    * Scale shape: one scan, pure codegen'd projections (the same
    * replace-shrinkage counters as [[qualityScore]] plus one
    * filter-lambda word pass); zero shuffles — the gate's only exchange
    * is the presentation sort. */
  /** The five rule measurements over a text column, in gate order:
    * n_words, mean_wl, alpha_frac, n_stops, symbol_ratio. */
  private def gopherMeasures(c: Column): Seq[Column] = {
    val nWords = tokenCount(c)
    val meanWl = r6(length(translate(c, " ", ""))
      .cast("double") / nWords)
    val alphaWords = size(filter(split(lower(c), " "),
      x => x.rlike("[a-z]"))).cast("long")
    val nStops = GopherStops.map(w =>
      (wordHits(lower(c), w) > 0.0).cast("int")).reduce(_ + _)
    val hashHits = (length(c)
      - length(translate(c, "#", ""))).cast("double")
    Seq(nWords, meanWl, r6(alphaWords.cast("double") / nWords), nStops,
      r6(hashHits / nWords))
  }

  /** The keep conjunction as a reusable scan-side predicate — shared by
    * the gate and the streaming curation filter so both paths apply
    * IDENTICAL rules (including the fixed-point rounding of the ratio
    * measurements). */
  def gopherKeep(c: Column): Column = {
    val Seq(nWords, meanWl, alphaFrac, nStops, symbolRatio) =
      gopherMeasures(c)
    nWords.between(50, 100000) && meanWl.between(3.0, 10.0) &&
      alphaFrac >= 0.8 && nStops >= 2 && symbolRatio <= 0.1
  }

  def gopherRules(docs: DataFrame): DataFrame = {
    val Seq(nWords, meanWl, alphaFrac, nStops, symbolRatio) =
      gopherMeasures(col("text"))
    docs
      .select(col("doc_id"), nWords.as("n_words"), meanWl.as("mean_wl"),
        alphaFrac.as("alpha_frac"), nStops.as("n_stops"),
        symbolRatio.as("symbol_ratio"))
      .select(col("doc_id"), col("n_words"), col("mean_wl"),
        col("alpha_frac"), col("n_stops"), col("symbol_ratio"),
        (col("n_words").between(50, 100000)
          && col("mean_wl").between(3.0, 10.0)
          && col("alpha_frac") >= 0.8
          && col("n_stops") >= 2
          && col("symbol_ratio") <= 0.1).as("keep"))
      .orderBy(col("doc_id"))
  }

  def qGopherRules(s: SparkSession, dir: String): DataFrame =
    gopherRules(t(s, dir, "documents"))

  val qGopherRulesSql: String = {
    val nW = sqlTokenCountOf("text")
    val stops = GopherStops.map(w =>
      s"CASE WHEN ${sqlWordHitsOf("lower(text)", w)} > 0.0 THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""SELECT doc_id, $nW AS n_words,
      |  ${sqlR6(s"CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE) / $nW")}
      |    AS mean_wl,
      |  ${sqlR6(s"CAST(len(list_filter(string_split(lower(text), ' '), x -> regexp_matches(x, '[a-z]'))) AS DOUBLE) / $nW")}
      |    AS alpha_frac,
      |  $stops AS n_stops,
      |  ${sqlR6(s"CAST(LENGTH(text) - LENGTH(REPLACE(text, '#', '')) AS DOUBLE) / $nW")}
      |    AS symbol_ratio,
      |  ($nW BETWEEN 50 AND 100000)
      |    AND (${sqlR6(s"CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE) / $nW")} BETWEEN 3.0 AND 10.0)
      |    AND ${sqlR6(s"CAST(len(list_filter(string_split(lower(text), ' '), x -> regexp_matches(x, '[a-z]'))) AS DOUBLE) / $nW")} >= 0.8
      |    AND ($stops) >= 2
      |    AND ${sqlR6(s"CAST(LENGTH(text) - LENGTH(REPLACE(text, '#', '')) AS DOUBLE) / $nW")} <= 0.1
      |    AS keep
      |FROM documents
      |ORDER BY doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_text_classifier_score" -> (qTextClassifierScore _),
    "q_text_tokens" -> (qTextTokens _),
    "q_text_stats" -> (qTextStats _),
    "q_text_quality" -> (qTextQuality _),
    "q_text_langid" -> (qTextLangid _),
    "q_text_fingerprint" -> (qTextFingerprint _),
    "q_text_repetition" -> (qTextRepetition _),
    "q_gopher_rules" -> (qGopherRules _))

  val oracles: Map[String, String] = Map(
    "q_text_classifier_score" -> qTextClassifierScoreSql,
    "q_text_tokens" -> qTextTokensSql,
    "q_text_stats" -> qTextStatsSql,
    "q_text_quality" -> qTextQualitySql,
    "q_text_langid" -> qTextLangidSql,
    "q_text_fingerprint" -> qTextFingerprintSql,
    "q_text_repetition" -> qTextRepetitionSql,
    "q_gopher_rules" -> qGopherRulesSql)
}
