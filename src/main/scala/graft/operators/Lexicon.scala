package graft.operators

import graft.Engine
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-lexicon operators: statistics computed over the whole corpus'
  * vocabulary and re-joined to documents — the unigram language-model
  * quality score (the cheap KenLM-perplexity analog every production
  * corpus filter runs) and per-document TF-IDF keyword extraction.
  * Extension tier like [[TextOps]] (no reference analog; the reference is
  * a SQL OLAP engine).
  *
  * Scale shape (100 TB): the vocabulary aggregate is the classic
  * map-side-combine win — the shuffle after `explode` carries one row per
  * DISTINCT (partition, token), not per token occurrence, and the
  * resulting lexicon frame is tiny (vocab ≪ corpus), so it broadcasts
  * back for the per-document pass. The corpus itself is scanned twice and
  * shuffled at most once (TF-IDF's per-(doc,token) partial agg); nothing
  * corpus-sized ever hits a driver.
  *
  * Determinism contract (same as Relational.dec): per-token float scores
  * are rounded to 1e-6 fixed-point LONGS before any reordering
  * aggregation, so sums are order-independent and engine-exact; `ln` is
  * IEEE double on both engines and the 1e-6 floor absorbs sub-ulp library
  * differences.
  */
object Lexicon {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Engine.table(s, dir, n)

  private def r6(c: Column): Column =
    floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
  private def sqlR6(e: String): String =
    s"FLOOR(($e) * 1000000.0 + 0.5) / 1000000.0"

  /** One row per token occurrence: (doc_id, tok). */
  private def tokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))

  // --- unigram language-model score ---------------------------------------

  /** Per-document mean negative log-probability under the corpus' own
    * unigram LM — the scalable stand-in for KenLM perplexity filtering
    * (low = fluent/common tokens, high = rare-token gibberish). Returned
    * per doc: token count and `avg_neg_logprob` (nats, 1e-6 fixed point).
    *
    * lp6 (per-token fixed-point −ln p) is summed as a LONG, so the
    * aggregation is order-independent; the final division happens once
    * per doc.
    *
    * `broadcastLexicon`: a WORD vocabulary broadcasts comfortably
    * (1e7-1e8 entries); pass false when the "token" is open-class
    * (URLs, n-grams) and the lexicon outgrows a broadcast — the join
    * then shuffles both sides on tok, everything else is unchanged.
    */
  def unigramLogprob(docs: DataFrame,
                     broadcastLexicon: Boolean = true): DataFrame = {
    val toks = tokens(docs)
    // lexicon: token -> occurrence count; |vocab| rows (tiny vs corpus)
    val lexicon = toks.groupBy(col("tok"))
      .agg(count(lit(1)).as("cnt"))
    val total = lexicon.agg(sum(col("cnt")).as("n_total"))
    val scored = lexicon.crossJoin(broadcast(total))
      .select(col("tok"),
        (-floor(log(col("cnt").cast("double") / col("n_total").cast("double"))
          * lit(1000000.0) + lit(0.5))).cast("long").as("nlp6"))
    toks.join(if (broadcastLexicon) broadcast(scored) else scored,
        Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("nlp6")).as("sum_nlp6"))
      .select(col("doc_id"), col("n_tokens"),
        r6(col("sum_nlp6").cast("double") / lit(1000000.0)
          / col("n_tokens").cast("double")).as("avg_neg_logprob"))
  }

  def qUnigramLogprob(s: SparkSession, dir: String): DataFrame =
    unigramLogprob(Engine.rebalance(t(s, dir, "documents")))
      .orderBy(col("doc_id"))

  val qUnigramLogprobSql: String =
    s"""WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
      |), lexicon AS (
      |  SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok
      |), scored AS (
      |  SELECT tok,
      |    CAST(-FLOOR(ln(CAST(cnt AS DOUBLE)
      |      / (SELECT CAST(SUM(cnt) AS DOUBLE) FROM lexicon))
      |      * 1000000.0 + 0.5) AS BIGINT) AS nlp6
      |  FROM lexicon
      |)
      |SELECT t.doc_id, COUNT(*) AS n_tokens,
      |  ${sqlR6("CAST(SUM(s.nlp6) AS DOUBLE) / 1000000.0 / COUNT(*)")}
      |    AS avg_neg_logprob
      |FROM toks t JOIN scored s ON t.tok = s.tok
      |GROUP BY t.doc_id
      |ORDER BY t.doc_id""".stripMargin

  // --- bigram language-model score ----------------------------------------

  /** One row per bigram occurrence: (doc_id, bg = "a b"). */
  private def bigrams(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("tk"))
      .where(size(col("tk")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(tk) - 1), i -> concat(tk[i-1], ' ', tk[i]))"))
        .as("bg"))

  /** Per-document mean −ln p(b|a) under the corpus' own bigram LM — the
    * conditional upgrade of [[unigramLogprob]] (KenLM-style fluency: a
    * doc of common-but-never-adjacent tokens now scores high). The
    * denominator is the continuation count (bigrams starting with `a`),
    * so probabilities condition correctly at document edges; no smoothing
    * is needed because the corpus scores itself (every doc bigram has
    * corpus count ≥ 1). Same fixed-point long-sum determinism contract,
    * same two-agg + broadcast-back scale shape (the bigram lexicon is
    * vocab²-bounded; pass through a shuffled join instead of broadcast
    * for open-class vocabularies, as in [[unigramLogprob]]). */
  def bigramLogprob(docs: DataFrame,
                    broadcastLexicon: Boolean = true): DataFrame = {
    val bgs = bigrams(docs)
    val lexicon = bgs.groupBy(col("bg"))
      .agg(count(lit(1)).as("cnt"))
    val firsts = lexicon
      .groupBy(substring_index(col("bg"), " ", 1).as("a"))
      .agg(sum(col("cnt")).as("cnt_a"))
    val scored = lexicon
      .withColumn("a", substring_index(col("bg"), " ", 1))
      .join(firsts, Seq("a"))
      .select(col("bg"),
        (-floor(log(col("cnt").cast("double") / col("cnt_a").cast("double"))
          * lit(1000000.0) + lit(0.5))).cast("long").as("nlp6"))
    bgs.join(if (broadcastLexicon) broadcast(scored) else scored, Seq("bg"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("nlp6")).as("sum_nlp6"))
      .select(col("doc_id"), col("n_bigrams"),
        r6(col("sum_nlp6").cast("double") / lit(1000000.0)
          / col("n_bigrams").cast("double")).as("avg_neg_logprob2"))
  }

  def qBigramLogprob(s: SparkSession, dir: String): DataFrame =
    bigramLogprob(Engine.rebalance(t(s, dir, "documents")))
      .orderBy(col("doc_id"))

  val qBigramLogprobSql: String =
    s"""WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
      |), bgs AS (
      |  SELECT doc_id,
      |    unnest(list_transform(range(1, len(tk)),
      |      i -> tk[i] || ' ' || tk[i+1])) AS bg
      |  FROM toks WHERE len(tk) >= 2
      |), lexicon AS (
      |  SELECT bg, COUNT(*) AS cnt FROM bgs GROUP BY bg
      |), firsts AS (
      |  SELECT string_split(bg, ' ')[1] AS a, SUM(cnt) AS cnt_a
      |  FROM lexicon GROUP BY 1
      |), scored AS (
      |  SELECT l.bg,
      |    CAST(-FLOOR(ln(CAST(l.cnt AS DOUBLE) / CAST(f.cnt_a AS DOUBLE))
      |      * 1000000.0 + 0.5) AS BIGINT) AS nlp6
      |  FROM lexicon l JOIN firsts f ON string_split(l.bg, ' ')[1] = f.a
      |)
      |SELECT b.doc_id, COUNT(*) AS n_bigrams,
      |  ${sqlR6("CAST(SUM(s.nlp6) AS DOUBLE) / 1000000.0 / COUNT(*)")}
      |    AS avg_neg_logprob2
      |FROM bgs b JOIN scored s ON b.bg = s.bg
      |GROUP BY b.doc_id
      |ORDER BY b.doc_id""".stripMargin

  // --- TF-IDF keyword extraction ------------------------------------------

  /** Top terms kept per document. */
  val TopK = 3

  /** Per-document top-[[TopK]] terms by TF-IDF (idf = ln(N/df), the
    * classic smooth-free form). Ranking compares the 1e-6 fixed-point
    * score with the term string as tie-break, so the order is total and
    * engine-exact. Scale: tf is a partial-agg shuffle on (doc_id, tok)
    * (bounded by per-doc vocab, not doc length); df and N are
    * lexicon-sized and broadcast; the final top-k is a per-doc window over
    * rows already co-partitioned by doc_id.
    */
  def tfidfTopk(docs: DataFrame): DataFrame = {
    val tf = tokens(docs).groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf
      .join(broadcast(df.crossJoin(n)), Seq("tok"))
      .select(col("doc_id"), col("tok"),
        floor(col("tf").cast("double")
          * log(col("n_docs").cast("double") / col("df").cast("double"))
          * lit(1000000.0) + lit(0.5)).cast("long").as("score6"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score6").desc, col("tok").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= TopK)
      .select(col("doc_id"), col("tok").as("term"), col("rnk"),
        (col("score6").cast("double") / lit(1000000.0)).as("tfidf"))
  }

  def qTfidfTopk(s: SparkSession, dir: String): DataFrame =
    tfidfTopk(Engine.rebalance(t(s, dir, "documents")))
      .orderBy(col("doc_id"), col("rnk"))

  val qTfidfTopkSql: String =
    s"""WITH tf AS (
      |  SELECT doc_id, tok, COUNT(*) AS tf
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |        FROM documents)
      |  GROUP BY doc_id, tok
      |), df AS (
      |  SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok
      |), scored AS (
      |  SELECT tf.doc_id, tf.tok,
      |    CAST(FLOOR(CAST(tf.tf AS DOUBLE)
      |      * ln((SELECT CAST(COUNT(*) AS DOUBLE) FROM documents)
      |           / CAST(df.df AS DOUBLE))
      |      * 1000000.0 + 0.5) AS BIGINT) AS score6
      |  FROM tf JOIN df ON tf.tok = df.tok
      |), ranked AS (
      |  SELECT doc_id, tok, score6,
      |    ROW_NUMBER() OVER (PARTITION BY doc_id
      |                       ORDER BY score6 DESC, tok ASC) AS rnk
      |  FROM scored
      |)
      |SELECT doc_id, tok AS term, rnk,
      |  CAST(score6 AS DOUBLE) / 1000000.0 AS tfidf
      |FROM ranked WHERE rnk <= $TopK
      |ORDER BY doc_id, rnk""".stripMargin

  // --- heavy hitters -------------------------------------------------------

  /** Exact corpus-wide top-20 tokens by occurrence count (ties broken by
    * token). One map-side-combined agg + TakeOrderedAndProject — the
    * shuffle carries |vocab| rows, the heap carries 20. */
  def qHeavyHitters(s: SparkSession, dir: String): DataFrame =
    tokens(Engine.rebalance(t(s, dir, "documents")))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok").asc)
      .limit(20)
      .select(col("tok").as("term"), col("cnt"))

  val qHeavyHittersSql: String =
    """SELECT tok AS term, COUNT(*) AS cnt
      |FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      |GROUP BY tok
      |ORDER BY cnt DESC, tok ASC
      |LIMIT 20""".stripMargin

  /** Count-min-sketch twin — the 100 TB path when even |vocab| is too
    * large to shuffle exactly (URLs, n-grams): partition-local sketches
    * merge associatively into one `eps`-wide summary, then any candidate
    * set probes it. Deterministic (fixed seed, commutative merge) and
    * guaranteed to over-estimate: est >= true, est <= true + eps*N with
    * the configured confidence. Probes the exact top-20 so the spec can
    * pin both bounds; rows-only gate (the sketch is not SQL-expressible).
    */
  def heavyHittersSketch(docs: DataFrame, eps: Double = 0.0001,
                         confidence: Double = 0.99): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val toks = tokens(docs)
    val sketch = toks.stat.countMinSketch("tok", eps, confidence, 42)
    val probes = qProbeTerms(docs)
    probes.map(term => term -> sketch.estimateCount(term))
      .toDF("term", "est_cnt")
  }

  /** Probe set for the sketch gate: the exact top-20 terms. */
  private def qProbeTerms(docs: DataFrame): Seq[String] =
    tokens(docs).groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok").asc).limit(20)
      .collect().map(_.getString(0)).toSeq

  def qHeavySketch(s: SparkSession, dir: String): DataFrame =
    heavyHittersSketch(Engine.rebalance(t(s, dir, "documents")))
      .orderBy(col("est_cnt").desc, col("term").asc)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_unigram_logprob" -> (qUnigramLogprob _),
    "q_bigram_logprob" -> (qBigramLogprob _),
    "q_tfidf_topk" -> (qTfidfTopk _),
    "q_heavy_hitters" -> (qHeavyHitters _),
    "q_heavy_sketch" -> (qHeavySketch _))

  val oracles: Map[String, String] = Map(
    "q_unigram_logprob" -> qUnigramLogprobSql,
    "q_bigram_logprob" -> qBigramLogprobSql,
    "q_tfidf_topk" -> qTfidfTopkSql,
    "q_heavy_hitters" -> qHeavyHittersSql)
}
