package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Corpus layout & selection tier (operators.Corpus): chunk geometry,
  * leakage-safe splits, token-budget selection equivalence to the naive
  * prefix rule, source-curation verdict consistency. */
class CorpusSpec extends AnyFunSuite {
  import operators._
  private def spark = TestSession.spark
  private val sf = TestSession.sf

  private def docs = Engine.table(spark, sf, "documents")

  test("chunking tiles every document exactly: last chunk ends at " +
      "n_tokens, inner chunks are full-width, stride fixed") {
    val chunks = Corpus.qChunkDocs(spark, sf)
    val nTok = TextOps.qTextStats(spark, sf).select("doc_id", "n_tokens")
    val geo = chunks.groupBy("doc_id").agg(
      max(col("chunk_idx") * Corpus.ChunkStride + col("n_chunk_tokens"))
        .as("covered_end"),
      max("chunk_idx").as("last_idx"),
      min("n_chunk_tokens").as("min_w"),
      count(lit(1)).as("n_chunks")).join(nTok, "doc_id")
    // contiguous cover: the last chunk's end == the doc's token count
    assert(geo.filter(col("covered_end") =!= col("n_tokens")).count() === 0)
    // chunk ids are dense 0..n-1
    assert(geo.filter(col("last_idx") =!= col("n_chunks") - 1).count() === 0)
    // every non-last chunk is exactly ChunkTokens wide; the last is >
    // overlap (no chunk fully contained in its predecessor)
    val widths = chunks.join(geo.select("doc_id", "last_idx"), "doc_id")
    assert(widths.filter(col("chunk_idx") =!= col("last_idx")
      && col("n_chunk_tokens") =!= Corpus.ChunkTokens).count() === 0)
    // (single-chunk docs have no predecessor, so only last_idx > 0 counts)
    assert(widths.filter(col("last_idx") > 0
      && col("chunk_idx") === col("last_idx")
      && col("n_chunk_tokens") <= Corpus.ChunkTokens - Corpus.ChunkStride)
      .count() === 0)
  }

  test("leakage-safe split: identical text always lands in the same " +
      "split, and the split partitions the corpus") {
    val s = spark
    import s.implicits._
    val synth = Seq(
      (1L, "a", "alpha beta gamma delta"),
      (2L, "b", "alpha beta gamma delta"), // dup of 1 in another source
      (3L, "a", "one two three four five"),
      (4L, "c", "one two three four five"), // dup of 3
      (5L, "a", "unique text here")).toDF("doc_id", "source", "text")
    val splits = Corpus.splitOf(synth)
      .join(synth, Seq("doc_id", "source"))
    val perText = splits.groupBy("text")
      .agg(countDistinct("split").as("n_splits"))
    assert(perText.filter(col("n_splits") =!= 1).count() === 0)
    // the gate's accounting partitions the real corpus
    val total = Corpus.qSplitLeakfree(spark, sf)
      .agg(sum("n_docs")).first().getLong(0)
    assert(total === docs.count())
  }

  test("token-budget selection equals the naive global-prefix rule") {
    val scored = Corpus.scoredDocs(docs)
    val budget = scored.agg(expr("sum(n) div 2")).first().getLong(0)
    val w = Window.orderBy(col("q").desc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = scored.withColumn("run", sum("n").over(w))
      .filter(col("run") <= budget)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val kept = Corpus.tokenBudgetKept(docs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === naive)
    assert(kept.nonEmpty && kept.size < docs.count())
  }

  test("token-budget selection never exceeds the budget and cannot add " +
      "the next-ranked document") {
    val scored = Corpus.scoredDocs(docs)
    val budget = scored.agg(expr("sum(n) div 2")).first().getLong(0)
    val kept = Corpus.tokenBudgetKept(docs)
    val used = kept.agg(sum("n")).first().getLong(0)
    assert(used <= budget)
    // maximality: the best-ranked unselected doc would overflow
    val keptIds = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    val next = scored.filter(!col("doc_id").isInCollection(keptIds))
      .orderBy(col("q").desc, col("doc_id").asc)
      .select("n").head().getLong(0)
    assert(used + next > budget)
  }

  test("pipeline mix: no drop-verdict source survives, and the selected " +
      "token total respects the surviving-corpus budget") {
    val mix = operators.Pipeline.qPipelineMix(spark, sf)
    val stats = Corpus.sourceStats(docs)
    val dropped = stats.filter(col("verdict") === "drop").select("source")
    assert(mix.join(dropped, Seq("source")).count() === 0)
    val kept = docs.join(
      stats.filter(col("verdict") === "keep").select("source"), Seq("source"))
    val budget = Corpus.scoredDocs(kept)
      .agg(expr("sum(n) div 2")).first().getLong(0)
    val used = mix.agg(sum("n_tokens")).first().getLong(0)
    assert(used <= budget && used > 0)
  }

  test("hybrid retrieval: candidate set is the brute-force top-10 and " +
      "the reported chunk maximizes term hits") {
    val hy = Similarity.qRetrievalHybrid(spark, sf)
    val rows = hy.collect()
    assert(rows.length === 10)
    val bf10 = Similarity.qSimBruteForce(spark, sf)
      .orderBy(col("cos").desc, col("vec_id")).limit(10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(rows.map(_.getAs[Long]("doc_id")).toSet === bf10)
    // recompute per-chunk hits independently; the reported best must hit
    // the per-doc maximum
    val cand = docs.filter(col("doc_id").isInCollection(bf10))
    val hits = size(filter(col("chunk_toks"),
      t => Similarity.HybridTerms.map(t === _).reduce(_ || _))).cast("long")
    val maxHits = Corpus.chunkTokens(cand)
      .select(col("doc_id"), hits.as("h"))
      .groupBy("doc_id").agg(max("h").as("max_h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("term_hits") === maxHits(r.getAs[Long]("doc_id")))
    }
  }

  test("source curation: verdict matches its own published thresholds") {
    val cur = Corpus.qSourceCuration(spark, sf)
    val bad = cur.filter(
      (col("dup_rate") <= 0.2 && col("mean_quality") >= 0.4
        && col("verdict") =!= "keep")
        || ((col("dup_rate") > 0.2 || col("mean_quality") < 0.4)
          && col("verdict") =!= "drop"))
    assert(bad.count() === 0)
    assert(cur.filter(col("dup_rate") < 0 || col("dup_rate") > 1).count() === 0)
  }

  test("waterfill allocation: tiny source saturates, the rest split the " +
      "remainder by weight; never over budget or capacity") {
    val s = spark
    import s.implicits._
    // equal weights; A can only give 10 tokens, so it saturates and
    // B/C waterfill the remaining budget equally
    val per = Seq(
      ("a", 10L, 1000000L),
      ("b", 2000L, 1000000L),
      ("c", 2000L, 1000000L)).toDF("source", "capacity", "w6")
    val out = Corpus.waterfillAlloc(per).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    val budget = (10L + 2000L + 2000L) / 2  // 2005
    assert(out("a")._2 === 10L, s"tiny source must saturate: $out")
    assert(out("b")._2 === out("c")._2, s"equal weights split equally: $out")
    val total = out.values.map(_._2).sum
    assert(total <= budget && total >= budget - 3,
      s"allocation $total must fill the budget $budget up to flooring")
    out.values.foreach { case (cap, alloc) => assert(alloc <= cap) }
    // degenerate: budget >= capacity (every source saturates)
    val small = Seq(("x", 4L, 500000L), ("y", 4L, 500000L))
      .toDF("source", "capacity", "w6")
    val degen = Corpus.waterfillAlloc(small).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    // budget = 4: the lower-ratio source fills first; no over-alloc
    assert(degen.values.sum <= 4L && degen.values.forall(_ <= 4L))
    // zero-weight source: allocates 0 and must NOT distort the rest —
    // Spark's non-ANSI x/0 is NULL and sorted it first, silently
    // treating the source as pre-saturated (a got 25 instead of 75
    // before the guard)
    val wz = Seq(("a", 100L, 1000000L), ("z", 50L, 0L))
      .toDF("source", "capacity", "w6")
    val outz = Corpus.waterfillAlloc(wz).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(outz === Map("a" -> 75L, "z" -> 0L), s"got $outz")
  }

  test("temperature sampling: tail sources keep a rate no lower than the " +
      "head, budget respected, quotas honor the power law") {
    val out = operators.Sampling.qSampleTemperature(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_docs"),
        r.getAs[Long]("w6"), r.getAs[Long]("quota"),
        r.getAs[Long]("n_sampled"))).toMap
    assert(out.nonEmpty)
    out.foreach { case (src, (n, w6, quota, sampled)) =>
      assert(w6 === math.floor(math.sqrt(n.toDouble) * 1e6).toLong, src)
      assert(sampled <= n, src)
    }
    // α=1/2 flattening: the smallest source's target RATE (quota/n)
    // is >= the largest source's — the whole point of temperature
    val smallest = out.values.minBy(_._1)
    val largest = out.values.maxBy(_._1)
    assert(smallest._3.toDouble / smallest._1
      >= largest._3.toDouble / largest._1 - 1e-9)
  }

  test("quality score is total: empty and pathological text scores 0.0, " +
      "never NULL") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "web", ""),            // zero-length: alpha divisor would be 0
      (2L, "web", " "),           // whitespace-only
      (3L, "web", "12345!!!"),    // no alpha, no stopwords
      (4L, "web", "the and of the and of the and of the quick brown fox")
    ).toDF("doc_id", "source", "text")
    val out = Corpus.scoredDocs(docs).collect()
      .map(r => r.getLong(0) -> Option(r.get(2)).map(_.asInstanceOf[Double]))
      .toMap
    assert(out.values.forall(_.isDefined), s"NULL q would vanish from " +
      s"tokenBudgetKept's bucket equi-joins: $out")
    assert(out(1L).get === 0.0)
    assert(out(4L).get > out(3L).get)
  }
}
