package graft

import graft.operators.{Dedup, Pipeline, TextOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-cleaning pipeline invariants: the kept set contains no
  * low-quality doc, no two identical texts, and no near-dup pair; every
  * drop is attributable to exactly one of those rules. */
class PipelineSpec extends AnyFunSuite {
  private def spark = TestSession.spark
  private val sf = TestSession.sf

  private lazy val kept =
    Pipeline.cleanCorpus(spark, sf).collect()
      .map(_.getAs[Long]("doc_id")).toSet

  test("pipeline output is deterministic and nonempty") {
    val again = Pipeline.cleanCorpus(spark, sf).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(kept.nonEmpty && kept === again)
  }

  test("no low-quality document survives") {
    val low = TextOps.qTextQuality(spark, sf)
      .filter(col("quality_band") === "low")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert((kept & low).isEmpty)
  }

  test("no two kept documents share a text fingerprint") {
    val docs = Engine.table(spark, sf, "documents")
      .select(col("doc_id"), md5(col("text")).as("fp")).collect()
      .filter(r => kept(r.getLong(0)))
    val dupFps = docs.groupBy(_.getString(1)).filter(_._2.length > 1)
    assert(dupFps.isEmpty, s"kept exact dups: ${dupFps.keys.take(3)}")
  }

  test("no near-dup pair survives within the kept set") {
    val pairs = Dedup.qDedupMinhash(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val surviving = pairs.filter(p => kept(p._1) && kept(p._2))
    assert(surviving.isEmpty, s"kept near-dup pairs: ${surviving.take(3)}")
  }

  test("every dropped doc is attributable to a pipeline rule") {
    val all = Engine.table(spark, sf, "documents")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val low = TextOps.qTextQuality(spark, sf)
      .filter(col("quality_band") === "low")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val exactKeepers = Dedup.qDedupExact(spark, sf)
      .collect().map(_.getAs[Long]("keeper")).toSet
    val nearKeepers = Dedup.qDedupCorpus(spark, sf)
      .filter(col("doc_id") === col("keeper"))
      .collect().map(_.getAs[Long]("doc_id")).toSet
    (all -- kept).foreach { d =>
      assert(low(d) || !exactKeepers(d) || !nearKeepers(d),
        s"doc $d dropped without a rule")
    }
  }
}
