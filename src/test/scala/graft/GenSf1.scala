package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-shot sf1 generator (test scope, benchmark support): scales the
  * driver's sf0.1 TPC-H tables 10× by unioning key-shifted copies —
  * each copy's orderkey/custkey/partkey/suppkey domains are offset by
  * copy-index × (max+1), so per-key join fan-out matches real sf1
  * (plain row duplication would square join outputs on repeated keys).
  * nation/region stay fixed like real TPC-H. Output parquet under
  * /tmp/sf1 for `SPARK_GRAFT_SF_DIR=/tmp/sf1 Bench` with
  * `SPARK_GRAFT_BENCH_FILTER='q\d\d_.*'`. */
object GenSf1 {
  private val Copies = 10

  def main(args: Array[String]): Unit = {
    val spark = TestSession.spark
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/sf1")

    def tbl(name: String): DataFrame =
      spark.read.parquet(s"$src/$name.parquet")

    def off(df: DataFrame, col0: String): Long =
      df.agg(max(col(col0)).cast("long")).first().getLong(0) + 1

    val customer = tbl("customer")
    val orders = tbl("orders")
    val lineitem = tbl("lineitem")
    val part = tbl("part")
    val supplier = tbl("supplier")

    val cOff = off(customer, "c_custkey")
    val oOff = off(orders, "o_orderkey")
    val pOff = off(part, "p_partkey")
    val sOff = off(supplier, "s_suppkey")

    // one crossJoin with a tiny copy-index frame per table: the shift
    // is a codegen'd projection, no shuffle — write-parallelism comes
    // from the source partitioning × copies
    def scaled(df: DataFrame, shifts: Map[String, Long]): DataFrame = {
      val idx = spark.range(Copies).toDF("__copy")
      df.crossJoin(broadcast(idx))
        .select(df.columns.map { c =>
          shifts.get(c) match {
            case Some(o) => (col(c) + col("__copy") * o).as(c)
            case None => col(c)
          }
        }.toIndexedSeq: _*)
    }

    def write(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[gensf1] $name written")
    }

    write(tbl("region"), "region")
    write(tbl("nation"), "nation")
    write(scaled(customer, Map("c_custkey" -> cOff)), "customer")
    write(scaled(supplier, Map("s_suppkey" -> sOff)), "supplier")
    write(scaled(part, Map("p_partkey" -> pOff)), "part")
    write(scaled(orders,
      Map("o_orderkey" -> oOff, "o_custkey" -> cOff)), "orders")
    write(scaled(lineitem, Map("l_orderkey" -> oOff,
      "l_partkey" -> pOff, "l_suppkey" -> sOff)), "lineitem")

    // ── LLM-pipeline tables (round 17): the text/ANN/events tiers get
    // their own 10× point. Copies must NOT be near-duplicates of each
    // other (plain duplication would give every doc 9 planted
    // near-dups — a fixture-density artifact that inflates every
    // pair-producing operator quadratically, the interval-overlap
    // lesson), so copy i>0 suffixes EVERY word with _i: each copy's
    // tokens are disjoint from every other copy's, while the planted
    // dup structure WITHIN a copy is preserved verbatim — per-copy dup
    // density matches sf0.1, the honest scale-up. n_chars recomputes.
    val documents = tbl("documents")
    val docs10 = documents.crossJoin(broadcast(
        spark.range(Copies).toDF("__copy")))
      .select(
        (col("doc_id") + col("__copy") * off(documents, "doc_id")).as("doc_id"),
        when(col("__copy") === 0, col("text"))
          .otherwise(regexp_replace(col("text"), lit("(\\w+)"),
            concat(lit("$1_"), col("__copy")))).as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    write(docs10, "documents")

    // embeddings: vec_id shifts; vectors get a small deterministic
    // per-copy affine nudge so ANN structure is 10 shifted clusters,
    // not 10 coincident points per location
    val embeddings = tbl("embeddings")
    val emb10 = embeddings.crossJoin(broadcast(
        spark.range(Copies).toDF("__copy")))
      .select(
        (col("vec_id") + col("__copy") * off(embeddings, "vec_id")).as("vec_id"),
        transform(col("embedding"),
          x => x * (lit(1.0f) + col("__copy").cast("float") * lit(0.01f))
            + col("__copy").cast("float") * lit(0.003f)).as("embedding"),
        col("label"))
    write(emb10, "embeddings")

    // events: event_id/user_id shift; timestamps keep their window
    // (10× the traffic in the same period — the scale shape)
    val events = tbl("events")
    val ev10 = events.crossJoin(broadcast(
        spark.range(Copies).toDF("__copy")))
      .select(
        (col("event_id") + col("__copy") * off(events, "event_id")).as("event_id"),
        col("ts"),
        (col("user_id") + col("__copy") * off(events, "user_id")).as("user_id"),
        col("event_type"), col("value"), col("props"))
    write(ev10, "events")
    println("[gensf1] DONE " + dst)
  }
}
