package graft

import graft.sources.Dml
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the batch DML transforms (SURVEY.md §2.11 — the
  * reference's replace_into.test / insert_on_duplicate_update.test /
  * delete_join.test / update_join.test shapes). Value-level correctness
  * at sf0.01 is covered by the DuckDB oracle gate; these pin the
  * set-algebra invariants at smoke scale. */
class DmlSpec extends AnyFunSuite {
  private def spark = TestSession.spark
  private val sf = TestSession.sf

  private def customer = Engine.table(spark, sf, "customer")

  test("replaceInto: row count unchanged on key-hit batch, values replaced") {
    val n = customer.count()
    val out = Dml.qDmlReplaceInto(spark, sf)
    assert(out.count() === n)
    val hit = out.filter(col("c_custkey") % 100 === 0)
    assert(hit.count() > 0)
    assert(hit.filter(col("c_mktsegment") =!= "REPLACED").count() === 0)
  }

  test("replaceInto is idempotent on the same batch") {
    val c = customer
    val batch = c.filter(col("c_custkey") % 100 === 0)
      .withColumn("c_mktsegment", lit("REPLACED"))
    val once = Dml.replaceInto(c, batch, Seq("c_custkey"))
    val twice = Dml.replaceInto(once, batch, Seq("c_custkey"))
    assert(once.exceptAll(twice).count() === 0)
    assert(twice.exceptAll(once).count() === 0)
  }

  test("upsert: updates touch only updateCols, inserts add new keys") {
    val c = customer
    val nHit = c.filter(col("c_custkey") % 97 === 0).count()
    val out = Dml.qDmlUpsert(spark, sf)
    assert(out.count() === c.count() + nHit)
    // updated rows kept their base segment (IGNORED is not in updateCols)
    assert(out.filter(col("c_mktsegment") === "IGNORED").count() === 0)
    // and got the +500 balance
    val one = c.filter(col("c_custkey") % 97 === 0)
      .orderBy("c_custkey").select("c_custkey", "c_acctbal").first()
    val upd = out.filter(col("c_custkey") === one.getLong(0))
      .select("c_acctbal").first().getDouble(0)
    assert(upd === one.getDouble(1) + 500.0)
    // inserted rows carry the shifted key + NEW_ name
    assert(out.filter(col("c_custkey") >= 10000000L).count() === nHit)
  }

  test("deleteJoin removes exactly the matching keys") {
    val out = Dml.qDmlDeleteJoin(spark, sf)
    val urgent = Engine.table(spark, sf, "orders")
      .filter(col("o_orderpriority") === "1-URGENT"
        && col("o_orderdate") < lit("1996-01-01"))
      .select(col("o_custkey")).distinct()
    val victims = customer
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
    assert(out.count() === customer.count() - victims.count())
    assert(out.join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
      .count() === 0)
  }

  test("updateJoin: matched rows rewritten, unmatched pass through") {
    val out = Dml.qDmlUpdateJoin(spark, sf)
    assert(out.count() === customer.count())
    val eu = Engine.table(spark, sf, "nation")
      .join(Engine.table(spark, sf, "region"),
        col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "EUROPE").select("n_nationkey")
    val nEu = customer
      .join(eu, col("c_nationkey") === col("n_nationkey"), "left_semi").count()
    assert(out.filter(col("c_mktsegment").startsWith("EU_")).count() === nEu)
  }

  test("appendStrict enforces PK uniqueness: clean append passes, " +
      "in-batch dup / base clash / NULL key all throw") {
    val s = spark
    import s.implicits._
    val base = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    // clean batch appends
    val ok = Dml.appendStrict(base, Seq((3L, "c"), (4L, "d")).toDF("id", "v"),
      Seq("id"))
    assert(ok.count() === 4)
    // duplicate within the incoming batch
    val e1 = intercept[IllegalStateException] {
      Dml.appendStrict(base, Seq((3L, "c"), (3L, "c2")).toDF("id", "v"),
        Seq("id"))
    }
    assert(e1.getMessage.contains("within the incoming batch"))
    // key already present in base
    val e2 = intercept[IllegalStateException] {
      Dml.appendStrict(base, Seq((2L, "x")).toDF("id", "v"), Seq("id"))
    }
    assert(e2.getMessage.contains("already present in base"))
    // NULL key component
    val e3 = intercept[IllegalStateException] {
      Dml.appendStrict(base,
        Seq((Option.empty[Long], "n")).toDF("id", "v"), Seq("id"))
    }
    assert(e3.getMessage.contains("NULL primary-key"))
  }

  test("materialized agg: incremental refreshes equal a one-shot " +
      "aggregate, snapshot stays group-sized") {
    import graft.sources.MaterializedAgg
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_mview_spec").toString
    val v = new MaterializedAgg(spark, root, Seq("k"), Seq("x"))
    val b0 = Seq(("a", 1.5), ("a", 2.5), ("b", 10.0)).toDF("k", "x")
    val b1 = Seq(("a", -3.0), ("c", 7.0)).toDF("k", "x")
    val b2 = Seq(("b", 0.25), ("c", -1.25)).toDF("k", "x")
    v.init(b0); v.refresh(b1); v.refresh(b2)
    // snapshot on disk is |groups| rows, not |rows|
    assert(spark.read.parquet(s"$root/snapshot").count() === 3)
    val got = v.read().collect()
      .map(r => r.getString(0) -> r).toMap
    // one-shot over the union must match exactly
    val all = b0.unionByName(b1).unionByName(b2).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    Seq("a", "b", "c").foreach { k =>
      val xs = all.filter(_._1 == k).map(_._2)
      val r = got(k)
      assert(r.getAs[Long]("n_rows") === xs.length.toLong)
      assert(r.getAs[Double]("sum_x") ===
        xs.map(x => math.floor(x * 1e4 + 0.5).toLong).sum.toDouble / 1e4)
      assert(r.getAs[Double]("min_x") === xs.min)
      assert(r.getAs[Double]("max_x") === xs.max)
      assert(r.getAs[Double]("avg_x") ===
        xs.map(x => math.floor(x * 1e4 + 0.5).toLong).sum.toDouble / 1e4
          / xs.length)
    }
  }
}
