package graft

import graft.operators.Scale
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The scale-toolkit invariants: salting must not change results, and
  * bucketed joins must actually eliminate the shuffle. */
class ScaleSpec extends AnyFunSuite {
  private def spark = TestSession.spark
  private val sf = TestSession.sf

  test("salted aggregation equals direct aggregation") {
    val li = Engine.table(spark, sf, "lineitem")
    val direct = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_l_quantity"))
    val salted = Scale.saltedCountSum(li, Seq("l_returnflag"), 8, "l_quantity")
    val joined = direct.as("d").join(salted.as("s"), Seq("l_returnflag"))
    assert(joined.filter(col("d.n") =!= col("s.n")).count() === 0)
    // double sums may differ in last ulp across add orders; compare loosely
    val maxDelta = joined
      .select(max(abs(col("d.sum_l_quantity") - col("s.sum_l_quantity"))))
      .head().getDouble(0)
    assert(maxDelta < 1e-6)
  }

  test("salted join equals plain join") {
    val li = Engine.table(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    val o = Engine.table(spark, sf, "orders").select("o_orderkey", "o_orderpriority")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    val plain = li.join(o, Seq("l_orderkey"))
    val salted = Scale.saltedJoin(li, o, "l_orderkey", 8)
    assert(plain.count() === salted.count())
    assert(plain.exceptAll(salted).count() === 0)
    assert(salted.exceptAll(plain).count() === 0)
  }

  test("banded range join equals the nested-loop range join") {
    val sup = Engine.table(spark, sf, "supplier")
      .select("s_suppkey", "s_acctbal")
    val ranges = Engine.table(spark, sf, "customer")
      .filter(col("c_custkey") % 20 === 0)
      .select(col("c_custkey"),
        (col("c_acctbal") - 500.0).as("lo"),
        (col("c_acctbal") + 500.0).as("hi"))
    val plain = sup.join(ranges,
      col("s_acctbal") >= col("lo") && col("s_acctbal") <= col("hi"))
    val banded = Scale.bandedRangeJoin(sup, "s_acctbal", ranges,
      "lo", "hi", bandWidth = 500L)
    assert(plain.count() === banded.count())
    assert(plain.exceptAll(banded).count() === 0)
    assert(banded.exceptAll(plain).count() === 0)
  }

  test("interval overlap join equals the nested-loop overlap join, " +
      "no duplicate pairs from the multi-band explode") {
    val iv = Engine.table(spark, sf, "supplier")
      .select(col("s_suppkey"),
        (col("s_acctbal") - 300.0).as("lo"),
        (col("s_acctbal") + 300.0).as("hi"))
    val a = iv.select(col("s_suppkey").as("a_id"),
      col("lo").as("a_lo"), col("hi").as("a_hi"))
    val b = iv.select(col("s_suppkey").as("b_id"),
      col("lo").as("b_lo"), col("hi").as("b_hi"))
    val plain = a.join(b, col("a_lo") <= col("b_hi")
      && col("b_lo") <= col("a_hi") && col("a_id") < col("b_id"))
    // bandWidth far smaller than the span forces multi-band explode —
    // the dedup-by-first-shared-band rule must still emit each pair once
    val banded = Scale.intervalOverlapJoin(a, b, bandWidth = 100L)
      .where(col("a_id") < col("b_id"))
    assert(plain.count() === banded.count())
    assert(plain.exceptAll(banded).count() === 0)
    assert(banded.exceptAll(plain).count() === 0)
  }

  test("partitioned write prunes at the partition level on read") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_part").toString
    val ev = Engine.table(spark, sf, "events")
    Scale.partitionedWrite(ev, s"$tmp/events_p", "event_type")
    val one = ev.select("event_type").distinct().head().getString(0)
    val pruned = spark.read.parquet(s"$tmp/events_p")
      .filter(col("event_type") === one)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("event_type"), s"expected partition pruning:\n$plan")
    assert(pruned.count() === ev.filter(col("event_type") === one).count())
  }

  test("bucketed join plans as SortMergeJoin without a shuffle exchange") {
    val sp = spark
    val prevThreshold = sp.conf.get("spark.sql.autoBroadcastJoinThreshold")
    sp.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = Engine.table(sp, sf, "lineitem").select("l_orderkey", "l_quantity")
      val o = Engine.table(sp, sf, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
      val joined = Scale.bucketedJoin(sp, li, o, "l_orderkey", 8,
        "t_li_bucketed", "t_o_bucketed")
      val physical = joined.queryExecution.executedPlan.toString
      assert(physical.contains("SortMergeJoin"),
        s"expected a sort-merge join:\n$physical")
      assert(!physical.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$physical")
      assert(joined.count() ===
        Engine.table(sp, sf, "lineitem").join(
          Engine.table(sp, sf, "orders"),
          col("l_orderkey") === col("o_orderkey")).count())
    } finally {
      sp.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }
}
