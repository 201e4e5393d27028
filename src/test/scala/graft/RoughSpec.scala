package graft

import graft.sources.StatsSidecar
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Knowledge-Grid analog (sources.StatsSidecar): per-pack DPN stats,
  * tri-state RoughCheck, metadata-only aggregates, and hybrid pruned
  * range counts — semantics pinned against exact recomputation. */
class RoughSpec extends AnyFunSuite {
  private def spark = TestSession.spark
  private val sf = TestSession.sf

  private lazy val scratch = {
    val dir = java.nio.file.Files.createTempDirectory("graft_roughspec")
    val li = Engine.table(spark, sf, "lineitem")
      .select(col("l_quantity"), col("l_extendedprice"))
    StatsSidecar.writeWithStats(li, s"$dir/li", 512,
      Seq("l_quantity", "l_extendedprice"),
      clusterBy = Some(col("l_quantity")))
    s"$dir/li"
  }

  test("rough aggregates equal exact aggregates") {
    val exact = Engine.table(spark, sf, "lineitem")
      .agg(count(lit(1)), min("l_quantity").cast("double"),
        max("l_quantity").cast("double"),
        sum(floor(col("l_quantity") * 10000.0 + 0.5).cast("long"))).first()
    val rough = StatsSidecar
      .roughAgg(StatsSidecar.readStats(spark, scratch), "l_quantity").first()
    assert(rough.getAs[Long]("n_rows") === exact.getLong(0))
    assert(rough.getAs[Double]("min_v") === exact.getDouble(1))
    assert(rough.getAs[Double]("max_v") === exact.getDouble(2))
    assert(rough.getAs[Double]("sum_v") === exact.getLong(3) / 10000.0)
  }

  test("clustered packs rough-decide packs for a mid range") {
    val states = StatsSidecar
      .roughCheck(StatsSidecar.readStats(spark, scratch), "l_quantity",
        10.0, 30.0)
      .select("state").distinct().collect().map(_.getString(0)).toSet
    // Clustering must yield decided (skippable/acceptable) packs. SOME
    // may legitimately be absent: l_quantity has 50 discrete values, so
    // range boundaries can align exactly with pack boundaries — that is
    // perfect pruning, not a failure.
    assert(states.contains("NONE") || states.contains("ALL"),
      s"expected skip/accept packs under clustering, got $states")
    assert(states.subsetOf(Set("NONE", "SOME", "ALL")))
  }

  test("hybrid count equals exact count") {
    val exact = Engine.table(spark, sf, "lineitem")
      .filter(col("l_quantity").between(10.0, 30.0)).count()
    assert(StatsSidecar.countBetween(spark, scratch, "l_quantity",
      10.0, 30.0) === exact)
  }

  test("z-order clustering prunes on BOTH z-dimensions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder")
    val li = Engine.table(spark, sf, "lineitem")
      .select(col("l_quantity"), col("l_partkey"))
    // 128-row packs → ~47 packs at sf0.001, deep enough in the z quadtree
    // for per-pack per-dimension ranges to narrow below the predicate
    operators.Scale.zorderPack(li, s"$dir/li_z", 128,
      Seq("l_quantity", "l_partkey"), Seq("l_quantity", "l_partkey"))
    val stats = StatsSidecar.readStats(spark, s"$dir/li_z")
    def skippable(column: String, lo: Double, hi: Double): Double = {
      val states = StatsSidecar.roughCheck(stats, column, lo, hi)
        .groupBy("state").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val decided = states.getOrElse("NONE", 0L) + states.getOrElse("ALL", 0L)
      decided.toDouble / states.values.sum
    }
    // a mid-range predicate on EITHER column must rough-decide a
    // substantial pack fraction — one clustering order, two pruned dims
    val qFrac = skippable("l_quantity", 10.0, 30.0)
    val pkMax = li.agg(max("l_partkey")).first().getLong(0).toDouble
    val pFrac = skippable("l_partkey", pkMax * 0.2, pkMax * 0.6)
    assert(qFrac > 0.1, s"l_quantity rough-decided only $qFrac")
    assert(pFrac > 0.1, s"l_partkey rough-decided only $pFrac")
    // hybrid count stays exact under z-order packing
    val exact = li.filter(col("l_quantity").between(10.0, 30.0)).count()
    assert(StatsSidecar.countBetween(spark, s"$dir/li_z", "l_quantity",
      10.0, 30.0) === exact)
  }

  test("empty input writes a readable empty table + sidecar") {
    val dir = java.nio.file.Files.createTempDirectory("graft_roughempty")
    val li = Engine.table(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
      .filter(col("l_orderkey") < 0) // empty, schema preserved
    StatsSidecar.writeWithStats(li, s"$dir/li", 512, Seq("l_quantity"))
    val stats = StatsSidecar.readStats(spark, s"$dir/li")
    assert(stats.count() === 0)
    assert(StatsSidecar.countBetween(spark, s"$dir/li", "l_quantity", 0, 100)
      === 0L)
    // the z-order path routes empty frames here too (Scale.scala)
    operators.Scale.zorderPack(li, s"$dir/liz", 512,
      Seq("l_orderkey", "l_quantity"), Seq("l_quantity"))
    assert(StatsSidecar.readStats(spark, s"$dir/liz").count() === 0)
  }

  test("string prefix rough check: hybrid LIKE count equals exact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_roughstr")
    val c = Engine.table(spark, sf, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    StatsSidecar.writeWithStats(c, s"$dir/c", 16, Seq("c_custkey"),
      clusterBy = Some(col("c_mktsegment")), strCols = Seq("c_mktsegment"))
    val exact = c.filter(col("c_mktsegment").startsWith("M")).count()
    assert(StatsSidecar.countPrefix(spark, s"$dir/c", "c_mktsegment", "M")
      === exact)
    // segment clustering must let the prefix check skip packs entirely
    val states = StatsSidecar
      .roughCheckPrefix(StatsSidecar.readStats(spark, s"$dir/c"),
        "c_mktsegment", "M")
      .select("state").distinct().collect().map(_.getString(0)).toSet
    assert(states.contains("NONE") || states.contains("ALL"),
      s"expected decided packs, got $states")
  }

  test("many SOME packs switch to the broadcast-join path, counts exact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_roughwide")
    val li = Engine.table(spark, sf, "lineitem")
      .select(col("l_quantity"), col("l_extendedprice"))
    // unclustered tiny packs: every pack spans the full quantity range,
    // so a mid-range predicate leaves (nearly) all packs RS_SOME —
    // the adversarial weak-rough-pass case the literal-IN path must not
    // inline (IsinMaxPacks guard)
    StatsSidecar.writeWithStats(li, s"$dir/li", 8,
      Seq("l_quantity"))
    val nSome = StatsSidecar
      .roughCheck(StatsSidecar.readStats(spark, s"$dir/li"),
        "l_quantity", 10.0, 30.0)
      .filter(col("state") === "SOME").count()
    assert(nSome > StatsSidecar.IsinMaxPacks,
      s"fixture too small to force the join path: $nSome SOME packs")
    val exact = li.filter(col("l_quantity").between(10.0, 30.0)).count()
    assert(StatsSidecar.countBetween(spark, s"$dir/li", "l_quantity",
      10.0, 30.0) === exact)
  }

  test("SOME-pack scan prunes at the partition level") {
    val plan = spark.read.parquet(scratch)
      .filter(col(StatsSidecar.PackCol).isin(0, 1))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("_pack"),
      s"expected _pack partition pruning in:\n$plan")
  }
}
