package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** The banded range-join optimizer rule (plans.BandedRangeJoinRule,
  * injected via spark.sql.extensions): an interval join with no equi
  * conjunct must stop planning as BroadcastNestedLoopJoin once the rule
  * is enabled, with results identical to the naive plan. */
class PlanRuleSpec extends AnyFunSuite {
  private def spark = TestSession.spark
  private val Width = "spark.graft.rangeJoin.bandWidth"

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))

  private def executedPlanString(df: DataFrame): String = {
    df.collect() // force AQE to finalize the physical plan
    df.queryExecution.executedPlan.toString
  }

  test("interval join: BNLJ with rule off, equi join + same rows with " +
      "rule on (incl. negatives)") {
    val s = spark
    import s.implicits._
    val probes = Seq((1L, 5L), (2L, 23L), (3L, -17L), (4L, 100L))
      .toDF("id", "v")
    val ranges = Seq((10L, 0L, 9L), (20L, -20L, -10L), (30L, 5L, 50L))
      .toDF("rid", "lo", "hi")
    def q(): DataFrame =
      probes.join(ranges, $"v" >= $"lo" && $"v" <= $"hi")
        .select("id", "rid")
    spark.conf.unset(Width)
    val naive = q()
    assert(executedPlanString(naive).contains("BroadcastNestedLoopJoin"))
    val expected = rows(naive)
    assert(expected === Seq(Seq(1L, 10L), Seq(1L, 30L), Seq(2L, 30L),
      Seq(3L, 20L)).sortBy(_.mkString("|")))
    spark.conf.set(Width, "8")
    try {
      val banded = q()
      val plan = executedPlanString(banded)
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        "rule must eliminate the nested-loop join")
      assert(plan.contains("__graft_band"), "band key must be the join key")
      assert(rows(banded) === expected)
    } finally spark.conf.unset(Width)
  }

  test("strict bounds band correctly; empty/NULL intervals yield no rows " +
      "and no error") {
    val s = spark
    import s.implicits._
    val probes = Seq((1L, 7L), (2L, 9L)).toDF("id", "v")
    val ranges = Seq(
      (10L, Some(0L), Some(9L)),   // 7 matches strictly, 9 does not
      (20L, Some(50L), Some(40L)), // inverted interval: no matches
      (30L, None, Some(99L)))      // NULL lo: three-valued false
      .toDF("rid", "lo", "hi")
    def q(): DataFrame =
      probes.join(ranges, $"v" > $"lo" && $"v" < $"hi").select("id", "rid")
    spark.conf.unset(Width)
    val expected = rows(q())
    assert(expected === Seq(Seq(1L, 10L)))
    spark.conf.set(Width, "4")
    try {
      val banded = q()
      assert(!executedPlanString(banded).contains("BroadcastNestedLoopJoin"))
      assert(rows(banded) === expected)
    } finally spark.conf.unset(Width)
  }

  test("a mixed-reference upper bound never lands under the Generate") {
    // v <= hi + x references BOTH sides — the rewrite must band on the
    // clean (lo, hi) pair and keep the mixed conjunct as residual only
    val s = spark
    import s.implicits._
    val probes = Seq((1L, 5L, 0L), (2L, 8L, -10L)).toDF("id", "v", "x")
    val ranges = Seq((10L, 0L, 9L)).toDF("rid", "lo", "hi")
    def q(): DataFrame = probes.join(ranges,
      $"v" >= $"lo" && $"v" <= $"hi" && $"v" <= $"hi" + $"x")
      .select("id", "rid")
    spark.conf.unset(Width)
    val expected = rows(q())
    assert(expected === Seq(Seq(1L, 10L))) // id=2 fails 8 <= 9 + (-10)
    spark.conf.set(Width, "4")
    try {
      val banded = q()
      assert(rows(banded) === expected)
      assert(!executedPlanString(banded).contains("BroadcastNestedLoopJoin"))
    } finally spark.conf.unset(Width)
  }

  test("joins that already have an equi key are left alone") {
    val s = spark
    import s.implicits._
    val l = Seq((1L, 5L), (2L, 7L)).toDF("k", "v")
    val r = Seq((1L, 0L, 9L), (2L, 8L, 9L)).toDF("k2", "lo", "hi")
    spark.conf.set(Width, "4")
    try {
      val joined = l.join(r, $"k" === $"k2" && $"v" >= $"lo" && $"v" <= $"hi")
      assert(!joined.queryExecution.optimizedPlan.toString
        .contains("__graft_band"))
      assert(rows(joined.select("k", "k2")) === Seq(Seq(1L, 1L)))
      // null-safe equality is an equi key too — banding on top of a
      // `<=>`-keyed join would only add a useless explode + band shuffle
      val nullSafe = l.join(r,
        $"k" <=> $"k2" && $"v" >= $"lo" && $"v" <= $"hi")
      assert(!nullSafe.queryExecution.optimizedPlan.toString
        .contains("__graft_band"))
      assert(rows(nullSafe.select("k", "k2")) === Seq(Seq(1L, 1L)))
    } finally spark.conf.unset(Width)
  }

  test("edit-distance rule: band + threshold kernel injected, results " +
      "identical with the rule disabled") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val a = Seq((1L, "kitten"), (2L, "ab"), (3L, "house"))
      .toDF("ida", "na")
    val b = Seq((10L, "sitten"), (20L, "abcdefgh"), (30L, "mouse"))
      .toDF("idb", "nb")
    val fuzzy = a.join(b, levenshtein($"na", $"nb") <= 1)
    val opt = fuzzy.queryExecution.optimizedPlan.toString
    // band prefilter and 3-arg (thresholded) kernel both present
    assert(opt.contains("abs((length(na") || opt.contains("abs((length(nb"),
      s"band missing in:\n$opt")
    assert(opt.contains("Some(1)"), s"threshold kernel missing in:\n$opt")
    val got = fuzzy.select("ida", "idb").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got === Seq((1L, 10L), (3L, 30L)))
    // rule off → same rows, no band in the plan
    spark.conf.set("spark.graft.editDistance.band", "false")
    try {
      val off = a.join(b, levenshtein($"na", $"nb") <= 1)
      assert(!off.queryExecution.optimizedPlan.toString.contains("abs((len"))
      val got2 = off.select("ida", "idb").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got2 === got)
    } finally spark.conf.unset("spark.graft.editDistance.band")
    // strict < and NULL inputs preserve semantics
    val withNull = a.union(Seq((4L, null.asInstanceOf[String])).toDF)
    val strict = withNull.join(b, levenshtein($"na", $"nb") < 2)
    val got3 = strict.select("ida", "idb").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got3 === Seq((1L, 10L), (3L, 30L)))
  }
}
