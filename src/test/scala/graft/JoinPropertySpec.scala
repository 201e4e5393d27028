package graft

import graft.operators.AsofJoin
import org.scalatest.funsuite.AnyFunSuite

/** Randomized cross-checks for the two new join operators: asofJoin vs a
  * driver-side brute force, and the banded range-join optimizer rule vs
  * the naive (rule-off) plan — seeds fixed for determinism. */
class JoinPropertySpec extends AnyFunSuite {
  private def spark = TestSession.spark

  test("asofJoin matches driver-side brute force on random data") {
    val s = spark
    import s.implicits._
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed)
      val left = (1 to 60).map(i =>
        (rnd.nextInt(5).toLong, rnd.nextInt(100).toLong, i.toLong))
      // asofJoin requires unique (key, ts) on the right — dedupe the gen
      val right = (1 to 40).map(i =>
        (rnd.nextInt(5).toLong, rnd.nextInt(100).toLong, i.toLong * 10))
        .groupBy(t => (t._1, t._2)).map(_._2.head).toSeq
      val got = AsofJoin.asofJoin(
        left.toDF("k", "t", "lid"), right.toDF("k", "t", "rv"),
        "k", "t", Seq("rv"))
        .collect()
        .map(r => r.getLong(2) ->
          (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
      val gotFwd = AsofJoin.asofJoin(
        left.toDF("k", "t", "lid"), right.toDF("k", "t", "rv"),
        "k", "t", Seq("rv"), forward = true)
        .collect()
        .map(r => r.getLong(2) ->
          (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
      val byKey = right.groupBy(_._1)
      left.foreach { case (k, t, lid) =>
        val cand = byKey.getOrElse(k, Nil).filter(_._2 <= t)
        val expect =
          if (cand.isEmpty) None else Some(cand.maxBy(_._2)._3)
        assert(got(lid) === expect, s"seed=$seed lid=$lid key=$k ts=$t")
        val candF = byKey.getOrElse(k, Nil).filter(_._2 >= t)
        val expectF =
          if (candF.isEmpty) None else Some(candF.minBy(_._2)._3)
        assert(gotFwd(lid) === expectF,
          s"forward seed=$seed lid=$lid key=$k ts=$t")
      }
    }
  }

  test("asofJoin fails fast on reserved-name and output-prefix collisions") {
    val s = spark
    import s.implicits._
    val okL = Seq((1L, 10L, "x")).toDF("k", "t", "lv")
    val okR = Seq((1L, 5L, "y")).toDF("k", "t", "rv")
    // internal scratch name in an input
    val e1 = intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(okL.withColumnRenamed("lv", "__side"), okR,
        "k", "t", Seq("rv"))
    }
    assert(e1.getMessage.contains("__side"))
    val e2 = intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(okL, okR.withColumnRenamed("rv", "__payload"),
        "k", "t", Seq("__payload"))
    }
    assert(e2.getMessage.contains("__payload"))
    // r_<payload> output name already present on the left
    val e3 = intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(okL.withColumnRenamed("lv", "r_rv"), okR,
        "k", "t", Seq("rv"))
    }
    assert(e3.getMessage.contains("r_rv"))
  }

  test("asofJoin stays correct under heavy key skew (one key = 50% of rows)") {
    // one hot key holds half of both sides — the single-shuffle window
    // plan puts that whole key in one task; this pins correctness (and
    // documents the behavior: skew degrades latency, never results)
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val hot = 0L
    val left = (1 to 4000).map { i =>
      val k = if (i % 2 == 0) hot else 1L + rnd.nextInt(50).toLong
      (k, rnd.nextInt(10000).toLong, i.toLong)
    }
    val right = (1 to 3000).map { i =>
      val k = if (i % 2 == 0) hot else 1L + rnd.nextInt(50).toLong
      (k, rnd.nextInt(10000).toLong, i.toLong * 10)
    }.groupBy(t => (t._1, t._2)).map(_._2.head).toSeq
    val got = AsofJoin.asofJoin(
      left.toDF("k", "t", "lid"), right.toDF("k", "t", "rv"),
      "k", "t", Seq("rv"))
      .collect()
      .map(r => r.getLong(2) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    val byKey = right.groupBy(_._1)
    left.foreach { case (k, t, lid) =>
      val cand = byKey.getOrElse(k, Nil).filter(_._2 <= t)
      val expect = if (cand.isEmpty) None else Some(cand.maxBy(_._2)._3)
      assert(got(lid) === expect, s"hot-key fixture lid=$lid key=$k ts=$t")
    }
    assert(left.count(_._1 == hot) * 2 >= left.size) // fixture really is skewed
  }

  test("asofJoinSalted equals plain asofJoin on random data, both directions") {
    val s = spark
    import s.implicits._
    for (seed <- 1 to 4; width <- Seq(3L, 16L, 1000L)) {
      val rnd = new scala.util.Random(seed)
      // one hot key (~50%), timestamps spanning many buckets at width 3/16
      // and ONE bucket at width 1000 (carry never fires / always fires)
      val left = (1 to 80).map { i =>
        val k = if (i % 2 == 0) 0L else 1L + rnd.nextInt(4).toLong
        (k, rnd.nextInt(100).toLong - 20L, i.toLong) // negative ts included
      }
      val right = (1 to 50).map { i =>
        val k = if (i % 2 == 0) 0L else 1L + rnd.nextInt(4).toLong
        (k, rnd.nextInt(100).toLong - 20L, i.toLong * 10)
      }.groupBy(t => (t._1, t._2)).map(_._2.head).toSeq
      val lDf = left.toDF("k", "t", "lid")
      val rDf = right.toDF("k", "t", "rv")
      for (fwd <- Seq(false, true)) {
        def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
          .map(r => r.getLong(2) ->
            (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
        val plain = toMap(AsofJoin.asofJoin(
          lDf, rDf, "k", "t", Seq("rv"), forward = fwd))
        val salted = toMap(AsofJoin.asofJoinSalted(
          lDf, rDf, "k", "t", Seq("rv"), bucketWidth = width, forward = fwd))
        assert(salted === plain, s"seed=$seed width=$width forward=$fwd")
      }
    }
  }

  test("asofJoinSalted NULL semantics match the plain operator") {
    val s = spark
    import s.implicits._
    val left = Seq((Option(1L), Option(10L), "a"), (Option(1L), None, "e"),
      (Option.empty[Long], Option(7L), "f")).toDF("k", "t", "lv")
    val right = Seq((Option(1L), Option(10L), "r10"),
      (Option(1L), None, "rNullTs"), (Option.empty[Long], Option(1L), "rNullKey"))
      .toDF("k", "t", "rv")
    val out = AsofJoin.asofJoinSalted(left, right, "k", "t", Seq("rv"),
        bucketWidth = 4L)
      .collect().map(r => r.getString(2) -> r.getString(3)).toMap
    assert(out("a") === "r10") // inclusive at equal ts
    assert(out("e") === null)  // NULL left ts matches nothing
    assert(out("f") === null)  // NULL left key matches nothing
  }

  test("banded range-join rule equals the naive plan on random " +
      "intervals and widths") {
    val s = spark
    import s.implicits._
    val conf = "spark.graft.rangeJoin.bandWidth"
    for (seed <- 1 to 3; w <- Seq(1L, 7L, 64L)) {
      val rnd = new scala.util.Random(seed)
      val probes = (1 to 60).map(i =>
        (i.toLong, (rnd.nextInt(201) - 100).toLong)).toDF("id", "v")
      // a/b unordered on purpose: inverted intervals must yield nothing
      val ranges = (1 to 25).map(i =>
        (i.toLong, (rnd.nextInt(201) - 100).toLong,
          (rnd.nextInt(201) - 100).toLong)).toDF("rid", "a", "b")
      def q() = probes.join(ranges,
        $"v" >= $"a" && $"v" <= $"b").select("id", "rid")
      spark.conf.unset(conf)
      val naive = q().collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
      spark.conf.set(conf, w.toString)
      try {
        val banded = q().collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
        assert(banded === naive, s"seed=$seed width=$w")
      } finally spark.conf.unset(conf)
    }
  }
}
