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
