package graft

import graft.functions.{GroupConcat, MySql}
import graft.operators.Relational
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the type-edge and MySQL-semantics risks in
  * SURVEY.md §7's register (decimal fixed-point convention, DIV/MOD sign
  * rules, time roundtrips, GROUP_CONCAT contract) — the ScalaCheck
  * replacement for the reference's issueNNNN regression long tail. */
class PropertySpec extends AnyFunSuite {
  private def spark = TestSession.spark

  /** Minimal deterministic forAll over ScalaCheck gens (the
    * scalatest-scalacheck bridge isn't in the offline cache). */
  private def forAll[A](g: Gen[A], n: Int = 25)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)).foreach(f)
    }
  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(t => f(t._1, t._2))
  private def whenever(c: Boolean)(f: => Unit): Unit = if (c) f

  /** Evaluate scalar column expressions over one generated row. */
  private def eval1(schema: StructType, row: Row,
                    exprs: Seq[org.apache.spark.sql.Column]): Row = {
    val df = spark.createDataFrame(
      java.util.Collections.singletonList(row), schema)
    df.select(exprs: _*).head()
  }

  private val longs = Gen.chooseNum(-1000000L, 1000000L)
  private val nonZero = longs.suchThat(_ != 0L)

  test("DIV truncates toward zero; MOD takes the dividend's sign (MySQL)") {
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("b", LongType)))
    forAll(longs, nonZero) { (a, b) =>
      val r = eval1(schema, Row(a, b),
        Seq(MySql.div(col("a"), col("b")).as("d"),
          MySql.mod(col("a"), col("b")).as("m")))
      assert(r.getLong(0) === a / b)         // JVM / truncates toward zero
      assert(r.getLong(1) === a % b)         // JVM % follows dividend sign
      // invariant: a = b * DIV + MOD
      assert(a === b * r.getLong(0) + r.getLong(1))
    }
  }

  test("TRUNCATE is toward zero at any scale") {
    val schema = StructType(Seq(StructField("x", DoubleType)))
    val doubles = Gen.chooseNum(-99999.0, 99999.0)
    forAll(doubles, Gen.chooseNum(0, 4)) { (x, d) =>
      val got = eval1(schema, Row(x),
        Seq(MySql.truncate(col("x"), d).as("t"))).getDouble(0)
      assert(math.abs(got) <= math.abs(x) + 1e-9)       // never away from zero
      assert(math.signum(got) * math.signum(x) >= 0.0)  // sign preserved or 0
      val p = math.pow(10, d)
      assert(math.abs(got * p - math.rint(got * p)) < 1e-6) // d decimals
    }
  }

  test("SEC_TO_TIME / TIME_TO_SEC roundtrip on [0, 86400)") {
    val schema = StructType(Seq(StructField("s", LongType)))
    forAll(Gen.chooseNum(0L, 86399L)) { s =>
      val r = eval1(schema, Row(s),
        Seq(MySql.timeToSec(MySql.secToTime(col("s"))).as("rt")))
      assert(r.getLong(0) === s)
    }
  }

  test("PERIOD_ADD / PERIOD_DIFF are inverse") {
    val periods = for {
      y <- Gen.chooseNum(1990, 2030); m <- Gen.chooseNum(1, 12)
    } yield y * 100L + m
    val schema = StructType(Seq(
      StructField("p", LongType), StructField("n", LongType)))
    forAll(periods, Gen.chooseNum(-60L, 60L)) { (p, n) =>
      val r = eval1(schema, Row(p, n),
        Seq(MySql.periodDiff(MySql.periodAdd(col("p"), col("n")), col("p"))
          .as("d")))
      assert(r.getLong(0) === n)
    }
  }

  test("fixed-point dsum is permutation-invariant (the oracle convention)") {
    val amounts = Gen.listOfN(24, Gen.chooseNum(-10000.0, 10000.0))
    forAll(amounts, 8) { xs =>
      whenever(xs.nonEmpty) {
        val sp = spark
        import sp.implicits._
        def total(ys: Seq[Double]): Long =
          ys.toDF("v").agg(sum(Relational.dec(col("v"))))
            .head().getLong(0)
        assert(total(xs) === total(scala.util.Random.shuffle(xs)))
      }
    }
  }

  test("MinHashShingleSig ≡ array_distinct(shingleHash64) + per-perm minima") {
    val texts = Gen.listOfN(8,
      Gen.choose(0, 40).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf(('a' to 'e') :+ ' ')).map(_.mkString)))
    forAll(texts, 6) { ts =>
      val sp = spark
      import sp.implicits._
      val params = graft.operators.Dedup.hashParams
      val df = ts.toDF("text").select(
        graft.functions.MinHashShingleSig
          .minhashShingleSig(col("text"), 5, params).as("mh"),
        array_distinct(graft.functions.ShingleHash64
          .shingleHash64(col("text"), 5)).as("ref_hs"))
      df.collect().foreach { r =>
        val hs = r.getStruct(0).getSeq[Long](0)
        val sig = r.getStruct(0).getSeq[Long](1)
        val ref = r.getSeq[Long](1)
        assert(hs.toSet === ref.toSet, "distinct shingle sets differ")
        params.zipWithIndex.foreach { case ((a, b), i) =>
          val expect = ref.map(h => h * a + b).min
          assert(sig(i) === expect, s"perm $i minimum differs")
        }
      }
    }
  }

  test("JaccardLong equals driver-side set Jaccard on random long sets") {
    val sets = Gen.zip(
      Gen.listOf(Gen.chooseNum(-50L, 50L)).map(_.distinct),
      Gen.listOf(Gen.chooseNum(-50L, 50L)).map(_.distinct))
    forAll(sets, 20) { case (a, b) =>
      val sp = spark
      import sp.implicits._
      val got = Seq((a, b)).toDF("a", "b")
        .select(graft.functions.LshOps.jaccardLong(col("a"), col("b")))
        .head().getDouble(0)
      val (sa, sb) = (a.toSet, b.toSet)
      val expect =
        if (sa.isEmpty && sb.isEmpty) 1.0
        else sa.intersect(sb).size.toDouble / sa.union(sb).size
      assert(got === expect, s"a=$a b=$b")
    }
  }

  test("GROUP_CONCAT ORDER BY: values emitted in key order, both directions") {
    val sp = spark
    import sp.implicits._
    val df = Seq(("3", "c"), ("1", "a"), ("2", "b")).toDF("k", "v")
    val asc = df.agg(GroupConcat.groupConcatOrderBy(col("v"), col("k"),
      sep = "-")).head().getString(0)
    assert(asc === "a-b-c")
    val desc = df.agg(GroupConcat.groupConcatOrderBy(col("v"), col("k"),
      sep = "-", desc = true)).head().getString(0)
    assert(desc === "c-b-a")
  }

  test("GROUP_CONCAT: distinct dedups, separator joins, max_len truncates") {
    val words = Gen.listOfN(12,
      Gen.oneOf("ab", "cd", "ef", "gh", "ij", "kl"))
    forAll(words, 8) { ws =>
      whenever(ws.nonEmpty) {
        val sp = spark
        import sp.implicits._
        val df = ws.toDF("w")
        val plain = df.agg(GroupConcat.groupConcat(col("w"), sep = "|"))
          .head().getString(0)
        assert(plain.split('|').sorted.toSeq === ws.sorted)
        val dist = df.agg(
          GroupConcat.groupConcat(col("w"), sep = "|", distinct = true))
          .head().getString(0)
        assert(dist.split('|').toSeq === ws.distinct.sorted)
        val cut = df.agg(
          GroupConcat.groupConcat(col("w"), sep = "|", maxLen = 5))
          .head().getString(0)
        assert(cut.length <= 5)
        assert(plain.startsWith(cut))
      }
    }
  }

  test("waterfill allocation invariants on random capacity/weight mixes") {
    val s = spark
    import s.implicits._
    val gen = Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(1L, 5000L), Gen.choose(100000L, 2000000L)))
    forAll(gen, n = 15) { rows =>
      whenever(rows.nonEmpty) {
        val per = rows.zipWithIndex
          .map { case ((c, w), i) => (f"s$i%03d", c, w) }
          .toDF("source", "capacity", "w6")
        val out = operators.Corpus.waterfillAlloc(per).collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
            r.getLong(3)))
        val budget = rows.map(_._1).sum / 2
        val total = out.map(_._4).sum
        // never over budget or capacity; fills the budget up to one
        // floor-unit per unsaturated source
        out.foreach { case (src, cap, _, alloc) =>
          assert(alloc >= 0 && alloc <= cap, s"$src: alloc=$alloc cap=$cap")
        }
        val unsat = out.filter { case (_, cap, _, alloc) => alloc < cap }
        assert(total <= budget)
        assert(total >= budget - unsat.length - 1,
          s"left ${budget - total} unallocated with ${unsat.length} " +
            "unsaturated sources")
        // proportionality: unsaturated allocations are floor(w * T) for
        // one common T — cross-check every unsaturated pair
        for (pair <- unsat.sortBy(_._1).toSeq.sliding(2)
            if unsat.length >= 2 && pair.length == 2) {
          val Seq((sa, _, wa, aa), (sb, _, wb, ab)) = pair
          // floor(wa*T)/wa ≈ floor(wb*T)/wb within flooring slack
          assert(math.abs(aa.toDouble / wa - ab.toDouble / wb)
            <= 1.0 / wa + 1.0 / wb,
            s"$sa/$sb not proportional: $aa/$wa vs $ab/$wb")
        }
      }
    }
  }
}
