package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every SparkEntry.queries entry must plan + execute at sf0.001, and the
  * ones that are structurally nonempty at the smallest scale must return
  * rows. (Value-level correctness is the DuckDB oracle's job —
  * tools/check_oracle.py / the driver's t2 gate.) */
class InventorySpec extends AnyFunSuite {
  private def spark = TestSession.spark
  private val sf = TestSession.sf

  // Queries whose predicates may legitimately select nothing at sf0.001.
  private val mayBeEmpty = Set("q_filter_between_in_like", "q_join_full_outer")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executes at sf0.001") {
      val n = fn(spark, sf).count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("every oracle key has a matching query") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracles without queries: $unknown")
  }

  test("group_concat output is sorted and comma-separated") {
    val row = operators.Aggregates.qAggGroupConcat(spark, sf)
      .filter(org.apache.spark.sql.functions.col("r_name") === "ASIA").first()
    val nations = row.getAs[String]("nations").split(",").toSeq
    assert(nations == nations.sorted)
    assert(nations.size == row.getAs[Long]("n_nations"))
  }

  test("window rank keeps at most 2 rows per customer") {
    val df = operators.Subqueries.qWindowRank(spark, sf)
    val over = df.groupBy("o_custkey").count().filter("count > 2").count()
    assert(over === 0)
  }

  test("rollup contains grand-total row") {
    val df = operators.Aggregates.qAggRollup(spark, sf)
    assert(df.filter("r_name IS NULL AND n_name IS NULL").count() === 1)
  }

  test("one session serves concurrent queries (multi-client parity)") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val names = Seq("q01_pricing_summary", "q06_forecast_revenue",
      "q_agg_having", "q_sort_topk", "q_join_semi_exists", "q_distinct")
    val sequential = names.map(n => n -> SparkEntry.queries(n)(spark, sf).count())
    val concurrent = Await.result(
      Future.sequence(names.map(n =>
        Future(n -> SparkEntry.queries(n)(spark, sf).count()))),
      5.minutes)
    assert(concurrent.toMap === sequential.toMap)
  }

  test("approximate aggregates track exact within sketch error bounds") {
    // the bound checks now live IN the query (hll_ok/median_ok booleans,
    // pinned TRUE by the DuckDB oracle); the spec asserts them locally too
    operators.Aggregates.qAggApprox(spark, sf).collect().foreach { r =>
      assert(r.getAs[Boolean]("hll_ok"), s"HLL out of bounds: $r")
      assert(r.getAs[Boolean]("median_ok"), s"median out of bounds: $r")
    }
  }
}
