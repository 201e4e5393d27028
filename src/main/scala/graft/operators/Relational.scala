package graft.operators

import graft.Engine
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Relational operator inventory (SURVEY.md §2) — scans, filters, joins,
  * aggregation, sort/limit, set ops, subqueries — expressed as declarative
  * DataFrame plans so Catalyst owns pushdown/pruning/join selection (the
  * reference hand-rolls these: descriptor evaluation at
  * storage/tianmu/core/parameterized_filter.cpp:1114, join choice at
  * storage/tianmu/optimizer/joiner.cpp:42).
  *
  * Oracle-parity convention: row-level arithmetic stays in doubles (IEEE
  * ops are bit-identical across engines); at every aggregation boundary the
  * value is cast to DECIMAL(18,4) so the sum is exact and order-independent
  * (a raw double sum depends on partial-aggregation order and would flake a
  * hash-compare against DuckDB); the final aggregate is cast back to
  * double. Every oracle below applies the identical expression.
  */
object Relational {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Engine.table(s, dir, n)

  /** Fixed-point (scale 4) image of a double expression, as an exact
    * integer. `floor(v*1e4 + 0.5)` is pure IEEE arithmetic — bit-identical
    * in any engine — unlike a double→DECIMAL cast, whose rounding differs
    * between DuckDB (scaled-double) and the JVM (exact binary expansion).
    *
    * The scaled image is a BIGINT, not a DECIMAL: long-sum hash
    * aggregation is markedly cheaper than decimal-sum (q01's 8 aggregates
    * run in the scan stage), and the sum stays exact far past any
    * realistic scale — |v|·1e4 ≤ ~1e9 for every monetary column, so
    * overflow needs > 9e9 rows PER GROUP (TPC-H SF1500's lineitem).
    * DuckDB's SUM(BIGINT) widens to HUGEINT; both engines convert the
    * identical exact integer to double with IEEE round-half-even, so the
    * final doubles are bit-identical. */
  def dec(c: Column): Column =
    floor(c * lit(10000.0) + lit(0.5)).cast(LongType)
  /** Exact, order-independent sum of a double expression, as double. */
  def dsum(c: Column): Column = sum(dec(c)).cast(DoubleType) / lit(10000.0)
  /** Exact average of a double expression, returned as double. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** Oracle-SQL fragments applying the identical fixed-point convention. */
  def sqlDec(e: String): String =
    s"CAST(FLOOR(($e) * 10000.0 + 0.5) AS BIGINT)"
  def sqlDsum(e: String, alias: String): String =
    s"CAST(SUM(${sqlDec(e)}) AS DOUBLE) / 10000.0 AS $alias"
  def sqlDavg(e: String, alias: String): String =
    s"CAST(SUM(${sqlDec(e)}) AS DOUBLE) / 10000.0 / COUNT($e) AS $alias"

  // ---------------------------------------------------------------------
  // Scan → filter → aggregate (the reference's pack-skipping scan +
  // AggregationAlgorithm path, SURVEY.md §2.2/§2.5)
  // ---------------------------------------------------------------------

  /** TPC-H Q1 shape: full scan, date filter, 4 sums / 3 avgs / count over
    * low-cardinality group keys. Map-side partial agg keeps the shuffle at
    * |groups|×partitions rows — scale-safe. */
  def q01PricingSummary(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    li.filter(col("l_shipdate") <= lit("2000-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  val q01Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
      |  ${sqlDsum("l_quantity", "sum_qty")},
      |  ${sqlDsum("l_extendedprice", "sum_base_price")},
      |  ${sqlDsum("l_extendedprice * (1.0 - l_discount)", "sum_disc_price")},
      |  ${sqlDsum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)", "sum_charge")},
      |  ${sqlDavg("l_quantity", "avg_qty")},
      |  ${sqlDavg("l_extendedprice", "avg_price")},
      |  ${sqlDavg("l_discount", "avg_disc")},
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-09-02'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q6 shape: tight range filters, no join, single global agg. All
    * three predicates push to the Parquet scan (row-group pruning). */
  def q06ForecastRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    li.filter(col("l_shipdate") >= lit("1996-01-01")
        && col("l_shipdate") < lit("1997-01-01")
        && col("l_discount").between(0.03, 0.07)
        && col("l_quantity") < 24)
      .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  val q06Sql: String =
    s"""SELECT
      |  ${sqlDsum("l_extendedprice * l_discount", "revenue")},
      |  COUNT(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.03 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  /** TPC-H Q19 shape: equi join under a 3-branch OR tree (the reference's
    * O_OR_TREE descriptors, optimizer/compile/descriptor.h:116). `part`
    * grows with SF, so no broadcast hint: an explicit hint is honored
    * regardless of autoBroadcastJoinThreshold and AQE will NOT demote an
    * oversized hinted broadcast — Catalyst picks BroadcastHashJoin by
    * size when the side fits, shuffled join when it doesn't. The OR
    * residual stays in codegen either way. */
  def q19OrTreeRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val p = t(s, dir, "part")
    val branches =
      (col("p_brand") === "Brand#13" && col("l_quantity").between(1, 11)
        && col("p_size").between(1, 5)) ||
      (col("p_brand") === "Brand#23" && col("l_quantity").between(10, 20)
        && col("p_size").between(1, 10)) ||
      (col("p_brand") === "Brand#5" && col("l_quantity").between(20, 30)
        && col("p_size").between(1, 15))
    li.join(p, col("l_partkey") === col("p_partkey"))
      .filter(branches)
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"),
        count(lit(1)).as("n_items"))
  }

  val q19Sql: String =
    s"""SELECT
      |  ${sqlDsum("l_extendedprice * (1.0 - l_discount)", "revenue")},
      |  COUNT(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#13' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
      |   OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
      |   OR (p_brand = 'Brand#5'  AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)""".stripMargin

  /** TPC-H Q3 shape: 3-way join, group-by, top-k. The limit compiles to
    * TakeOrderedAndProject (no global sort materialization) — the analog of
    * the reference's SorterLimit top-N heap (util/sorter3.h:211). */
  def q03ShippingPriority(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = t(s, dir, "orders").filter(col("o_orderdate") < lit("1998-07-21"))
    val li = t(s, dir, "lineitem").filter(col("l_shipdate") > lit("1998-07-21"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q03Sql: String =
    s"""SELECT l_orderkey, o_orderdate,
      |  ${sqlDsum("l_extendedprice * (1.0 - l_discount)", "revenue")}
      |FROM customer
      |JOIN orders ON o_custkey = c_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-07-21'
      |  AND l_shipdate > TIMESTAMP '1998-07-21'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** TPC-H Q5 shape: 6-way star join. Only the bounded dimensions
    * (region: 5 rows, nation: 25 rows — fixed at every SF) carry a
    * broadcast hint; customer/supplier grow with SF so Catalyst/AQE
    * choose their join strategy by measured size (broadcast at small SF,
    * shuffled at 100 TB where customer is ~15e9 rows). The
    * orders⋈lineitem shuffle is the one unavoidable exchange, key-
    * partitioned on orderkey. */
  def q05LocalSupplierVolume(s: SparkSession, dir: String): DataFrame = {
    val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
    val n = t(s, dir, "nation")
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01")
        && col("o_orderdate") < lit("1998-01-01"))
    val li = t(s, dir, "lineitem")
    val sup = t(s, dir, "supplier")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(c, col("o_custkey") === col("c_custkey")
        && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
  }

  val q05Sql: String =
    s"""SELECT n_name,
      |  ${sqlDsum("l_extendedprice * (1.0 - l_discount)", "revenue")}
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY n_name""".stripMargin

  // Registry for this module ---------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (q01PricingSummary _),
    "q03_shipping_priority_topk" -> (q03ShippingPriority _),
    "q05_local_supplier_volume" -> (q05LocalSupplierVolume _),
    "q06_forecast_revenue" -> (q06ForecastRevenue _),
    "q19_ortree_revenue" -> (q19OrTreeRevenue _))

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" -> q01Sql,
    "q03_shipping_priority_topk" -> q03Sql,
    "q05_local_supplier_volume" -> q05Sql,
    "q06_forecast_revenue" -> q06Sql,
    "q19_ortree_revenue" -> q19Sql)
}
