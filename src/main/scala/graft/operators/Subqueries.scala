package graft.operators

import graft.Engine
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Relational.{dec, dsum, davg, sqlDec, sqlDsum, sqlDavg}

/** Subquery inventory (SURVEY.md §2.10): scalar / IN / correlated /
  * quantified (ALL-ANY) subqueries — the reference's SubSelectColumn
  * machinery (vc/subselect_column.h:40) and O_EQ_ALL/ANY operator family
  * (common_definitions.h:185-202). DataFrame-side each becomes a join
  * (the decorrelated plan Catalyst would produce from the SQL), which is
  * the scale-correct shape: a correlated re-evaluation per outer row —
  * how the reference executes ROW_BASED subqueries — would be a
  * driver-side loop here.
  *
  * Window functions at the end are surplus vs. the reference (MySQL 5.7
  * has none, SURVEY.md §2.6).
  */
object Subqueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Engine.table(s, dir, n)

  /** Scalar subquery: orders above the global average price. The
    * threshold uses the exact fixed-point average so both engines compute
    * the identical double. */
  def qSubqScalar(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val thr = o.agg(davg(col("o_totalprice")).as("thr"))
    o.join(broadcast(thr), col("o_totalprice") > col("thr"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        dsum(col("o_totalprice")).as("sum_price"))
  }

  val qSubqScalarSql: String =
    s"""SELECT o_orderstatus, COUNT(*) AS n,
      |  ${sqlDsum("o_totalprice", "sum_price")}
      |FROM orders
      |WHERE o_totalprice > (SELECT ${sqlDavg("o_totalprice", "thr")} FROM orders)
      |GROUP BY o_orderstatus""".stripMargin

  /** IN subquery → left-semi join (in_subquery.test analog). */
  def qSubqIn(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part")
    val heavy = t(s, dir, "lineitem").filter(col("l_quantity") >= 49)
      .select(col("l_partkey"))
    p.join(heavy, col("p_partkey") === col("l_partkey"), "leftsemi")
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_parts"))
  }

  val qSubqInSql: String =
    """SELECT p_brand, COUNT(*) AS n_parts
      |FROM part
      |WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
      |GROUP BY p_brand""".stripMargin

  /** Correlated scalar subquery (TPC-H Q17 shape): per-part average
    * quantity, decorrelated into a grouped join — each lineitem compares
    * against 0.5× its part's average. */
  def qSubqCorrelated(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val p = t(s, dir, "part").filter(col("p_brand") === "Brand#13")
    val halfAvg = li.groupBy(col("l_partkey").as("hp_partkey"))
      .agg((davg(col("l_quantity")) * 0.5).as("half_avg"))
    li.join(p, col("l_partkey") === col("p_partkey"))
      .join(halfAvg, col("l_partkey") === col("hp_partkey"))
      .filter(col("l_quantity") < col("half_avg"))
      .agg((dsum(col("l_extendedprice")) / 7.0).as("avg_yearly"),
        count(lit(1)).as("n_items"))
  }

  /** Quantified comparison: s_acctbal >= ALL(subquery) — rewritten to the
    * max (SURVEY.md §7 risk register; O_MORE_EQ_ALL,
    * common_definitions.h:195). */
  def qSubqAnyAll(s: SparkSession, dir: String): DataFrame = {
    val sup = t(s, dir, "supplier")
    val thr = t(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING" && col("c_acctbal") < 5000)
      .agg(max(col("c_acctbal")).as("max_bal"))
    sup.join(broadcast(thr), col("s_acctbal") >= col("max_bal"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
  }

  val qSubqAnyAllSql: String =
    """SELECT s_suppkey, s_name, s_acctbal
      |FROM supplier
      |WHERE s_acctbal >= ALL (SELECT c_acctbal FROM customer
      |                        WHERE c_mktsegment = 'BUILDING' AND c_acctbal < 5000)""".stripMargin

  // --- window functions (surplus tier, SURVEY.md §2.6) -------------------

  /** Top-2 orders per customer by row_number. */
  def qWindowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("rn"))
  }

  val qWindowRankSql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn
      |FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders
      |) WHERE rn <= 2""".stripMargin

  /** Running per-customer spend (exact fixed-point window sum). */
  def qWindowRunningSum(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "orders")
      .filter(col("o_custkey") < 100)
      .select(col("o_custkey"), col("o_orderkey"),
        (sum(dec(col("o_totalprice"))).over(w).cast("double") / 10000.0)
          .as("running_spend"))
  }

  val qWindowRunningSumSql: String =
    s"""SELECT o_custkey, o_orderkey,
      |  CAST(SUM(${sqlDec("o_totalprice")}) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      |  ) AS DOUBLE) / 10000.0 AS running_spend
      |FROM orders
      |WHERE o_custkey < 100""".stripMargin

  /** NTILE quartiles per nation (window tier completion): customers
    * bucketed into 4 account-balance quartiles within their nation —
    * both engines implement the SQL-standard larger-first remainder
    * distribution, so the gate is hash-exact. */
  def qWindowNtile(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    t(s, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"),
        ntile(4).over(w).cast("long").as("bal_quartile"))
  }

  val qWindowNtileSql: String =
    """SELECT c_custkey, c_nationkey,
      |  CAST(NTILE(4) OVER (PARTITION BY c_nationkey
      |                      ORDER BY c_acctbal DESC, c_custkey) AS BIGINT)
      |    AS bal_quartile
      |FROM customer""".stripMargin

  /** Explicit GROUPING SETS + GROUPING() id (beyond the rollup/cube
    * gates): two independent groupings in one pass, with the grouping
    * id disambiguating which set each row came from. */
  def qAggGroupingSets(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("gs_orders")
    s.sql(
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
        |  CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
        |  COUNT(*) AS n
        |FROM gs_orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin)
  }

  val qAggGroupingSetsSql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
      |  CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
      |  COUNT(*) AS n
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
      |ORDER BY o_orderstatus, o_orderpriority""".stripMargin

  /** Derived table (subquery in FROM — derived_table.test): aggregate in
    * the inner block, filter + join the derived alias outside. Catalyst
    * inlines it; the gate pins the semantics. */
  def qSubqDerived(s: SparkSession, dir: String): DataFrame = {
    val perSeg = t(s, dir, "customer")
      .groupBy(col("c_mktsegment").as("seg"))
      .agg(count(lit(1)).as("n_cust"),
        dsum(col("c_acctbal")).as("seg_bal"))
    perSeg.filter(col("n_cust") > 10)
      .select(col("seg"), col("n_cust"),
        (col("seg_bal") / col("n_cust")).as("avg_bal"))
  }

  val qSubqDerivedSql: String =
    s"""SELECT seg, n_cust, seg_bal / n_cust AS avg_bal
      |FROM (SELECT c_mktsegment AS seg, COUNT(*) AS n_cust,
      |        ${sqlDsum("c_acctbal", "seg_bal")}
      |      FROM customer GROUP BY c_mktsegment) t
      |WHERE n_cust > 10""".stripMargin

  /** Offset/value/distribution window family: LAG, LEAD, FIRST_VALUE,
    * NTILE, PERCENT_RANK over per-customer order history (surplus tier —
    * the reference's MySQL 5.7 dialect has no window functions,
    * SURVEY.md §2.6). */
  def qWindowLeadLag(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val pr = percent_rank().over(w)
    t(s, dir, "orders")
      .filter(col("o_custkey") < 100)
      .select(col("o_custkey"), col("o_orderkey"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        first_value(col("o_orderdate")).over(w).as("first_date"),
        ntile(4).over(w).as("quartile"),
        (floor(pr * lit(1000000.0) + lit(0.5)) / lit(1000000.0))
          .as("pct_rank"))
  }

  val qWindowLeadLagSql: String =
    """SELECT o_custkey, o_orderkey,
      |  LAG(o_totalprice, 1) OVER w AS prev_price,
      |  LEAD(o_totalprice, 1) OVER w AS next_price,
      |  FIRST_VALUE(o_orderdate) OVER w AS first_date,
      |  CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
      |  FLOOR((PERCENT_RANK() OVER w) * 1000000.0 + 0.5) / 1000000.0
      |    AS pct_rank
      |FROM orders
      |WHERE o_custkey < 100
      |WINDOW w AS (PARTITION BY o_custkey
      |             ORDER BY o_orderdate, o_orderkey)""".stripMargin

  /** Explicit frame-clause family (window frames tier): a sliding 3-row
    * ROWS frame (moving sum), a numeric RANGE frame (orderkey-proximity
    * sum), LAST_VALUE over the to-partition-end frame, NTH_VALUE over the
    * whole-partition frame, and CUME_DIST — the frame grammar beyond the
    * running-sum/offset gates. Frame sums ride the ×10000 fixed-point
    * convention so segment-tree vs streaming accumulation order cannot
    * produce float drift between engines. Scale shape: one shuffle on
    * o_custkey serves every window (same partition key; the RANGE frame
    * re-sorts within the partition, no extra exchange). */
  def qWindowFrames(s: SparkSession, dir: String): DataFrame = {
    val ord = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val sliding = ord.rowsBetween(-2, Window.currentRow)
    val tail = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val whole =
      ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val near = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderkey")).rangeBetween(-100, 0)
    val cd = cume_dist().over(ord)
    t(s, dir, "orders")
      .filter(col("o_custkey") < 100)
      .select(col("o_custkey"), col("o_orderkey"),
        (sum(dec(col("o_totalprice"))).over(sliding).cast("double")
          / 10000.0).as("mov_sum3"),
        (sum(dec(col("o_totalprice"))).over(near).cast("double")
          / 10000.0).as("range_sum"),
        last(col("o_totalprice")).over(tail).as("last_price"),
        nth_value(col("o_totalprice"), 2).over(whole).as("second_price"),
        (floor(cd * lit(1000000.0) + lit(0.5)) / lit(1000000.0))
          .as("cdist"))
  }

  val qWindowFramesSql: String =
    s"""SELECT o_custkey, o_orderkey,
      |  CAST(SUM(${sqlDec("o_totalprice")}) OVER (
      |    wo ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
      |  ) AS DOUBLE) / 10000.0 AS mov_sum3,
      |  CAST(SUM(${sqlDec("o_totalprice")}) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderkey
      |    RANGE BETWEEN 100 PRECEDING AND CURRENT ROW
      |  ) AS DOUBLE) / 10000.0 AS range_sum,
      |  LAST_VALUE(o_totalprice) OVER (
      |    wo ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
      |  ) AS last_price,
      |  NTH_VALUE(o_totalprice, 2) OVER (
      |    wo ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
      |  ) AS second_price,
      |  FLOOR((CUME_DIST() OVER wo) * 1000000.0 + 0.5) / 1000000.0 AS cdist
      |FROM orders
      |WHERE o_custkey < 100
      |WINDOW wo AS (PARTITION BY o_custkey
      |              ORDER BY o_orderdate, o_orderkey)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_subq_scalar" -> (qSubqScalar _),
    "q_subq_in" -> (qSubqIn _),
    "q_subq_correlated" -> (qSubqCorrelated _),
    "q_subq_any_all" -> (qSubqAnyAll _),
    "q_subq_derived" -> (qSubqDerived _),
    "q_window_rank" -> (qWindowRank _),
    "q_window_running_sum" -> (qWindowRunningSum _),
    "q_window_lead_lag" -> (qWindowLeadLag _),
    "q_window_ntile" -> (qWindowNtile _),
    "q_window_frames" -> (qWindowFrames _),
    "q_agg_grouping_sets" -> (qAggGroupingSets _))

  val oracles: Map[String, String] = Map(
    "q_subq_scalar" -> qSubqScalarSql,
    "q_subq_in" -> qSubqInSql,
    "q_subq_correlated" -> qSubqCorrelatedSqlReal,
    "q_subq_any_all" -> qSubqAnyAllSql,
    "q_window_rank" -> qWindowRankSql,
    "q_window_running_sum" -> qWindowRunningSumSql,
    "q_window_lead_lag" -> qWindowLeadLagSql,
    "q_window_ntile" -> qWindowNtileSql,
    "q_window_frames" -> qWindowFramesSql,
    "q_agg_grouping_sets" -> qAggGroupingSetsSql,
    "q_subq_derived" -> qSubqDerivedSql)

  /** Correlated oracle with the exact per-part fixed-point half-average. */
  lazy val qSubqCorrelatedSqlReal: String =
    s"""SELECT ${sqlDsum("l_extendedprice", "x").replace(" AS x", "")} / 7.0 AS avg_yearly,
      |  COUNT(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_brand = 'Brand#13'
      |  AND l_quantity < (
      |    SELECT ${sqlDavg("l2.l_quantity", "h").replace(" AS h", "")} * 0.5
      |    FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)""".stripMargin
}
