package graft.operators

import graft.Engine
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Relational.{dsum, sqlDsum}

/** Join-operator inventory (SURVEY.md §2.4). The reference picks among
  * hash / map(broadcast) / sort-merge / nested-loop joiners at
  * optimizer/joiner.cpp:42-93; here Catalyst + AQE make that choice from
  * the same signals (equi keys, side sizes, non-equi residuals). Semi/anti
  * joins are first-class ("leftsemi"/"leftanti") rather than the
  * reference's compiled EXISTS/IN descriptors
  * (core/query_compile.cpp:517).
  */
object Joins {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Engine.table(s, dir, n)

  /** LEFT OUTER join + aggregation over match/no-match structure
    * (joiner_hash.h:100 `watch_traversed`/outer_filter analog). */
  def qJoinLeftAgg(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders").filter(col("o_totalprice") > 400000)
    c.join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_pairs"),
        count(col("o_orderkey")).as("n_matched"),
        sum(when(col("o_orderkey").isNull, 1).otherwise(0)).as("n_unmatched"))
  }

  val qJoinLeftAggSql: String =
    """SELECT c_mktsegment, COUNT(*) AS n_pairs,
      |  COUNT(o_orderkey) AS n_matched,
      |  CAST(COUNT(CASE WHEN o_orderkey IS NULL THEN 1 END) AS BIGINT) AS n_unmatched
      |FROM customer LEFT JOIN (
      |  SELECT * FROM orders WHERE o_totalprice > 400000
      |) ON c_custkey = o_custkey
      |GROUP BY c_mktsegment""".stripMargin

  /** FULL OUTER join of two derived sides (JO_FULL, cq_term.h:60). */
  def qJoinFullOuter(s: SparkSession, dir: String): DataFrame = {
    val rich = t(s, dir, "customer")
      .filter(col("c_acctbal") > 9000)
      .select(col("c_custkey"), col("c_acctbal"))
    val big = t(s, dir, "orders")
      .filter(col("o_totalprice") > 450000)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_big_orders"))
    rich.join(big, col("c_custkey") === col("o_custkey"), "full")
      .select(
        coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        col("c_acctbal"), col("n_big_orders"))
  }

  val qJoinFullOuterSql: String =
    """SELECT COALESCE(c_custkey, o_custkey) AS custkey, c_acctbal, n_big_orders
      |FROM (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 9000) a
      |FULL OUTER JOIN (
      |  SELECT o_custkey, COUNT(*) AS n_big_orders FROM orders
      |  WHERE o_totalprice > 450000 GROUP BY o_custkey
      |) b ON c_custkey = o_custkey""".stripMargin

  /** Semi join = EXISTS subquery (TM_EXISTS mode, cq_term.h:61). */
  def qJoinSemiExists(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val urgent = t(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    c.join(urgent, col("c_custkey") === col("o_custkey"), "leftsemi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
  }

  val qJoinSemiExistsSql: String =
    """SELECT c_mktsegment, COUNT(*) AS n_customers
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey
      |                AND o_orderpriority = '1-URGENT')
      |GROUP BY c_mktsegment""".stripMargin

  /** Anti join = NOT EXISTS (O_NOT_EXISTS descriptor,
    * common_definitions.h:198). */
  def qJoinAnti(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val big = t(s, dir, "orders").filter(col("o_totalprice") > 450000)
    c.join(big, col("c_custkey") === col("o_custkey"), "leftanti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_customers"),
        dsum(col("c_acctbal")).as("sum_bal"))
  }

  val qJoinAntiSql: String =
    s"""SELECT c_nationkey, COUNT(*) AS n_customers,
      |  ${sqlDsum("c_acctbal", "sum_bal")}
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_totalprice > 450000)
      |GROUP BY c_nationkey""".stripMargin

  /** Theta join: equi component (nation) + range residual — the
    * reference's JTYPE_SORT case for `<,>` predicates
    * (optimizer/joiner_sort.h:30). With an equi key present, Spark hashes
    * on nation and evaluates the range as a post-join residual — no
    * nested-loop blowup at scale. */
  def qJoinThetaAcctbal(s: SparkSession, dir: String): DataFrame = {
    val sup = t(s, dir, "supplier")
    val c = t(s, dir, "customer")
    sup.join(c, col("s_nationkey") === col("c_nationkey")
        && col("s_acctbal") > col("c_acctbal"))
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_pairs"),
        dsum(col("s_acctbal") - col("c_acctbal")).as("sum_gap"))
  }

  val qJoinThetaAcctbalSql: String =
    s"""SELECT s_nationkey, COUNT(*) AS n_pairs,
      |  ${sqlDsum("s_acctbal - c_acctbal", "sum_gap")}
      |FROM supplier JOIN customer
      |  ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal
      |GROUP BY s_nationkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_join_left_agg" -> (qJoinLeftAgg _),
    "q_join_full_outer" -> (qJoinFullOuter _),
    "q_join_semi_exists" -> (qJoinSemiExists _),
    "q_join_anti" -> (qJoinAnti _),
    "q_join_theta_acctbal" -> (qJoinThetaAcctbal _))

  val oracles: Map[String, String] = Map(
    "q_join_left_agg" -> qJoinLeftAggSql,
    "q_join_full_outer" -> qJoinFullOuterSql,
    "q_join_semi_exists" -> qJoinSemiExistsSql,
    "q_join_anti" -> qJoinAntiSql,
    "q_join_theta_acctbal" -> qJoinThetaAcctbalSql)
}
