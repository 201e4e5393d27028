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

  /** RIGHT OUTER join (JO_RIGHT, optimizer/compile/cq_term.h:60; the
    * reference's joiners handle it by side switching,
    * joiner_hash.h:100-106 — Catalyst does the same, planning the
    * preserved side as the build/stream choice it would make for the
    * mirrored LEFT). Kept as a literal `"right"` join so the semantics
    * are pinned from this API surface too. */
  def qJoinRight(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").filter(col("o_totalprice") > 400000)
    o.join(t(s, dir, "customer"),
        col("o_custkey") === col("c_custkey"), "right")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_rows"),
        count(col("o_orderkey")).as("n_matched"),
        dsum(coalesce(col("o_totalprice"), lit(0.0))).as("sum_price"))
  }

  val qJoinRightSql: String =
    s"""SELECT c_mktsegment, COUNT(*) AS n_rows,
      |  COUNT(o_orderkey) AS n_matched,
      |  ${sqlDsum("COALESCE(o_totalprice, 0.0)", "sum_price")}
      |FROM (SELECT * FROM orders WHERE o_totalprice > 400000) o
      |RIGHT JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment""".stripMargin

  /** NOT IN over a subquery that may produce NULL — the reference's
    * O_NOT_IN descriptor (common/common_definitions.h:184-235;
    * t/in_subquery.test): three-valued semantics make `x NOT IN S`
    * never TRUE when S contains a NULL (every non-matching comparison
    * is UNKNOWN), so ONE NULL in the subquery empties the result. The
    * gate pins both faces in one row: the same NOT IN with and without
    * a NULL row in S. Expressed through the SQL surface so Catalyst
    * plans its null-aware anti join (not a plain LEFT ANTI, whose
    * NOT-EXISTS semantics would wrongly survive the NULL). */
  def qSubqNotIn(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "customer").createOrReplaceTempView("graft_notin_customer")
    t(s, dir, "orders").createOrReplaceTempView("graft_notin_orders")
    s.sql(
      """SELECT
        |  (SELECT COUNT(*) FROM graft_notin_customer
        |   WHERE c_custkey NOT IN
        |     (SELECT o_custkey FROM graft_notin_orders
        |      WHERE o_totalprice > 450000)) AS n_without_null,
        |  (SELECT COUNT(*) FROM graft_notin_customer
        |   WHERE c_custkey NOT IN
        |     (SELECT o_custkey FROM graft_notin_orders
        |      WHERE o_totalprice > 450000
        |      UNION ALL SELECT CAST(NULL AS BIGINT))) AS n_with_null
        |""".stripMargin)
  }

  val qSubqNotInSql: String =
    """SELECT
      |  (SELECT COUNT(*) FROM customer
      |   WHERE c_custkey NOT IN
      |     (SELECT o_custkey FROM orders
      |      WHERE o_totalprice > 450000)) AS n_without_null,
      |  (SELECT COUNT(*) FROM customer
      |   WHERE c_custkey NOT IN
      |     (SELECT o_custkey FROM orders
      |      WHERE o_totalprice > 450000
      |      UNION ALL SELECT CAST(NULL AS BIGINT))) AS n_with_null""".stripMargin

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
    "q_join_right_agg" -> (qJoinRight _),
    "q_subq_not_in" -> (qSubqNotIn _),
    "q_join_theta_acctbal" -> (qJoinThetaAcctbal _))

  val oracles: Map[String, String] = Map(
    "q_join_left_agg" -> qJoinLeftAggSql,
    "q_join_full_outer" -> qJoinFullOuterSql,
    "q_join_semi_exists" -> qJoinSemiExistsSql,
    "q_join_anti" -> qJoinAntiSql,
    "q_join_right_agg" -> qJoinRightSql,
    "q_subq_not_in" -> qSubqNotInSql,
    "q_join_theta_acctbal" -> qJoinThetaAcctbalSql)
}
