package graft.operators

import graft.Engine
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sort / limit / top-k / DISTINCT / UNION inventory (SURVEY.md §2.7-2.8).
  * Top-k compiles to TakeOrderedAndProject — the analog of the reference's
  * SorterLimit heap (util/sorter3.h:211); LIMIT+OFFSET mirrors TM_TOP
  * n1,n2 (core/query_compile.cpp:1268); UNION [ALL/DISTINCT] mirrors
  * TempTable::Union (core/temp_table.cpp:1318). Sort keys include a unique
  * tiebreaker so results are deterministic sets.
  */
object SortSetOps {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Engine.table(s, dir, n)

  def qSortTopk(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  val qSortTopkSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 10""".stripMargin

  def qSortLimitOffset(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
      .offset(10)
      .limit(20)

  val qSortLimitOffsetSql: String =
    """SELECT o_orderkey, o_totalprice
      |FROM orders
      |ORDER BY o_orderkey
      |LIMIT 20 OFFSET 10""".stripMargin

  /** SELECT DISTINCT = group-by over all output columns (TM_DISTINCT,
    * core/query_compile.cpp:1232). */
  def qDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderstatus"), col("o_orderpriority"))
      .distinct()

  val qDistinctSql: String =
    "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders"

  def qUnionAll(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val a = c.filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("custkey"), lit("building").as("src"))
    val b = c.filter(col("c_mktsegment") === "MACHINERY"
        && col("c_acctbal") > 0)
      .select(col("c_custkey").as("custkey"), lit("machinery").as("src"))
    a.unionAll(b)
  }

  val qUnionAllSql: String =
    """SELECT c_custkey AS custkey, 'building' AS src
      |FROM customer WHERE c_mktsegment = 'BUILDING'
      |UNION ALL
      |SELECT c_custkey AS custkey, 'machinery' AS src
      |FROM customer WHERE c_mktsegment = 'MACHINERY' AND c_acctbal > 0""".stripMargin

  /** UNION DISTINCT dedups across overlapping sides
    * (temp_table.cpp:1344-1430's GroupDistinctTable analog). */
  def qUnionDistinct(s: SparkSession, dir: String): DataFrame = {
    val rich = t(s, dir, "customer").filter(col("c_acctbal") > 8000)
      .select(col("c_custkey").as("custkey"))
    val bigSpenders = t(s, dir, "orders")
      .filter(col("o_totalprice") > 400000)
      .select(col("o_custkey").as("custkey"))
    rich.union(bigSpenders).distinct()
  }

  val qUnionDistinctSql: String =
    """SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 8000
      |UNION
      |SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000""".stripMargin

  /** Multi-block UNION under a GLOBAL ORDER BY + LIMIT — the reference
    * walks UNION units in Engine::HandleSelect (engine_execute.cpp:80)
    * and applies one TM_TOP over the combined result
    * (query_compile.cpp:1295). Spark-first this is union → distinct →
    * orderBy → limit, which compiles to one TakeOrderedAndProject above
    * the union (heap top-k, no global sort materialization). */
  def qUnionOrderLimit(s: SparkSession, dir: String): DataFrame = {
    val a = t(s, dir, "orders")
      .filter(col("o_totalprice") > 400000)
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("v"))
    val b = t(s, dir, "customer")
      .filter(col("c_acctbal") > 9000)
      .select(col("c_custkey").as("k"), col("c_acctbal").as("v"))
    a.union(b).distinct()
      .orderBy(col("v").desc, col("k"))
      .limit(25)
  }

  val qUnionOrderLimitSql: String =
    """SELECT k, v FROM (
      |  SELECT o_orderkey AS k, o_totalprice AS v
      |  FROM orders WHERE o_totalprice > 400000
      |  UNION
      |  SELECT c_custkey AS k, c_acctbal AS v
      |  FROM customer WHERE c_acctbal > 9000
      |)
      |ORDER BY v DESC, k
      |LIMIT 25""".stripMargin

  /** INTERSECT (distinct) — surplus vs. the reference (MySQL 5.7 has only
    * UNION, SURVEY.md §2.8); Catalyst plans it as a left-semi join over
    * distinct sides. */
  def qIntersect(s: SparkSession, dir: String): DataFrame = {
    val rich = t(s, dir, "customer").filter(col("c_acctbal") > 5000)
      .select(col("c_custkey").as("custkey"))
    val active = t(s, dir, "orders")
      .filter(col("o_totalprice") > 200000)
      .select(col("o_custkey").as("custkey"))
    rich.intersect(active)
  }

  val qIntersectSql: String =
    """SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
      |INTERSECT
      |SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 200000""".stripMargin

  /** EXCEPT (distinct) — surplus vs. the reference; plans as left-anti. */
  def qExcept(s: SparkSession, dir: String): DataFrame = {
    val building = t(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("custkey"))
    val bigSpenders = t(s, dir, "orders")
      .filter(col("o_totalprice") > 350000)
      .select(col("o_custkey").as("custkey"))
    building.except(bigSpenders)
  }

  val qExceptSql: String =
    """SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |EXCEPT
      |SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 350000""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sort_topk" -> (qSortTopk _),
    "q_sort_limit_offset" -> (qSortLimitOffset _),
    "q_distinct" -> (qDistinct _),
    "q_union_all" -> (qUnionAll _),
    "q_union_distinct" -> (qUnionDistinct _),
    "q_union_order_limit" -> (qUnionOrderLimit _),
    "q_intersect" -> (qIntersect _),
    "q_except" -> (qExcept _))

  val oracles: Map[String, String] = Map(
    "q_sort_topk" -> qSortTopkSql,
    "q_sort_limit_offset" -> qSortLimitOffsetSql,
    "q_distinct" -> qDistinctSql,
    "q_union_all" -> qUnionAllSql,
    "q_union_distinct" -> qUnionDistinctSql,
    "q_union_order_limit" -> qUnionOrderLimitSql,
    "q_intersect" -> qIntersectSql,
    "q_except" -> qExceptSql)
}
