package graft.operators

import graft.Engine
import graft.functions.GroupConcat.groupConcat
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import Relational.{dec, dsum, davg, sqlDec, sqlDsum, sqlDavg}

/** Aggregation inventory (SURVEY.md §2.5): the reference's
  * AggregationAlgorithm kernels (optimizer/aggregator_basic.h /
  * aggregator_advanced.h) — COUNT/SUM/AVG/MIN/MAX [DISTINCT],
  * STDDEV/VAR, BIT_AND/OR/XOR, GROUP_CONCAT — plus HAVING and ROLLUP
  * (ROLLUP is surplus: the reference rejects it to the MySQL row engine,
  * core/query_compile.cpp:70-74; Spark gives it natively).
  */
object Aggregates {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Engine.table(s, dir, n)

  /** DISTINCT aggregates (GroupDistinctTable analog,
    * optimizer/group_distinct_table.cpp). Distinct double sums are exact
    * under the fixed-point convention: the distinct SET of scaled
    * decimals is engine-independent. */
  def qAggDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_part"),
        (sum_distinct(dec(col("l_quantity"))).cast("double") / 10000.0)
          .as("sum_uq_qty"),
        count(lit(1)).as("n_rows"))

  val qAggDistinctSql: String =
    s"""SELECT l_returnflag,
      |  COUNT(DISTINCT l_suppkey) AS n_supp,
      |  COUNT(DISTINCT l_partkey) AS n_part,
      |  CAST(SUM(DISTINCT ${sqlDec("l_quantity")}) AS DOUBLE) / 10000.0 AS sum_uq_qty,
      |  COUNT(*) AS n_rows
      |FROM lineitem
      |GROUP BY l_returnflag""".stripMargin

  /** STDDEV / VAR kernels (aggregator_advanced.h:89-151). Builtins on
    * both sides; rounding absorbs <1e-9 algorithmic differences
    * (Welford vs. naive) while staying far from the grid. */
  def qAggStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_linestatus"))
      .agg(
        round(stddev_samp(col("l_extendedprice")), 2).as("sd_price"),
        round(stddev_pop(col("l_extendedprice")), 2).as("sdp_price"),
        round(var_samp(col("l_discount")), 8).as("var_disc"),
        round(var_pop(col("l_discount")), 8).as("varp_disc"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"))

  val qAggStatsSql: String =
    """SELECT l_linestatus,
      |  ROUND(STDDEV_SAMP(l_extendedprice), 2) AS sd_price,
      |  ROUND(STDDEV_POP(l_extendedprice), 2) AS sdp_price,
      |  ROUND(VAR_SAMP(l_discount), 8) AS var_disc,
      |  ROUND(VAR_POP(l_discount), 8) AS varp_disc,
      |  MIN(l_extendedprice) AS min_price,
      |  MAX(l_extendedprice) AS max_price
      |FROM lineitem
      |GROUP BY l_linestatus""".stripMargin

  /** BIT_AND / BIT_OR / BIT_XOR (aggregator_advanced.h:153-211). */
  def qAggBits(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        expr("bit_and(l_linenumber)").cast("long").as("band"),
        expr("bit_or(l_linenumber)").cast("long").as("bor"),
        expr("bit_xor(l_linenumber)").cast("long").as("bxor"))

  val qAggBitsSql: String =
    """SELECT l_returnflag,
      |  CAST(BIT_AND(l_linenumber) AS BIGINT) AS band,
      |  CAST(BIT_OR(l_linenumber) AS BIGINT) AS bor,
      |  CAST(BIT_XOR(l_linenumber) AS BIGINT) AS bxor
      |FROM lineitem
      |GROUP BY l_returnflag""".stripMargin

  /** GROUP_CONCAT via the custom Aggregator (SURVEY.md §2.5 — the one
    * aggregate needing custom code). */
  def qAggGroupConcat(s: SparkSession, dir: String): DataFrame = {
    val n = t(s, dir, "nation")
    val r = t(s, dir, "region")
    n.join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(groupConcat(col("n_name")).as("nations"),
        count(lit(1)).as("n_nations"))
  }

  val qAggGroupConcatSql: String =
    """SELECT r_name,
      |  STRING_AGG(n_name, ',' ORDER BY n_name) AS nations,
      |  COUNT(*) AS n_nations
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name""".stripMargin

  /** GROUP_CONCAT truncation at `group_concat_max_len` — every reference
    * GROUP_CONCAT is governed by it (512 in the published TPC-H bench
    * config, BASELINE.md; MySQL default 1024; see
    * mysql-test/suite/tianmu/t/group_concat.test). Customer names per
    * market segment far exceed 512 chars at sf0.01, so the cut bites;
    * values are sorted pre-join so the truncated prefix is
    * deterministic. The oracle mirrors with substr over the untruncated
    * aggregate. */
  def qAggGroupConcatTrunc(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .groupBy(col("c_mktsegment"))
      .agg(groupConcat(col("c_name"), maxLen = 512).as("names_512"),
        count(lit(1)).as("n_customers"))
      .select(col("c_mktsegment"), col("names_512"),
        length(col("names_512")).cast("long").as("len_512"),
        col("n_customers"))

  val qAggGroupConcatTruncSql: String =
    """SELECT c_mktsegment,
      |  SUBSTR(STRING_AGG(c_name, ',' ORDER BY c_name), 1, 512)
      |    AS names_512,
      |  LENGTH(SUBSTR(STRING_AGG(c_name, ',' ORDER BY c_name), 1, 512))
      |    AS len_512,
      |  COUNT(*) AS n_customers
      |FROM customer
      |GROUP BY c_mktsegment""".stripMargin

  /** HAVING over a shuffled hash aggregation. */
  def qAggHaving(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_items"),
        dsum(col("l_quantity")).as("sum_qty"))
      .filter(col("n_items") > 50)

  val qAggHavingSql: String =
    s"""SELECT l_suppkey, COUNT(*) AS n_items,
      |  ${sqlDsum("l_quantity", "sum_qty")}
      |FROM lineitem
      |GROUP BY l_suppkey
      |HAVING COUNT(*) > 50""".stripMargin

  /** ROLLUP (surplus vs. reference — see scaladoc above). */
  def qAggRollup(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    val r = t(s, dir, "region")
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
        dsum(col("c_acctbal")).as("sum_bal"))
  }

  val qAggRollupSql: String =
    s"""SELECT r_name, n_name, COUNT(*) AS n_customers,
      |  ${sqlDsum("c_acctbal", "sum_bal")}
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP (r_name, n_name)""".stripMargin

  /** Approximate aggregates (scale tier, no reference analog): at 100 TB
    * an exact COUNT(DISTINCT) shuffles every distinct value; the HLL++
    * sketch and the percentile t-digest shuffle constant-size state per
    * group. Sketch INTERNALS differ per engine, so raw sketch outputs
    * can never hash-match — instead the gate emits the exact values
    * (hash-checked) plus within-error-bound BOOLEANS comparing each
    * sketch to its exact twin inside the query; the oracle recomputes
    * the exacts and pins the booleans to TRUE. A sketch drifting out of
    * its published bound (HLL rsd 0.02 → 3σ = 6%; t-digest at 10k
    * centroids → ~1% on the median) now fails the driver gate, not just
    * a spec. */
  def qAggApprox(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("apx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
          .as("apx_median_price"),
        expr("percentile(l_extendedprice, 0.5)").as("exact_median_price"),
        count(lit(1)).as("n_rows"))
      .select(col("l_returnflag"), col("exact_parts"), col("n_rows"),
        (abs(col("apx_parts") - col("exact_parts"))
          .cast("double") / col("exact_parts") <= 0.06).as("hll_ok"),
        (abs(col("apx_median_price") - col("exact_median_price"))
          / col("exact_median_price") <= 0.01).as("median_ok"))

  val qAggApproxSql: String =
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_partkey) AS exact_parts,
      |  COUNT(*) AS n_rows,
      |  TRUE AS hll_ok,
      |  TRUE AS median_ok
      |FROM lineitem
      |GROUP BY l_returnflag""".stripMargin

  /** CUBE — all grouping-set combinations (surplus vs. reference, which
    * rejects even ROLLUP to the row engine — core/query_compile.cpp:70). */
  def qAggCube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("sum_price"))

  val qAggCubeSql: String =
    s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
      |  ${sqlDsum("o_totalprice", "sum_price")}
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin

  /** Pearson correlation + covariance kernels (surplus tier — neither
    * MySQL 5.7 nor the reference has them; standard analytics surface).
    * corr is dimensionless and covariance here is small-magnitude
    * (quantity × discount), so the rounding grid sits ~6 orders above
    * aggregation-order noise. Zero-variance groups: Spark's corr
    * returns NaN where DuckDB (and SQL convention) return NULL — the
    * nanvl wrapper adopts the NULL convention so the hash gate cannot
    * break on a constant-column fixture. */
  def qAggCorr(s: SparkSession, dir: String): DataFrame = {
    def nullNaN(c: Column): Column = nanvl(c, lit(null).cast("double"))
    t(s, dir, "lineitem")
      .groupBy(col("l_linestatus"))
      .agg(
        round(nullNaN(corr(col("l_quantity"), col("l_extendedprice"))), 6)
          .as("corr_qty_price"),
        round(nullNaN(corr(col("l_quantity"), col("l_discount"))), 6)
          .as("corr_qty_disc"),
        round(nullNaN(covar_samp(col("l_quantity"), col("l_discount"))), 8)
          .as("cov_qty_disc"),
        round(nullNaN(covar_pop(col("l_quantity"), col("l_discount"))), 8)
          .as("covp_qty_disc"),
        count(lit(1)).as("n_rows"))
  }

  val qAggCorrSql: String =
    """SELECT l_linestatus,
      |  ROUND(corr(l_extendedprice, l_quantity), 6) AS corr_qty_price,
      |  ROUND(corr(l_discount, l_quantity), 6) AS corr_qty_disc,
      |  ROUND(covar_samp(l_discount, l_quantity), 8) AS cov_qty_disc,
      |  ROUND(covar_pop(l_discount, l_quantity), 8) AS covp_qty_disc,
      |  COUNT(*) AS n_rows
      |FROM lineitem
      |GROUP BY l_linestatus""".stripMargin

  /** EXACT percentiles (vs q_agg_approx's sketch tier): both engines use
    * the type-7 (n-1)p linear interpolation; columns are small-magnitude
    * so the 1e-6 rounding grid is far above interpolation ulp noise. */
  def qAggPercentile(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_quantity, 0.5)"), 6).as("median_qty"),
        round(expr("percentile(l_quantity, 0.9)"), 6).as("p90_qty"),
        round(expr("percentile(l_discount, 0.25)"), 6).as("p25_disc"),
        round(expr("percentile(l_discount, 0.75)"), 6).as("p75_disc"),
        count(lit(1)).as("n_rows"))

  val qAggPercentileSql: String =
    """SELECT l_returnflag,
      |  ROUND(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
      |  ROUND(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
      |  ROUND(quantile_cont(l_discount, 0.25), 6) AS p25_disc,
      |  ROUND(quantile_cont(l_discount, 0.75), 6) AS p75_disc,
      |  COUNT(*) AS n_rows
      |FROM lineitem
      |GROUP BY l_returnflag""".stripMargin

  /** PIVOT — long-to-wide conditional aggregation (surplus surface; the
    * oracle expresses it as portable FILTER aggregates). Explicit value
    * list keeps the output schema static — at scale an implicit pivot
    * would add a distinct-collect driver pass. */
  def qPivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("user_id"))
      .pivot("event_type",
        Seq("click", "view", "purchase", "signup", "error"))
      .count()
      .na.fill(0L)
      .select(col("user_id"), col("click").as("n_click"),
        col("view").as("n_view"), col("purchase").as("n_purchase"),
        col("signup").as("n_signup"), col("error").as("n_error"))

  val qPivotSql: String =
    """SELECT user_id,
      |  COUNT(*) FILTER (event_type = 'click') AS n_click,
      |  COUNT(*) FILTER (event_type = 'view') AS n_view,
      |  COUNT(*) FILTER (event_type = 'purchase') AS n_purchase,
      |  COUNT(*) FILTER (event_type = 'signup') AS n_signup,
      |  COUNT(*) FILTER (event_type = 'error') AS n_error
      |FROM events
      |GROUP BY user_id""".stripMargin

  /** UNPIVOT — wide-to-long melt, [[qPivot]]'s inverse (the reshaping
    * pair): lineitem's four measure columns melt into (measure, v) rows,
    * then aggregate per (returnflag, measure). The melt is a scan-side
    * Expand (each input row emits 4, no shuffle); the only exchange is
    * the final small-group aggregate. Fixed-point sums keep the gate
    * hash-exact. */
  def qUnpivot(s: SparkSession, dir: String): DataFrame = {
    val measures = Seq("l_quantity", "l_extendedprice", "l_discount",
      "l_tax")
    t(s, dir, "lineitem")
      .select((col("l_returnflag") +: measures.map(col)): _*)
      .unpivot(Array(col("l_returnflag")),
        measures.map(col).toArray, "measure", "v")
      .groupBy(col("l_returnflag"), col("measure"))
      .agg(count(lit(1)).as("n"),
        (sum(Relational.dec(col("v"))).cast("double") / 10000.0)
          .as("sum_v"),
        min(col("v")).as("min_v"), max(col("v")).as("max_v"))
  }

  val qUnpivotSql: String = {
    val arms = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .map(m =>
        s"SELECT l_returnflag, '$m' AS measure, $m AS v FROM lineitem")
      .mkString("\n  UNION ALL\n  ")
    s"""WITH long AS (
      |  $arms
      |)
      |SELECT l_returnflag, measure, COUNT(*) AS n,
      |  ${Relational.sqlDsum("v", "sum_v")},
      |  MIN(v) AS min_v, MAX(v) AS max_v
      |FROM long
      |GROUP BY l_returnflag, measure""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg_corr" -> (qAggCorr _),
    "q_agg_percentile" -> (qAggPercentile _),
    "q_pivot" -> (qPivot _),
    "q_unpivot" -> (qUnpivot _),
    "q_agg_distinct" -> (qAggDistinct _),
    "q_agg_stats" -> (qAggStats _),
    "q_agg_bits" -> (qAggBits _),
    "q_agg_group_concat" -> (qAggGroupConcat _),
    "q_agg_group_concat_trunc" -> (qAggGroupConcatTrunc _),
    "q_agg_having" -> (qAggHaving _),
    "q_agg_rollup" -> (qAggRollup _),
    "q_agg_cube" -> (qAggCube _),
    "q_agg_approx" -> (qAggApprox _))

  val oracles: Map[String, String] = Map(
    "q_agg_corr" -> qAggCorrSql,
    "q_agg_percentile" -> qAggPercentileSql,
    "q_pivot" -> qPivotSql,
    "q_unpivot" -> qUnpivotSql,
    "q_agg_distinct" -> qAggDistinctSql,
    "q_agg_stats" -> qAggStatsSql,
    "q_agg_bits" -> qAggBitsSql,
    "q_agg_group_concat" -> qAggGroupConcatSql,
    "q_agg_group_concat_trunc" -> qAggGroupConcatTruncSql,
    "q_agg_having" -> qAggHavingSql,
    "q_agg_rollup" -> qAggRollupSql,
    "q_agg_cube" -> qAggCubeSql,
    "q_agg_approx" -> qAggApproxSql)
}
