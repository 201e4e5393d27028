package graft.operators

import graft.Engine
import graft.operators.Relational.{davg, dsum, sqlDavg, sqlDec, sqlDsum}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TPC-H continuation beyond the flagship five in [[Relational]] —
  * adaptations of Q4, Q7, Q8, Q10, Q13, Q14, Q15, Q18, Q22 to the
  * driver's TPC-H-ish schema (TESTDATA.md). These mirror the reference's
  * published benchmark inventory (BASELINE.md lists its per-query SF100
  * times for Q2-Q21), so the per-round BENCH json lines up query-by-query
  * with the baseline table.
  *
  * Schema adaptations (columns the testdata lacks):
  *  - Q4: no l_commitdate/l_receiptdate → the EXISTS probes
  *    `l_shipdate > o_orderdate` instead of late receipts.
  *  - Q8: p_type is a single word (`ECONOMY`), region ASIA, market-share
  *    nation NATION_3.
  *  - Q13: the `o_comment NOT LIKE` filter becomes
  *    `o_orderpriority <> '1-URGENT'`.
  *  - Q18: quantity threshold 250 (≈ p99 of per-order quantity sums in
  *    this data — same selectivity role as 300 in standard TPC-H).
  *  - Q22: no c_phone country codes → group by c_nationkey; "no orders"
  *    becomes "no orders since 1999-01-01" (every customer here has some
  *    order).
  * Q2/Q9/Q11/Q16/Q20 need partsupp (absent); Q12/Q21 need
  * shipmode/commit/receipt dates (absent) — the literal queries are out of
  * schema reach, so every uncovered *query shape* is gated as a
  * documented stand-in (`qNN_*_shape` below), completing the BASELINE.md
  * table query-for-query:
  *  - Q2: correlated min-cost subquery, partsupp played by
  *    lineitem(partkey, suppkey, extendedprice).
  *  - Q11: fraction-of-total HAVING over a scalar subquery, inventory
  *    value played by lineitem price×quantity.
  *  - Q12: two-way conditional priority counts, l_returnflag playing
  *    l_shipmode.
  *  - Q16: distinct-supplier count with NOT-IN exclusion, the partsupp
  *    catalog played by distinct (l_partkey, l_suppkey) pairs.
  *  - Q20: nested IN-over-aggregated-subquery, the availqty test played
  *    by a per-(supplier,part) shipped-quantity HAVING.
  *  - Q21: multi-EXISTS + NOT-EXISTS self-join (the reference's
  *    second-worst completed query, 567.46 s at SF100), "late" meaning
  *    `l_shipdate > o_orderdate + 90 days` (the Q4 adaptation
  *    convention).
  *
  * Scale shape per query is called out inline: what broadcasts, what
  * shuffles, and on which key.
  */
object TpchSuite {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Engine.table(s, dir, n)

  private val vol = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
  private val sqlVol = "l_extendedprice * (1.0 - l_discount)"

  // --- Q4: order priority checking (EXISTS semi-join) ---------------------

  /** Q4 shape: date-windowed orders, EXISTS(lineitem shipped after order
    * date) → left-semi join on orderkey (+ non-equi residual), count by
    * priority. The semi join shuffles on orderkey; at 100 TB both sides
    * are orderkey-partitioned so no row ever crosses twice. */
  def q04OrderPriority(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1997-01-01")
        && col("o_orderdate") < lit("1997-04-01"))
    val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_shipdate"))
    o.join(li, col("o_orderkey") === col("l_orderkey")
        && col("l_shipdate") > col("o_orderdate"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  val q04Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-04-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // --- Q7: volume shipping between two nations ----------------------------

  /** Q7 shape: nation-pair trade volume by ship year over a 4-nation
    * group (pairs of 2 are empty at the sf0.001 smoke scale). Only the
    * two nation lookups (25 rows, fixed at every SF) are hint-broadcast;
    * supplier/customer grow with SF so their strategy is left to
    * Catalyst/AQE sizing. lineitem⋈orders is the only mandatory
    * shuffle, keyed on orderkey. */
  def q07VolumeShipping(s: SparkSession, dir: String): DataFrame = {
    val pair = Seq("NATION_0", "NATION_1", "NATION_2", "NATION_3")
    val n1 = t(s, dir, "nation").filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("supp_nk"), col("n_name").as("supp_nation"))
    val n2 = t(s, dir, "nation").filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("cust_nk"), col("n_name").as("cust_nation"))
    val li = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01")
        && col("l_shipdate") < lit("1998-01-01"))
    li.join(t(s, dir, "supplier"),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("supp_nk"))
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(n2), col("c_nationkey") === col("cust_nk"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(dsum(vol).as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  val q07Sql: String =
    s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  YEAR(l_shipdate) AS l_year,
      |  ${sqlDsum(sqlVol, "revenue")}
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND n1.n_name IN ('NATION_0', 'NATION_1', 'NATION_2', 'NATION_3')
      |  AND n2.n_name IN ('NATION_0', 'NATION_1', 'NATION_2', 'NATION_3')
      |  AND n1.n_name <> n2.n_name
      |GROUP BY 1, 2, 3
      |ORDER BY 1, 2, 3""".stripMargin

  // --- Q8: national market share ------------------------------------------

  /** Q8 shape: NATION_3's share of ECONOMY-part volume sold into ASIA by
    * order year. The part pre-filter joins into lineitem first, shrinking
    * the fact stream before the orderkey shuffle. The SF-fixed
    * nation/region lookups are folded into their DIMENSION sides before
    * those meet the fact stream (guide §3): customer pre-joins the
    * ASIA-filtered nation key set — dropping ~4/5 of customers BEFORE
    * the o_custkey join, so at 100 TB the customer shuffle (or
    * broadcast) carries only ASIA customers — and supplier pre-attaches
    * its nation name. The fact-row probe chain shrinks from 7 joins to
    * 5 and two BroadcastExchanges (nCust, region) leave the fact path
    * entirely (they build the tiny nAsia key set instead).
    * Catalyst/AQE still size part/customer/supplier (broadcast when
    * small, shuffled at 100 TB). Inner equi-join reassociation over
    * key-unique lookups is row-set-preserving, and both dsums are exact
    * decimal sums, so the final ratio is engine-deterministic. */
  def q08MarketShare(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part").filter(col("p_type") === "ECONOMY")
    val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
    val nCust = t(s, dir, "nation")
      .select(col("n_nationkey").as("cn_nk"), col("n_regionkey").as("cn_rk"))
    val nSupp = t(s, dir, "nation")
      .select(col("n_nationkey").as("sn_nk"), col("n_name").as("supp_nation"))
    // ASIA nation keys: nation ⋈ region collapses to one SF-fixed key set
    val nAsia = nCust.join(broadcast(r), col("cn_rk") === col("r_regionkey"))
      .select(col("cn_nk"))
    val cust = t(s, dir, "customer")
      .join(broadcast(nAsia), col("c_nationkey") === col("cn_nk"))
      .select(col("c_custkey"))
    val supp = t(s, dir, "supplier")
      .join(broadcast(nSupp), col("s_nationkey") === col("sn_nk"))
      .select(col("s_suppkey"), col("supp_nation"))
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01")
        && col("o_orderdate") < lit("1998-01-01"))
    t(s, dir, "lineitem")
      .join(p, col("l_partkey") === col("p_partkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg((dsum(when(col("supp_nation") === "NATION_3", vol)
          .otherwise(lit(0.0))) / dsum(vol)).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  val q08Sql: String = {
    // the /10000.0 factors cancel algebraically but NOT in IEEE — the
    // oracle must mirror Spark's dsum(x)/dsum(y) op-for-op
    val share = s"(CAST(SUM(${sqlDec(s"CASE WHEN n2.n_name = 'NATION_3' THEN $sqlVol ELSE 0.0 END")}) AS DOUBLE) / 10000.0)" +
      s" / (CAST(SUM(${sqlDec(sqlVol)}) AS DOUBLE) / 10000.0)"
    s"""SELECT YEAR(o_orderdate) AS o_year, $share AS mkt_share
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |JOIN region ON n1.n_regionkey = r_regionkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY 1
      |ORDER BY 1""".stripMargin
  }

  // --- Q10: returned item reporting ----------------------------------------

  /** Q10 shape: top-20 customers by returned revenue in a quarter.
    * orders⋈lineitem shuffles on orderkey; nation (SF-fixed) is hint-
    * broadcast, customer's strategy is left to Catalyst/AQE sizing; the
    * limit compiles to TakeOrderedAndProject (top-k heap, no global
    * sort). */
  def q10ReturnedItems(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-10-01")
        && col("o_orderdate") < lit("1997-01-01"))
    val li = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(dsum(vol).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val q10Sql: String =
    s"""SELECT c_custkey, c_name, c_acctbal, n_name,
      |  ${sqlDsum(sqlVol, "revenue")}
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= TIMESTAMP '1996-10-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY 1, 2, 3, 4
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  // --- Q13: customer order-count distribution ------------------------------

  /** Q13 shape: histogram of per-customer order counts, left outer join so
    * zero-order customers survive with count 0. Two aggregations: first
    * keyed on custkey (the join key — no extra shuffle after the join),
    * then on the tiny count domain. */
  def q13CustomerDistribution(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").filter(col("o_orderpriority") =!= "1-URGENT")
    t(s, dir, "customer")
      .join(o, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val q13Sql: String =
    """SELECT c_count, COUNT(*) AS custdist
      |FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |      FROM customer LEFT OUTER JOIN orders
      |        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |      GROUP BY c_custkey)
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  // --- Q14: promotion effect ------------------------------------------------

  /** Q14 shape: promo share of one month's revenue. part grows with SF
    * so no broadcast hint (Catalyst sizes it); the single global
    * aggregate is a map-side-combined scalar. */
  def q14PromoRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-09-01")
        && col("l_shipdate") < lit("1997-10-01"))
    li.join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .agg((lit(100.0) * dsum(when(col("p_type") === "PROMO", vol)
          .otherwise(lit(0.0))) / dsum(vol)).as("promo_revenue"))
  }

  val q14Sql: String = {
    // mirror Spark's 100.0 * dsum(x) / dsum(y) op-for-op (see q08Sql note)
    val ratio = s"100.0 * (CAST(SUM(${sqlDec(s"CASE WHEN p_type = 'PROMO' THEN $sqlVol ELSE 0.0 END")}) AS DOUBLE) / 10000.0)" +
      s" / (CAST(SUM(${sqlDec(sqlVol)}) AS DOUBLE) / 10000.0)"
    s"""SELECT $ratio AS promo_revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      |  AND l_shipdate < TIMESTAMP '1997-10-01'""".stripMargin
  }

  // --- Q15: top supplier -----------------------------------------------------

  /** Q15 shape: supplier(s) with the quarter's max revenue. The revenue
    * aggregate is computed once and reused for both the max (scalar, one
    * row — broadcast) and the equality probe; exact decimal sums make the
    * `= max` comparison safe on doubles. */
  def q15TopSupplier(s: SparkSession, dir: String): DataFrame = {
    val rev = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01")
        && col("l_shipdate") < lit("1997-04-01"))
      .groupBy(col("l_suppkey"))
      .agg(dsum(vol).as("total_revenue"))
    val maxRev = rev.agg(max(col("total_revenue")).as("max_rev"))
    t(s, dir, "supplier")
      .join(rev, col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(maxRev), col("total_revenue") === col("max_rev"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  val q15Sql: String =
    s"""WITH revenue AS (
      |  SELECT l_suppkey, ${sqlDsum(sqlVol, "total_revenue")}
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |    AND l_shipdate < TIMESTAMP '1997-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM supplier JOIN revenue ON s_suppkey = l_suppkey
      |WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  // --- Q18: large volume customers -------------------------------------------

  /** Q18 shape (the reference's slowest completed query, 1101.7 s at
    * SF100 — BASELINE.md): orders whose total quantity exceeds 250.
    * The heavy per-orderkey aggregate runs FIRST so its survivors (a few
    * hundred rows) join back into orders⋈customer — the big tables never
    * shuffle against each other unfiltered. No broadcast hints: `big`'s
    * size is data-dependent (a hint would pin a driver-killing broadcast
    * if the filter passes more than expected) and customer grows with
    * SF; AQE sees the filtered aggregate's true runtime size and picks
    * broadcast exactly when it is actually small. */
  def q18LargeVolumeCustomer(s: SparkSession, dir: String): DataFrame = {
    val big = t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(dsum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > 250.0)
    t(s, dir, "orders")
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(t(s, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  val q18Sql: String =
    s"""SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
      |FROM orders
      |JOIN (SELECT l_orderkey, ${sqlDsum("l_quantity", "sum_qty")}
      |      FROM lineitem GROUP BY l_orderkey
      |      HAVING CAST(SUM(${sqlDec("l_quantity")}) AS DOUBLE) / 10000.0 > 250.0) big
      |  ON o_orderkey = big.l_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 100""".stripMargin

  // --- Q22: global sales opportunity ------------------------------------------

  /** Q22 shape: rich customers (above positive-average balance) with no
    * recent orders, counted per nation. The average is a broadcast
    * scalar; the "no recent orders" is a left-anti join on custkey. */
  def q22IdleCustomers(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val avgBal = c.filter(col("c_acctbal") > 0.0)
      .agg(davg(col("c_acctbal")).as("avg_bal"))
    val recent = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1999-01-01"))
      .select(col("o_custkey"))
    c.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
      .orderBy(col("c_nationkey"))
  }

  val q22Sql: String = {
    val avgExpr = s"CAST(SUM(${sqlDec("c_acctbal")}) AS DOUBLE) / 10000.0 / COUNT(c_acctbal)"
    s"""SELECT c_nationkey, COUNT(*) AS numcust,
      |  ${sqlDsum("c_acctbal", "totacctbal")}
      |FROM customer
      |WHERE c_acctbal > (SELECT $avgExpr FROM customer WHERE c_acctbal > 0.0)
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderdate >= TIMESTAMP '1999-01-01')
      |GROUP BY c_nationkey
      |ORDER BY c_nationkey""".stripMargin
  }

  /** Q9 SHAPE (product-type profit by nation and year). Exact Q9 needs
    * partsupp.ps_supplycost (absent — see scaladoc above); this keeps
    * Q9's join topology and aggregation — lineitem ⋈ orders ⋈ supplier ⋈
    * nation ⋈ part, revenue aggregated by (nation, order-year) over a
    * part filter — with profit simplified to the discounted revenue.
    * Scale shape: nation (SF-fixed) hint-broadcast; part/supplier sized
    * by Catalyst/AQE; lineitem⋈orders is the one big shuffle
    * (orderkey), then a narrow (nation, year) agg. */
  def q09ProfitShape(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    // nation pre-attaches to SUPPLIER (broadcast into the
    // supplier-sized side) instead of probing every fact row — one
    // fewer join on the lineitem stream, same rows (inner equi-join
    // reassociation over the key-unique nation lookup); dsum is the
    // exact decimal sum, so regrouping cannot move the result
    val su = t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    val p = t(s, dir, "part").filter(col("p_name").like("%bolt%"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(p, col("l_partkey") === col("p_partkey"))
      .join(su, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).as("o_year"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("sum_profit"))
  }

  val q09Sql: String =
    s"""SELECT n_name AS nation,
      |  CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |  ${sqlDsum("l_extendedprice * (1.0 - l_discount)", "sum_profit")}
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE p_name LIKE '%bolt%'
      |GROUP BY n_name, year(o_orderdate)""".stripMargin

  // --- Q2 SHAPE: correlated min-cost subquery ------------------------------

  /** Q2 SHAPE (minimum-cost supplier per part within a region). The exact
    * Q2 needs partsupp.ps_supplycost (absent); lineitem(l_partkey,
    * l_suppkey, l_extendedprice) plays partsupp, preserving Q2's defining
    * structure: a correlated scalar subquery — min cost over the SAME
    * supplier⋈nation⋈region topology as the outer query — probed with
    * equality, then top-100 by supplier balance.
    *
    * Scale shape: region⋈nation collapses to an SF-fixed broadcast key
    * set; the offers stream (lineitem pre-pruned to 3 columns + supplier
    * attrs) is shuffled once on the extracted join key
    * (partkey, price) to probe the min table; the min table itself is
    * |parts| rows — its per-part agg plus the re-key onto
    * (partkey, min) are both narrow relative to the fact stream, and at
    * AQE sizes it becomes a broadcast, removing the wide shuffle
    * entirely. The ECONOMY part join happens after min-filtering, so
    * only surviving offers touch the part table. The LIMIT compiles to
    * TakeOrderedAndProject (top-k heap, no global sort). Double equality
    * on `min` is safe: min is order-independent and exact on IEEE
    * doubles (no summation).
    * Determinism: sort key (s_acctbal desc, n_name, s_name, p_partkey)
    * pins a unique (supplier, part) pair; remaining output columns are
    * functions of it. */
  def q02MinCostSupplierShape(s: SparkSession, dir: String): DataFrame = {
    val asiaNations = t(s, dir, "nation")
      .join(t(s, dir, "region").filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val offers = t(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
      .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"))
    val minPerPart = offers.groupBy(col("l_partkey").as("mp_partkey"))
      .agg(min(col("l_extendedprice")).as("min_price"))
    offers
      .join(minPerPart, col("l_partkey") === col("mp_partkey")
        && col("l_extendedprice") === col("min_price"))
      .join(t(s, dir, "part").filter(col("p_type") === "ECONOMY"),
        col("l_partkey") === col("p_partkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_name"), col("s_suppkey"), col("min_price"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey"))
      .limit(100)
  }

  val q02Sql: String =
    """SELECT s_acctbal, s_name, n_name, p_partkey, p_name, s_suppkey,
      |       l_extendedprice AS min_price
      |FROM part, lineitem, supplier, nation, region
      |WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA' AND p_type = 'ECONOMY'
      |  AND l_extendedprice = (
      |    SELECT MIN(l2.l_extendedprice)
      |    FROM lineitem l2, supplier s2, nation n2, region r2
      |    WHERE l2.l_partkey = p_partkey AND s2.s_suppkey = l2.l_suppkey
      |      AND s2.s_nationkey = n2.n_nationkey
      |      AND n2.n_regionkey = r2.r_regionkey
      |      AND r2.r_name = 'ASIA')
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      |LIMIT 100""".stripMargin

  // --- Q20 SHAPE: nested IN over aggregated subquery -----------------------

  /** Q20 SHAPE (suppliers with excess shipments of a part family, by
    * region). The exact Q20 needs partsupp.ps_availqty (absent); the
    * structure kept is the defining one: an IN-subquery whose body is an
    * AGGREGATED, HAVING-filtered group over lineitem, itself containing a
    * nested IN-subquery over a name-filtered part — two levels of IN with
    * an aggregate between them.
    *
    * Scale shape: the part-name filter runs first and only p_partkey
    * survives into a semi join (Catalyst/AQE sizes it — broadcast while
    * small); the (suppkey, partkey) aggregate is map-side combined; the
    * HAVING uses the fixed-point integer sum (sum(round(q*10⁴)) >
    * 35·10⁴), so the threshold boundary is engine-deterministic — no
    * float-sum tie-break risk; the surviving suppkeys are a left-semi
    * probe into the SF-fixed supplier⋈nation⋈region side. */
  def q20QualifiedSuppliersShape(s: SparkSession, dir: String): DataFrame = {
    val boltParts = t(s, dir, "part")
      .filter(col("p_name").like("%bolt%")).select(col("p_partkey"))
    val qualified = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01")
        && col("l_shipdate") < lit("1998-01-01"))
      .join(boltParts, col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(Relational.dec(col("l_quantity"))).as("qty_fp"))
      .filter(col("qty_fp") > lit(350000L))
      .select(col("l_suppkey")).distinct()
    t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region").filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .join(qualified, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_name"), col("s_acctbal"))
      .orderBy(col("s_name"))
  }

  val q20Sql: String =
    """SELECT s_name, s_acctbal
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |              JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'EUROPE'
      |  AND s_suppkey IN (
      |    SELECT l_suppkey FROM lineitem
      |    WHERE l_partkey IN (SELECT p_partkey FROM part
      |                        WHERE p_name LIKE '%bolt%')
      |      AND l_shipdate >= TIMESTAMP '1997-01-01'
      |      AND l_shipdate < TIMESTAMP '1998-01-01'
      |    GROUP BY l_suppkey, l_partkey
      |    HAVING SUM(CAST(FLOOR(l_quantity * 10000.0 + 0.5) AS BIGINT))
      |             > 350000)
      |ORDER BY s_name""".stripMargin

  // --- Q21 SHAPE: multi-EXISTS + NOT-EXISTS self-join ----------------------

  /** Q21 SHAPE (suppliers who alone were late on multi-supplier orders —
    * the reference's second-worst completed query, 567.46 s at SF100 per
    * BASELINE.md). The exact Q21 needs l_commitdate/l_receiptdate
    * (absent); "late" becomes `l_shipdate > o_orderdate + 90 days`. The
    * defining structure is intact: an EXISTS over a lineitem self-join
    * (some OTHER supplier on the same order) AND a NOT-EXISTS over the
    * same self-join restricted to late rows (no OTHER supplier was also
    * late) — semi + anti join over the same key.
    *
    * Scale shape: `late` (lineitem⋈'F'-orders, date residual) is computed
    * once as a 2-column stream; l1 joins supplier and the SF-fixed
    * broadcast nation⋈region key set; then BOTH the EXISTS (left-semi vs
    * all lineitems) and the NOT-EXISTS (left-anti vs late lineitems) key
    * on l_orderkey — one partitioning carries the row through both
    * probes, with only the ≠-supplier residual evaluated post-match. The
    * final agg is over ≤|supplier| groups; count ordering is made total
    * by the unique s_name tie-break. */
  def q21WaitingSuppliersShape(s: SparkSession, dir: String): DataFrame = {
    val ordersF = t(s, dir, "orders")
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val late = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(ordersF, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .select(col("l_orderkey"), col("l_suppkey"))
    val afrNations = t(s, dir, "nation")
      .join(t(s, dir, "region").filter(col("r_name") === "AFRICA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    val l1 = late
      .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(afrNations), col("s_nationkey") === col("n_nationkey"))
    // EXISTS / NOT-EXISTS via per-order MIN/MAX supplier aggregates
    // instead of semi/anti self-joins. Equivalence: the l1 row's own
    // supplier is always IN the order's supplier set (l1 ⊆ lineitem) and
    // in the order's late set (l1 ⊆ late), so
    //   ∃ other supplier on the order    ⇔ min ≠ s ∨ max ≠ s
    //   ∄ other LATE supplier on the order ⇔ min_late = max_late = s,
    // and both inner joins are key-preserving (every l1 orderkey has an
    // aggregate row). Cost: the semi probe shuffled ALL of lineitem and
    // the anti probe re-shuffled `late`; the min/max aggregates are
    // map-side combined to one row per order (guide §2.3 "aggregate
    // before you shuffle") and at bench scale broadcast, so l1 is never
    // shuffled at all.
    val ordSupp = t(s, dir, "lineitem")
      .groupBy(col("l_orderkey").as("o2_orderkey"))
      .agg(min(col("l_suppkey")).as("mn_supp"),
        max(col("l_suppkey")).as("mx_supp"))
    val lateSupp = late
      .groupBy(col("l_orderkey").as("o3_orderkey"))
      .agg(min(col("l_suppkey")).as("mn_late"),
        max(col("l_suppkey")).as("mx_late"))
    l1.join(ordSupp, col("l_orderkey") === col("o2_orderkey"))
      .where(col("mn_supp") =!= col("l_suppkey")
        || col("mx_supp") =!= col("l_suppkey"))
      .join(lateSupp, col("l_orderkey") === col("o3_orderkey"))
      .where(col("mn_late") === col("l_suppkey")
        && col("mx_late") === col("l_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  val q21Sql: String =
    """SELECT s_name, COUNT(*) AS numwait
      |FROM supplier, lineitem l1, orders, nation, region
      |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      |  AND o_orderstatus = 'F'
      |  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3, orders o3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND o3.o_orderkey = l3.l_orderkey
      |                    AND o3.o_orderstatus = 'F'
      |                    AND l3.l_shipdate > o3.o_orderdate
      |                          + INTERVAL 90 DAY)
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'AFRICA'
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 100""".stripMargin

  // --- Q11 SHAPE: fraction-of-total HAVING over a scalar subquery ----------

  /** Q11 SHAPE (important stock identification). The exact Q11 sums
    * partsupp cost×qty (absent); lineitem price×quantity plays the
    * inventory value. The defining structure is intact: a per-part
    * aggregate over ONE geography's suppliers (a region here — a single
    * nation holds <1 supplier at the sf0.001 smoke scale), kept only
    * where it exceeds a FRACTION of the same aggregate's grand total
    * (scalar subquery), ordered by value.
    *
    * Scale shape: the nation filter broadcasts; the one wide shuffle is
    * the per-partkey agg (map-side combined); the grand total is a
    * 1-row broadcast re-using the already-aggregated nval (tiny), so the
    * fact stream is read and shuffled exactly once. The threshold
    * compare is integer fixed-point cross-multiplied
    * (val·1000 > total) — no division, no float boundary. */
  def q11ImportantStockShape(s: SparkSession, dir: String): DataFrame = {
    val eurNations = t(s, dir, "nation")
      .join(t(s, dir, "region").filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    val nval = t(s, dir, "lineitem")
      .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(eurNations), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("l_partkey"))
      .agg(sum(Relational.dec(col("l_extendedprice") * col("l_quantity")))
        .as("val_fp"))
    val total = nval.agg(sum(col("val_fp")).as("total_fp"))
    nval.crossJoin(broadcast(total))
      .filter(col("val_fp") * 1000 > col("total_fp"))
      .select(col("l_partkey"),
        (col("val_fp").cast("double") / 10000.0).as("value"))
      .orderBy(col("value").desc, col("l_partkey"))
  }

  val q11Sql: String =
    """WITH nval AS (
      |  SELECT l_partkey,
      |    SUM(CAST(FLOOR(l_extendedprice * l_quantity * 10000.0 + 0.5)
      |             AS BIGINT)) AS val_fp
      |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |                JOIN nation ON s_nationkey = n_nationkey
      |                JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'EUROPE'
      |  GROUP BY l_partkey)
      |SELECT l_partkey, CAST(val_fp AS DOUBLE) / 10000.0 AS value
      |FROM nval
      |WHERE val_fp * 1000 > (SELECT SUM(val_fp) FROM nval)
      |ORDER BY value DESC, l_partkey""".stripMargin

  // --- Q12 SHAPE: two-way conditional counts by category -------------------

  /** Q12 SHAPE (shipping modes and order priority). The testdata has no
    * l_shipmode (absent along with commit/receipt dates); l_returnflag
    * plays the mode category. The defining structure is intact: a
    * date-windowed orders⋈lineitem join aggregated into TWO conditional
    * counts (urgent-or-high vs the rest) per category.
    *
    * Scale shape: one orderkey-keyed shuffle joins the two facts; the
    * final agg has |categories| groups — map-side combined to nothing. */
  def q12ModePriorityShape(s: SparkSession, dir: String): DataFrame = {
    val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    t(s, dir, "orders")
      .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") >= lit("1997-01-01")
        && col("l_shipdate") < lit("1998-01-01"))
      .groupBy(col("l_returnflag"))
      .agg(sum(when(hi, 1).otherwise(0)).as("high_line_count"),
        sum(when(hi, 0).otherwise(1)).as("low_line_count"))
      .orderBy(col("l_returnflag"))
  }

  val q12Sql: String =
    """SELECT l_returnflag,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
      |           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
      |           THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // --- Q16 SHAPE: distinct-count with NOT-IN supplier exclusion ------------

  /** Q16 SHAPE (parts/supplier relationship). The exact Q16 counts
    * partsupp suppliers (absent); distinct (l_partkey, l_suppkey) pairs
    * from lineitem play the supplier catalog. The defining structure is
    * intact: negated brand/type/size filters, a NOT-IN subquery
    * excluding flagged suppliers (complaints → negative balance here),
    * and COUNT(DISTINCT supplier) per (brand, type, size).
    *
    * Scale shape: the flagged-supplier set is an SF-fixed left-anti
    * broadcast; part filters cut before the join; the distinct count
    * shuffles once on the (brand, type, size) group key with partial
    * dedup map-side. */
  def q16SupplierCntShape(s: SparkSession, dir: String): DataFrame = {
    val flagged = t(s, dir, "supplier")
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    val parts = t(s, dir, "part")
      .filter(col("p_brand") =!= "Brand#1"
        && !col("p_type").like("PROMO%")
        && col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    t(s, dir, "lineitem")
      .join(parts, col("l_partkey") === col("p_partkey"))
      .join(flagged, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  val q16Sql: String =
    """SELECT p_brand, p_type, p_size,
      |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#1' AND p_type NOT LIKE 'PROMO%'
      |  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
      |                        WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  // --- Q17: small-quantity-order revenue ----------------------------------

  /** Q17: average yearly revenue lost if small-quantity orders for one
    * brand's parts were not taken. The correlated subquery
    * `l_quantity < 0.2 * AVG(l_quantity) per part` becomes a per-partkey
    * aggregate joined back to the filtered lineitem — one shuffle on
    * partkey instead of a rescan per row (the reference runs this as
    * subselect_column materialization, core/subselect.cpp). Adaptation:
    * no p_container in the testdata, so the part cut is
    * `p_brand = 'Brand#13' AND p_size < 15`.
    *
    * Scale shape: the filtered part list is SF-fixed per brand (~dozens
    * of keys) and broadcasts into BOTH the per-part average and the
    * lineitem probe, so the partkey aggregate runs over the pruned
    * lineitem slice only — never over the full table. The final result
    * is a 1-row global sum. Fixed-point (×10000) quantities keep the
    * 0.2·avg threshold bit-identical across engines. */
  def q17SmallQtyRevenue(s: SparkSession, dir: String): DataFrame = {
    val parts = t(s, dir, "part")
      .filter(col("p_brand") === "Brand#13" && col("p_size") < 15)
      .select(col("p_partkey"))
    val li = t(s, dir, "lineitem")
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
    // one row per surviving part — bounded by the brand's catalog size,
    // so it broadcasts and the pruned lineitem slice never re-shuffles
    // (the static plan was a sort-merge join exchanging both sides)
    val perPart = li.groupBy(col("l_partkey").as("a_partkey"))
      .agg(davg(col("l_quantity")).as("avg_qty"))
    li.join(broadcast(perPart), col("l_partkey") === col("a_partkey"))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg((dsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"))
  }

  val q17Sql: String =
    s"""SELECT CAST(SUM(${sqlDec("l_extendedprice")}) AS DOUBLE) / 10000.0 / 7.0
      |    AS avg_yearly
      |FROM lineitem
      |JOIN part ON p_partkey = l_partkey
      |JOIN (SELECT l_partkey AS a_partkey, ${sqlDavg("l_quantity", "avg_qty")}
      |      FROM lineitem
      |      WHERE l_partkey IN (SELECT p_partkey FROM part
      |                          WHERE p_brand = 'Brand#13' AND p_size < 15)
      |      GROUP BY l_partkey) pa
      |  ON l_partkey = a_partkey
      |WHERE p_brand = 'Brand#13' AND p_size < 15
      |  AND l_quantity < 0.2 * avg_qty""".stripMargin

  // Registry ---------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q04_order_priority" -> (q04OrderPriority _),
    "q07_volume_shipping" -> (q07VolumeShipping _),
    "q08_market_share" -> (q08MarketShare _),
    "q10_returned_items" -> (q10ReturnedItems _),
    "q13_customer_distribution" -> (q13CustomerDistribution _),
    "q14_promo_revenue" -> (q14PromoRevenue _),
    "q15_top_supplier" -> (q15TopSupplier _),
    "q18_large_volume_customer" -> (q18LargeVolumeCustomer _),
    "q22_idle_customers" -> (q22IdleCustomers _),
    "q09_profit_shape" -> (q09ProfitShape _),
    "q02_min_cost_supplier_shape" -> (q02MinCostSupplierShape _),
    "q20_qualified_suppliers_shape" -> (q20QualifiedSuppliersShape _),
    "q21_waiting_suppliers_shape" -> (q21WaitingSuppliersShape _),
    "q11_important_stock_shape" -> (q11ImportantStockShape _),
    "q12_mode_priority_shape" -> (q12ModePriorityShape _),
    "q16_supplier_cnt_shape" -> (q16SupplierCntShape _),
    "q17_small_qty_revenue" -> (q17SmallQtyRevenue _))

  val oracles: Map[String, String] = Map(
    "q04_order_priority" -> q04Sql,
    "q07_volume_shipping" -> q07Sql,
    "q08_market_share" -> q08Sql,
    "q10_returned_items" -> q10Sql,
    "q13_customer_distribution" -> q13Sql,
    "q14_promo_revenue" -> q14Sql,
    "q15_top_supplier" -> q15Sql,
    "q18_large_volume_customer" -> q18Sql,
    "q22_idle_customers" -> q22Sql,
    "q09_profit_shape" -> q09Sql,
    "q02_min_cost_supplier_shape" -> q02Sql,
    "q20_qualified_suppliers_shape" -> q20Sql,
    "q21_waiting_suppliers_shape" -> q21Sql,
    "q11_important_stock_shape" -> q11Sql,
    "q12_mode_priority_shape" -> q12Sql,
    "q16_supplier_cnt_shape" -> q16Sql,
    "q17_small_qty_revenue" -> q17Sql)
}
