package graft.operators

import graft.Engine
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Display-format tier (reference: mysql-test/suite/tianmu/t/zerofill.test
  * and select_precision.test): MySQL's ZEROFILL display-width padding and
  * SELECT-time rounding/precision conventions, re-expressed as explicit
  * format expressions — a Spark library has no column display attribute,
  * so the format is a projection the caller applies (the same stance as
  * CsvLoader's LOAD DATA surface: semantics as API, not server state).
  *
  * Scale shape: both gates are pure codegen'd projections over one scan —
  * no shuffle except the presentation sort.
  */
object Display {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Engine.table(s, dir, n)

  /** MySQL ZEROFILL display rule (zerofill.test st1-st4): left-pad with
    * zeros to the display width, but NEVER truncate a value wider than
    * the width (INT(8) ZEROFILL shows 123456789 as-is). */
  def zerofill(c: Column, width: Int): Column = {
    val str = c.cast("string")
    when(length(str) >= width, str).otherwise(lpad(str, width, "0"))
  }

  private def sqlZerofill(e: String, width: Int): String =
    s"CASE WHEN length(CAST($e AS VARCHAR)) >= $width THEN CAST($e AS VARCHAR) " +
      s"ELSE lpad(CAST($e AS VARCHAR), $width, '0') END"

  /** zerofill.test shapes on orders: INT(8) ZEROFILL keys (some values
    * wider than 8 stay untruncated — the st1 123456789 case), INT(2)
    * ZEROFILL month/day (the st4 shape), and arithmetic on a zerofilled
    * column loses the padding (st2's `SELECT val+1`). */
  def qDisplayZerofill(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"),
        zerofill(col("o_orderkey"), 8).as("ok_z8"),
        zerofill(col("o_custkey"), 3).as("ck_z3"),
        zerofill(month(col("o_orderdate")), 2).as("mon_z2"),
        zerofill(dayofmonth(col("o_orderdate")), 2).as("day_z2"),
        (col("o_custkey") + 1).as("ck_plus1"))
      .orderBy(col("o_orderkey"))

  val qDisplayZerofillSql: String =
    s"""SELECT o_orderkey,
      |  ${sqlZerofill("o_orderkey", 8)} AS ok_z8,
      |  ${sqlZerofill("o_custkey", 3)} AS ck_z3,
      |  ${sqlZerofill("month(o_orderdate)", 2)} AS mon_z2,
      |  ${sqlZerofill("day(o_orderdate)", 2)} AS day_z2,
      |  o_custkey + 1 AS ck_plus1
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  /** select_precision.test shapes: ROUND at positive, zero, and NEGATIVE
    * scales (the t1 ROUND battery), plus the literal-precision
    * conventions — exact DECIMAL literal arithmetic ((.1 + .2) = .3 is
    * TRUE in decimal, FALSE in binary double) and multiplication/
    * division result scales (.01 * .01, .1 / .1).
    *
    * Oracle-robustness convention: every ROUND runs on DECIMAL(12,2)
    * (the cents grid is exact there), because decimal rounding is
    * integer arithmetic with ties-away-from-zero in BOTH engines at
    * every version — double ROUND tie-breaking is library-dependent
    * (round(1234.5) is a representable tie). Round results and the
    * dec_mul/dec_div scale probes export as DOUBLE so the driver hashes
    * one value representation; the decimal-vs-double exactness CLAIM is
    * carried by the dec_eq/dbl_eq booleans, which stay in-engine. */
  def qDisplayPrecision(s: SparkSession, dir: String): DataFrame = {
    val dec = col("l_extendedprice").cast("decimal(12,2)")
    t(s, dir, "lineitem")
      .filter(col("l_orderkey") < 200)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice").as("price"),
        round(dec).cast("double").as("r0"),
        round(dec, 1).cast("double").as("r1"),
        round(dec, -1).cast("double").as("rm1"),
        round(dec, -2).cast("double").as("rm2"),
        round(dec, 3).cast("double").as("r3"),
        (expr("CAST(0.1 AS DECIMAL(2,1)) + CAST(0.2 AS DECIMAL(2,1))")
          === expr("CAST(0.3 AS DECIMAL(2,1))")).as("dec_eq"),
        (lit(0.1) + lit(0.2) === lit(0.3)).as("dbl_eq"),
        expr("CAST(CAST(CAST(0.01 AS DECIMAL(3,2)) * CAST(0.01 AS DECIMAL(3,2)) AS DECIMAL(6,4)) AS DOUBLE)")
          .as("dec_mul"),
        expr("CAST(CAST(CAST(0.1 AS DECIMAL(2,1)) / CAST(0.1 AS DECIMAL(2,1)) AS DECIMAL(8,4)) AS DOUBLE)")
          .as("dec_div"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  val qDisplayPrecisionSql: String =
    """SELECT l_orderkey, l_linenumber,
      |  l_extendedprice AS price,
      |  CAST(round(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS r0,
      |  CAST(round(CAST(l_extendedprice AS DECIMAL(12,2)), 1) AS DOUBLE) AS r1,
      |  CAST(round(CAST(l_extendedprice AS DECIMAL(12,2)), -1) AS DOUBLE) AS rm1,
      |  CAST(round(CAST(l_extendedprice AS DECIMAL(12,2)), -2) AS DOUBLE) AS rm2,
      |  CAST(round(CAST(l_extendedprice AS DECIMAL(12,2)), 3) AS DOUBLE) AS r3,
      |  CAST(0.1 AS DECIMAL(2,1)) + CAST(0.2 AS DECIMAL(2,1))
      |    = CAST(0.3 AS DECIMAL(2,1)) AS dec_eq,
      |  CAST(0.1 AS DOUBLE) + CAST(0.2 AS DOUBLE)
      |    = CAST(0.3 AS DOUBLE) AS dbl_eq,
      |  CAST(CAST(CAST(0.01 AS DECIMAL(3,2)) * CAST(0.01 AS DECIMAL(3,2))
      |       AS DECIMAL(6,4)) AS DOUBLE) AS dec_mul,
      |  CAST(CAST(CAST(0.1 AS DECIMAL(2,1)) / CAST(0.1 AS DECIMAL(2,1))
      |       AS DECIMAL(8,4)) AS DOUBLE) AS dec_div
      |FROM lineitem
      |WHERE l_orderkey < 200
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_display_zerofill" -> (qDisplayZerofill _),
    "q_display_precision" -> (qDisplayPrecision _))

  val oracles: Map[String, String] = Map(
    "q_display_zerofill" -> qDisplayZerofillSql,
    "q_display_precision" -> qDisplayPrecisionSql)
}
