package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SQL entry point: registered views + custom functions callable from
  * spark.sql — the dialect surface a reference user would migrate to. */
class SqlSurfaceSpec extends AnyFunSuite {
  private def spark = TestSession.spark
  private val sf = TestSession.sf

  test("registerAll exposes every table and the custom functions") {
    Engine.registerAll(spark, sf)
    val row = spark.sql(
      """SELECT r_name, group_concat(n_name) AS nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name LIMIT 1""".stripMargin).first()
    assert(row.getString(1).split(",").nonEmpty)
    val sh = spark.sql(
      "SELECT simhash64(text) AS h FROM documents LIMIT 3").collect()
    assert(sh.forall(r => r.getLong(0) != 0L))
  }

  test("SQL group_concat truncates at the MySQL default max_len") {
    Engine.registerAll(spark, sf)
    val row = spark.sql(
      """SELECT length(group_concat(c_name)) AS len, count(*) AS n
        |FROM customer""".stripMargin).first()
    // all customer names far exceed 1024 chars; the registered SQL
    // function must apply group_concat_max_len (MySQL default 1024)
    assert(row.getAs[Long]("n") * 18 > functions.Registry.GroupConcatMaxLen)
    assert(row.getAs[Int]("len") === functions.Registry.GroupConcatMaxLen)
  }

  test("simhash is stable and near-identical texts collide closely") {
    Engine.registerAll(spark, sf)
    val h = spark.sql(
      """SELECT bit_count(simhash64('the quick brown fox jumps') ^
        |                 simhash64('the quick brown fox jumped')) AS d,
        |        bit_count(simhash64('the quick brown fox jumps') ^
        |                 simhash64('completely unrelated words here')) AS far
        |""".stripMargin).first()
    assert(h.getAs[Int]("d") < h.getAs[Int]("far"))
  }

  test("full TPC-H-style SQL runs through the view catalog") {
    Engine.registerAll(spark, sf)
    val n = spark.sql(
      """SELECT l_returnflag, count(*) n FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |GROUP BY l_returnflag""".stripMargin).count()
    assert(n > 0)
  }

  test("CREATE VIEW / temp tables work through plain SQL (create_view tier)") {
    Engine.registerAll(spark, sf)
    spark.sql("""CREATE OR REPLACE TEMPORARY VIEW rich_customers AS
      |SELECT c_custkey, c_name, c_acctbal FROM customer
      |WHERE c_acctbal > 5000""".stripMargin)
    val viaView = spark.sql(
      "SELECT count(*) FROM rich_customers").first().getLong(0)
    val direct = Engine.table(spark, sf, "customer")
      .filter(org.apache.spark.sql.functions.col("c_acctbal") > 5000).count()
    assert(viaView === direct && viaView > 0)
    // view composes with joins like a base table
    val joined = spark.sql("""SELECT count(*) FROM rich_customers r
      |JOIN orders o ON r.c_custkey = o.o_custkey""".stripMargin)
      .first().getLong(0)
    assert(joined > 0)
  }

  test("dedup kernels are SQL-callable and consistent with each other") {
    Engine.registerAll(spark, sf)
    val r = spark.sql(
      """SELECT jaccard_long(mh.hs, mh.hs) AS self_jac,
        |       sig_agree(mh.sig, mh.sig) AS self_agree,
        |       size(band_hashes64(mh.sig)) AS n_bands
        |FROM (SELECT minhash_shingle_sig(lower(text)) AS mh
        |      FROM documents LIMIT 5)""".stripMargin).collect()
    r.foreach { row =>
      assert(row.getAs[Double]("self_jac") === 1.0)
      assert(row.getAs[Int]("self_agree") === 32)
      assert(row.getAs[Int]("n_bands") === 8)
    }
  }
}
