package graft

object Scratch2 {
  def main(args: Array[String]): Unit = {
    val spark = TestSession.spark
    val r = new sources.StatementRunner(spark)
    Seq(
      "create table bit2(a bit(8), b bit(11)) engine=tianmu DEFAULT CHARSET=utf8mb4",
      "insert into bit2 values(b'10111', b'1011')",
      "select abs(-a), abs(a), acos(b), asin(a), atan(b),atan2(a),ceil(a+0.1), ceiling(a+0.2),conv(a, 16,2), conv(a, 16, 10), conv(a, 16, 16) from bit2",
      "SELECT WEEK('2020-10-12')",
      "SELECT YEARWEEK('1020-10-12')",
      "CREATE TABLE t1 (a datetime)",
      "CREATE TABLE t2 (a timestamp)",
      "INSERT INTO t1 VALUES ('2022-08-20 12:00:00')",
      "INSERT INTO t2 VALUES ('2021-07-20 12:30:00')",
      "SELECT a FROM t2 UNION SELECT a FROM t1",
      "SELECT a FROM t1 UNION SELECT a FROM t2")
    .foreach { sql =>
      System.err.println(">>> " + sql.take(80))
      scala.util.Try { r.run(sql).collect() } match {
        case scala.util.Success(rows) if sql.trim.startsWith("S") =>
          rows.foreach(row => System.err.println("   " + row.toSeq.mkString(",")))
        case scala.util.Failure(e) =>
          System.err.println("   FAIL: " + e.toString.take(300))
        case _ =>
      }
    }
    System.err.println("DONE")
  }
}
