package graft

object Scratch2 {
  def main(args: Array[String]): Unit = {
    val spark = TestSession.spark
    val r = new sources.StatementRunner(spark)
    val stmts = Seq(
      "create table bit2(a bit(8), b bit(11)) engine=tianmu DEFAULT CHARSET=utf8mb4",
      "insert into bit2 values(b'10111', b'1011')",
      "insert into bit2 values(b'10111111', b'1011000')",
      "select strcmp(a,b), strcmp(b,a), strcmp(a,a) from bit2",
      "select charset(binary a), collation(binary b) from bit2",
      "SELECT ~18446744073709551615.0 AS c1",
      "SELECT ~18446744073709551615e0 AS c1")
    stmts.foreach { sql =>
      System.err.println(">>> " + sql.take(90))
      scala.util.Try { r.run(sql).collect() } match {
        case scala.util.Success(rows) if sql.trim.toUpperCase.startsWith("SEL") =>
          rows.foreach(row => System.err.println("   " + row.toSeq.mkString("\t")))
        case scala.util.Failure(e) =>
          System.err.println("   FAIL: " + e.toString.take(250))
        case _ =>
      }
    }
    System.err.println("DONE")
  }
}
