package graft

/** Scratch repro harness (not part of the suite). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = TestSession.spark
    val r = new sources.StatementRunner(spark)
    val stmts = Seq(
      "CREATE TABLE cs1 (d1 INT PRIMARY KEY, d2 INT) ENGINE=TIANMU",
      "INSERT INTO cs1 VALUES (33, 66), (77, 55)",
      "set sql_safe_updates=1",
      "DELETE FROM cs1 WHERE d1 != 33",
      "set sql_safe_updates=0",
      """CREATE TABLE t1 (date char(30), format char(30) not null)""",
      """insert into t1 values ('2003-01-02 10:11:12 PM', '%Y-%m-%d %H:%i:%S %p'), ('2003-01-02 10:11:12.123456', '%Y-%m-%d %h:%i:%S %p'), ('2003-01-02 10:11:12AM', '%Y-%m-%d %h:%i:%S.%f %p'), ('2003-01-02 10:11:12AN', '%Y-%m-%d %h:%i:%S%p'), ('2003-01-02 10:11:12 PM', '%y-%m-%d %H:%i:%S %p'), ('10:20:10AM', '%H:%i:%s%p')""")
    stmts.foreach { s =>
      println("=== STMT: " + s.take(90))
      try { r.run(s).show(3, false) }
      catch { case e: Throwable =>
        println("ERR " + e.getClass.getName + ": " +
          String.valueOf(e.getMessage).take(400)) }
    }
  }
}
