package graft

/** Scratch repro harness (not part of the suite). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = TestSession.spark
    val dir = "/root/testdata/sf0.01"
    println("=== q_sql_multi_table_dml")
    sources.Statements.qSqlMultiTableDml(spark, dir)
      .orderBy("region_name").show(30, false)
    println("=== q_sql_session_forms")
    sources.Statements.qSqlSessionForms(spark, dir)
      .orderBy("k").show(30, false)
  }
}
