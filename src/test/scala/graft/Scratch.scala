package graft

/** Scratch repro harness (not part of the suite). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = TestSession.spark
    val r = new sources.StatementRunner(spark)
    r.run("SET sql_mode = 'NO_ENGINE_SUBSTITUTION'")
    r.run("""create table t1 (a int not null auto_increment,
      primary key (a),
      t timestamp NOT NULL DEFAULT CURRENT_TIMESTAMP ON UPDATE CURRENT_TIMESTAMP,
      c char(10) default "hello", i int)engine=tianmu""")
    try {
      r.run("""insert into t1 values (default,default,default,default), (default,default,default,default), (4,0,"a",5),(default,default,default,default)""")
      r.run("select a,t>0,c,i from t1").orderBy("a").show(10, false)
    } catch { case e: Throwable => println("FAIL: " + e) }
  }
}
