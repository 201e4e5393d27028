package graft

/** Scratch repro harness (not part of the suite). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = TestSession.spark
    val file = args.headOption.getOrElse("func_math.test")
    val spec = new MtrReplaySpec
    val parse = classOf[MtrReplaySpec].getDeclaredMethod("parseMtr", classOf[String])
    parse.setAccessible(true)
    val stmts = parse.invoke(spec,
      s"/root/reference/mysql-test/suite/tianmu/t/$file")
      .asInstanceOf[Seq[(String, Boolean)]]
    val r = new sources.StatementRunner(spark)
    stmts.zipWithIndex.foreach { case ((sql, expErr), i) =>
      val t0 = System.nanoTime()
      System.err.println(s"[$i] ${sql.take(90).replace('\n', ' ')}")
      val res = scala.util.Try { r.run(sql).collect() }
      val ms = (System.nanoTime() - t0) / 1000000
      if (ms > 3000) System.err.println(s"    SLOW ${ms}ms")
      (res.isFailure, expErr) match {
        case (false, true) => System.err.println(s"    EXPECTED-ERROR-GOT-SUCCESS")
        case (true, false) => System.err.println(
          s"    FAIL: ${res.failed.get.toString.take(160)}")
        case _ =>
      }
    }
    System.err.println("DONE")
  }
}
