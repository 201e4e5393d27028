package graft

/** Value-parity sweep against the reference's own golden `.result`
  * files: replays a pinned MTR file and, for every deterministic
  * SELECT whose echo + result block the golden records, compares the
  * produced rows (as a sorted multiset, MySQL-rendered) cell for cell
  * with the golden block. This upgrades the corpus claim from
  * success/error parity to VALUE parity wherever the reference's own
  * CI recorded values.
  *
  * Shared by the [[MtrValueSpec]] pin and the `MtrValueSweep` report
  * main (`sbt "Test/runMain graft.MtrValueSweep [file…]"`).
  */
object MtrValueSweep {
  // the engine lives in the MAIN tree (graft.sources.MtrParity) so the
  // driver-facing q_sql_mtr_value_parity gate can pin parity counts;
  // this object keeps the test-tree surface (spec + report main)
  type Mismatch = sources.MtrParity.Mismatch
  type SweepResult = sources.MtrParity.SweepResult
  private val MtrDir = sources.MtrParity.MtrDir

  def renderCell(v: Any): String = sources.MtrParity.renderCell(v)
  def cellEq(exp: String, act: String): Boolean =
    sources.MtrParity.cellEq(exp, act)
  def sweep(file: String,
            session: org.apache.spark.sql.SparkSession): SweepResult =
    sources.MtrParity.sweep(file, session)

  def main(args: Array[String]): Unit = {
    val spark = TestSession.spark
    val files =
      if (args.nonEmpty) args.toSeq
      else new java.io.File(MtrDir).listFiles()
        .map(_.getName).filter(_.endsWith(".test")).sorted.toSeq
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val futs = files.map { f =>
      scala.concurrent.Future((f, scala.util.Try(
        sweep(f, sources.MtrParity.statementSession(spark)))))
    }
    val results = scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(futs),
      scala.concurrent.duration.Duration(90, "min"))
    pool.shutdown()
    var totalCmp = 0
    var totalMis = 0
    var totalFix = 0
    var totalSkew = 0
    results.foreach {
      case (f, scala.util.Success(res)) =>
        totalCmp += res.compared
        totalMis += res.mismatches.length
        totalFix += res.skippedFixture
        totalSkew += res.skippedSkew
        val cls = (if (res.skippedFixture > 0)
          s" fixture_absent=${res.skippedFixture}" else "") +
          (if (res.skippedSkew > 0) s" golden_skew=${res.skippedSkew}"
           else "")
        println(s"XXSWEEP $f compared=${res.compared} " +
          s"mismatch=${res.mismatches.length}$cls")
        res.mismatches.take(3).foreach { m =>
          println(s"  XMIS stmt: ${m.stmt}")
          println(s"    exp: ${m.expected.mkString(" | ").take(200)}")
          println(s"    act: ${m.actual.mkString(" | ").take(200)}")
        }
      case (f, scala.util.Failure(e)) =>
        println(s"XXSWEEP $f ABORTED " +
          String.valueOf(e.getMessage).take(120))
    }
    println(s"XXTOTAL compared=$totalCmp mismatches=$totalMis " +
      s"fixture_absent=$totalFix golden_skew=$totalSkew")
    spark.stop()
  }
}
