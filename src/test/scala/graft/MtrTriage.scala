package graft

/** Triage harness (test scope, not shipped): attempts to replay every
  * reference MTR file NOT in the pinned corpus and prints the first
  * failing statement per file, so corpus growth targets the real
  * boundaries instead of guessing. Run:
  * `sbt "Test/runMain graft.MtrTriage"`. */
object MtrTriage {
  private val MtrDir = "/root/reference/mysql-test/suite/tianmu/t"

  def main(args: Array[String]): Unit = {
    val spark = TestSession.spark
    val pinned = classOf[MtrReplaySpec]
    val spec = new MtrReplaySpec
    // reflectively reuse the spec's parser + scope predicate
    val parse = pinned.getDeclaredMethod("parseMtr", classOf[String])
    parse.setAccessible(true)
    val oos = pinned.getDeclaredMethod("outOfScope", classOf[String])
    oos.setAccessible(true)
    val pinnedNames = {
      val f = pinned.getDeclaredField("PinnedFiles")
      f.setAccessible(true)
      f.get(spec).asInstanceOf[Seq[(String, Int, Int)]].map(_._1).toSet +
        "truncate_table.test"
    }
    val all = new java.io.File(MtrDir).listFiles()
      .filter(_.getName.endsWith(".test")).map(_.getName).sorted
      .filterNot(pinnedNames)
    val only: Seq[String] = if (args.nonEmpty) args.toSeq else all.toSeq
    val okCount = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val futs = only.map { file => scala.concurrent.Future {
      triageOne(file, sources.MtrParity.statementSession(spark), parse, oos,
        spec, okCount)
    } }
    scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(futs),
      scala.concurrent.duration.Duration(120, "min"))
    pool.shutdown()
    println(s"TRIAGE TOTAL: ${only.length} tried, ${okCount.get} clean")
  }

  private def triageOne(file: String,
      spark: org.apache.spark.sql.SparkSession,
      parse: java.lang.reflect.Method, oos: java.lang.reflect.Method,
      spec: MtrReplaySpec,
      okCount: java.util.concurrent.atomic.AtomicInteger): Unit = {
    {
      val runner = new sources.StatementRunner(spark)
      // apply <file>-master.opt server flags, like replay() does
      val opt = new java.io.File(
        s"$MtrDir/${file.stripSuffix(".test")}-master.opt")
      if (opt.exists()) {
        val osrc = scala.io.Source.fromFile(opt)
        val txt = try osrc.mkString finally osrc.close()
        txt.split("--").map(_.trim).filter(_.contains("=")).foreach { kv =>
          val Array(k, v) = kv.split("=", 2)
          scala.util.Try(runner.run(s"SET SESSION $k=$v").collect())
        }
      }
      val stmts = scala.util.Try(
        parse.invoke(spec, s"$MtrDir/$file")
          .asInstanceOf[Seq[(String, Boolean)]]).getOrElse(Seq.empty)
      if (stmts.isEmpty) println(s"TRIAGE $file: PARSE-EMPTY")
      else {
        var failed: Option[String] = None
        var ran = 0
        var skipped = 0
        val it = stmts.iterator
        while (failed.isEmpty && it.hasNext) {
          val (stmt, expectsError) = it.next()
          if (oos.invoke(spec, stmt).asInstanceOf[Boolean]) skipped += 1
          else {
            val r = scala.util.Try(runner.run(stmt).collect())
            if (expectsError && r.isSuccess)
              failed = Some(s"EXPECTED-ERROR-GOT-SUCCESS: $stmt")
            else if (!expectsError && r.isFailure)
              failed = Some(s"FAIL: $stmt ||| " +
                r.failed.get.toString.replace('\n', ' ').take(200))
            else ran += 1
          }
        }
        failed match {
          case None =>
            okCount.incrementAndGet()
            println(s"TRIAGE $file: OK ran=$ran skipped=$skipped")
          case Some(msg) =>
            println(s"TRIAGE $file: at stmt ${ran + 1} " +
              msg.replace('\n', ' ').take(900))
        }
      }
    }
  }
}
