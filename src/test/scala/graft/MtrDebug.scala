package graft

/** Developer tool: replay ONE reference MTR file through a fresh
  * StatementRunner and print parity failures with the offending
  * statement — the fast loop for diagnosing a corpus regression
  * without the 25-minute full MtrReplaySpec sweep.
  *
  *   sbt "Test/runMain graft.MtrDebug trigger.test flag"   // flag =
  *     SET tianmu_no_key_error=ON (the disabled-trigger-file prologue)
  *   sbt "Test/runMain graft.MtrDebug select.test x all"   // all =
  *     keep going after the first failure
  *
  * NOTE: runs every statement (no out-of-scope skip), so LFS-fixture
  * LOADs that the suite skips will report here as failures. */
object MtrDebug {
  private val MtrDir = "/root/reference/mysql-test/suite/tianmu/t"

  def parseMtr(path: String): Seq[(String, Boolean)] = {
    val out = scala.collection.mutable.ArrayBuffer[(String, Boolean)]()
    val cur = new StringBuilder
    var expectError = false
    var delim = ";"
    val ClientCmd =
      """(?i)^(connect\b|connection\b|disconnect\b|let\b|inc\b|dec\b|sleep\b|real_sleep\b|source\b|echo\b|exit\b|die\b|while\b|if\b|(?:disable|enable)_\w+\b|\{|\})""".r
    val DelimiterCmd = """(?i)^delimiter\s+(\S+).*$""".r
    var inBlockComment = false
    implicit val codec: scala.io.Codec = scala.io.Codec.UTF8
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
    val src = scala.io.Source.fromFile(path)
    try src.getLines().foreach { rawLine =>
      var line = rawLine
      if (inBlockComment) {
        val end = line.indexOf("*/")
        if (end >= 0) { line = line.substring(end + 2); inBlockComment = false }
        else line = ""
      }
      line = line.replaceAll("""/\*.*?\*/""", "")
      val openIdx = line.indexOf("/*")
      if (openIdx >= 0) { line = line.substring(0, openIdx); inBlockComment = true }
      val t = line.trim
      if (t.isEmpty) ()
      else if (t.startsWith("#")) {
        if ("""(?i)^#\s*(select|insert|update|delete|create|drop|alter|load|set|show)\b""".r
          .findFirstIn(t).isDefined) expectError = false
      }
      else if (t.startsWith("--")) {
        if (t.matches("(?i)--\\s*error\\b.*")) expectError = true
        else """(?i)^--\s*delimiter\s+(\S+)""".r.findFirstMatchIn(t)
          .foreach { m =>
            delim = m.group(1).stripSuffix(";") match {
              case "" => ";"; case x => x
            }
          }
      } else if (cur.isEmpty && DelimiterCmd.findFirstMatchIn(t).isDefined) {
        val d = DelimiterCmd.findFirstMatchIn(t).get.group(1)
        delim = d.stripSuffix(delim).stripSuffix(";") match {
          case "" => ";"; case x => x
        }
      } else if (cur.isEmpty && ClientCmd.findFirstIn(t).isDefined) ()
      else {
        val effective =
          if (delim == ";") t.replaceFirst(";\\s*#[^'\"]*$", ";") else t
        cur.append(
          if (effective != t) line.replaceFirst(";\\s*#[^'\"]*$", ";")
          else line).append('\n')
        if (effective.endsWith(delim)) {
          val stmt = cur.toString.trim.stripSuffix(delim)
            .replaceFirst("(?is)^eval\\s+", "")
            .replace("$MYSQL_TEST_DIR", "/root/reference/mysql-test")
          out += ((stmt, expectError))
          cur.clear()
          expectError = false
        }
      }
    } finally src.close()
    out.toSeq
  }

  def main(args: Array[String]): Unit = {
    val file = args(0)
    val flagOn = args.length > 1 && args(1) == "flag"
    val stopAtFirst = args.length <= 2 || args(2) != "all"
    val spark = TestSession.spark
    val runner = new sources.StatementRunner(
      sources.MtrParity.statementSession(spark))
    if (flagOn) runner.run("SET SESSION tianmu_no_key_error=ON")
    val opt = new java.io.File(s"$MtrDir/${file.stripSuffix(".test")}-master.opt")
    if (opt.exists()) {
      val src = scala.io.Source.fromFile(opt)
      val txt = try src.mkString finally src.close()
      txt.split("--").map(_.trim).filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        scala.util.Try(runner.run(s"SET SESSION $k=$v").collect())
      }
    }
    var n = 0
    var bad = 0
    parseMtr(s"$MtrDir/$file").foreach { case (stmt, expectsError) =>
      n += 1
      if (bad == 0 || !stopAtFirst) {
        val result = scala.util.Try(runner.run(stmt).collect())
        if (expectsError && result.isSuccess) {
          println(s"XXFAIL#$n expected error, got success:\n$stmt\n")
          bad += 1
        } else if (!expectsError && result.isFailure) {
          println(s"XXFAIL#$n unexpected failure:\n$stmt\n  -> " +
            result.failed.get.toString.take(400) + "\n")
          bad += 1
        }
      }
    }
    println(s"XXDONE stmts=$n failures=$bad")
    spark.stop()
  }
}
