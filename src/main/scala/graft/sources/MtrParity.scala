package graft.sources

/** Value-parity engine against the reference's own golden `.result`
  * files (mysql-test/suite/tianmu — the reference's CI corpus): parse
  * an MTR `.test` file into statements, replay them through a
  * [[StatementRunner]], and compare every deterministic SELECT's rows
  * cell-for-cell (multiset, MySQL-rendered, numeric-tolerant for the
  * float-print variants) with the block the golden records.
  *
  * Lives in the MAIN tree so the driver-facing gate surface
  * (`q_sql_mtr_value_parity`) can pin parity counts in the per-round
  * correctness artifact; the test tree's MtrValueSweep/MtrValueSpec/
  * MtrDebug delegate here.
  */
object MtrParity {
  val MtrDir = "/root/reference/mysql-test/suite/tianmu/t"
  val ResDir = "/root/reference/mysql-test/suite/tianmu/r"

  /** Statements whose output is inherently nondeterministic or
    * session-dependent — never value-compared. */
  private val NonDeterministic =
    ("""(?is)\b(now|curdate|curtime|current_date|current_time|""" +
      """current_timestamp|sysdate|rand|uuid|uuid_short|user|""" +
      """current_user|session_user|system_user|version|connection_id|""" +
      """database|schema|benchmark|sleep|found_rows|row_count|""" +
      """last_insert_id|get_lock|release_lock)\s*\(|@|\binformation_schema\b""").r

  case class Mismatch(file: String, stmt: String, expected: Seq[String],
                      actual: Seq[String])
  case class SweepResult(file: String, compared: Int,
                         mismatches: Seq[Mismatch])

  /** Parse one MTR `.test` file into (statement, expectsError) pairs —
    * the statement grammar of mysqltest: `--error` annotations,
    * `delimiter` switches, client commands skipped, block comments. */
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

  /** MySQL-style rendering of one result cell. */
  def renderCell(v: Any): String = v match {
    case null => "NULL"
    case s: String => s
    case b: Boolean => if (b) "1" else "0"
    case d: java.math.BigDecimal => d.toPlainString
    case d: BigDecimal => d.bigDecimal.toPlainString
    case t: java.sql.Timestamp => t.toString.replaceAll("\\.0+$", "")
    case d: java.sql.Date => d.toString
    case t: java.time.LocalDateTime =>
      t.toString.replace('T', ' ').replaceAll("\\.0+$", "")
    case b: Array[Byte] =>
      new String(b, java.nio.charset.StandardCharsets.UTF_8)
    case f: java.lang.Float => f.toString
    case other => other.toString
  }

  /** Cell equality: literal match, or numeric match with a small
    * relative tolerance (MySQL prints FLOAT/DOUBLE at 6/17 significant
    * digits — '-7.40287e18' vs -7.402866E18 must compare equal). */
  def cellEq(exp: String, act: String): Boolean = {
    if (exp == act) return true
    val numRe = """^-?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?$""".r
    (numRe.findFirstIn(exp.trim), numRe.findFirstIn(act.trim)) match {
      case (Some(_), Some(_)) =>
        val e = BigDecimal(exp.trim)
        val a = BigDecimal(act.trim)
        if (e == a) true
        else if (e.signum == 0 || a.signum == 0) (e - a).abs < 1e-9
        // MySQL prints exact-type AVG and friends at +4 decimal scale
        // (AVG(DISTINCT a) = '2.6667' for 8/3), so the golden itself
        // carries up to ~5e-5 relative rounding
        else ((e - a).abs / e.abs.max(a.abs)) < BigDecimal("6e-5")
      case _ => false
    }
  }

  private def rowEq(exp: String, act: String): Boolean = {
    val es = exp.split("\t", -1)
    val as = act.split("\t", -1)
    es.length == as.length && es.zip(as).forall((cellEq _).tupled)
  }

  /** Replay `file`, comparing every eligible SELECT's rows against the
    * golden result block. */
  def sweep(file: String,
            session: org.apache.spark.sql.SparkSession): SweepResult = {
    val stmts = parseMtr(s"$MtrDir/$file")
    val resFile = new java.io.File(ResDir,
      file.stripSuffix(".test") + ".result")
    if (!resFile.exists()) return SweepResult(file, 0, Seq.empty)
    implicit val codec: scala.io.Codec = scala.io.Codec.UTF8
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
    val src = scala.io.Source.fromFile(resFile)
    val lines = try src.getLines().toVector finally src.close()
    // `--echo` directive output lands verbatim in the golden (the
    // replication files print "[on slave]" banners) — never rows
    val echoTexts: Set[String] = {
      val tsrc = scala.io.Source.fromFile(s"$MtrDir/$file")
      try tsrc.getLines().flatMap(l =>
        """(?i)^\s*--\s*echo\s?(.*)$""".r.findFirstMatchIn(l.trim)
          .map(_.group(1).trim)).toSet
      finally tsrc.close()
    }

    // align: find each statement's echo (line-by-line trimmed match);
    // the block between echo end and the next echo start is its output
    val echoAt = new Array[Int](stmts.length)
    val echoLen = new Array[Int](stmts.length)
    var cursor = 0
    // the golden echoes statements WITH their terminating `;` (and
    // with the delimiter-form terminator stripped) — normalize both
    def norm(l: String) = l.trim.stripSuffix(";").trim
    stmts.zipWithIndex.foreach { case ((stmt, _), i) =>
      val sl = stmt.split("\n").map(norm).filter(_.nonEmpty)
      var found = -1
      var p = cursor
      while (found < 0 && p <= lines.length - sl.length) {
        if (sl.indices.forall(k => norm(lines(p + k)) == sl(k))) found = p
        else p += 1
      }
      if (found >= 0) {
        echoAt(i) = found
        echoLen(i) = sl.length
        cursor = found + sl.length
      } else { echoAt(i) = -1; echoLen(i) = 0 }
    }

    val runner = new StatementRunner(session)
    if (Set("trigger.test", "issue364.test", "issue581.test")
        .contains(file))
      runner.run("SET SESSION tianmu_no_key_error=ON")
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

    var compared = 0
    val mismatches = scala.collection.mutable.ArrayBuffer[Mismatch]()
    stmts.zipWithIndex.foreach { case ((stmt, expectsError), i) =>
      val isSelect =
        """(?is)^\s*select\b""".r.findFirstIn(stmt).isDefined &&
          """(?i)\binto\b""".r.findFirstIn(stmt).isEmpty
      val deterministic = NonDeterministic.findFirstIn(stmt).isEmpty
      val comparable = isSelect && !expectsError && deterministic &&
        echoAt(i) >= 0 && i + 1 < stmts.length
      val result = scala.util.Try(runner.run(stmt).collect())
      if (comparable && result.isSuccess) {
        // the golden block: echo end → next echoed statement
        val next = (i + 1 until stmts.length).find(echoAt(_) >= 0)
          .map(echoAt(_)).getOrElse(lines.length)
        val blockEnd = math.max(echoAt(i) + echoLen(i), math.min(next, lines.length))
        var block = lines.slice(echoAt(i) + echoLen(i), blockEnd)
        // strip warnings sections and error echoes
        val wIdx = block.indexWhere(_.trim == "Warnings:")
        if (wIdx >= 0) block = block.take(wIdx)
        block = block.filterNot(l =>
          """^(Warning|Note|Error)\t\d+\t""".r.findFirstIn(l).isDefined ||
            l.startsWith("ERROR ") || echoTexts.contains(l.trim) ||
            l.startsWith("include/"))
        // a MULTI-line statement's echo can align on fewer lines than
        // the golden actually echoed (whitespace variants) — strip any
        // leftover echoed fragment of THIS statement from the block
        val stmtLines = stmt.split("\n").map(norm).filter(_.nonEmpty).toSet
        block = block.filterNot(l => stmtLines.contains(norm(l)))
        if (block.nonEmpty) {
          val expected = block.drop(1) // header row
          val actual = result.get.map(r =>
            (0 until r.length).map(k => renderCell(r.get(k)))
              .mkString("\t")).toSeq
          compared += 1
          // multiset matching under cellEq (a sort-then-zip pairs the
          // wrong rows when rendering variants reorder lexically:
          // '…e108' vs '…E108')
          val ok =
            if (expected.length != actual.length) false
            else {
              val remaining =
                scala.collection.mutable.ArrayBuffer(actual: _*)
              expected.forall { e =>
                val at = remaining.indexWhere(a => rowEq(e, a))
                if (at < 0) false
                else { remaining.remove(at); true }
              }
            }
          if (!ok) mismatches += Mismatch(file, stmt.take(120),
            expected.sorted.take(5), actual.sorted.take(5))
        }
      }
    }
    SweepResult(file, compared, mismatches.toSeq)
  }
}
