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
  private val MtrDir = "/root/reference/mysql-test/suite/tianmu/t"
  private val ResDir = "/root/reference/mysql-test/suite/tianmu/r"

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
    val stmts = MtrDebug.parseMtr(s"$MtrDir/$file")
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

    val runner = new sources.StatementRunner(session)
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
        sweep(f, spark.newSession()))))
    }
    val results = scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(futs),
      scala.concurrent.duration.Duration(90, "min"))
    pool.shutdown()
    var totalCmp = 0
    var totalMis = 0
    results.foreach {
      case (f, scala.util.Success(res)) =>
        totalCmp += res.compared
        totalMis += res.mismatches.length
        println(s"XXSWEEP $f compared=${res.compared} " +
          s"mismatch=${res.mismatches.length}")
        res.mismatches.take(3).foreach { m =>
          println(s"  XMIS stmt: ${m.stmt}")
          println(s"    exp: ${m.expected.mkString(" | ").take(200)}")
          println(s"    act: ${m.actual.mkString(" | ").take(200)}")
        }
      case (f, scala.util.Failure(e)) =>
        println(s"XXSWEEP $f ABORTED " +
          String.valueOf(e.getMessage).take(120))
    }
    println(s"XXTOTAL compared=$totalCmp mismatches=$totalMis")
    spark.stop()
  }
}
