package graft

import org.scalatest.funsuite.AnyFunSuite

/** Replays an ACTUAL reference MTR test file, statement for statement,
  * through [[sources.StatementRunner]] — the strongest form of the
  * "a user of the reference could switch" claim: the reference's own
  * test script runs with success/error parity. MTR client directives
  * (`--echo`, `--source`, `connect`/`connection`, …) are client-side
  * and skipped; `--error N` lines flip the expectation for the next
  * statement (it must THROW). Statements exercising server-side
  * machinery this library deliberately does not carry (stored
  * procedures — SURVEY §2.13: the reference itself routes them to
  * MySQL, not to its engine) are skipped via an explicit, visible
  * predicate. Everything else must behave: unexpected success where an
  * error is pinned, or any error where success is pinned, fails the
  * suite naming the statement. */
class MtrReplaySpec extends AnyFunSuite {
  private def spark = TestSession.spark

  private val MtrDir = "/root/reference/mysql-test/suite/tianmu/t"

  /** (statement text, expectsError) pairs from an MTR .test file. */
  private def parseMtr(path: String): Seq[(String, Boolean)] = {
    val out = scala.collection.mutable.ArrayBuffer[(String, Boolean)]()
    val cur = new StringBuilder
    var expectError = false
    val src = scala.io.Source.fromFile(path)
    try src.getLines().foreach { line =>
      val t = line.trim
      if (t.isEmpty || t.startsWith("#")) ()
      else if (t.startsWith("--")) {
        // both MTR spellings: `--error N` and `-- error N`
        if (t.matches("(?i)--\\s*error\\b.*")) expectError = true
      } else if (cur.isEmpty && (t.startsWith("connect")
          || t.startsWith("connection") || t.startsWith("disconnect")
          || t.startsWith("delimiter"))) ()
      else {
        cur.append(line).append('\n')
        if (t.endsWith(";")) {
          // `eval` substitutes MTR variables then executes — the only
          // one these files use is $MYSQL_TEST_DIR (fixture paths)
          val stmt = cur.toString.trim.stripSuffix(";")
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

  /** Server-side statements this library does not carry (each with the
    * scope rationale) — skipping is explicit and counted. */
  private def outOfScope(stmt: String): Boolean =
    """(?i)\b(PROCEDURE|TRIGGER|FUNCTION)\b""".r
      .findFirstIn(stmt).isDefined || // SURVEY §2.13: routed to MySQL
      // LOAD fixtures absent from this reference checkout (LFS-tracked
      // bulk files): the statement cannot run ANYWHERE without them
      """'(/root/reference/[^']+)'""".r.findFirstMatchIn(stmt)
        .exists(m => !new java.io.File(m.group(1)).exists())

  private def replay(file: String): (Int, Int) = {
    val runner = new sources.StatementRunner(spark)
    val stmts = parseMtr(s"$MtrDir/$file")
    assert(stmts.nonEmpty, s"no statements parsed from $file")
    var ran = 0
    var skipped = 0
    stmts.foreach { case (stmt, expectsError) =>
      if (outOfScope(stmt)) skipped += 1
      else {
        val result = scala.util.Try(runner.run(stmt).collect())
        if (expectsError)
          assert(result.isFailure,
            s"[$file] expected an error, got success: $stmt")
        else if (result.isFailure)
          fail(s"[$file] unexpected failure for: $stmt\n  " +
            result.failed.get.toString.take(300))
        ran += 1
      }
    }
    (ran, skipped)
  }

  test("the reference's truncate_table.test replays with success/error " +
      "parity (databases, CREATE/LIKE/CTAS, views, multi-connection " +
      "truncates, qualified names)") {
    val (ran, skipped) = replay("truncate_table.test")
    assert(ran >= 30, s"only $ran statements ran")
    assert(skipped <= 1, s"$skipped skipped (expected only CREATE PROCEDURE)")
  }

  /** The pinned compatibility corpus: reference MTR files that replay
    * END TO END with success/error parity (minimum statement-count
    * floors so a silently-shortened parse can't fake a pass). Files NOT
    * here fail on documented boundaries: multi-table DELETE `t1.*, t2.*
    * FROM …` (the Dml.deleteJoin tier), charset CONVERT(… USING ucs2),
    * backtick identifiers containing spaces/slashes, MySQL's
    * bare-string-alias and VALUES-references-column quirks. */
  private val PinnedFiles: Seq[(String, Int)] = Seq(
    "create_db.test" -> 19,
    "dropdb.test" -> 4,
    "truncate.test" -> 11,
    "between_and.test" -> 17,
    "select_distinct.test" -> 19,
    "select_limit.test" -> 24,
    "where_conditions.test" -> 29,
    "replace_into.test" -> 38,
    "having.test" -> 16,
    "select_order_by.test" -> 58,
    "select_group_by.test" -> 43,
    "orquery.test" -> 9,
    "composite_primary_key.test" -> 8,
    "drop_column.test" -> 8,
    "add_column.test" -> 11,
    "alter_delete.test" -> 13,
    "alter_update.test" -> 12)

  PinnedFiles.foreach { case (file, floor) =>
    test(s"the reference's $file replays with success/error parity") {
      val (ran, skipped) = replay(file)
      assert(ran >= floor, s"only $ran statements ran (floor $floor)")
      assert(skipped <= 1, s"$skipped statements skipped")
    }
  }
}
