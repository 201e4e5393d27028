package graft

import org.scalatest.funsuite.AnyFunSuite

/** Replays an ACTUAL reference MTR test file, statement for statement,
  * through [[sources.StatementRunner]] — the strongest form of the
  * "a user of the reference could switch" claim: the reference's own
  * test script runs with success/error parity. MTR client directives
  * (`--echo`, `--source`, `connect`/`connection`, …) are client-side
  * and skipped; `--error N` lines flip the expectation for the next
  * statement (it must THROW). Since round 17 the full statement
  * surface — stored PROCEDUREs/FUNCTIONs, CALL, TRIGGERs — is in
  * scope (sources/Procedural.scala); the only skipped statements are
  * fixtures this checkout physically lacks (LFS-stripped data files)
  * and mysqltest harness-variable loops. Everything else must behave:
  * unexpected success where an error is pinned, or any error where
  * success is pinned, fails the suite naming the statement. */
class MtrReplaySpec extends AnyFunSuite {
  private def spark = TestSession.spark

  private val MtrDir = "/root/reference/mysql-test/suite/tianmu/t"

  /** (statement text, expectsError) pairs from an MTR .test file.
    * Client-side constructs are handled the way the real mysqltest
    * client does: `--` lines are directives (only `--error` affects the
    * next statement), `delimiter X` switches the statement terminator
    * (so stored-routine bodies parse as ONE statement and hit the
    * out-of-scope skip instead of shredding), bare client commands
    * (connect/let/inc/dec/sleep/…) are not SQL, and a trailing
    * `# comment` after the terminating `;` does not glue the next
    * statement on (issue1332's `select …; # NULL_VALUE` lines). */
  private def parseMtr(path: String): Seq[(String, Boolean)] = {
    val out = scala.collection.mutable.ArrayBuffer[(String, Boolean)]()
    val cur = new StringBuilder
    var expectError = false
    var delim = ";"
    val ClientCmd =
      """(?i)^(connect\b|connection\b|disconnect\b|let\b|inc\b|dec\b|sleep\b|real_sleep\b|source\b|echo\b|exit\b|die\b|while\b|if\b|(?:disable|enable)_\w+\b|\{|\})""".r
    val DelimiterCmd = """(?i)^delimiter\s+(\S+).*$""".r
    var inBlockComment = false
    // some reference files carry GBK-encoded comment bytes
    // (hash_join.test) — replace rather than abort
    implicit val codec: scala.io.Codec = scala.io.Codec.UTF8
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
    val src = scala.io.Source.fromFile(path)
    try src.getLines().foreach { rawLine =>
      // strip /* … */ block comments (inner_join.test annotates every
      // section with them); statements never embed them mid-expression
      // in this corpus
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
        // an --error directive whose TARGET got commented out together
        // with it must expire — select.test leaves `-- error 1176`
        // above `#select … use index`, and the error would otherwise
        // leak onto the next live statement
        if ("""(?i)^#\s*(select|insert|update|delete|create|drop|alter|load|set|show)\b""".r
          .findFirstIn(t).isDefined) expectError = false
      }
      else if (t.startsWith("--")) {
        // both MTR spellings: `--error N` and `-- error N`
        if (t.matches("(?i)--\\s*error\\b.*")) expectError = true
        else """(?i)^--\s*delimiter\s+(\S+)""".r.findFirstMatchIn(t)
          .foreach { m =>
            delim = m.group(1).stripSuffix(";") match {
              case "" => ";"; case x => x
            }
          }
      } else if (cur.isEmpty && DelimiterCmd.findFirstMatchIn(t).isDefined) {
        val d = DelimiterCmd.findFirstMatchIn(t).get.group(1)
        // `delimiter ;` (or `//;` while // is active) restores
        delim = d.stripSuffix(delim).stripSuffix(";") match {
          case "" => ";"; case x => x
        }
      } else if (cur.isEmpty && ClientCmd.findFirstIn(t).isDefined) ()
      else {
        // a terminator followed only by a # comment still terminates
        val effective =
          if (delim == ";") t.replaceFirst(";\\s*#[^'\"]*$", ";") else t
        cur.append(
          if (effective != t) line.replaceFirst(";\\s*#[^'\"]*$", ";")
          else line).append('\n')
        if (effective.endsWith(delim)) {
          // `eval` substitutes MTR variables then executes — the only
          // one these files use is $MYSQL_TEST_DIR (fixture paths)
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

  /** Server-side statements this library does not carry (each with the
    * scope rationale) — skipping is explicit and counted. */
  private def outOfScope(stmt: String): Boolean =
    // stored PROCEDUREs, procedural FUNCTION bodies, TRIGGERs, and CALL
    // are all IN scope since round 17 (sources/Procedural.scala — the
    // driver-side interpreter mirroring the reference's routing of
    // routines to the MySQL SQL layer, engine_execute.cpp:374-382).
    // Remaining skips are fixture/harness gaps, not engine scope:
      // LOAD fixtures absent from this reference checkout (LFS-tracked
      // bulk files): the statement cannot run ANYWHERE without them
      """'(/root/reference/[^']+)'""".r.findFirstMatchIn(stmt)
        .exists(m => !new java.io.File(m.group(1)).exists()) ||
      // a relative INFILE fixture that resolves nowhere in the
      // reference trees (LFS-stripped, load.test's std_data/tianmu/
      // loadfile) cannot run anywhere either
      """(?i)\bINFILE\s+'([^'$]+)'""".r.findFirstMatchIn(stmt).exists {
        m =>
          val p = m.group(1)
          !p.startsWith("/") && {
            val sub = p.indexOf("std_data/") match {
              case -1 => None
              case i => Some(p.substring(i + "std_data/".length))
            }
            val flat = p.replaceAll("[^\\w.-]+", "_").stripPrefix("_")
            // sandbox hits: the legacy flat path plus the per-runner
            // subdirectories (target/mtr_io/<runner>/<flat>)
            val sandboxHit = new java.io.File(s"target/mtr_io/$flat")
              .exists() ||
              Option(new java.io.File("target/mtr_io").listFiles())
                .exists(_.exists(d =>
                  new java.io.File(d, flat).exists()))
            !sandboxHit && (Seq(new java.io.File(MtrDir, p)) ++
              sub.toSeq.flatMap(s => Seq(
                new java.io.File("/root/reference/mysql-test/std_data", s),
                new java.io.File(
                  "/root/reference/mysql-test/suite/tianmu/std_data", s))))
              .forall(!_.exists())
          }
      } ||
      // a $MYSQL_TEST_DIR-anchored INFILE fixture missing from this
      // checkout (LFS-stripped bulk data — delete.test's
      // bigdata4load.txt) cannot run anywhere either
      """(?i)\bINFILE\s+'\$MYSQL_TEST_DIR/([^']+)'""".r
        .findFirstMatchIn(stmt).exists(m =>
          !new java.io.File("/root/reference/mysql-test",
            m.group(1)).exists()) ||
      // an UNQUOTED $var is an mysqltest harness variable (`let $i`
      // loops — issue1876.test): its value lives in harness control
      // flow this replayer does not interpret. Quoted ones ($MYSQLTEST_
      // VARDIR paths) still run — the IO sandbox resolves them.
      // only at word START: `$i` is a harness variable, but `e$8b` is
      // a legal MySQL identifier with an embedded $ (create_db.test)
      """(?<!\w)\$\w+""".r.findFirstIn(
        stmt.replaceAll("'[^']*'|\"[^\"]*\"", "")).isDefined ||
      // `@x := …` INSIDE a query is MySQL's row-order-dependent
      // accumulator hack (issue1897/1903/1910, range.test:189) — no
      // relational analog (SURVEY §2.13); `SET @x := …` stays in
      // scope, and so do routine BODIES (the interpreter evaluates
      // their := assignments itself — procedure.test's
      // `select @sum:=(a+b)`)
      (!"""(?i)^\s*(SET|CREATE\s+(?:DEFINER\s*=\s*\S+\s+)?(?:FUNCTION|PROCEDURE|TRIGGER)|CALL)\b""".r
        .findFirstIn(stmt).isDefined &&
        """@\w+\s*:=""".r.findFirstIn(
          stmt.replaceAll("'[^']*'|\"[^\"]*\"", "")).isDefined)

  /** Files the reference DISABLES in its CI (disabled.def:
    * `trigger : bug_for_trigger`, issue364, issue581) because they
    * predate its tianmu trigger gate: CREATE TRIGGER on a tianmu table
    * is 3240 unless tianmu_no_key_error=ON (sql_trigger.cc:229-235).
    * Replaying them under the reference's own enabling flag is the
    * only way the scripts' pinned successes are reachable at all. */
  private val TriggerFlagFiles =
    Set("trigger.test", "issue364.test", "issue581.test")

  private def replay(file: String,
                     session: org.apache.spark.sql.SparkSession = spark,
                     boundary: Option[(String, Boolean, Int) => Boolean]
                       = None)
      : (Int, Int) = {
    val runner = new sources.StatementRunner(session)
    if (TriggerFlagFiles.contains(file))
      runner.run("SET SESSION tianmu_no_key_error=ON")
    // MTR applies <file>-master.opt server flags before the file runs
    // (drop_index.test needs tianmu_no_key_error=ON); replay them as
    // session SETs — the engine models them as session variables.
    val opt = new java.io.File(
      s"$MtrDir/${file.stripSuffix(".test")}-master.opt")
    if (opt.exists()) {
      val src = scala.io.Source.fromFile(opt)
      val txt = try src.mkString finally src.close()
      txt.split("--").map(_.trim).filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        scala.util.Try(runner.run(s"SET SESSION $k=$v").collect())
      }
    }
    val stmts = parseMtr(s"$MtrDir/$file")
    assert(stmts.nonEmpty, s"no statements parsed from $file")
    var ran = 0
    var skipped = 0
    var skippedTriggers = 0
    var stopped = false
    stmts.foreach { case (stmt, expectsError) =>
      if (stopped) ()
      else if (boundary.exists(_(stmt, expectsError, skippedTriggers)))
        stopped = true
      else if (outOfScope(stmt)) {
        skipped += 1
        if ("""(?i)^\s*CREATE\s+(?:DEFINER\s*=\s*\S+\s+)?TRIGGER\b""".r
          .findFirstIn(stmt).isDefined) skippedTriggers += 1
      } else {
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

  /** The pinned compatibility corpus: EVERY reference MTR file in
    * tianmu/t — 292 of 292, ~13.3k statements — replays END TO END
    * with success/error parity. Per-file statement-count floors stop
    * a silently-shortened parse from faking a pass; skip counts are
    * pinned exactly (LFS fixtures absent from the checkout, plus
    * mysqltest client-variable loops). trigger.test and
    * user_function.test joined in round 17 with the stored-routine
    * interpreter and the trigger engine: procedural bodies
    * (DECLARE/flow control/SELECT…INTO), CALL with OUT/INOUT
    * write-back, and row triggers with the reference's engine gate
    * (3240 on tianmu unless tianmu_no_key_error — issue1185 pins the
    * errors, issue1318 the flag-on firing, issue1186 the InnoDB
    * path). issue538.test joined earlier in round 17: its
    * expression-bodied stored functions expand
    * inline with a caller-scope capture guard, ON-placed expansions
    * hoist to LEFT JOIN LATERAL columns, and the
    * PushProjectionThroughUnion outer-ref crash is excluded for
    * statement sessions. */
  private val PinnedFiles: Seq[(String, Int, Int)] = Seq(
    // round-17 pin: stored-function JOIN-ON placement — expansion
    // capture guard (caller-scope argument refs), LEFT JOIN LATERAL
    // hoist for ON-placed scalar subqueries, and the
    // PushProjectionThroughUnion exclusion (Spark outer-ref crash over
    // base∪delta unions)
    ("issue538.test", 46, 0),
    ("trigger.test", 487, 0),
    ("user_function.test", 78, 0),
    // round-16 pins: strict-insert/unsigned-overflow/DDL-shape work
    ("auto_increment.test", 60, 0),
    ("bit_type.test", 99, 0),
    ("case_when.test", 63, 0),
    ("create_table.test", 199, 0),
    ("delete.test", 148, 1), // 1 skip: LFS-stripped bigdata4load.txt
    ("func_math.test", 94, 0),
    ("insert_select.test", 92, 0),
    ("issue1169.test", 14, 0),
    ("issue1263.test", 15, 0),
    ("issue1910.test", 15, 7), // 7 skips: mysqltest client-var loops
    ("issue682.test", 91, 0),
    ("select_function_calls.test", 24, 0),
    ("select_joins.test", 18, 0),
    ("unsigned_greatest.test", 106, 0),
    ("unsigned_least.test", 107, 0),
    ("unsigned_support_issue1267.test", 144, 0),
    ("unsigned_type.test", 77, 0),
    ("AddDate_function.test", 17, 0),
    ("AddTime_function.test", 17, 0),
    ("aliases.test", 26, 0),
    ("case_function.test", 13, 0),
    ("convert_conv_func.test", 25, 0),
    ("date_formats_func.test", 21, 0),
    ("double_float.test", 85, 0),
    ("escape.test", 47, 0),
    ("func_bit.test", 59, 0),
    ("func_sec_to_time.test", 11, 0),
    ("group_concat.test", 17, 0),
    ("group_concat2.test", 10, 0),
    ("if_function.test", 13, 0),
    ("init_auto_increment_value.test", 33, 0),
    ("inner_join.test", 80, 0),
    ("insert_all_data_types.test", 30, 0),
    ("insert_select_from.test", 27, 0),
    ("integer_range.test", 112, 0),
    ("issue1090.test", 38, 0),
    ("issue1107.test", 23, 0),
    ("issue1108.test", 1, 0),
    ("issue1131.test", 43, 0),
    ("issue1152.test", 8, 0),
    ("issue1157.test", 21, 0),
    ("issue1173.test", 14, 0),
    ("issue1332.test", 141, 0),
    ("issue1352.test", 13, 0),
    ("issue1361.test", 9, 0),
    ("issue1464.test", 18, 0),
    ("issue1510.test", 14, 0),
    ("issue1523.test", 56, 0),
    ("issue1637.test", 9, 0),
    ("issue1784.test", 64, 0),
    ("issue1848.test", 9, 0),
    ("issue1860.test", 20, 0),
    ("issue1942.test", 12, 0),
    ("issue270.test", 15, 0),
    ("issue301.test", 192, 0),
    ("issue342.test", 21, 0),
    ("issue429.test", 9, 0),
    ("issue431.test", 8, 0),
    ("issue468.test", 9, 0),
    ("issue469.test", 8, 0),
    ("issue475.test", 8, 0),
    ("issue656.test", 8, 0),
    ("issue703.test", 5, 0),
    ("issue845.test", 16, 0),
    ("issue889.test", 12, 0),
    ("issue938.test", 9, 0),
    ("issue964.test", 11, 0),
    ("issue975.test", 9, 0),
    ("issue995.test", 8, 0),
    ("issue_566.test", 21, 0),
    ("issues_tx417.test", 15, 0),
    ("lz4.test", 12, 0),
    ("md5_function.test", 14, 0),
    ("mid_function.test", 20, 0),
    ("period_diff.test", 22, 0),
    ("primary_secondary_bit.test", 17, 0),
    ("select_order_by_group_by.test", 24, 0),
    ("semi-join.test", 21, 0),
    ("time_function.test", 15, 0),
    ("timediff_function.test", 16, 0),
    ("union.test", 122, 0),
    ("various_join.test", 47, 0),
    ("week_function.test", 38, 0),
    ("yearweek_function.test", 41, 0),
    ("zerofill.test", 27, 0),
    ("add_column.test", 11, 1),
    ("aggregate.test", 108, 0),
    ("alter_bit.test", 42, 0),
    ("alter_delete.test", 13, 0),
    ("alter_table.test", 20, 0),
    ("alter_table_negative.test", 18, 0),
    ("alter_table_null.test", 15, 0),
    ("alter_update.test", 12, 0),
    ("avg_function.test", 10, 0),
    ("between_and.test", 17, 0),
    ("casewhen.test", 7, 0),
    ("cast_data_types.test", 15, 0),
    ("char_length_function.test", 21, 0),
    ("coalesce_ascii_func.test", 26, 0),
    ("composite_primary_key.test", 8, 0),
    ("concat.test", 10, 0),
    ("create_db.test", 19, 0),
    ("create_index.test", 8, 0),
    ("ctas.test", 10, 0),
    ("date_function.test", 11, 0),
    ("day_function.test", 11, 0),
    ("dayname_function.test", 11, 0),
    ("dayofmonth_function.test", 11, 0),
    ("dayofyear_function.test", 11, 0),
    ("derived_table.test", 23, 0),
    ("div_func.test", 16, 0),
    ("drop_column.test", 8, 0),
    ("dropdb.test", 4, 0),
    ("empty_string_not_null.test", 35, 0),
    ("flow_control_function.test", 15, 0),
    ("having.test", 16, 0),
    ("hour_function.test", 13, 0),
    ("insert_on_duplicate_update.test", 8, 0),
    ("issue1006.test", 8, 0),
    ("issue1070.test", 13, 0),
    ("issue1079_366.test", 35, 0),
    ("issue1175.test", 7, 0),
    ("issue1251.test", 1, 0),
    ("issue1258.test", 12, 0),
    ("issue1363.test", 12, 0),
    ("issue1385.test", 11, 0),
    ("issue1394.test", 35, 0),
    ("issue1402.test", 20, 0),
    ("issue1564.test", 21, 0),
    ("issue1599.test", 19, 0),
    ("issue1625.test", 8, 0),
    ("issue1708.test", 9, 0),
    ("issue1808.test", 7, 0),
    ("issue1864.test", 16, 0),
    ("issue226.test", 14, 0),
    ("issue281.test", 11, 0),
    ("issue282.test", 19, 0),
    ("issue405.test", 8, 0),
    ("issue417.test", 8, 0),
    ("issue430.test", 8, 0),
    ("issue467.test", 8, 0),
    ("issue487.test", 5, 0),
    ("issue496.test", 12, 0),
    ("issue502.test", 10, 0),
    ("issue515.test", 9, 0),
    ("issue581.test", 22, 0),
    ("issue736.test", 10, 0),
    ("issue763.test", 59, 0),
    ("issue767.test", 42, 0),
    ("issue829.test", 27, 0),
    ("issue852.test", 8, 0),
    ("issue906.test", 12, 0),
    ("issue947.test", 18, 0),
    ("issue959.test", 61, 0),
    ("issue962.test", 7, 0),
    ("issue971.test", 20, 0),
    ("issue981.test", 10, 0),
    ("issue998.test", 48, 0),
    ("last_day_function.test", 13, 0),
    ("left_function.test", 14, 0),
    ("left_right_func.test", 10, 0),
    ("like_not_like.test", 8, 0),
    ("max_function.test", 10, 0),
    ("min_function.test", 10, 0),
    ("multi_join.test", 11, 0),
    ("null_functions.test", 27, 0),
    ("order_by.test", 16, 0),
    ("orquery.test", 9, 0),
    ("orquery1.test", 9, 0),
    ("out_of_range_issue1151.test", 74, 0),
    ("replace.test", 29, 0),
    ("replace_func.test", 12, 0),
    ("replace_into.test", 38, 0),
    ("right_function.test", 14, 0),
    ("select_distinct.test", 19, 0),
    ("select_from.test", 37, 0),
    ("select_group_by.test", 43, 0),
    ("select_limit.test", 24, 0),
    ("select_order_by.test", 58, 0),
    ("ssb_small.test", 9, 0),
    ("substr_function.test", 27, 0),
    ("substring_function.test", 27, 0),
    ("sum_function.test", 10, 0),
    ("timestampadd_function.test", 42, 0),
    ("timestampdiff_function.test", 42, 0),
    ("truncate.test", 11, 1),
    ("truncate_table.test", 48, 0),
    ("union_case.test", 30, 0),
    ("unsigned_join.test", 13, 0),
    ("various_subquery.test", 38, 0),
    ("weekday_function.test", 13, 0),
    ("weekofyear_function.test", 14, 0),
    ("where_conditions.test", 29, 0),
    ("year_function.test", 14, 0),
    ("select.test", 1276, 0),
    ("select_expressions.test", 32, 0),
    ("select_precision.test", 23, 0),
    ("signed_boundary.test", 32, 0),
    ("issue887.test", 37, 0),
    ("left_join.test", 63, 0),
    ("type_timestamp.test", 45, 0),
    ("update_v1.test", 90, 1),
    ("issue850.test", 17, 0),
    ("alter_column.test", 41, 0),
    ("alter_table1.test", 57, 0),
    ("alter_table_mix_use.test", 18, 0),
    ("alter_table_primarykey.test", 25, 0),
    ("alter_table_v1.test", 47, 0),
    ("bigint_unsigned.test", 142, 0),
    ("bit.test", 190, 0),
    ("cast_json_func.test", 16, 0),
    ("create_drop_users.test", 24, 0),
    ("create_tmp.test", 56, 0),
    ("create_view.test", 39, 0),
    ("ctas1.test", 45, 0),
    ("date_formats.test", 51, 0),
    ("delete_all_rows.test", 72, 1),
    ("delete_join.test", 14, 0),
    ("delete_signed.test", 93, 0),
    ("different_charsets_a.test", 124, 0),
    ("different_charsets_b.test", 164, 0),
    ("drop_index.test", 13, 0),
    ("drop_restric.test", 10, 0),
    ("func_define.test", 31, 0),
    ("hash_join.test", 60, 0),
    ("in_subquery.test", 150, 0),
    ("in_withpk.test", 49, 0),
    ("insert.test", 213, 2),
    ("insert_into_select.test", 43, 0),
    ("insert_update.test", 59, 2),
    ("issue1000.test", 41, 0),
    ("issue1034.test", 364, 0),
    ("issue1054.test", 59, 0),
    ("issue1065.test", 29, 0),
    ("issue1111.test", 111, 0),
    ("issue1153.test", 53, 0),
    ("issue1174.test", 119, 0),
    ("issue1185.test", 65, 0),
    ("issue1186.test", 42, 0),
    ("issue1209.test", 10, 0),
    ("issue1318.test", 19, 0),
    ("issue1325.test", 37, 0),
    ("issue1359.test", 17, 0),
    ("issue1616.test", 31, 0),
    ("issue1662.test", 5, 2),
    ("issue1696.test", 24, 3),
    ("issue1707.test", 5, 1),
    ("issue1855.test", 23, 0),
    ("issue1861.test", 15, 0),
    ("issue1865.test", 14, 0),
    ("issue1876.test", 23, 1),
    ("issue1897.test", 8, 4),
    ("issue1903.test", 8, 2),
    ("issue1912.test", 17, 0),
    ("issue1931.test", 11, 0),
    ("issue1938.test", 9, 0),
    ("issue222.test", 4, 4),
    ("issue228.test", 8, 0),
    ("issue271.test", 77, 0),
    ("issue362.test", 10, 0),
    ("issue364.test", 12, 0),
    ("issue415.test", 8, 0),
    ("issue422.test", 167, 0),
    ("issue433.test", 16, 0),
    ("issue441.test", 8, 0),
    ("issue446.test", 5, 0),
    ("issue464.test", 38, 0),
    ("issue502-2.test", 14, 0),
    ("issue663.test", 42, 0),
    ("issue669.test", 12, 0),
    ("issue781.test", 1622, 0),
    ("issue790.test", 13, 1),
    ("issue819.test", 88, 0),
    ("issue848.test", 24, 0),
    ("issue880.test", 19, 1),
    ("issue956.test", 66, 0),
    ("issue985.test", 12, 0),
    ("load.test", 10, 1),
    ("other_bit.test", 98, 0),
    ("procedure.test", 55, 0),
    ("range.test", 325, 1),
    ("show_db_table.test", 23, 0),
    ("std_test.test", 83, 0),
    ("strings.test", 61, 0),
    ("temporary.test", 35, 0),
    ("unsigned.test", 75, 0),
    ("unsigned_math.test", 94, 0),
    ("update_join.test", 15, 0),
    ("update_signed.test", 98, 0))

  test(s"${PinnedFiles.size} reference MTR files replay with " +
      "success/error parity (statement floors pinned)") {
    // files are independent sessions — `spark.newSession()` isolates
    // temp views / session conf per file, so the corpus replays in
    // PARALLEL (12 files at a time on the shared TestSession context);
    // the serial sweep outgrew an hour at ~4500 statements. LONGEST
    // FIRST: statement count is the duration proxy, and the biggest
    // file (issue781, 1622 stmts, ~10 min under contention) must start
    // in the first wave or it alone sets the suite's tail — with
    // insertion order it started late and the pool drained around it.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(12)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val futs = PinnedFiles.sortBy(-_._2).map { case (file, floor, maxSkip) =>
      scala.concurrent.Future {
        val t0 = System.nanoTime()
        val res = scala.util.Try(replay(file,
          sources.MtrParity.statementSession(spark)))
        val secs = (System.nanoTime() - t0) / 1e9
        // per-file wall time to stdout: a pathological straggler must
        // be visible by NAME, not as a silent hour
        println(f"[mtr-replay] $file%-36s ${secs}%7.1fs " +
          s"ok=${res.isSuccess} " +
          res.map { case (r, sk) => s"ran=$r skipped=$sk" }
            .getOrElse(""))
        (file, floor, maxSkip, res)
      }
    }
    val results = scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(futs),
      scala.concurrent.duration.Duration(90, "min"))
    pool.shutdown()
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    var total = 0
    results.foreach { case (file, floor, maxSkip, res) =>
      res match {
        case scala.util.Success((ran, skipped)) =>
          total += ran
          if (ran < floor) failures += s"$file: ran $ran < floor $floor"
          if (skipped > maxSkip) failures += s"$file: skipped $skipped"
        case scala.util.Failure(e) =>
          failures += s"$file: ${String.valueOf(e.getMessage).take(160)}"
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
    println(s"[mtr-replay] corpus total ran=$total")
    assert(total >= 13930, s"corpus shrank: $total statements")
  }

}
