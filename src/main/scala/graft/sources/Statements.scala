package graft.sources

import scala.util.matching.Regex

import org.apache.spark.sql.{DataFrame, SparkSession}

/** MySQL *statement* front-end for the ingest/export tier (the one
  * surface the reference exposes as SQL text that this library exposed
  * only as Scala APIs): the reference routes `LOAD DATA INFILE` to its
  * loader at sql/ha_my_tianmu.cpp:157 (`ha_my_tianmu_load`) and
  * `SELECT … INTO OUTFILE` through its query path at
  * ha_my_tianmu.cpp:84 (`ha_my_tianmu_query` → `ResultExportSender`,
  * core/engine.h:338).
  *
  * `StatementRunner.run(sql)` accepts exactly those two statement forms
  * plus passthrough: `LOAD DATA [LOCAL] INFILE … INTO TABLE t [FIELDS
  * TERMINATED/ENCLOSED/ESCAPED BY …] [LINES TERMINATED BY …]` parses to
  * a [[CsvLoader.load]] against the attached table's schema and appends
  * the clean rows to its [[DeltaStore]]; `SELECT … INTO OUTFILE 'f'
  * [export options]` strips the INTO clause, runs the remaining SELECT
  * through `spark.sql`, and exports via [[CsvLoader.export]]; anything
  * else goes to `spark.sql` after the [[MySqlDialect]] rewrite (hash
  * comments, `&&`/`||`, `LIMIT n,m`, `FROM DUAL` — so verbatim
  * MTR-style SELECT text runs unchanged). Statement execution is thus a thin
  * *parser*, not an engine — every byte of data movement rides the same
  * distributed load/export paths the Scala API uses (this stays a
  * library, not a server: no wire protocol, no session state beyond the
  * attached stores).
  *
  * Unsupported clauses (`IGNORE n LINES`, `REPLACE`/`IGNORE` dup-key
  * modes) throw with a pointer at the API that covers the semantics
  * ([[Dml.replaceInto]] / [[Dml.appendStrict]]) — failing fast beats
  * silently dropping a requested behavior.
  */
class StatementRunner(spark: SparkSession) {

  private val stores = scala.collection.mutable.Map[String, DeltaStore]()

  /** Attach a managed table: statements may LOAD into it; its merged
    * view is (re)registered as a temp view under `name`. */
  def attach(name: String, store: DeltaStore): Unit = {
    stores(name.toLowerCase) = store
    store.read().createOrReplaceTempView(name)
  }

  // MySQL string literals spell control chars with backslash escapes.
  private def unescape(s: String): String = s
    .replace("\\t", "\t").replace("\\n", "\n")
    .replace("\\r", "\r").replace("\\\\", "\\")

  private val LoadRe: Regex =
    """(?is)^\s*LOAD\s+DATA\s+(?:LOCAL\s+)?INFILE\s+'([^']*)'\s+(?:(REPLACE|IGNORE)\s+)?INTO\s+TABLE\s+`?(\w+)`?\s*(.*)$""".r
  private val OutfileRe: Regex =
    """(?is)\bINTO\s+OUTFILE\s+'([^']*)'""".r
  private val IgnoreLinesRe: Regex = """(?is)\bIGNORE\s+\d+\s+LINES""".r

  private case class ExportOpts(delimiter: String = ",", quote: String = "\"",
                                escape: String = "\\", lineSep: String = "\n")

  /** Consume FIELDS/LINES option clauses from the head of `s`; returns
    * (opts, rest-of-string). Shared by both statement forms — MySQL uses
    * the identical grammar for load and export options. */
  private def parseOpts(s: String): (ExportOpts, String) = {
    var rest = s
    var o = ExportOpts()
    def eat(re: Regex)(f: String => Unit): Boolean =
      re.findPrefixMatchOf(rest) match {
        case Some(m) => f(m.group(1)); rest = rest.substring(m.end); true
        case None => false
      }
    val fields = """(?is)^\s*(?:FIELDS|COLUMNS)\b()""".r
    if (fields.findPrefixMatchOf(rest).isDefined) {
      rest = rest.replaceFirst("(?is)^\\s*(?:FIELDS|COLUMNS)\\b", "")
      var progressed = true
      while (progressed) {
        progressed =
          eat("""(?is)^\s*TERMINATED\s+BY\s+'([^']*)'""".r)(v => o = o.copy(delimiter = unescape(v))) ||
          eat("""(?is)^\s*OPTIONALLY\s+ENCLOSED\s+BY\s+'([^']*)'""".r)(v => o = o.copy(quote = unescape(v))) ||
          eat("""(?is)^\s*ENCLOSED\s+BY\s+'([^']*)'""".r)(v => o = o.copy(quote = unescape(v))) ||
          eat("""(?is)^\s*ESCAPED\s+BY\s+'([^']*)'""".r)(v => o = o.copy(escape = unescape(v)))
      }
    }
    eat("""(?is)^\s*LINES\s+TERMINATED\s+BY\s+'([^']*)'""".r)(v => o = o.copy(lineSep = unescape(v)))
    (o, rest)
  }

  /** Execute one statement; always returns a DataFrame (query result,
    * or a one-row summary for LOAD/OUTFILE). */
  def run(sql: String): DataFrame = sql match {
    case LoadRe(path, dupMode, table, tail) =>
      if (dupMode != null)
        throw new UnsupportedOperationException(
          s"LOAD DATA ${dupMode.toUpperCase}: duplicate-key modes need a " +
            "declared key — use Dml.replaceInto (REPLACE) or " +
            "Dml.appendStrict (reject) on the store directly")
      if (IgnoreLinesRe.findFirstIn(tail).isDefined)
        throw new UnsupportedOperationException(
          "LOAD DATA … IGNORE n LINES is not supported; pre-strip the " +
            "header (Spark's CSV reader skips only column-header lines)")
      val store = stores.getOrElse(table.toLowerCase,
        throw new IllegalArgumentException(
          s"LOAD DATA: table '$table' is not attached to this runner"))
      val (opts, rest) = parseOpts(tail)
      if (rest.trim.nonEmpty)
        throw new UnsupportedOperationException(
          s"LOAD DATA: unsupported trailing clause: '${rest.trim.take(60)}'")
      // Spark's CSV reader auto-detects \n / \r\n on READ but accepts no
      // custom record terminator — honor the clause or refuse it.
      if (opts.lineSep != "\n" && opts.lineSep != "\r\n")
        throw new UnsupportedOperationException(
          "LOAD DATA: LINES TERMINATED BY supports only '\\n' or '\\r\\n' " +
            "on the read path (Spark CSV auto-detects these; custom " +
            "terminators are export-only)")
      val schema = store.read().schema
      val res = CsvLoader.load(spark, path, schema,
        delimiter = opts.delimiter, quote = opts.quote, escape = opts.escape)
      val loaded = res.clean.count()
      val rejected = res.rejects.count()
      store.append(res.clean)
      store.read().createOrReplaceTempView(table)
      import spark.implicits._
      Seq((table, loaded, rejected))
        .toDF("table_name", "rows_loaded", "rows_rejected")

    case s if OutfileRe.findFirstIn(s).isDefined =>
      val m = OutfileRe.findFirstMatchIn(s).get
      val path = m.group(1)
      val (opts, tail) = parseOpts(s.substring(m.end))
      // MySQL allows INTO OUTFILE before FROM or statement-final; the
      // SELECT is the statement minus the INTO clause span.
      val select = s.substring(0, m.start) + " " + tail
      val df = spark.sql(MySqlDialect.rewrite(select))
      val rows = df.count()
      CsvLoader.export(df, path, delimiter = opts.delimiter,
        quote = opts.quote, escape = opts.escape, lineSep = opts.lineSep)
      import spark.implicits._
      Seq((path, rows)).toDF("outfile", "rows_exported")

    // Everything else is query text: translate the MySQL-isms the
    // reference inherits from MySQL's parser (# comments, &&/||,
    // LIMIT n,m, FROM DUAL — see [[MySqlDialect]]) so verbatim MTR-style
    // SELECT text runs unchanged, then hand Catalyst the statement.
    case other => spark.sql(MySqlDialect.rewrite(other))
  }
}

/** Driver-gate read view: a full SQL-statement roundtrip — customer is
  * exported with `SELECT … INTO OUTFILE` (pipe-delimited) and loaded
  * back with `LOAD DATA INFILE` into an empty attached store; the gate
  * returns the re-loaded table, which must match the oracle's plain
  * SELECT over the original — proving both statement parsers AND both
  * data paths are lossless end-to-end. */
object Statements {

  def qSqlStatementRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-stmt-gate").toString
    val customer = graft.Engine.table(s, dir, "customer")
    customer.createOrReplaceTempView("stmt_customer_src")
    val runner = new StatementRunner(s)
    runner.run(
      s"""SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
         |INTO OUTFILE '$tmp/customer_out'
         |FIELDS TERMINATED BY '|' ESCAPED BY '\\\\'
         |LINES TERMINATED BY '\\n'
         |FROM stmt_customer_src""".stripMargin)
    val store = new DeltaStore(s, s"$tmp/customer_store")
    store.writeBase(customer.limit(0))
    runner.attach("stmt_customer", store)
    runner.run(
      s"""LOAD DATA INFILE '$tmp/customer_out'
         |INTO TABLE stmt_customer
         |FIELDS TERMINATED BY '|' ESCAPED BY '\\\\'""".stripMargin)
    runner.run("SELECT * FROM stmt_customer")
  }

  val qSqlStatementRoundtripSql: String =
    """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
      |FROM customer""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sql_statement_roundtrip" -> (qSqlStatementRoundtrip _))

  val oracles: Map[String, String] = Map(
    "q_sql_statement_roundtrip" -> qSqlStatementRoundtripSql)
}
