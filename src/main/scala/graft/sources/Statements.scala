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
  * `StatementRunner.run(sql)` accepts those two statement forms, the
  * `SELECT ROUGHLY` rough-query mode (engine_execute.cpp:450 — see
  * [[StatementRunner.attachPacked]]), the DML statement forms against
  * attached stores (`INSERT INTO … [cols] VALUES …` through the delta
  * append; `DELETE FROM … [WHERE]` / `UPDATE … SET … [WHERE]` as staged
  * base rewrites with old-row UPDATE semantics — the reference's
  * handler-level row DML, ha_tianmu.h:101-102, executed the columnar
  * way), the session admin statements
  * (`SHOW TABLES`, `SHOW CREATE TABLE`, `DESCRIBE`/`DESC`/`SHOW COLUMNS
  * FROM`, `EXPLAIN SELECT …` — answered from the runner's catalog /
  * Catalyst's plan, with column types rendered back through the
  * SURVEY §1.2 MySQL mapping), plus passthrough:
  * `LOAD DATA [LOCAL] INFILE … INTO TABLE t [FIELDS
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
  private val packedTables = scala.collection.mutable.Map[String, String]()

  /** Attach a managed table: statements may LOAD into it; its merged
    * view is (re)registered as a temp view under `name`. */
  def attach(name: String, store: DeltaStore): Unit = {
    stores(name.toLowerCase) = store
    store.read().createOrReplaceTempView(name)
  }

  /** Attach a pack-written table ([[StatsSidecar.writeWithStats]]
    * layout: pack-partitioned parquet + stats sidecar) so `SELECT
    * ROUGHLY …` statements can answer from its metadata. */
  def attachPacked(name: String, path: String): Unit =
    packedTables(name.toLowerCase) = path

  // MySQL string literals spell control chars with backslash escapes.
  private def unescape(s: String): String = s
    .replace("\\t", "\t").replace("\\n", "\n")
    .replace("\\r", "\r").replace("\\\\", "\\")

  private val LoadRe: Regex =
    """(?is)^\s*LOAD\s+DATA\s+(?:LOCAL\s+)?INFILE\s+'([^']*)'\s+(?:(REPLACE|IGNORE)\s+)?INTO\s+TABLE\s+`?(\w+)`?\s*(.*)$""".r
  private val OutfileRe: Regex =
    """(?is)\bINTO\s+OUTFILE\s+'([^']*)'""".r
  private val IgnoreLinesRe: Regex = """(?is)\bIGNORE\s+\d+\s+LINES""".r

  // DML statement forms against attached stores (the reference's primary
  // write surface: handler INSERT ha_tianmu.h write_row, DELETE/UPDATE
  // ha_tianmu.h:101-102). INSERT appends through the delta store;
  // DELETE/UPDATE execute as staged base rewrites (the columnar
  // execution of row DML — what the reference's own delta-merge
  // eventually does to packs).
  private val InsertRe: Regex =
    """(?is)^\s*INSERT\s+INTO\s+`?(\w+)`?\s*(?:\(([^)]*)\))?\s*VALUES\s*(.+?)\s*;?\s*$""".r
  private val DeleteRe: Regex =
    """(?is)^\s*DELETE\s+FROM\s+`?(\w+)`?\s*(?:WHERE\s+(.+?))?\s*;?\s*$""".r
  private val UpdateRe: Regex =
    """(?is)^\s*UPDATE\s+`?(\w+)`?\s+SET\s+(.+?)(?:\s+WHERE\s+(.+?))?\s*;?\s*$""".r

  private def attachedStore(table: String): DeltaStore =
    stores.getOrElse(table.toLowerCase,
      throw new IllegalArgumentException(
        s"DML: table '$table' is not attached to this runner"))

  /** Split on top-level commas (quote- and paren-aware) — `SET a = f(x,
    * y), b = 'v,w'` must not split inside the call or the literal. */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var depth = 0
    var quote: Char = 0
    s.foreach { c =>
      if (quote != 0) { cur += c; if (c == quote) quote = 0 }
      else c match {
        case '\'' | '"' => quote = c; cur += c
        case '(' => depth += 1; cur += c
        case ')' => depth -= 1; cur += c
        case ',' if depth == 0 => out += cur.toString; cur.clear()
        case _ => cur += c
      }
    }
    if (cur.nonEmpty) out += cur.toString
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  private def runInsert(table: String, colList: String,
                        tuples: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val store = attachedStore(table)
    val schema = store.read().schema
    val raw = spark.sql(s"SELECT * FROM VALUES $tuples")
    val provided: Seq[String] =
      if (colList == null || colList.trim.isEmpty) schema.map(_.name).toSeq
      else splitTopLevel(colList).map(_.stripPrefix("`").stripSuffix("`"))
    if (raw.schema.length != provided.length)
      throw new IllegalArgumentException(
        s"INSERT: ${raw.schema.length} values per row for " +
          s"${provided.length} target columns")
    val named = raw.toDF(provided: _*)
    // positional cast into the table schema; unmentioned columns = NULL
    // (MySQL's permissive default — strict modes are appendStrict's job)
    val aligned = named.select(schema.map { f =>
      if (provided.contains(f.name)) col(f.name).cast(f.dataType)
      else lit(null).cast(f.dataType).as(f.name)
    }.toSeq: _*)
    store.append(aligned)
    store.read().createOrReplaceTempView(table)
    import spark.implicits._
    Seq((table, aligned.count())).toDF("table_name", "rows_inserted")
  }

  private def runDelete(table: String, whereClause: String): DataFrame = {
    import org.apache.spark.sql.functions.{expr, not}
    val store = attachedStore(table)
    val before = store.read().count()
    if (whereClause == null) store.truncate()
    else {
      val cond = expr(MySqlDialect.rewrite(whereClause))
      // SQL DELETE semantics: NULL-condition rows survive (NOT NULL=NULL)
      store.rewriteWith(df => df.filter(not(cond) || cond.isNull))
    }
    store.read().createOrReplaceTempView(table)
    import spark.implicits._
    Seq((table, before - store.read().count()))
      .toDF("table_name", "rows_deleted")
  }

  private def runUpdate(table: String, setList: String,
                        whereClause: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, lit, when}
    val store = attachedStore(table)
    val assigns = splitTopLevel(setList).map { a =>
      val i = a.indexOf('=')
      if (i < 0) throw new IllegalArgumentException(
        s"UPDATE SET: malformed assignment '$a'")
      (a.substring(0, i).trim.stripPrefix("`").stripSuffix("`"),
        MySqlDialect.rewrite(a.substring(i + 1).trim))
    }
    val cond =
      if (whereClause == null) lit(true)
      else expr(MySqlDialect.rewrite(whereClause))
    val touched = store.read().filter(cond).count()
    // ONE select so every RHS evaluates against the OLD row (standard
    // UPDATE semantics — sequential withColumn would leak new values
    // into later assignments)
    store.rewriteWith { df =>
      val bad = assigns.map(_._1).filterNot(df.columns.contains)
      if (bad.nonEmpty) throw new IllegalArgumentException(
        s"UPDATE: unknown column(s) ${bad.mkString(", ")}")
      df.select(df.schema.map { f =>
        assigns.find(_._1 == f.name) match {
          case Some((_, rhs)) =>
            when(cond, expr(rhs).cast(f.dataType))
              .otherwise(col(f.name)).as(f.name)
          case None => col(f.name)
        }
      }.toSeq: _*)
    }
    store.read().createOrReplaceTempView(table)
    import spark.implicits._
    Seq((table, touched)).toDF("table_name", "rows_updated")
  }

  // Admin/diagnostic statements (the MySQL client-session surface the
  // reference inherits from its server half: SHOW TABLES / SHOW CREATE
  // TABLE / DESCRIBE / EXPLAIN — mysql-test/suite/tianmu uses all four
  // around its data statements).
  private val ShowTablesRe: Regex =
    """(?is)^\s*SHOW\s+TABLES\s*;?\s*$""".r
  private val ShowCreateRe: Regex =
    """(?is)^\s*SHOW\s+CREATE\s+TABLE\s+`?(\w+)`?\s*;?\s*$""".r
  private val DescribeRe: Regex =
    """(?is)^\s*(?:DESCRIBE|DESC|SHOW\s+COLUMNS\s+FROM)\s+`?(\w+)`?\s*;?\s*$""".r
  private val ExplainRe: Regex =
    """(?is)^\s*EXPLAIN\s+(SELECT\b.*)$""".r
  // Maintenance statements (MySQL admin pair the reference inherits):
  // OPTIMIZE TABLE = fold the insert buffer (the background-merge the
  // reference schedules by thresholds, engine.h:210, run on demand);
  // ANALYZE TABLE = refresh statistics (the ANALYZE tier — the profile
  // lands in a `<table>__stats` view beside MySQL's status row).
  private val OptimizeRe: Regex =
    """(?is)^\s*OPTIMIZE\s+TABLE\s+`?(\w+)`?\s*;?\s*$""".r
  private val AnalyzeRe: Regex =
    """(?is)^\s*ANALYZE\s+TABLE\s+`?(\w+)`?\s*;?\s*$""".r
  // DDL pair: CTAS materializes the SELECT into a runner-managed store
  // (every later statement — LOAD, DML, OPTIMIZE — works on it like any
  // attached table); DROP detaches and deletes ONLY runner-created
  // stores (a table the caller attached owns its own files).
  private val CtasRe: Regex =
    """(?is)^\s*CREATE\s+TABLE\s+`?(\w+)`?\s+AS\s+(SELECT\b.*?)\s*;?\s*$""".r
  private val DropRe: Regex =
    """(?is)^\s*DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?`?(\w+)`?\s*;?\s*$""".r

  /** Roots of stores THIS runner created via CTAS (safe to delete on
    * DROP; caller-attached stores are never touched on disk). */
  private val ownedRoots = scala.collection.mutable.Map[String, String]()

  /** Spark type → the MySQL column type the reference's DDL would show
    * (SURVEY.md §1.2 type mapping, reversed). */
  private def mysqlType(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType => "BIGINT"
      case IntegerType => "INT"
      case ShortType => "SMALLINT"
      case ByteType => "TINYINT"
      case DoubleType => "DOUBLE"
      case FloatType => "FLOAT"
      case StringType => "TEXT"
      case BooleanType => "TINYINT(1)"
      case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
      case DateType => "DATE"
      case _: TimestampType | _: TimestampNTZType => "TIMESTAMP"
      case BinaryType => "BLOB"
      case other => other.sql
    }
  }

  private def schemaOf(table: String): org.apache.spark.sql.types.StructType =
    stores.get(table.toLowerCase).map(_.read().schema).getOrElse {
      if (spark.catalog.tableExists(table)) spark.table(table).schema
      else throw new IllegalArgumentException(
        s"table '$table' is neither attached to this runner nor a " +
          "registered view")
    }

  // SELECT ROUGHLY (core/engine_execute.cpp:450 of the reference routes
  // the ROUGHLY keyword into rough_query mode; temp_table_roughquery.cpp
  // answers the aggregates from Knowledge-Grid metadata alone).
  private val RoughlyRe: Regex =
    """(?is)^\s*SELECT\s+ROUGHLY\s+(.*?)\s+FROM\s+`?(\w+)`?\s*(?:WHERE\s+(.*?))?\s*;?\s*$""".r
  private val RoughCountRe: Regex =
    """(?i)^COUNT\(\s*\*\s*\)(?:\s+AS\s+`?(\w+)`?)?$""".r
  private val RoughFnRe: Regex =
    """(?i)^(MIN|MAX|SUM|AVG)\(\s*`?(\w+)`?\s*\)(?:\s+AS\s+`?(\w+)`?)?$""".r
  private val RoughBetweenRe: Regex =
    """(?is)^`?(\w+)`?\s+BETWEEN\s+(-?[0-9.]+)\s+AND\s+(-?[0-9.]+)$""".r
  private val RoughPrefixRe: Regex =
    """(?is)^`?(\w+)`?\s+LIKE\s+'([^'%_]*)%'$""".r

  /** `SELECT ROUGHLY aggs FROM t [WHERE …]` — metadata-only aggregates
    * over an attached packed table: COUNT(*)/MIN/MAX/SUM/AVG answered
    * purely from the stats sidecar (zero data files touched); a
    * `col BETWEEN lo AND hi` or `col LIKE 'prefix%'` WHERE routes
    * COUNT(*) through the tri-state hybrid path (ALL packs from
    * metadata, SOME packs scanned with pruning, NONE untouched). Per
    * the DPN contract the answers are EXACT, not approximate — the
    * sidecar is metadata-complete for these shapes. */
  private def runRoughly(aggList: String, table: String,
                         whereClause: String): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val path = packedTables.getOrElse(table.toLowerCase,
      throw new IllegalArgumentException(
        s"SELECT ROUGHLY: table '$table' is not attached as a packed " +
          "store (StatementRunner.attachPacked over a " +
          "StatsSidecar.writeWithStats layout)"))
    val specs: Seq[(String, String, String)] =
      aggList.split(",").map(_.trim).toSeq.map {
        case RoughCountRe(alias) =>
          ("count", "", Option(alias).getOrElse("count_star"))
        case RoughFnRe(fn, c, alias) =>
          (fn.toLowerCase, c, Option(alias).getOrElse(s"${fn.toLowerCase}_$c"))
        case other => throw new UnsupportedOperationException(
          "SELECT ROUGHLY supports COUNT(*) and MIN/MAX/SUM/AVG(column) " +
            s"aggregates only; got '$other'")
      }
    Option(whereClause).map(_.trim).filter(_.nonEmpty) match {
      case None =>
        val stats = StatsSidecar.readStats(spark, path)
        val statCols = stats.select("column").distinct().collect()
          .map(_.getString(0)).toSet
        val needed = specs.collect { case (_, c, _) if c.nonEmpty => c }.distinct
        val missing = needed.filterNot(statCols)
        if (missing.nonEmpty) throw new IllegalArgumentException(
          s"SELECT ROUGHLY: no sidecar stats for column(s) " +
            missing.mkString(", "))
        if (statCols.isEmpty) throw new IllegalStateException(
          s"SELECT ROUGHLY: empty stats sidecar for '$table'")
        val per = (if (needed.nonEmpty) needed else Seq(statCols.head))
          .map(c => c -> StatsSidecar.roughAgg(stats, c).first()).toMap
        val total = per.values.head.getAs[Long]("n_rows")
        val out = specs.map {
          case ("count", _, a) => lit(total).as(a)
          case ("min", c, a) => lit(per(c).getAs[Double]("min_v")).as(a)
          case ("max", c, a) => lit(per(c).getAs[Double]("max_v")).as(a)
          case ("sum", c, a) => lit(per(c).getAs[Double]("sum_v")).as(a)
          case ("avg", c, a) =>
            val r = per(c)
            val nonNull = r.getAs[Long]("n_rows") - r.getAs[Long]("n_nulls")
            (if (nonNull == 0L) lit(null).cast("double")
             else lit(r.getAs[Double]("sum_v") / nonNull)).as(a)
        }
        spark.range(1).select(out: _*)
      case Some(w) =>
        if (specs.exists(_._1 != "count"))
          throw new UnsupportedOperationException(
            "SELECT ROUGHLY with a WHERE clause answers COUNT(*) only " +
              "(the hybrid rough+exact count); other aggregates need the " +
              "full query path")
        val n = w match {
          case RoughBetweenRe(c, lo, hi) =>
            StatsSidecar.countBetween(spark, path, c, lo.toDouble, hi.toDouble)
          case RoughPrefixRe(c, p) =>
            StatsSidecar.countPrefix(spark, path, c, p)
          case _ => throw new UnsupportedOperationException(
            "SELECT ROUGHLY WHERE supports 'col BETWEEN lo AND hi' and " +
              "\"col LIKE 'prefix%'\" shapes only")
        }
        spark.range(1).select(specs.map { case (_, _, a) => lit(n).as(a) }: _*)
    }
  }

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

    case RoughlyRe(aggList, table, whereClause) =>
      runRoughly(aggList, table, whereClause)

    case InsertRe(table, colList, tuples) =>
      runInsert(table, colList, tuples)

    case DeleteRe(table, whereClause) =>
      runDelete(table, whereClause)

    case UpdateRe(table, setList, whereClause) =>
      runUpdate(table, setList, whereClause)

    case ShowTablesRe() =>
      import spark.implicits._
      (stores.keySet ++ packedTables.keySet).toSeq.sorted
        .toDF("table_name")

    case ShowCreateRe(table) =>
      import spark.implicits._
      val cols = schemaOf(table).fields.map(f =>
        s"  `${f.name}` ${mysqlType(f.dataType)}" +
          (if (f.nullable) "" else " NOT NULL"))
      val ddl = s"CREATE TABLE `$table` (\n${cols.mkString(",\n")}\n" +
        ") ENGINE=TIANMU"
      Seq((table, ddl)).toDF("table_name", "create_table")

    case DescribeRe(table) =>
      import spark.implicits._
      schemaOf(table).fields.toSeq.map(f =>
        (f.name, mysqlType(f.dataType), if (f.nullable) "YES" else "NO"))
        .toDF("field", "type", "null")

    case CtasRe(table, select) =>
      import spark.implicits._
      val key = table.toLowerCase
      if (stores.contains(key))
        throw new IllegalArgumentException(
          s"CREATE TABLE: '$table' already exists in this runner")
      val df = spark.sql(MySqlDialect.rewrite(select))
      val root = java.nio.file.Files
        .createTempDirectory(s"graft-ctas-$key").toString
      val store = new DeltaStore(spark, root)
      store.writeBase(df)
      attach(table, store)
      ownedRoots(key) = root
      Seq((table, store.read().count()))
        .toDF("table_name", "rows_created")

    case DropRe(table) =>
      import spark.implicits._
      val key = table.toLowerCase
      val existed = stores.remove(key).isDefined
      packedTables.remove(key)
      spark.catalog.dropTempView(table)
      ownedRoots.remove(key).foreach(root =>
        org.apache.commons.io.FileUtils
          .deleteDirectory(new java.io.File(root)))
      Seq((table, if (existed) "dropped" else "not attached"))
        .toDF("table_name", "status")

    case OptimizeRe(table) =>
      import spark.implicits._
      val store = attachedStore(table)
      val pending = store.deltaCount()
      store.compact()
      store.read().createOrReplaceTempView(table)
      Seq((table, "optimize", "status", s"OK ($pending delta rows folded)"))
        .toDF("table_name", "op", "msg_type", "msg_text")

    case AnalyzeRe(table) =>
      import spark.implicits._
      val store = attachedStore(table)
      val numeric = store.read().schema.fields.map(_.name).toSeq
      graft.operators.Profile.profile(store.read(), numeric)
        .createOrReplaceTempView(s"${table}__stats")
      Seq((table, "analyze", "status", s"OK (stats in ${table}__stats)"))
        .toDF("table_name", "op", "msg_type", "msg_text")

    case ExplainRe(select) =>
      import spark.implicits._
      spark.sql(MySqlDialect.rewrite(select))
        .queryExecution
        .explainString(org.apache.spark.sql.execution.SimpleMode)
        .split("\n").toSeq.toDF("plan")

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

  /** `SELECT ROUGHLY` as SQL text (the reference's rough_query mode,
    * core/engine_execute.cpp:450): pack-write lineitem, then answer
    * COUNT/MIN/MAX/SUM from the sidecar and a BETWEEN count through the
    * hybrid path — all via statement text, all exact vs the oracle's
    * full recomputation (same contract as [[StatsSidecar.qRoughAgg]],
    * here proving the STATEMENT surface end-to-end). */
  def qRoughSqlStatement(s: SparkSession, dir: String): DataFrame = {
    val scratch = java.nio.file.Files
      .createTempDirectory("graft-roughly-gate").toString
    val li = graft.Engine.table(s, dir, "lineitem")
      .select(org.apache.spark.sql.functions.col("l_quantity"),
        org.apache.spark.sql.functions.col("l_extendedprice"))
    StatsSidecar.writeWithStats(li, s"$scratch/li_packed", 8192,
      Seq("l_quantity", "l_extendedprice"),
      clusterBy = Some(org.apache.spark.sql.functions.col("l_quantity")))
    val runner = new StatementRunner(s)
    runner.attachPacked("li_packed", s"$scratch/li_packed")
    val base = runner.run(
      """SELECT ROUGHLY COUNT(*) AS n, MIN(l_extendedprice) AS min_price,
        |MAX(l_extendedprice) AS max_price, SUM(l_extendedprice) AS sum_price
        |FROM li_packed""".stripMargin)
    val between = runner.run(
      """SELECT ROUGHLY COUNT(*) AS n_qty_10_30 FROM li_packed
        |WHERE l_quantity BETWEEN 10.0 AND 30.0""".stripMargin)
    base.crossJoin(between)
  }

  /** Same oracle as the rough-agg capability gate: rough answers must
    * EQUAL exact recomputation (DPN contract — rough ≠ approximate). */
  val qRoughSqlStatementSql: String = StatsSidecar.qRoughAggSql

  /** DML as statement TEXT end-to-end (the reference's handler write
    * path driven from SQL): seed an attached store with customer, run
    * verbatim DELETE / UPDATE / INSERT statements, read the final state
    * back through the runner's own catalog. The oracle replays the same
    * three edits as pure relational algebra over the ORIGINAL table —
    * hash equality proves statement parsing, the staged rewrites, AND
    * old-row UPDATE semantics in one gate. */
  def qSqlDmlStatements(s: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-dml-gate").toString
    val customer = graft.Engine.table(s, dir, "customer")
    val store = new DeltaStore(s, s"$tmp/cust_store")
    store.writeBase(customer)
    val runner = new StatementRunner(s)
    runner.attach("stmt_cust_dml", store)
    runner.run("DELETE FROM stmt_cust_dml WHERE c_acctbal < 0")
    runner.run("UPDATE stmt_cust_dml SET c_acctbal = c_acctbal + 100 " +
      "WHERE c_mktsegment = 'BUILDING'")
    runner.run("INSERT INTO stmt_cust_dml VALUES " +
      "(900001, 'Customer#900001', 3, 123.25, 'MACHINERY'), " +
      "(900002, 'Customer#900002', 5, 67.5, 'BUILDING')")
    runner.run(
      """SELECT c_mktsegment, COUNT(*) AS n,
        |  CAST(SUM(CAST(FLOOR(c_acctbal * 10000.0 + 0.5) AS BIGINT))
        |       AS DOUBLE) / 10000.0 AS sum_bal
        |FROM stmt_cust_dml
        |GROUP BY c_mktsegment""".stripMargin)
  }

  val qSqlDmlStatementsSql: String =
    """WITH survivors AS (
      |  SELECT c_mktsegment,
      |    CASE WHEN c_mktsegment = 'BUILDING' THEN c_acctbal + 100
      |         ELSE c_acctbal END AS bal
      |  FROM customer
      |  WHERE NOT (c_acctbal < 0)
      |), inserted AS (
      |  SELECT 'MACHINERY' AS c_mktsegment, 123.25 AS bal
      |  UNION ALL
      |  SELECT 'BUILDING', 67.5
      |), final AS (
      |  SELECT * FROM survivors UNION ALL SELECT * FROM inserted
      |)
      |SELECT c_mktsegment, COUNT(*) AS n,
      |  CAST(SUM(CAST(FLOOR(bal * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE)
      |    / 10000.0 AS sum_bal
      |FROM final
      |GROUP BY c_mktsegment""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sql_statement_roundtrip" -> (qSqlStatementRoundtrip _),
    "q_sql_select_roughly" -> (qRoughSqlStatement _),
    "q_sql_dml_statements" -> (qSqlDmlStatements _))

  val oracles: Map[String, String] = Map(
    "q_sql_statement_roundtrip" -> qSqlStatementRoundtripSql,
    "q_sql_select_roughly" -> qRoughSqlStatementSql,
    "q_sql_dml_statements" -> qSqlDmlStatementsSql)
}
