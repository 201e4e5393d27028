package graft.functions

import org.apache.spark.sql.{GraftSqlBridge, SparkSession}
import org.apache.spark.sql.functions.udaf

/** SQL-surface registration: makes the engine's custom functions callable
  * from `spark.sql(...)` — the analog of the reference's function names
  * being part of its SQL dialect. Idempotent per session. */
object Registry {

  /** MySQL default `group_concat_max_len` (chars; MySQL counts bytes but
    * the dialect surface here is ASCII-safe). */
  val GroupConcatMaxLen = 1024

  def register(spark: SparkSession): Unit = {
    // MySQL's logical XOR (the dialect folds `a XOR b` into this):
    // truthiness-xor with 3-valued NULL propagation — `191 XOR 1` is 0
    // (bit_type.test's BIT column), `NULL XOR x` is NULL.
    GraftSqlBridge.registerFunction(spark, "graft_xor", exprs => {
      import org.apache.spark.sql.catalyst.expressions._
      import org.apache.spark.sql.types._
      def truthy(e: Expression): Expression =
        scala.util.Try(e.dataType).toOption match {
          case Some(BooleanType) => e
          case Some(NullType) => Cast(e, BooleanType)
          case _ => Not(EqualTo(Cast(e, DoubleType), Literal(0.0)))
        }
      Not(EqualTo(truthy(exprs(0)), truthy(exprs(1))))
    })
    // Native Catalyst expression → plain SQL function.
    GraftSqlBridge.registerFunction(spark, "simhash64",
      exprs => SimHash64(exprs.head))
    GraftSqlBridge.registerFunction(spark, "shingle_hash64",
      exprs => ShingleHash64(exprs.head, 5))
    // MySQL GROUP_CONCAT defaults: comma separator, sorted, and the
    // group_concat_max_len truncation contract — MySQL's default is
    // 1024 (the reference's published TPC-H config pins 512; callers
    // needing another limit use the Scala API's maxLen). An unlimited
    // default would silently diverge from every reference GROUP_CONCAT
    // on groups past the limit.
    spark.udf.register("group_concat",
      udaf(new GroupConcat(",", false, GroupConcatMaxLen)))
    // MySQL's real unordered contract — SCAN order — for the SQL
    // statement tier (the sorted variant above stays the Scala API's
    // deterministic default for distributed plans)
    spark.udf.register("group_concat_scan",
      udaf(new GroupConcatScan(",", GroupConcatMaxLen)))
    spark.udf.register("group_concat_distinct",
      udaf(new GroupConcat(",", true, GroupConcatMaxLen)))
    // GROUP_CONCAT(value ORDER BY key [DESC]) from SQL: the ORDER BY
    // clause becomes the first argument (the sort key travels in the
    // buffer — t/group_concat.test shapes). asc/desc are separate names
    // because a UDAF signature cannot carry the modifier.
    spark.udf.register("group_concat_order_by",
      udaf(new GroupConcatOrdered(",", false, GroupConcatMaxLen)))
    spark.udf.register("group_concat_order_by_desc",
      udaf(new GroupConcatOrdered(",", true, GroupConcatMaxLen)))
    // Dedup kernels, wired to the Dedup pipeline's parameters so SQL
    // users compute the same signatures/verdicts as the operators.
    val params = graft.operators.Dedup.hashParams
    GraftSqlBridge.registerFunction(spark, "minhash_shingle_sig",
      exprs => MinHashShingleSig(exprs.head, 5,
        params.map(_._1).toArray, params.map(_._2).toArray))
    GraftSqlBridge.registerFunction(spark, "band_hashes64",
      exprs => LshOps.BandHashes64(exprs.head,
        graft.operators.Dedup.NumHashes / graft.operators.Dedup.BandSize,
        graft.operators.Dedup.BandSize))
    GraftSqlBridge.registerFunction(spark, "sig_agree",
      exprs => LshOps.SigAgree(exprs.head, exprs(1)))
    GraftSqlBridge.registerFunction(spark, "jaccard_long",
      exprs => LshOps.JaccardLong(exprs.head, exprs(1)))
    registerMySqlSql(spark)
  }

  /** SQL-name registration for the MySQL scalar shims in [[MySql]] —
    * the reference's SQL dialect IS MySQL's function surface
    * (core/mysql_expression.h:34 evaluates MySQL Item trees), so
    * verbatim MTR statement text must resolve these names. Column-level
    * shims are lifted through [[GraftSqlBridge]]; literal arguments
    * (WEEK modes, DATE_FORMAT patterns) are extracted by constant
    * evaluation at registration. */
  private def registerMySqlSql(spark: SparkSession): Unit = {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.catalyst.expressions.Expression
    import org.apache.spark.sql.functions._
    def fn(name: String)(builder: Seq[Column] => Column): Unit =
      GraftSqlBridge.registerFunction(spark, name, exprs =>
        GraftSqlBridge.expression(builder(exprs.map(GraftSqlBridge.column))))
    def litOf(e: Expression): Option[Any] =
      scala.util.Try(e.eval(null)).toOption.filter(_ != null)
    def isInterval(e: Expression): Boolean =
      scala.util.Try(e.dataType).toOption.exists(dt =>
        dt.typeName.contains("interval"))

    // adddate/subdate need the raw expressions for interval detection
    GraftSqlBridge.registerFunction(spark, "adddate", exprs => {
      val d = GraftSqlBridge.column(exprs.head)
      GraftSqlBridge.expression(
        if (isInterval(exprs(1)))
          MySql.adddateInterval(d, GraftSqlBridge.column(exprs(1)))
        else MySql.adddateDays(d, GraftSqlBridge.column(exprs(1))))
    })
    GraftSqlBridge.registerFunction(spark, "subdate", exprs => {
      val d = GraftSqlBridge.column(exprs.head)
      GraftSqlBridge.expression(
        if (isInterval(exprs(1)))
          MySql.adddateInterval(d, -GraftSqlBridge.column(exprs(1)))
        else MySql.adddateDays(d,
          -GraftSqlBridge.column(exprs(1)).cast("int")))
    })
    // DATE_ADD/DATE_SUB with INTERVAL (MySQL's primary form —
    // date_formats_func.test); integer second args keep Spark's own
    // date_add/date_sub semantics via the Catalyst expressions
    GraftSqlBridge.registerFunction(spark, "date_add", exprs =>
      if (isInterval(exprs(1)))
        GraftSqlBridge.expression(MySql.adddateInterval(
          GraftSqlBridge.column(exprs.head),
          GraftSqlBridge.column(exprs(1))))
      else org.apache.spark.sql.catalyst.expressions.DateAdd(
        exprs.head, exprs(1)))
    GraftSqlBridge.registerFunction(spark, "date_sub", exprs =>
      if (isInterval(exprs(1)))
        GraftSqlBridge.expression(MySql.adddateInterval(
          GraftSqlBridge.column(exprs.head),
          -GraftSqlBridge.column(exprs(1))))
      else org.apache.spark.sql.catalyst.expressions.DateSub(
        exprs.head, exprs(1)))
    fn("addtime")(cs => MySql.addtimeFull(cs.head, cs(1)))
    fn("subtime")(cs => MySql.addtimeFull(cs.head, cs(1), sign = -1))
    fn("timediff")(cs => MySql.timediff(cs.head, cs(1)))
    // SEC_TO_TIME of a FRACTIONAL-typed argument returns TIME(6) —
    // '277:46:40.000000' for a DOUBLE column (func_sec_to_time.test);
    // integer input keeps the bare 'HH:MM:SS' form
    GraftSqlBridge.registerFunction(spark, "sec_to_time", exprs => {
      val c = GraftSqlBridge.column(exprs.head)
      val fractional = scala.util.Try(exprs.head.dataType).toOption match {
        case Some(org.apache.spark.sql.types.DoubleType) |
             Some(org.apache.spark.sql.types.FloatType) => true
        case Some(dt: org.apache.spark.sql.types.DecimalType)
          if dt.scale > 0 => true
        case _ => false
      }
      val base = MySql.secToTime(c)
      GraftSqlBridge.expression(
        if (!fractional) base
        else {
          val fr = org.apache.spark.sql.functions.lpad(
            org.apache.spark.sql.functions.round(
              (org.apache.spark.sql.functions.abs(c.cast("double")) -
                org.apache.spark.sql.functions.floor(
                  org.apache.spark.sql.functions.abs(c.cast("double"))))
                * 1000000, 0).cast("long").cast("string"), 6, "0")
          org.apache.spark.sql.functions.concat(base,
            org.apache.spark.sql.functions.lit("."), fr)
        })
    })
    fn("time_to_sec")(cs => MySql.timeToSecFull(cs.head).cast("long"))
    fn("maketime")(cs => MySql.maketime(cs.head, cs(1), cs(2)))
    // MICROSECOND(expr): the fractional-seconds part in microseconds.
    // MySQL prefix-parses string temporals ('…59.01XXXX' → 10000,
    // date_formats.test) — read the first fraction digits from the
    // string form, so garbage tails degrade like MySQL instead of
    // nulling the whole cast.
    fn("microsecond")(cs => {
      val frac = regexp_extract(cs.head.cast("string"),
        "\\.(\\d{1,6})", 1)
      when(length(frac) > 0, rpad(frac, 6, "0").cast("long"))
        .otherwise(lit(0L))
    })
    fn("makedate")(cs => MySql.makedate(cs.head, cs(1)))
    fn("to_days")(cs => MySql.toDays(cs.head))
    fn("from_days")(cs => MySql.fromDays(cs.head))
    fn("to_seconds")(cs => MySql.toSeconds(cs.head))
    // introspection shims: the engine is UTF-8 native (SURVEY §1.2) —
    // one charset, one collation (bit_type.test calls both)
    // a BINARY-typed argument reports the binary pseudo-charset
    // (bit_type.test's `charset(binary a)`)
    GraftSqlBridge.registerFunction(spark, "charset", exprs => {
      val isBin = scala.util.Try(exprs.head.dataType).toOption
        .contains(org.apache.spark.sql.types.BinaryType)
      GraftSqlBridge.expression(lit(if (isBin) "binary" else "utf8mb4"))
    })
    GraftSqlBridge.registerFunction(spark, "collation", exprs => {
      val isBin = scala.util.Try(exprs.head.dataType).toOption
        .contains(org.apache.spark.sql.types.BinaryType)
      GraftSqlBridge.expression(
        lit(if (isBin) "binary" else "utf8mb4_general_ci"))
    })
    // MySQL's ACOS/ASIN return NULL outside [-1, 1] where Spark's give
    // NaN (bit_type.test). Built from the Catalyst nodes DIRECTLY —
    // functions.acos resolves by NAME and would loop back into this
    // registration.
    GraftSqlBridge.registerFunction(spark, "acos", exprs => {
      import org.apache.spark.sql.catalyst.expressions._
      val d = Cast(exprs.head, org.apache.spark.sql.types.DoubleType)
      If(GreaterThan(Abs(d), Literal(1.0)),
        Literal(null, org.apache.spark.sql.types.DoubleType), Acos(d))
    })
    GraftSqlBridge.registerFunction(spark, "asin", exprs => {
      import org.apache.spark.sql.catalyst.expressions._
      val d = Cast(exprs.head, org.apache.spark.sql.types.DoubleType)
      If(GreaterThan(Abs(d), Literal(1.0)),
        Literal(null, org.apache.spark.sql.types.DoubleType), Asin(d))
    })
    // MySQL TRUNCATE(x, d): toward-zero truncation at d decimal places
    // (bit_type.test); negative d zeroes digits left of the point
    GraftSqlBridge.registerFunction(spark, "truncate", exprs => {
      val c = GraftSqlBridge.column(exprs.head)
      // MySQL clamps an out-of-range digit count (func_math.test
      // `truncate(4, 18446744073709551614)` = 4) — the raw int cast
      // wraps it instead
      val dClamped = least(greatest(GraftSqlBridge.column(exprs(1))
        .cast("decimal(38,0)"), lit(-30)), lit(30)).cast("int")
      val p = pow(lit(10.0), dClamped)
      // only a TEMPORAL-typed argument coerces through its digit
      // string (type_timestamp.test TRUNCATEs a TIMESTAMP column:
      // '2020-01-02 03:04:05' ≡ 20200102030405) — the check is on the
      // resolved dataType, NOT the rendered value: a VARCHAR holding
      // '2020-01-02' prefix-parses to 2020 in MySQL, never 20200102
      val isTemporalArg = scala.util.Try(exprs.head.dataType)
        .toOption.exists(dt =>
          dt.isInstanceOf[org.apache.spark.sql.types.TimestampType] ||
            dt.isInstanceOf[org.apache.spark.sql.types.TimestampNTZType] ||
            dt.isInstanceOf[org.apache.spark.sql.types.DateType])
      val isStringArg = scala.util.Try(exprs.head.dataType).toOption
        .contains(org.apache.spark.sql.types.StringType)
      val x =
        if (isTemporalArg)
          regexp_replace(c.cast("string"), "[^0-9]", "").cast("double")
        else if (isStringArg)
          // MySQL prefix-parses string numerics ('2020-01-02' → 2020,
          // 'abc' → 0); Spark's cast would null the whole value
          coalesce(regexp_extract(c,
            "^\\s*(-?\\d+(?:\\.\\d+)?(?:[eE][+-]?\\d+)?)", 1)
            .cast("double"), lit(0.0))
        else c.cast("double")
      // exact path for DECIMAL/integer inputs with a constant digit
      // count: truncate-toward-zero as scale-aware RoundFloor/RoundCeil
      // — the double detour flattens 18446744073709551614
      // (func_math.test). Raw Catalyst nodes: a functions.floor call
      // would resolve by NAME back to the single-argument graft floor
      // registered below and silently drop the scale.
      val isExactArg = scala.util.Try(exprs.head.dataType)
        .toOption.exists { dt =>
          import org.apache.spark.sql.types._
          dt.isInstanceOf[DecimalType] || dt == LongType ||
            dt == IntegerType || dt == ShortType || dt == ByteType
        }
      if (isExactArg && exprs(1).foldable) {
        import org.apache.spark.sql.catalyst.expressions._
        val xd = GraftSqlBridge.expression(c.cast("decimal(38,8)"))
        val dE = GraftSqlBridge.expression(dClamped)
        If(GreaterThanOrEqual(xd, Literal(0)),
          RoundFloor(xd, dE), RoundCeil(xd, dE))
      } else
        GraftSqlBridge.expression(signum(x) * floor(abs(x) * p) / p)
    })
    // EXP/POW overflow to ±Infinity from finite arguments is MySQL
    // 1690 (func_math.test `EXP(750)`, `POW(10, 309)`) — Spark returns
    // Infinity silently
    locally {
      // the inner expression MUST be the raw Catalyst node — a
      // functions.exp/pow call inside its own registration resolves
      // back through THIS registry and expands forever
      def rawD(e: Expression): Column = GraftSqlBridge.column(
        org.apache.spark.sql.catalyst.expressions.Cast(e,
          org.apache.spark.sql.types.DoubleType))
      def infChecked(name: String, f: Seq[Expression] => Expression): Unit =
        GraftSqlBridge.registerFunction(spark, name, exprs => {
          val x = rawD(f(exprs))
          GraftSqlBridge.expression(
            when(x === lit(Double.PositiveInfinity) ||
                x === lit(Double.NegativeInfinity),
              assert_true(lit(false),
                lit(s"DOUBLE value is out of range in $name() " +
                  "(MySQL error 1690)")).cast("double"))
              .otherwise(x))
        })
      def dbl(e: Expression): Expression =
        org.apache.spark.sql.catalyst.expressions.Cast(e,
          org.apache.spark.sql.types.DoubleType)
      infChecked("exp", es =>
        org.apache.spark.sql.catalyst.expressions.Exp(dbl(es.head)))
      infChecked("pow", es =>
        org.apache.spark.sql.catalyst.expressions.Pow(
          dbl(es.head), dbl(es(1))))
      infChecked("power", es =>
        org.apache.spark.sql.catalyst.expressions.Pow(
          dbl(es.head), dbl(es(1))))
      // COT(0) divides by zero → MySQL 1690 (func_math.test); DEGREES
      // of a near-max double overflows the same way
      infChecked("cot", es =>
        org.apache.spark.sql.catalyst.expressions.Cot(dbl(es.head)))
      infChecked("degrees", es =>
        org.apache.spark.sql.catalyst.expressions.ToDegrees(dbl(es.head)))
    }
    // JSON_CONTAINS(target, candidate[, path]) → 1/0 (MySQL containment
    // rules, JsonOps); one name serves both arities
    locally {
      val jc2 = udf(JsonOps.contains _)
      val jc3 = udf(JsonOps.containsAt _)
      fn("json_contains")(cs =>
        (if (cs.size >= 3)
          jc3(cs(0).cast("string"), cs(1).cast("string"),
            cs(2).cast("string"))
        else jc2(cs(0).cast("string"), cs(1).cast("string"))).cast("int"))
    }
    // JSON_ARRAY(v1, v2, …): each element JSON-rendered by its own type
    // (to_json of a 1-element array, brackets stripped, preserves
    // numeric vs string vs null rendering and string escaping)
    fn("json_array") { cs =>
      if (cs.isEmpty) lit("[]")
      else {
        val elems = cs.map(c => coalesce(
          regexp_replace(to_json(array(c)), "^\\[|\\]$", ""), lit("null")))
        concat(lit("["), concat_ws(", ", elems: _*), lit("]"))
      }
    }
    fn("period_add")(cs => MySql.periodAdd(cs.head, cs(1)))
    fn("period_diff")(cs => MySql.periodDiff(cs.head, cs(1)))
    fn("dayname")(cs => MySql.dayname(cs.head))
    fn("monthname")(cs => MySql.monthname(cs.head))
    // STRCMP over BIT columns compares the bit VALUES (the binary
    // string context orders by the big-endian bytes = numeric order —
    // bit_type.test)
    GraftSqlBridge.registerFunction(spark, "strcmp", exprs => {
      def isBit(e: org.apache.spark.sql.catalyst.expressions.Expression) =
        e match {
          case ar: org.apache.spark.sql.catalyst.expressions
            .AttributeReference =>
            ar.metadata.contains("graft.mysql.type") &&
              ar.metadata.getString("graft.mysql.type").startsWith("BIT")
          case _ => false
        }
      val (a, b) = (GraftSqlBridge.column(exprs.head),
        GraftSqlBridge.column(exprs(1)))
      GraftSqlBridge.expression(
        if (isBit(exprs.head) || isBit(exprs(1))) {
          // the reference compares the bit values' DIGIT strings
          // lexically (strcmp(191, 88) = -1: '1' < '8' — bit_type.test)
          val (x, y) = (a.cast("decimal(20,0)").cast("string"),
            b.cast("decimal(20,0)").cast("string"))
          when(x < y, -1).when(x > y, 1).otherwise(0)
        } else MySql.strcmp(a, b))
    })
    fn("elt")(cs => MySql.elt(cs.head, cs.tail: _*))
    fn("field")(cs => MySql.field(cs.head, cs.tail: _*))
    fn("insert")(cs => MySql.insertStr(cs.head, cs(1), cs(2), cs(3)))
    // MID/SUBSTRING(str, pos, len): MySQL returns '' for pos = 0 and
    // for |pos| past the string's length (mid_function.test pins both;
    // Spark's substr treats 0 as 1 and clamps negative overshoot)
    fn("mid")(cs =>
      when(cs(1) === 0 ||
          org.apache.spark.sql.functions.abs(cs(1)) >
            org.apache.spark.sql.functions.length(cs.head), lit(""))
        .otherwise(cs.head.substr(cs(1), cs(2))))
    fn("oct")(cs => conv(cs.head.cast("string"), 10, 8))
    // CONV over a BIT column: the reference feeds the bit VALUE's
    // base-10 digits regardless of from_base (bit_type.test pins
    // conv(a,16,2) = '10111111' for a=191 — that is 191 base-10 → 2;
    // common_definitions.h:74 stores BIT as an integer value)
    GraftSqlBridge.registerFunction(spark, "conv", exprs => {
      val isBit = exprs.head match {
        case ar: org.apache.spark.sql.catalyst.expressions
          .AttributeReference =>
          ar.metadata.contains("graft.mysql.type") &&
            ar.metadata.getString("graft.mysql.type").startsWith("BIT")
        case _ => false
      }
      val from =
        if (isBit) org.apache.spark.sql.catalyst.expressions.Literal(10)
        else exprs(1)
      org.apache.spark.sql.catalyst.expressions.Conv(
        GraftSqlBridge.expression(
          GraftSqlBridge.column(exprs.head).cast("string")),
        from, exprs(2))
    })
    // MySQL FORMAT is EXACT over decimal/integer inputs
    // (func_math.test formats 18446744073709551614 without the
    // double-roundtrip flattening to …552,000) — only true
    // floating-point inputs ride the double path
    GraftSqlBridge.registerFunction(spark, "format", exprs => {
      val isFloating = scala.util.Try(exprs.head.dataType)
        .toOption.exists(dt =>
          dt == org.apache.spark.sql.types.DoubleType ||
            dt == org.apache.spark.sql.types.FloatType)
      val target = if (isFloating) "double" else "decimal(38,12)"
      org.apache.spark.sql.catalyst.expressions.FormatNumber(
        GraftSqlBridge.expression(
          GraftSqlBridge.column(exprs.head).cast(target)),
        GraftSqlBridge.expression(
          GraftSqlBridge.column(exprs(1)).cast("int")))
    })
    // MySQL SQRT of a negative is NULL, not NaN (func_math.test).
    // Raw Catalyst nodes — functions.sqrt would resolve back to THIS
    // registration and loop (same rule as the md5 shim above).
    GraftSqlBridge.registerFunction(spark, "sqrt", exprs => {
      import org.apache.spark.sql.catalyst.expressions._
      val s = Sqrt(Cast(exprs.head,
        org.apache.spark.sql.types.DoubleType))
      NaNvl(s, Literal(null, org.apache.spark.sql.types.DoubleType))
    })
    // MySQL STD / STDDEV / VARIANCE are the POPULATION variants
    // (std_test.test's golden floor(STD(...)) values); Spark's builtins
    // of the same names are SAMPLE. STDDEV_SAMP/VAR_SAMP keep their
    // explicit sample meaning in both dialects.
    for (name <- Seq("std", "stddev"))
      GraftSqlBridge.registerFunction(spark, name, exprs =>
        org.apache.spark.sql.catalyst.expressions.aggregate.StddevPop(
          GraftSqlBridge.expression(
            GraftSqlBridge.column(exprs.head).cast("double")))
          .toAggregateExpression())
    GraftSqlBridge.registerFunction(spark, "variance", exprs =>
      org.apache.spark.sql.catalyst.expressions.aggregate.VariancePop(
        GraftSqlBridge.expression(
          GraftSqlBridge.column(exprs.head).cast("double")))
        .toAggregateExpression())
    // MySQL's md5 stringifies any argument (md5_function.test hashes
    // BIGINTs); Spark's builtin requires BINARY. Built directly as the
    // LENGTH/CHAR_LENGTH of a temporal measure MySQL's rendering —
    // a default (fsp=0) TIMESTAMP prints 'YYYY-MM-DD HH:MM:SS' = 19,
    // a DATE 10 (alter_column.test's length(ctm2) golden); Spark's
    // implicit cast would count the fractional tail. Other types pass
    // through Catalyst Length/OctetLength untouched (builders would
    // resolve back into this registry and loop).
    Seq("length", "char_length", "character_length").foreach { nm =>
      GraftSqlBridge.registerFunction(spark, nm, exprs => {
        val dtOpt = scala.util.Try(exprs.head.dataType).toOption
        // a column declared DATETIME(n>0)/TIMESTAMP(n>0) keeps its
        // fractional tail in MySQL's rendering — LENGTH of a
        // DATETIME(6) value is 26, not 19
        val fsp = exprs.head match {
          case ar: org.apache.spark.sql.catalyst.expressions
            .AttributeReference if ar.metadata.contains("graft.mysql.type") =>
            """(?i)^(?:DATETIME|TIMESTAMP)\((\d)\)""".r
              .findFirstMatchIn(ar.metadata.getString("graft.mysql.type"))
              .map(_.group(1).toInt).getOrElse(0)
          case _ => 0
        }
        val tsFmt =
          if (fsp > 0) "yyyy-MM-dd HH:mm:ss." + ("S" * fsp)
          else "yyyy-MM-dd HH:mm:ss"
        val rendered = dtOpt match {
          case Some(_: org.apache.spark.sql.types.TimestampType) |
               Some(_: org.apache.spark.sql.types.TimestampNTZType) =>
            org.apache.spark.sql.catalyst.expressions.DateFormatClass(
              exprs.head,
              org.apache.spark.sql.catalyst.expressions
                .Literal(tsFmt))
          case Some(_: org.apache.spark.sql.types.DateType) =>
            GraftSqlBridge.expression(
              GraftSqlBridge.column(exprs.head).cast("string"))
          case _ => exprs.head
        }
        val arg = scala.util.Try(rendered.dataType).toOption match {
          // binary stays binary: Length counts its bytes (MySQL
          // LENGTH over BLOB/BINARY)
          case Some(org.apache.spark.sql.types.BinaryType) |
               Some(org.apache.spark.sql.types.StringType) => rendered
          case _ => GraftSqlBridge.expression(
            GraftSqlBridge.column(rendered).cast("string"))
        }
        org.apache.spark.sql.catalyst.expressions.Length(arg)
      })
    }
    // Catalyst Md5 — functions.md5 would resolve back to THIS
    // registration and loop. FLOAT/DOUBLE arguments hash MySQL's
    // rendered string ('-7.40287e18'), not Spark's ('-7.4028661E18')
    // — md5_function.test pins the digests.
    GraftSqlBridge.registerFunction(spark, "md5", exprs => {
      val dtOpt = scala.util.Try(exprs.head.dataType).toOption
      val rendered = dtOpt match {
        case Some(org.apache.spark.sql.types.DoubleType) =>
          org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
            MySql.getClass, org.apache.spark.sql.types.StringType,
            "doubleToUtf8", Seq(exprs.head),
            Seq(org.apache.spark.sql.types.DoubleType))
        case Some(org.apache.spark.sql.types.FloatType) =>
          // the reference stores FLOAT in a 64-bit cell, so string
          // contexts render the PROMOTED double ('-7.402866104525128
          // e18' is what md5_function.result's digest hashes), not the
          // 6-digit float display
          org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
            MySql.getClass, org.apache.spark.sql.types.StringType,
            "doubleToUtf8",
            Seq(org.apache.spark.sql.catalyst.expressions.Cast(
              exprs.head, org.apache.spark.sql.types.DoubleType)),
            Seq(org.apache.spark.sql.types.DoubleType))
        case _ => GraftSqlBridge.expression(
          GraftSqlBridge.column(exprs.head).cast("string"))
      }
      org.apache.spark.sql.catalyst.expressions.Md5(
        GraftSqlBridge.expression(
          GraftSqlBridge.column(rendered).cast("binary")))
    })
    // WEEK/YEARWEEK take a literal mode (0-7); default 0
    GraftSqlBridge.registerFunction(spark, "week", exprs => {
      val mode = if (exprs.length > 1)
        litOf(exprs(1)).map(_.toString.toInt).getOrElse(0) else 0
      GraftSqlBridge.expression(
        MySql.week(GraftSqlBridge.column(exprs.head), mode))
    })
    GraftSqlBridge.registerFunction(spark, "yearweek", exprs => {
      val mode = if (exprs.length > 1)
        litOf(exprs(1)).map(_.toString.toInt).getOrElse(0) else 0
      GraftSqlBridge.expression(
        MySql.yearweek(GraftSqlBridge.column(exprs.head), mode))
    })
    // DATE_FORMAT with a %-pattern literal is MySQL's grammar; a
    // pattern without '%' falls through to Spark's own date_format
    GraftSqlBridge.registerFunction(spark, "date_format", exprs => {
      val fmt = litOf(exprs(1)).map(_.toString)
      val d = GraftSqlBridge.column(exprs.head)
      fmt match {
        case Some(f) if f.contains("%") =>
          GraftSqlBridge.expression(MySql.dateFormat(d, f))
        // terminal branches build DateFormatClass directly —
        // functions.date_format would resolve back here and loop
        case Some(f) => org.apache.spark.sql.catalyst.expressions
          .DateFormatClass(
            GraftSqlBridge.expression(d.cast("timestamp")),
            org.apache.spark.sql.catalyst.expressions.Literal(f))
        case None => org.apache.spark.sql.catalyst.expressions
          .DateFormatClass(exprs.head, exprs(1))
      }
    })
    // TIMESTAMP(d[, t]): the 2-arg form adds a time literal to a
    // datetime (issue429); 1-arg keeps the builtin cast behavior
    GraftSqlBridge.registerFunction(spark, "timestamp", exprs =>
      if (exprs.length >= 2)
        GraftSqlBridge.expression(
          GraftSqlBridge.column(exprs.head).cast("timestamp") +
            org.apache.spark.sql.functions.make_dt_interval(
              org.apache.spark.sql.functions.lit(0),
              org.apache.spark.sql.functions.lit(0),
              org.apache.spark.sql.functions.lit(0),
              MySql.timeToSecFull(GraftSqlBridge.column(exprs(1)))))
      else org.apache.spark.sql.catalyst.expressions.Cast(
        exprs.head, org.apache.spark.sql.types.TimestampType))
    // TIME(x): Spark has no TIME type — MySQL renders 'HH:mm:ss'.
    // String literals parse with MySQL's loose time grammar
    // (time_function.test): a bare digit run reads right-to-left as
    // [D]HHMMSS ('112233' → 11:22:33, '1811' → 00:18:11 with the
    // invalid tail truncated); a datetime form takes its time-of-day;
    // a fractional tail keeps its DISPLAY width but zeroes out —
    // the reference's TIME cells truncate fsp to 0 ('11:22:33.4455'
    // → '11:22:33.0000', golden time_function.result:20-24).
    def mysqlTimeLiteral(s0: String): Option[String] = {
      val s = s0.trim
      def fracZero(fr: String): String =
        if (fr == null || fr.isEmpty) ""
        else "." + ("0" * math.min(fr.length, 6))
      val dtRe = ("""^(\d{1,4})[-/.](\d{1,2})[-/.](\d{1,2})[ T]""" +
        """(\d{1,2}):(\d{1,2})(?::(\d{1,2}))?(?:\.(\d+))?$""").r
      val tRe = """^(\d{1,3}):(\d{1,2})(?::(\d{1,2}))?(?:\.(\d+))?$""".r
      s match {
        case dtRe(_, _, _, h, mi, se, fr) =>
          Some(f"${h.toInt}%02d:${mi.toInt}%02d:" +
            f"${Option(se).getOrElse("0").toInt}%02d" + fracZero(fr))
        case tRe(h, mi, se, fr) =>
          Some(f"${h.toInt}%02d:${mi.toInt}%02d:" +
            f"${Option(se).getOrElse("0").toInt}%02d" + fracZero(fr))
        case _ =>
          val digits = s.takeWhile(_.isDigit)
          if (digits.isEmpty) None
          else {
            val ss = digits.takeRight(2)
            val mm = digits.dropRight(2).takeRight(2)
            val hh = digits.dropRight(4)
            Some(f"${if (hh.isEmpty) 0 else hh.toInt}%02d:" +
              f"${if (mm.isEmpty) 0 else mm.toInt}%02d:" +
              f"${if (ss.isEmpty) 0 else ss.toInt}%02d")
          }
      }
    }
    // DATE(x): for a STRING argument, the date token extracts
    // textually so the zero dates a dynamic str_to_date emits survive
    // ('0000-00-00 10:20:10' → '0000-00-00', date_formats.test) —
    // Spark's DateType cast would NULL them; non-strings keep the
    // typed cast
    GraftSqlBridge.registerFunction(spark, "date", exprs => {
      val isStr = scala.util.Try(exprs.head.dataType).toOption
        .contains(org.apache.spark.sql.types.StringType)
      if (!isStr) org.apache.spark.sql.catalyst.expressions.Cast(
        exprs.head, org.apache.spark.sql.types.DateType)
      else {
        val c = GraftSqlBridge.column(exprs.head)
        GraftSqlBridge.expression(
          when(c.rlike("^\\d{1,4}-\\d{1,2}-\\d{1,2}"),
            regexp_replace(regexp_replace(
              regexp_extract(c, "^(\\d{1,4}-\\d{1,2}-\\d{1,2})", 1),
              "-(\\d)-", "-0$1-"), "-(\\d)$", "-0$1"))
            .otherwise(c.cast("date").cast("string")))
      }
    })
    GraftSqlBridge.registerFunction(spark, "time", exprs => {
      val c = GraftSqlBridge.column(exprs.head)
      val isStr = scala.util.Try(exprs.head.dataType).toOption
        .contains(org.apache.spark.sql.types.StringType)
      if (isStr) litOf(exprs.head).map(_.toString) match {
        case Some(s) => GraftSqlBridge.expression(
          lit(mysqlTimeLiteral(s).orNull))
        case None =>
          // stored TIME columns are normalized 'HH:mm:ss' strings —
          // identity; a datetime-SHAPED string (including the zero
          // dates a dynamic str_to_date emits, '0000-00-00 10:20:10')
          // yields its time-of-day by extraction — Spark's timestamp
          // cast would NULL the zero date (date_formats.test's
          // `TIME(str_to_date(…))` golden keeps '10:20:10').
          // A DYNAMIC str_to_date (format from a column) types the
          // result TIME(6) — every row renders a 6-digit fraction
          // ('10:20:10.000000', date_formats.test).
          val dynamicStd = exprs.head match {
            case si: org.apache.spark.sql.catalyst.expressions
              .objects.StaticInvoke =>
              si.functionName == "strToDateMysql" &&
                si.arguments.lift(2).exists {
                  case org.apache.spark.sql.catalyst.expressions
                    .Literal(true, org.apache.spark.sql.types
                    .BooleanType) => true
                  case _ => false
                }
            case _ => false
          }
          val base =
            when(c.rlike("^\\d{2}:\\d{2}:\\d{2}$"), c)
              .when(c.rlike("^\\d{1,4}-\\d{1,2}-\\d{1,2}[ T]" +
                  "\\d{1,2}:\\d{1,2}:\\d{1,2}"),
                regexp_replace(
                  regexp_extract(c,
                    "[ T](\\d{1,2}:\\d{1,2}:\\d{1,2}(?:\\.\\d+)?)", 1),
                  "^(\\d):", "0$1:"))
              .otherwise(date_format(c.cast("timestamp"), "HH:mm:ss"))
          GraftSqlBridge.expression(
            if (!dynamicStd) regexp_replace(base, "\\.\\d+$", "")
            else when(base.isNull, lit(null))
              .otherwise(concat(
                regexp_replace(base, "\\.\\d+$", ""), lit("."),
                org.apache.spark.sql.functions.rpad(
                  regexp_extract(base, "\\.(\\d+)$", 1), 6, "0"))))
      }
      else GraftSqlBridge.expression(
        date_format(c.cast("timestamp"), "HH:mm:ss"))
    })
    // CONVERT_TZ(ts, from, to) (issue464): NAMED zones need the mysql
    // time-zone tables, which the reference ships without — those
    // return NULL; numeric offsets ('+05:00') convert
    fn("convert_tz")(cs => {
      val offsetRe = "^[+-]?\\d{1,2}:\\d{2}$"
      when(!cs(1).rlike(offsetRe) || !cs(2).rlike(offsetRe), lit(null))
        .otherwise(from_utc_timestamp(
          to_utc_timestamp(cs.head.cast("timestamp"), cs(1)), cs(2)))
    })
    // CEILING/FLOOR return BIGINT in MySQL — an argument past the
    // signed range is 1690 out-of-range (func_math.test's
    // `ceiling(18446744073709551614)`); assert_true carries the throw
    // without changing the in-range value
    def bigintRangeChecked(name: String,
                           f: org.apache.spark.sql.catalyst.expressions
                             .Expression =>
                             org.apache.spark.sql.catalyst.expressions
                               .Expression): Unit =
      GraftSqlBridge.registerFunction(spark, name, exprs => {
        val x = GraftSqlBridge.column(exprs.head)
        val dtOpt = scala.util.Try(exprs.head.dataType).toOption
        // temporal input goes through its digit number (CEIL(ts) ≡
        // CEIL(20200102030405), type_timestamp.test); everything else
        // keeps its own type
        val isTemporalArg = dtOpt.exists(dt =>
          dt.isInstanceOf[org.apache.spark.sql.types.TimestampType] ||
            dt.isInstanceOf[org.apache.spark.sql.types
              .TimestampNTZType] ||
            dt.isInstanceOf[org.apache.spark.sql.types.DateType])
        // the 1690 out-of-range throw applies to EXACT-value numeric
        // arguments only (integral/decimal, func_math.test's
        // `ceiling(18446744073709551614)` — a DecimalType literal);
        // CEILING/FLOOR of a DOUBLE returns a float result in MySQL,
        // so 1.8e19 passes through unchecked
        val isExactNumeric = dtOpt.exists {
          case org.apache.spark.sql.types.ByteType |
               org.apache.spark.sql.types.ShortType |
               org.apache.spark.sql.types.IntegerType |
               org.apache.spark.sql.types.LongType => true
          case _: org.apache.spark.sql.types.DecimalType => true
          case _ => false
        }
        // `CAST(x AS UNSIGNED)` arrives as the dialect's modulo-2^64
        // wrap — Cast(CaseWhen(…), DECIMAL(20,0)) — and its type in
        // MySQL is BIGINT UNSIGNED, where values up to 2^64-1 are IN
        // range: ceiling(cast(-2 as unsigned)) =
        // 18446744073709551614 with NO 1690 (func_math.result:33).
        // Only a SIGNED exact argument past 2^63-1 overflows the
        // BIGINT result. The wrap's Cast-over-CaseWhen shape is the
        // provenance marker; a bare u64-magnitude DECIMAL literal
        // (ceiling(18446744073709551614)) keeps the throw.
        val isUnsignedWrap = exprs.head match {
          case c: org.apache.spark.sql.catalyst.expressions.Cast =>
            c.dataType ==
              org.apache.spark.sql.types.DecimalType(20, 0) &&
              c.child.isInstanceOf[
                org.apache.spark.sql.catalyst.expressions.CaseWhen]
          case _ => false
        }
        // FLOAT/DOUBLE arguments return a FLOATING result in MySQL
        // ("for string or floating-point arguments, the return value
        // has a floating-point type") — past ±2^63 a double is
        // already integral (ulp ≥ 1024), so the value passes through
        // where Spark's long-typed Floor/Ceil would saturate at
        // Long.MaxValue (std_test.test's floor(VAR_POP(...)) goldens
        // pin the full 38-digit magnitude)
        val isFloating = dtOpt.exists {
          case org.apache.spark.sql.types.DoubleType |
               org.apache.spark.sql.types.FloatType => true
          case _ => false
        }
        if (isFloating) {
          val xf = GraftSqlBridge.column(exprs.head).cast("double")
          GraftSqlBridge.expression(
            when(abs(xf) >= lit(9.223372036854776e18), xf)
              .otherwise(GraftSqlBridge.column(f(exprs.head))
                .cast("double")))
        }
        else if (isUnsignedWrap || (!isTemporalArg && !isExactNumeric))
          f(exprs.head)
        else {
          val x0 =
            if (isTemporalArg)
              regexp_replace(x.cast("string"), "[^0-9]", "")
                .cast("decimal(38,4)")
            else x
          // CaseWhen evaluates branches lazily per row, so the throw
          // only fires on actually-out-of-range values; the value's
          // type is preserved (NullType coerces to it). An exact value
          // that OVERFLOWS the decimal(38,4) probe (null comparison)
          // is out of range a fortiori — coalesce counts it. The
          // wrapped function MUST be the raw Catalyst expression: a
          // functions.* builder inside its own registration resolves
          // back through THIS registry and expands forever.
          val checked = when(x0.isNull, x0)
            .when(coalesce(abs(x0.cast("decimal(38,4)"))
              > lit(new java.math.BigDecimal(Long.MaxValue)), lit(true)),
              assert_true(lit(false)))
            .otherwise(x0)
          f(GraftSqlBridge.expression(checked))
        }
      })
    // ROUND over a temporal coerces through its digit number too
    GraftSqlBridge.registerFunction(spark, "round", exprs => {
      val isTemporalArg = scala.util.Try(exprs.head.dataType)
        .toOption.exists(dt =>
          dt.isInstanceOf[org.apache.spark.sql.types.TimestampType] ||
            dt.isInstanceOf[org.apache.spark.sql.types.TimestampNTZType] ||
            dt.isInstanceOf[org.apache.spark.sql.types.DateType])
      val head =
        if (!isTemporalArg) exprs.head
        else GraftSqlBridge.expression(
          regexp_replace(GraftSqlBridge.column(exprs.head).cast("string"),
            "[^0-9]", "").cast("decimal(38,4)"))
      // MySQL clamps an out-of-int-range digit count instead of
      // wrapping it (func_math.test `round(4, 18446744073709551614)`
      // = 4, the cast-to-int wraparound gave 0)
      val scale = if (exprs.length > 1)
        GraftSqlBridge.expression(
          least(greatest(GraftSqlBridge.column(exprs(1))
            .cast("decimal(38,0)"), lit(-30)), lit(30)).cast("int"))
        else org.apache.spark.sql.catalyst.expressions.Literal(0)
      org.apache.spark.sql.catalyst.expressions.Round(head, scale)
    })
    // DATABASE()/SCHEMA(): the session's current database — the
    // StatementRunner maintains it in a session conf on USE
    GraftSqlBridge.registerFunction(spark, "database", _ =>
      GraftSqlBridge.expression(
        lit(spark.conf.get("spark.graft.currentDb", "test"))))
    GraftSqlBridge.registerFunction(spark, "schema", _ =>
      GraftSqlBridge.expression(
        lit(spark.conf.get("spark.graft.currentDb", "test"))))
    bigintRangeChecked("ceiling",
      org.apache.spark.sql.catalyst.expressions.Ceil(_))
    bigintRangeChecked("ceil",
      org.apache.spark.sql.catalyst.expressions.Ceil(_))
    bigintRangeChecked("floor",
      org.apache.spark.sql.catalyst.expressions.Floor(_))
    // MySQL ATAN2 accepts one argument (= ATAN; bit_type.test)
    GraftSqlBridge.registerFunction(spark, "atan2", exprs =>
      if (exprs.length == 1)
        org.apache.spark.sql.catalyst.expressions.Atan(exprs.head)
      else org.apache.spark.sql.catalyst.expressions.Atan2(
        exprs.head, exprs(1)))
    // STR_TO_DATE: MySQL's extract_date_time reimplemented
    // (MySql.strToDateImpl) — returns the RENDERED string because the
    // result space (zero dates '0000-00-00 10:20:10', >24h TIME
    // '58:11:12') is not representable as a Spark timestamp. A
    // non-foldable format (column — date_formats.test's t1) makes the
    // result column DATETIME(6) for every row, matching MySQL's
    // dynamic-format typing.
    GraftSqlBridge.registerFunction(spark, "str_to_date", exprs => {
      val dynamic = !scala.util.Try(exprs(1).foldable).getOrElse(false)
      // BOTH arguments literal → fold at plan time, and give a CLEAN
      // date/datetime result its real Spark type (issue1860's
      // `… UNION SELECT str_to_date('2022-02-03','%Y-%m-%d')` must
      // coerce and DEDUP as a temporal). Fuzzy values — zero dates
      // ('0000-00-00', range.test), >24h TIMEs ('58:11:12'),
      // microsecond renderings ('….001200') — have no Spark temporal
      // representation and stay strings.
      val folded: Option[org.apache.spark.sql.catalyst.expressions
        .Expression] =
        if (dynamic || !scala.util.Try(exprs.head.foldable)
            .getOrElse(false)) None
        else {
          val v = litOf(exprs.head).map(_.toString)
          val f = litOf(exprs(1)).map(_.toString)
          if (v.isEmpty || f.isEmpty) None
          else {
            val r = MySql.strToDateMysql(
              org.apache.spark.unsafe.types.UTF8String.fromString(v.get),
              org.apache.spark.unsafe.types.UTF8String.fromString(f.get),
              false)
            if (r == null) Some(org.apache.spark.sql.catalyst
              .expressions.Literal(null,
                org.apache.spark.sql.types.StringType))
            else {
              val s = r.toString
              val asDate = scala.util.Try(java.sql.Date.valueOf(s))
                .filter(_.toString == s).toOption
              val asTs =
                if (s.contains(".") || !s.contains(" ")) None
                else scala.util.Try(java.sql.Timestamp.valueOf(s))
                  .filter(_.toString == s + ".0").toOption
              asDate.map(d => org.apache.spark.sql.catalyst.expressions
                .Literal.create(d, org.apache.spark.sql.types.DateType))
                .orElse(asTs.map(t => org.apache.spark.sql.catalyst
                  .expressions.Literal.create(t,
                    org.apache.spark.sql.types.TimestampType)))
                .orElse(Some(org.apache.spark.sql.catalyst.expressions
                  .Literal(org.apache.spark.unsafe.types.UTF8String
                    .fromString(s),
                    org.apache.spark.sql.types.StringType)))
            }
          }
        }
      folded.getOrElse(
        org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
          MySql.getClass, org.apache.spark.sql.types.StringType,
          "strToDateMysql",
          Seq(org.apache.spark.sql.catalyst.expressions.Cast(
            exprs.head, org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.catalyst.expressions.Cast(
              exprs(1), org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.catalyst.expressions.Literal(dynamic)),
          Seq(org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.BooleanType)))
    })
  }
}
