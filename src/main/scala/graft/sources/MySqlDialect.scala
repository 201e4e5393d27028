package graft.sources

import scala.util.matching.Regex

/** MySQL → Spark SQL SELECT-dialect rewrite — the thin front-end layer
  * the reference inherits from MySQL's parser (queries enter through
  * `sql/ha_my_tianmu.cpp:84` of /root/reference, already parsed by
  * MySQL 5.7's grammar). [[StatementRunner]] routes `LOAD DATA` /
  * `INTO OUTFILE` itself; the remaining statement text is Spark SQL —
  * which accepts most of the MySQL spellings natively (backtick
  * identifiers, double-quoted strings under the non-ANSI default,
  * `<>`/`!=`, `<=>`, `DIV`) — except a handful of MySQL-isms this
  * pre-pass translates so verbatim MTR-style SELECT text runs unchanged:
  *
  *  - `# comment` → `-- comment` (MySQL hash comments);
  *  - `&&` → `AND`, `||` → `OR` (MySQL's default SQL mode: `||` is
  *    logical OR unless PIPES_AS_CONCAT; Spark would parse it as string
  *    concat — use CONCAT(...) for concatenation, as MTR tests do);
  *  - `LIMIT offset, count` → `LIMIT count OFFSET offset`;
  *  - `FROM DUAL` → `FROM (SELECT 1) AS DUAL` (Spark has no DUAL);
  *  - bit literals `b'0101'` / `0b0101` → their integer value (MySQL
  *    BIT-type notation, bit.test / bit_type.test; ≤63 bits per the
  *    reference's cap, common_definitions.h:143 — Spark has no binary
  *    integer literal);
  *  - `AS 'alias'` → ``AS `alias` `` (MySQL's quoted aliases,
  *    aliases.test) and `CAST(… AS UNSIGNED/SIGNED)` →
  *    `DECIMAL(20,0)`/`BIGINT` (the §1.2 type mapping,
  *    bigint_unsigned.test).
  *
  * The scan is token-aware: text inside single/double-quoted string
  * literals (with backslash escapes and quote doubling), backtick-quoted
  * identifiers, and comments is NEVER rewritten — `'a && b'` stays a
  * three-word string. This is a character-level front end, not a parser:
  * structural rewrites beyond these (e.g. MySQL's multi-table DELETE
  * syntax) live behind the Scala APIs ([[Dml]]).
  */
object MySqlDialect {

  private val LimitRe: Regex = """(?is)^LIMIT\s+(\d+)\s*,\s*(\d+)""".r
  private val DualRe: Regex = """(?is)^FROM\s+DUAL\b""".r

  private def isWordChar(c: Char): Boolean =
    Character.isLetterOrDigit(c) || c == '_'

  private def wordAt(sql: String, pos: Int, w: String): Boolean =
    pos + w.length <= sql.length &&
      sql.regionMatches(true, pos, w, 0, w.length) &&
      (pos == 0 || !isWordChar(sql(pos - 1))) &&
      (pos + w.length == sql.length || !isWordChar(sql(pos + w.length)))

  /** Index just past the ')' matching the '(' at `open` (which must
    * point at a '('), honoring nested parens and string literals;
    * -1 when unbalanced. */
  private def matchParen(sql: String, open: Int): Int = {
    var depth = 0
    var i = open
    while (i < sql.length) {
      sql(i) match {
        case '(' => depth += 1; i += 1
        case ')' =>
          depth -= 1; i += 1
          if (depth == 0) return i
        case q @ ('\'' | '"') =>
          i += 1
          while (i < sql.length && sql(i) != q) {
            if (sql(i) == '\\') i += 1
            i += 1
          }
          i += 1
        case _ => i += 1
      }
    }
    -1
  }

  /** Split on top-level commas (paren- and string-aware). */
  private def splitArgs(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var depth = 0
    var start = 0
    var i = 0
    while (i < s.length) {
      s(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 =>
          out += s.substring(start, i); start = i + 1
        case q @ ('\'' | '"') =>
          i += 1
          while (i < s.length && s(i) != q) {
            if (s(i) == '\\') i += 1
            i += 1
          }
        case _ => ()
      }
      i += 1
    }
    out += s.substring(start)
    out.toSeq
  }

  /** MySQL CAST/CONVERT target type → Spark type text (§1.2 mapping). */
  private def castTarget(t: String): Option[String] = {
    val up = t.trim.toUpperCase
    if (up == "UNSIGNED" || up == "UNSIGNED INTEGER") Some("DECIMAL(20,0)")
    else if (up == "SIGNED" || up == "SIGNED INTEGER") Some("BIGINT")
    else if (up == "CHAR" || up.startsWith("CHAR(") ||
      up == "NCHAR" || up.startsWith("NCHAR(")) Some("STRING")
    else if (up == "DATE") Some("DATE")
    else if (up == "DATETIME" || up.startsWith("DATETIME(") ||
      up == "TIMESTAMP") Some("TIMESTAMP")
    else if (up.startsWith("DECIMAL")) Some(up)
    else if (up == "BINARY" || up.startsWith("BINARY(")) Some("BINARY")
    else if (up == "DOUBLE" || up == "FLOAT" || up == "REAL") Some("DOUBLE")
    else None
  }

  /** MySQL EXTRACT composite units → the documented positional-digit
    * arithmetic (EXTRACT(DAY_HOUR FROM x) = day·100 + hour, …). */
  private def compositeExtract(unit: String, x: String): Option[String] = {
    val u = unit.trim.toUpperCase
    def d = s"day($x)"
    def h = s"hour($x)"
    def mi = s"minute($x)"
    def se = s"second($x)"
    u match {
      case "YEAR_MONTH" => Some(s"(year($x)*100 + month($x))")
      case "DAY_HOUR" => Some(s"($d*100 + $h)")
      case "DAY_MINUTE" => Some(s"($d*10000 + $h*100 + $mi)")
      case "DAY_SECOND" => Some(s"($d*1000000 + $h*10000 + $mi*100 + $se)")
      case "HOUR_MINUTE" => Some(s"($h*100 + $mi)")
      case "HOUR_SECOND" => Some(s"($h*10000 + $mi*100 + $se)")
      case "MINUTE_SECOND" => Some(s"($mi*100 + $se)")
      // Spark's EXTRACT has no MICROSECOND field (issue845)
      case "MICROSECOND" =>
        Some(s"(unix_micros(CAST($x AS TIMESTAMP)) % 1000000)")
      case "SECOND_MICROSECOND" =>
        Some(s"($se*1000000 + unix_micros(CAST($x AS TIMESTAMP)) % 1000000)")
      case _ => None
    }
  }

  /** MySQL composite interval unit → Spark ranged interval spelling. */
  private val IntervalUnits: Seq[(String, String)] = Seq(
    "DAY_SECOND" -> "DAY TO SECOND",
    "DAY_MINUTE" -> "DAY TO MINUTE",
    "DAY_HOUR" -> "DAY TO HOUR",
    "HOUR_SECOND" -> "HOUR TO SECOND",
    "HOUR_MINUTE" -> "HOUR TO MINUTE",
    "MINUTE_SECOND" -> "MINUTE TO SECOND",
    "YEAR_MONTH" -> "YEAR TO MONTH")

  /** Words that legitimately precede a string literal — a literal after
    * any OTHER identifier-ish token is MySQL's bare string alias
    * (`SELECT col 'alias'`, aliases.test). */
  private val NotAliasBefore: Set[String] = Set(
    "SELECT", "DISTINCT", "ALL", "AS", "LIKE", "RLIKE", "REGEXP",
    "ESCAPE", "BINARY", "THEN", "ELSE", "WHEN", "IS", "IN", "AND", "OR",
    "XOR", "NOT", "BETWEEN", "SEPARATOR", "COLLATE", "BY", "FROM",
    "WHERE", "ON", "USING", "SET", "VALUES", "DEFAULT", "INTERVAL",
    "MOD", "DIV", "ANY", "SOME", "EXISTS", "IF", "CASE", "RETURN",
    "HAVING", "LIMIT", "OFFSET", "UNION", "EXCEPT", "INTERSECT",
    "DATE", "TIME", "TIMESTAMP", "DATETIME", "CHARSET", "INTO",
    "OUTFILE", "INFILE", "TERMINATED", "ENCLOSED", "ESCAPED", "STARTING",
    "COMMENT", "ENGINE", "ROW", "ROWS", "PRECEDING", "FOLLOWING", "KEY")

  /** The word (or `)` / backtick) immediately before position `i` in
    * the REWRITTEN output, skipping whitespace; empty when none. */
  private def prevToken(out: StringBuilder): String = {
    var j = out.length - 1
    while (j >= 0 && Character.isWhitespace(out(j))) j -= 1
    if (j < 0) return ""
    out(j) match {
      case ')' => ")"
      case '`' => "`"
      case c if isWordChar(c) =>
        val end = j + 1
        while (j >= 0 && isWordChar(out(j))) j -= 1
        out.substring(j + 1, end)
      case _ => ""
    }
  }

  /** `LIKE pat ESCAPE c` with a custom escape char, folded to Spark's
    * default-backslash form. Spark validates patterns strictly (a
    * trailing or misplaced escape char is an error); MySQL treats those
    * as literals (escape.test `LIKE "a%a" ESCAPE "a"`, issue1157), so
    * the pattern is rewritten char-wise: esc+wildcard → escaped
    * wildcard, esc+other → that char, trailing esc → itself. */
  private val LikeEscRe: Regex =
    """(?is)\bLIKE\s+('(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")\s+ESCAPE\s+('(?:[^'\\]|\\.)?'|"(?:[^"\\]|\\.)?")""".r

  private def unquoteSqlString(q: String): String = {
    val body = q.substring(1, q.length - 1)
    val sb = new StringBuilder
    var i = 0
    while (i < body.length) {
      if (body(i) == '\\' && i + 1 < body.length) {
        body(i + 1) match {
          case 'n' => sb.append('\n')
          case 't' => sb.append('\t')
          case 'r' => sb.append('\r')
          // MySQL KEEPS `\%` and `\_` verbatim in string literals (the
          // backslash survives for LIKE's benefit): 'hakan\%' under a
          // non-backslash ESCAPE is a literal backslash then the `%`
          // wildcard — matching nothing in issue271.test's data
          case '%' => sb.append('\\').append('%')
          case '_' => sb.append('\\').append('_')
          case other => sb.append(other)
        }
        i += 2
      } else { sb.append(body(i)); i += 1 }
    }
    sb.toString
  }

  /** Backward scan for the start of an XOR's LEFT operand in the
    * already-emitted text: the nearest depth-0 boundary — comma, an
    * opening paren, or a clause/looser-precedence keyword. Quote-free
    * spans only (the caller falls back otherwise). */
  private val XorStopWords = Seq("OR", "XOR", "WHERE", "SELECT", "FROM",
    "WHEN", "THEN", "ELSE", "HAVING", "ON", "SET", "BY")
  private def xorOperandStartBack(s: String): Int = {
    var i = s.length - 1
    var depth = 0
    while (i >= 0) {
      val c = s(i)
      if (c == '\'' || c == '"') return -1
      if (c == ')') depth += 1
      else if (c == '(') {
        if (depth == 0) return i + 1
        depth -= 1
      } else if (c == ',' && depth == 0) return i + 1
      else if (depth == 0 && c.isLetter) {
        // walk to the word's start and test it
        var j = i
        while (j > 0 && (s(j - 1).isLetterOrDigit || s(j - 1) == '_')) j -= 1
        val w = s.substring(j, i + 1).toUpperCase
        val prevOk = j == 0 || !s(j - 1).isLetterOrDigit
        if (prevOk && XorStopWords.contains(w)) return i + 1
        i = j
      }
      i -= 1
    }
    0
  }

  /** Forward scan for the end of an XOR's RIGHT operand: the nearest
    * depth-0 comma, closing paren, end, or looser-precedence keyword.
    * AND binds TIGHTER than XOR so it stays inside the span. Returns
    * (endIndex, ok) — ok=false when a quote makes the span unsafe. */
  private def xorOperandEndFwd(s: String, from: Int): (Int, Boolean) = {
    var i = from
    var depth = 0
    val stops = Seq("OR", "XOR", "WHERE", "GROUP", "ORDER", "HAVING",
      "LIMIT", "THEN", "ELSE", "END", "WHEN", "FROM")
    while (i < s.length) {
      val c = s(i)
      if (c == '\'' || c == '"') return (i, false)
      if (c == '(') depth += 1
      else if (c == ')') {
        if (depth == 0) return (i, true)
        depth -= 1
      } else if (c == ',' && depth == 0) return (i, true)
      else if (depth == 0 && (c.isLetter || c == '_')) {
        var j = i
        while (j < s.length && (s(j).isLetterOrDigit || s(j) == '_')) j += 1
        val w = s.substring(i, j).toUpperCase
        if (stops.contains(w)) return (i, true)
        i = j - 1
      }
      i += 1
    }
    (s.length, true)
  }

  private def translateLikeEscape(sql: String): String =
    LikeEscRe.replaceAllIn(sql, m => {
      val esc = unquoteSqlString(m.group(2))
      if (esc.isEmpty) {
        // ESCAPE '' disables escaping entirely (issue271.test) — Spark
        // still treats \ as an escape, so neutralize any backslash in
        // the pattern and drop the clause
        val raw = unquoteSqlString(m.group(1))
        val lit = raw.replace("\\", "\\\\").replace("'", "\\'")
        java.util.regex.Matcher.quoteReplacement(s"LIKE '$lit'")
      } else if (esc.length != 1 || esc.head == '\\')
        java.util.regex.Matcher.quoteReplacement(m.matched)
      else {
        val raw = unquoteSqlString(m.group(1))
        val e = esc.head
        // my_wildcmp's precedence (issue271, strings.test): a wildcard
        // check runs BEFORE the escape check, so ESCAPE '%'/'_' leaves
        // that char a WILDCARD (the clause is inert); and with a
        // non-backslash escape, '\' is an ordinary LITERAL character.
        // Build the FINAL Spark pattern explicitly: literal wildcards
        // re-escape with '\', literal backslashes double.
        val pat = new StringBuilder
        def emitLiteral(c: Char): Unit =
          if (c == '%' || c == '_') pat.append('\\').append(c)
          else if (c == '\\') pat.append('\\').append('\\')
          else pat.append(c)
        val escIsWildcard = e == '%' || e == '_'
        var i = 0
        while (i < raw.length) {
          val c = raw(i)
          if (!escIsWildcard && c == e && i + 1 < raw.length) {
            emitLiteral(raw(i + 1)); i += 2
          } else if (c == '%' || c == '_') { pat.append(c); i += 1 }
          else { emitLiteral(c); i += 1 }
        }
        val lit = pat.toString.replace("\\", "\\\\").replace("'", "\\'")
        java.util.regex.Matcher.quoteReplacement(s"LIKE '$lit'")
      }
    })

  /** MySQL 5.7 permits ASC/DESC inside GROUP BY (implicit sort,
    * issue415.test); the modifiers are order hints with no relational
    * meaning — strip them from each GROUP BY span. */
  private val GroupBySpanRe =
    """(?is)\bGROUP\s+BY\s+(.+?)(?=\bHAVING\b|\bORDER\s+BY\b|\bLIMIT\b|\bWINDOW\b|\)|;|$)""".r
  private def stripGroupByOrder(sql: String): String =
    if (!"""(?is)\b(ASC|DESC)\b""".r.findFirstIn(sql).isDefined) sql
    else GroupBySpanRe.replaceAllIn(sql, m =>
      java.util.regex.Matcher.quoteReplacement(
        "GROUP BY " + m.group(1).replaceAll("(?i)\\s+(ASC|DESC)\\b", "")))

  /** MySQL's nested-join grammar: `t1 LEFT JOIN t2 LEFT JOIN t3 ON e1
    * ON e2` binds the INNER join first — Spark's parser has no
    * double-ON form (issue887.test, left_join.test). Parenthesize the
    * inner join; repeat for deeper nests. */
  private def translateNestedJoinOn(sql: String): String = {
    val Re = ("""(?is)\bJOIN\s+(\w+(?:\s+(?:AS\s+)?""" +
      """(?!ON\b|LEFT\b|RIGHT\b|INNER\b|CROSS\b|JOIN\b|USING\b|WHERE\b|GROUP\b|ORDER\b|LIMIT\b)\w+)?)\s+""" +
      """((?:LEFT|RIGHT|INNER|CROSS)(?:\s+OUTER)?\s+JOIN\b.+?\bON\b.+?)\s+\bON\b""").r
    var cur = sql
    var n = 0
    var changed = true
    while (changed && n < 8) {
      n += 1
      changed = false
      cur = Re.replaceAllIn(cur, m => {
        changed = true
        java.util.regex.Matcher.quoteReplacement(
          s"JOIN (${m.group(1)} ${m.group(2)}) ON")
      })
    }
    cur
  }

  /** Spark's parser rejects a float literal whose DIGITS exceed double
    * precision near the e308 boundary
    * (signed_boundary.test's 1.7976931348623157081…e+308); MySQL rounds
    * it into range. Clamp such literals to the nearest double. */
  private def clampDoubleLiterals(sql: String): String =
    """\b(\d+\.\d{17,}[eE]\+?(\d{3}))\b""".r.replaceAllIn(sql, m => {
      if (m.group(2).toInt > 308) m.group(1) // beyond range: error stays
      else scala.util.Try(new java.math.BigDecimal(m.group(1)))
        .toOption match {
        // IEEE round-to-nearest (what MySQL does): finite after the
        // BigDecimal→double conversion means in range — the raw digits
        // may exceed Double.MaxValue by less than half an ULP
        case Some(v) if !v.doubleValue.isInfinite =>
          v.doubleValue.toString.toUpperCase
        case _ => m.group(1)
      }
    })

  /** MySQL `~` on an out-of-long-range literal works in 64-bit unsigned
    * space (other_bit.test `~18446744073709551615`); Spark's `~` takes
    * integral types only. Fold the literal case: ~x = (2^64−1) − x. */
  private def translateBigNot(sql: String): String =
    """~\s*(\d{10,20})(\.\d+)?([eE]\+?0+)?\b""".r.replaceAllIn(sql, m => {
      val x = BigInt(m.group(1))
      val full = (BigInt(1) << 64) - 1
      val isFloat = m.group(2) != null || m.group(3) != null
      // a FLOAT/DECIMAL operand converts through the SIGNED tier first,
      // saturating at the BIGINT rim, THEN complements in 64-bit space:
      // ~18446744073709551615.0 = ~9223372036854775807 =
      // 9223372036854775808 (other_bit.test) — only the pure integer
      // literal is the u64 bit pattern (~u64max = 0)
      if (isFloat && x <= full) {
        val sat = if (x > Long.MaxValue) BigInt(Long.MaxValue) else x
        (full - sat).toString
      }
      else if (x > Long.MaxValue && x <= full)
        (full - x).toString
      else java.util.regex.Matcher.quoteReplacement(m.matched)
    })

  /** MySQL truthiness in a searched CASE: `CASE WHEN 1 THEN …`
    * (case_when.test) — Spark requires BOOLEAN. Only the
    * immediately-after-CASE position is rewritten (a value-match
    * `CASE x WHEN 1 THEN` must stay equality). */
  private def translateCaseTruthiness(sql: String): String =
    """(?is)\bCASE\s+WHEN\s+(\d+(?:\.\d+)?)\s+THEN\b""".r.replaceAllIn(
      sql, m => s"CASE WHEN ${m.group(1)} <> 0 THEN")

  /** MySQL allows a column/expression as the INTERVAL quantity
    * (`DATE_ADD(d, INTERVAL a DAY)`, bit_type.test); Spark's INTERVAL
    * literal takes constants only — rewrite identifier quantities to
    * make_interval. */
  private val IntervalColUnits = Map(
    "YEAR" -> 0, "MONTH" -> 1, "WEEK" -> 2, "DAY" -> 3,
    "HOUR" -> 4, "MINUTE" -> 5, "SECOND" -> 6)
  private def translateIntervalCol(sql: String): String =
    """(?i)\bINTERVAL\s+([a-zA-Z_]\w*(?:\.\w+)?)\s+(YEAR|MONTH|WEEK|DAY|HOUR|MINUTE|SECOND)\b""".r
      .replaceAllIn(sql, m => {
        val slot = IntervalColUnits(m.group(2).toUpperCase)
        val args = (0 to 6).map(i =>
          if (i == slot) s"CAST(${m.group(1)} AS INT)" else "0")
        java.util.regex.Matcher.quoteReplacement(
          s"make_interval(${args.mkString(", ")})")
      })

  /** MySQL GET_FORMAT(type, region) — a pure lookup table (the server's
    * own is static, date_formats.test). Folded textually because the
    * first argument is a bare keyword, not an expression. */
  private val GetFormats: Map[(String, String), String] = Map(
    ("DATE", "USA") -> "%m.%d.%Y", ("DATE", "JIS") -> "%Y-%m-%d",
    ("DATE", "ISO") -> "%Y-%m-%d", ("DATE", "EUR") -> "%d.%m.%Y",
    ("DATE", "INTERNAL") -> "%Y%m%d",
    ("TIME", "USA") -> "%h:%i:%s %p", ("TIME", "JIS") -> "%H:%i:%s",
    ("TIME", "ISO") -> "%H:%i:%s", ("TIME", "EUR") -> "%H.%i.%s",
    ("TIME", "INTERNAL") -> "%H%i%s",
    ("DATETIME", "USA") -> "%Y-%m-%d %H.%i.%s",
    ("DATETIME", "JIS") -> "%Y-%m-%d %H:%i:%s",
    ("DATETIME", "ISO") -> "%Y-%m-%d %H:%i:%s",
    ("DATETIME", "EUR") -> "%Y-%m-%d %H.%i.%s",
    ("DATETIME", "INTERNAL") -> "%Y%m%d%H%i%s")
  private def translateGetFormat(sql: String): String =
    """(?i)\bGET_FORMAT\s*\(\s*(DATE|TIME|DATETIME|TIMESTAMP)\s*,\s*'(\w+)'\s*\)""".r
      .replaceAllIn(sql, m => {
        val t = m.group(1).toUpperCase match {
          case "TIMESTAMP" => "DATETIME"; case x => x
        }
        GetFormats.get((t, m.group(2).toUpperCase))
          .map(f => java.util.regex.Matcher.quoteReplacement(s"'$f'"))
          .getOrElse("NULL")
      })

  /** MySQL SELECT cache/result-size hints carry no semantics here
    * (range.test SQL_NO_CACHE). */
  private def stripSelectHints(sql: String): String =
    sql.replaceAll(
      "(?i)\\b(SQL_NO_CACHE|SQL_CACHE|SQL_BIG_RESULT|SQL_SMALL_RESULT" +
        "|SQL_BUFFER_RESULT)\\s+", "")
      // per-table index hints are optimizer metadata with no relational
      // meaning here (date_formats.test `LEFT JOIN t2 IGNORE
      // INDEX(PRIMARY) ON …`) — the pack sidecar prunes instead
      .replaceAll(
        "(?i)\\b(?:USE|IGNORE|FORCE)\\s+(?:INDEX|KEY)\\s*" +
          "(?:FOR\\s+(?:JOIN|ORDER\\s+BY|GROUP\\s+BY)\\s*)?\\([^)]*\\)", "")

  /** Spark requires a foldable RAND seed; MySQL accepts a per-row
    * expression (bit_type.test `rand(a)`). The values of a seeded RAND
    * are implementation-defined anyway — degrade a non-literal seed to
    * a fixed one. */
  private def translateRandSeed(sql: String): String =
    """(?i)\bRAND\s*\(\s*([^()',\s][^()',]*)\)""".r.replaceAllIn(sql, m => {
      val arg = m.group(1).trim
      if (arg.matches("-?\\d+(\\.\\d+)?"))
        java.util.regex.Matcher.quoteReplacement(m.matched)
      else "RAND(0)"
    })

  /** Quantified comparisons Spark lacks: `= ANY (SELECT …)` ≡ IN,
    * `<> ALL (SELECT …)` ≡ NOT IN (in_withpk.test). */
  /** MySQL `CAST(x AS CHAR(n))` TRUNCATES to n characters
    * (CAST('hello world' AS CHAR(5)) = 'hello'); a bare STRING cast
    * would silently keep the full value. Rewritten as
    * SUBSTRING(CAST(x AS STRING), 1, n) via balanced-paren scan;
    * length-less CHAR stays with the inline AS-position rewrite. */
  private def translateCharLenCast(sql: String): String = {
    val castPat = """(?i)\bCAST\s*\(""".r
    val tailPat = """(?is)^(.*\S)\s+AS\s+CHAR\s*\(\s*(\d+)\s*\)\s*$""".r
    var s = sql
    var changed = true
    while (changed) {
      changed = false
      // rightmost-first keeps earlier indices valid and unwinds nested
      // casts one per iteration (outermost first)
      val ms = castPat.findAllMatchIn(s).toList.reverse
      val it = ms.iterator
      while (!changed && it.hasNext) {
        val m = it.next()
        val open = s.indexOf('(', m.start)
        val close = matchParen(s, open)
        if (close > 0) {
          s.substring(open + 1, close - 1) match {
            case tailPat(operand, len) =>
              s = s.substring(0, m.start) +
                s"SUBSTRING(CAST($operand AS STRING), 1, $len)" +
                s.substring(close)
              changed = true
            case _ =>
          }
        }
      }
    }
    s
  }

  private def translateQuantified(sql: String): String =
    sql.replaceAll("(?is)=\\s*(?:ANY|SOME)\\s*\\(", " IN (")
      .replaceAll("(?is)(?:<>|!=)\\s*ALL\\s*\\(", " NOT IN (")

  /** MySQL's CAST(x AS UNSIGNED) / CONVERT(x, UNSIGNED) of a NEGATIVE
    * value wraps modulo 2^64 (CAST(-2 AS UNSIGNED) =
    * 18446744073709551614 — convert_conv_func.result:?,
    * func_math.result pins the whole family incl. ABS/CEILING over the
    * cast). The plain DECIMAL(20,0) cast keeps the sign, so wrap the
    * argument in the modulo CASE first; the `AS UNSIGNED` spelling is
    * left in place for the main scan's DECIMAL(20,0) mapping (which
    * also keeps Spark's USER_SPECIFIED_CAST tag for the 1690
    * unsigned-context marker). The argument is rendered through an
    * inner DECIMAL(20,0) cast so string/fraction arguments keep exact
    * integer arithmetic (MySQL rounds fractions first: CAST(-1.6 AS
    * UNSIGNED) = 2^64 - 2). */
  private def wrapUnsignedCasts(sql: String): String = {
    val out = new StringBuilder(sql.length + 32)
    val n = sql.length
    var i = 0
    while (i < n) {
      val c = sql(i)
      if (c == '\'' || c == '"' || c == '`') {
        out.append(c); i += 1
        while (i < n && sql(i) != c) {
          if (sql(i) == '\\' && c != '`' && i + 1 < n) {
            out.append(sql(i)); i += 1
          }
          out.append(sql(i)); i += 1
        }
        if (i < n) { out.append(c); i += 1 }
      } else if (wordAt(sql, i, "CAST") || wordAt(sql, i, "CONVERT")) {
        val isCast = wordAt(sql, i, "CAST")
        val kwLen = if (isCast) 4 else 7
        var open = i + kwLen
        while (open < n && sql(open).isWhitespace) open += 1
        val end = if (open < n && sql(open) == '(') matchParen(sql, open)
          else -1
        val argOpt: Option[String] =
          if (end < 0) None
          else {
            val inner = sql.substring(open + 1, end - 1)
            if (isCast) {
              // last top-level ` AS UNSIGNED[ INTEGER]` tail
              lastTopLevelAs(inner).flatMap { asAt =>
                val tail = inner.substring(asAt + 2).trim
                if (tail.matches("(?i)UNSIGNED(\\s+INTEGER)?"))
                  Some(inner.substring(0, asAt).trim)
                else None
              }
            } else splitArgs(inner) match {
              case Seq(e, t)
                  if t.trim.matches("(?i)UNSIGNED(\\s+INTEGER)?") =>
                Some(e.trim)
              case _ => None
            }
          }
        argOpt match {
          case Some(arg)
              // idempotency: never re-wrap our own emission
              if !arg.startsWith("CASE WHEN CAST((") =>
            val a = wrapUnsignedCasts(arg)
            val dec = s"CAST(($a) AS DECIMAL(20,0))"
            out.append("CAST(CASE WHEN ").append(dec)
              .append(" < 0 THEN 18446744073709551616 + ").append(dec)
              .append(" ELSE ").append(dec)
              .append(" END AS UNSIGNED)")
            i = end
          case _ =>
            out.append(sql.substring(i, i + kwLen)); i += kwLen
        }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Position of the LAST top-level ` AS ` keyword in `s`, or None. */
  private def lastTopLevelAs(s: String): Option[Int] = {
    var depth = 0
    var i = 0
    val n = s.length
    var last = -1
    while (i < n) {
      val c = s(i)
      if (c == '\'' || c == '"' || c == '`') {
        i += 1
        while (i < n && s(i) != c) {
          if (s(i) == '\\' && c != '`' && i + 1 < n) i += 1
          i += 1
        }
        if (i < n) i += 1
      } else if (c == '(') { depth += 1; i += 1 }
      else if (c == ')') { depth -= 1; i += 1 }
      else if (depth == 0 && (c == 'a' || c == 'A') && i + 1 < n &&
          (s(i + 1) == 's' || s(i + 1) == 'S') &&
          (i == 0 || !(s(i - 1).isLetterOrDigit || s(i - 1) == '_')) &&
          (i + 2 >= n || !(s(i + 2).isLetterOrDigit || s(i + 2) == '_'))) {
        last = i; i += 2
      } else i += 1
    }
    if (last < 0) None else Some(last)
  }

  /** `POSITION(B'bits' IN B'bits')` compares the literals as BINARY
    * BYTE strings (bits pack left-padded into bytes; byte-substring
    * search, 1-based, empty needle = 1 — other_bit.test:55-76), NOT as
    * the integer values the main scan would give them. Both operands
    * literal → fold to the answer here. */
  private def translateBitPosition(sql: String): String = {
    val re =
      """(?is)\bPOSITION\s*\(\s*B'([01]*)'\s+IN\s+B'([01]*)'\s*\)""".r
    re.replaceAllIn(sql, m => {
      def bytes(bits: String): Seq[Int] =
        if (bits.isEmpty) Seq.empty
        else ("0" * ((8 - bits.length % 8) % 8) + bits)
          .grouped(8).map(g => Integer.parseInt(g, 2)).toSeq
      val needle = bytes(m.group(1))
      val hay = bytes(m.group(2))
      val pos =
        if (needle.isEmpty) 1
        else (0 to hay.length - needle.length)
          .find(p => hay.slice(p, p + needle.length) == needle)
          .map(_ + 1).getOrElse(0)
      pos.toString
    })
  }

  /** `charset(BINARY x)` / `collation(BINARY x)` introspect the binary
    * pseudo-charset — keep the operator visible as an explicit cast
    * (the generic BINARY-drops rule would erase it; bit_type.test). */
  private def translateCharsetBinary(sql: String): String =
    """(?i)\b(charset|collation)\s*\(\s*binary\s+(\w+)\s*\)""".r
      .replaceAllIn(sql, m =>
        s"${m.group(1)}(CAST(${m.group(2)} AS BINARY))")

  /** BETWEEN with u64-range integer literals evaluates in the SIGNED
    * tier: every literal past the signed max WRAPS
    * (`-1 BETWEEN 9223372036854775808 AND 1` = 1 — the bound becomes
    * i64min; bigint_unsigned.test pins all five shapes). */
  private def translateBetweenU64(sql: String): String = {
    val u64 = (BigInt(1) << 64)
    def isHuge(s: String) = s.matches("\\d{19,20}") &&
      BigInt(s) > Long.MaxValue && BigInt(s) < u64
    def wrap(s: String) =
      if (isHuge(s)) (BigInt(s) - u64).toString else s
    """(?i)(\S+)\s+BETWEEN\s+(\S+)\s+AND\s+(\S+)""".r
      .replaceAllIn(sql, m =>
        java.util.regex.Matcher.quoteReplacement(
          // constant-only BETWEEN: the whole predicate folds in the
          // int64 item context, so u64 literals wrap. A COLUMN operand
          // keeps the plain decimal compare (issue1564's
          // `a BETWEEN -22 AND 18446744073709551599` keeps all rows)
          if (m.group(1).matches("-?\\d+") &&
              Seq(1, 2, 3).map(m.group).exists(isHuge))
            s"${wrap(m.group(1))} BETWEEN ${wrap(m.group(2))} " +
              s"AND ${wrap(m.group(3))}"
          else m.matched))
  }

  def rewrite(sqlIn: String): String = {
    val sql = translateBetweenU64(translateNestedJoinOn(
      clampDoubleLiterals(stripGroupByOrder(translateRandSeed(
      translateBigNot(translateQuantified(translateLikeEscape(
        translateCaseTruthiness(translateIntervalCol(stripSelectHints(
          translateGetFormat(translateCharLenCast(
            wrapUnsignedCasts(translateBitPosition(
              translateCharsetBinary(sqlIn))))))))))))))))
    val out = new StringBuilder(sql.length + 16)
    val n = sql.length
    var i = 0
    while (i < n) {
      val c = sql(i)
      // bit literal b'0101' (checked before the string-literal branch —
      // the quoted part would otherwise be protected as a string)
      if ((c == 'b' || c == 'B') && i + 1 < n && sql(i + 1) == '\''
          && (i == 0 || !isWordChar(sql(i - 1)))) {
        val close = sql.indexOf('\'', i + 2)
        val bits = if (close < 0) null else sql.substring(i + 2, close)
        // b'' is MySQL's legal zero-length bit literal (= 0, bit.test)
        if (bits != null && bits.length <= 63
            && bits.forall(ch => ch == '0' || ch == '1')) {
          out.append(
            if (bits.isEmpty) "0"
            else java.lang.Long.parseLong(bits, 2).toString)
          i = close + 1
        } else { out.append(c); i += 1 }
      } else if (c == '0' && i + 1 < n && sql(i + 1) == 'b'
          && i + 2 < n && (sql(i + 2) == '0' || sql(i + 2) == '1')
          && (i == 0 || !isWordChar(sql(i - 1)))) {
        var j = i + 2
        while (j < n && (sql(j) == '0' || sql(j) == '1')) j += 1
        val bits = sql.substring(i + 2, j)
        if (bits.length <= 63 && (j == n || !isWordChar(sql(j)))) {
          out.append(java.lang.Long.parseLong(bits, 2).toString)
          i = j
        } else { out.append(c); i += 1 }
      } else if (c == '0' && i + 1 < n && sql(i + 1) == 'x'
          && i + 2 < n && Character.digit(sql(i + 2), 16) >= 0
          && (i == 0 || !isWordChar(sql(i - 1)))) {
        // hex integer literal 0xFF (MySQL numeric context;
        // bigint_unsigned.test) — Spark has no 0x literal
        var j = i + 2
        while (j < n && Character.digit(sql(j), 16) >= 0) j += 1
        val hex = sql.substring(i + 2, j)
        if (hex.length <= 16 && (j == n || !isWordChar(sql(j)))) {
          out.append(new java.math.BigInteger(hex, 16).toString)
          i = j
        } else { out.append(c); i += 1 }
      } else if (c == '\'' && {
        // MySQL bare string alias: a single-quoted literal right after
        // an identifier-ish token (`SELECT t1_int 'Serial no'`,
        // aliases.test). Keywords that legitimately take a string
        // operand are excluded; charset introducers (_utf8…) and
        // adjacent-literal concatenation don't produce a word/)/`
        // prev-token so they fall through to the literal branch.
        // whitespace before the literal is REQUIRED: x'ab' / b'01' hex
        // and bit literals are token-adjacent (issue1070) and must not
        // read as aliases
        val pt = prevToken(out)
        i > 0 && Character.isWhitespace(sql(i - 1)) &&
          (pt == ")" || pt == "`" ||
            (pt.nonEmpty && (pt.head.isLetter || pt.forall(_.isDigit)) &&
              !NotAliasBefore.contains(pt.toUpperCase)))
      } && sql.indexOf('\'', i + 1) > 0 && {
        val close = sql.indexOf('\'', i + 1)
        val content = sql.substring(i + 1, close)
        !content.contains("`") && !content.contains("\\") &&
          (close + 1 >= n || sql(close + 1) != '\'')
      }) {
        val close = sql.indexOf('\'', i + 1)
        out.append("AS `").append(sql.substring(i + 1, close)).append('`')
        i = close + 1
      } else if (c == '\'' || c == '"') {
        // string literal: copy verbatim, honoring \-escapes and doubling
        out.append(c); i += 1
        var done = false
        while (i < n && !done) {
          val ch = sql(i)
          if (ch == '\\' && i + 1 < n) { out.append(ch).append(sql(i + 1)); i += 2 }
          else if (ch == c) {
            if (i + 1 < n && sql(i + 1) == c) { out.append(ch).append(ch); i += 2 }
            else { out.append(ch); i += 1; done = true }
          } else { out.append(ch); i += 1 }
        }
      } else if (c == '`') {
        // quoted identifier: copy verbatim (`` doubling)
        out.append(c); i += 1
        var done = false
        while (i < n && !done) {
          val ch = sql(i)
          if (ch == '`') {
            if (i + 1 < n && sql(i + 1) == '`') { out.append("``"); i += 2 }
            else { out.append(ch); i += 1; done = true }
          } else { out.append(ch); i += 1 }
        }
      } else if (c == '#') {
        // MySQL hash comment → Spark line comment
        out.append("--"); i += 1
        while (i < n && sql(i) != '\n') { out.append(sql(i)); i += 1 }
      } else if (c == '-' && i + 1 < n && sql(i + 1) == '-') {
        // MySQL's comment rule: `--` opens a comment only when followed
        // by whitespace/EOL; `--9` is double NEGATION. Spark comments
        // unconditionally on `--`, so the negation case must be spaced
        // out to survive (bigint_unsigned.test). Dash runs before a
        // DIGIT fold their unary pairs outright: `--x` is x and
        // `---x` is -x — leaving `- -9223372036854775808` to Spark
        // would fold the inner pair into the LongType i64min literal
        // and wrap the outer negation instead of widening to DECIMAL.
        val isComment = i + 2 >= n || Character.isWhitespace(sql(i + 2))
        if (isComment) {
          while (i < n && sql(i) != '\n') { out.append(sql(i)); i += 1 }
        } else {
          var k = 0
          while (i + k < n && sql(i + k) == '-') k += 1
          val after = if (i + k < n) sql(i + k) else ' '
          if (Character.isDigit(after) || after == '.') {
            // is the FIRST dash a binary minus? (previous token is an
            // operand: digit, closing paren, quote, or a non-keyword
            // identifier)
            val prevCh = out.reverseIterator.find(!_.isWhitespace)
            val lastWord = """([A-Za-z_][A-Za-z_0-9]*)\s*$""".r
              .findFirstMatchIn(out.toString).map(_.group(1).toUpperCase)
            val kw = Set("SELECT", "WHERE", "AND", "OR", "NOT", "WHEN",
              "THEN", "ELSE", "ON", "IN", "IS", "LIKE", "MOD", "XOR",
              "DIV", "BETWEEN", "SET", "VALUES", "ALL", "DISTINCT",
              "CASE", "HAVING", "RETURN", "RETURNS", "BY", "LIMIT",
              "OFFSET", "AS", "IF", "ELSEIF", "WHILE", "UNTIL", "DO",
              "FROM", "JOIN", "UNION", "INTERVAL")
            val binaryFirst = prevCh.exists(ch => ch.isDigit ||
              ch == ')' || ch == '\'' || ch == '"' || ch == '`') ||
              (prevCh.exists(_.isLetter) &&
                lastWord.exists(w => !kw.contains(w)))
            val unary = if (binaryFirst) k - 1 else k
            if (binaryFirst) out.append("- ")
            if (unary % 2 == 1) out.append("- ")
            i += k
          } else { out.append("- "); i += 1 }
        }
      } else if (c == '/' && i + 1 < n && sql(i + 1) == '*') {
        out.append("/*"); i += 2
        while (i < n && !(sql(i) == '*' && i + 1 < n && sql(i + 1) == '/')) {
          out.append(sql(i)); i += 1
        }
        if (i < n) { out.append("*/"); i += 2 }
      } else if (c == '&' && i + 1 < n && sql(i + 1) == '&') {
        out.append(" AND "); i += 2
      } else if (c == '|' && i + 1 < n && sql(i + 1) == '|') {
        out.append(" OR "); i += 2
      } else if (c == '_' && {
        // charset introducer `_latin1'…'` / `_utf8mb4"…"` — the literal
        // is already a Unicode string here; the introducer drops
        // (case_when.test).
        val m = """^_(?:latin1|ascii|utf8\w*|ucs2|utf16\w*|utf32|binary|gbk|big5)\s*(?=['"])"""
          .r.findPrefixMatchOf(sql.substring(i))
        m.isDefined && (i == 0 || !isWordChar(sql(i - 1))) && {
          out.append(' '); i += m.get.end; true
        }
      }) {
        // handled in the guard (append + advance)
      } else if (c == '_' && {
        // introducer before a BIT literal is likewise string-from-bytes
        // (`_latin1 b'1000001'` = 'A', `_utf8mb4 0b1000001` —
        // bit_type.test)
        val mb = """^_(latin1|ascii|utf8\w*)\s*(?:[bB]'([01]+)'|0[bB]([01]+))"""
          .r.findPrefixMatchOf(sql.substring(i))
        mb.isDefined && (i == 0 || !isWordChar(sql(i - 1))) && {
          val bits = BigInt(Option(mb.get.group(2))
            .getOrElse(mb.get.group(3)), 2)
          val bytes = bits.toByteArray.dropWhile(_ == 0) match {
            case Array() => Array(0.toByte)
            case a => a
          }
          val cs = if (mb.get.group(1).toLowerCase.startsWith("utf8"))
            java.nio.charset.StandardCharsets.UTF_8
          else java.nio.charset.StandardCharsets.ISO_8859_1
          val decoded = new String(bytes, cs)
            .replace("\\", "\\\\").replace("'", "\\'")
          out.append('\'').append(decoded).append('\'')
          i += mb.get.end; true
        }
      }) {
        // handled in the guard (append + advance)
      } else if (c == '_' && {
        // introducer before a HEX literal is string-from-bytes
        // (`_utf8mb4 0xE1B482`, different_charsets tests): decode the
        // bytes in the introducer's charset into a string literal
        val m = """^_(latin1|ascii|utf8\w*)\s*0x([0-9a-fA-F]+)"""
          .r.findPrefixMatchOf(sql.substring(i))
        m.isDefined && (i == 0 || !isWordChar(sql(i - 1))) && {
          val hex0 = m.get.group(2)
          val hex = if (hex0.length % 2 == 1) "0" + hex0 else hex0
          val bytes = hex.grouped(2)
            .map(Integer.parseInt(_, 16).toByte).toArray
          val cs = if (m.get.group(1).toLowerCase.startsWith("utf8"))
            java.nio.charset.StandardCharsets.UTF_8
          else java.nio.charset.StandardCharsets.ISO_8859_1
          val decoded = new String(bytes, cs)
            .replace("\\", "\\\\").replace("'", "\\'")
          out.append('\'').append(decoded).append('\'')
          i += m.get.end; true
        }
      }) {
        // handled in the guard
      } else if (wordAt(sql, i, "COLLATE") && {
        val m = """(?is)^COLLATE\s+[\w`]+""".r
          .findPrefixMatchOf(sql.substring(i))
        // collation qualifiers drop: the engine's one collation surface
        // is the CI kernel behind operators/Collation (SURVEY §2.10);
        // expression-level COLLATE picks MySQL-specific tailorings this
        // engine does not carry — byte-order comparison stands in
        m.isDefined && { out.append(' '); i += m.get.end; true }
      }) {
        // handled in the guard
      } else if (wordAt(sql, i, "BINARY") && {
        // MySQL's unary BINARY operator forces byte-wise comparison —
        // Spark string comparison is already binary, so the word drops
        // (case_when.test `CASE BINARY "b" WHEN …`). Kept when it's a
        // type name: after AS/CAST targets or declaring `col BINARY(n)`
        var j = i + 6
        while (j < n && Character.isWhitespace(sql(j))) j += 1
        // quoted operands always strip; a bare identifier strips only in
        // clear EXPRESSION position (after an opener/operator —
        // `charset(binary a)`, bit_type.test). A column DECLARATION
        // (`c BINARY NOT NULL`) has an identifier before it and must
        // survive; so must `CAST(x AS BINARY)`.
        !prevToken(out).equalsIgnoreCase("AS") && j < n && {
          var p = out.length - 1
          while (p >= 0 && Character.isWhitespace(out(p))) p -= 1
          val prevCh = if (p >= 0) out(p) else ' '
          (sql(j) == '\'' || sql(j) == '"') ||
            ("(,=<>+-".indexOf(prevCh) >= 0 &&
              (Character.isLetter(sql(j)) || sql(j) == '`'))
        }
      }) {
        i += 6
        while (i < n && Character.isWhitespace(sql(i))) i += 1
      } else if (wordAt(sql, i, "GROUP_CONCAT")) {
        // MySQL GROUP_CONCAT clause grammar (DISTINCT / ORDER BY /
        // SEPARATOR — group_concat.test, group_concat2.test, issue938,
        // issue1848): routed to the registered UDAFs where they fit
        // (comma separator — their sorted + 1024-truncated contract is
        // the engine's documented convention) and composed from
        // sort_array/array_join for custom separators. Arguments are
        // stringified — MySQL concatenates any type.
        val open = i + 12 + sql.substring(i + 12).takeWhile(_.isWhitespace).length
        val end = if (open < n && sql(open) == '(') matchParen(sql, open) else -1
        val rewritten: Option[String] = if (end > 0) {
          val inner = sql.substring(open + 1, end - 1)
          """(?is)^\s*(DISTINCT\s+)?(.*?)(?:\s+ORDER\s+BY\s+(.*?)(\s+DESC|\s+ASC)?)?(?:\s+SEPARATOR\s+('[^']*'|"[^"]*"))?\s*$"""
            .r.findFirstMatchIn(inner).flatMap { m =>
              val distinct = m.group(1) != null
              val e = rewrite(m.group(2)).trim
              val cast = s"CAST($e AS STRING)"
              val orderKey = Option(m.group(3)).map(k => rewrite(k).trim)
              val desc = Option(m.group(4)).exists(_.trim
                .equalsIgnoreCase("DESC"))
              val sep = Option(m.group(5))
                .map(_.trim.drop(1).dropRight(1)).getOrElse(",")
              val sepLit = "'" + sep.replace("\\", "\\\\")
                .replace("'", "\\'") + "'"
              if (orderKey.isEmpty && sep == ",")
                Some(if (distinct) s"group_concat_distinct($cast)"
                else s"group_concat_scan($cast)")
              else if (orderKey.contains(e) && !distinct) {
                // sort in the VALUE's native domain before
                // stringifying (issue938: numeric keys order
                // numerically, not lexically)
                val arr = if (desc)
                  s"reverse(sort_array(collect_list($e)))"
                else s"sort_array(collect_list($e))"
                Some("substring(array_join(transform(" +
                  s"$arr, x -> CAST(x AS STRING)), $sepLit), 1, 1024)")
              } else if (orderKey.isDefined && sep == "," && !distinct)
                Some(s"group_concat_order_by${if (desc) "_desc" else ""}" +
                  s"(CAST(${orderKey.get} AS DOUBLE), " +
                  s"CAST(${orderKey.get} AS STRING), $cast)")
              else if (orderKey.isEmpty) {
                val base = if (distinct)
                  s"array_distinct(collect_list($cast))"
                else s"collect_list($cast)"
                Some(s"substring(array_join(sort_array($base), $sepLit)" +
                  ", 1, 1024)")
              } else None
            }
        } else None
        rewritten match {
          case Some(r) => out.append(r); i = end
          case None => out.append(c); i += 1
        }
      } else if (wordAt(sql, i, "CONVERT")) {
        // MySQL CONVERT(expr, type) → CAST (§1.2 mapping); CONVERT(expr
        // USING utf8*) is an encoding no-op here (the engine is UTF-8
        // native); other charsets stay untranslated — the documented
        // ucs2 boundary, they error downstream exactly like the
        // unsupported path should
        val open = i + 7 + sql.substring(i + 7).takeWhile(_.isWhitespace).length
        val end = if (open < n && sql(open) == '(') matchParen(sql, open) else -1
        val handled = if (end > 0) {
          val inner = sql.substring(open + 1, end - 1)
          val usingM = """(?is)^(.*)\sUSING\s+(\w+)\s*$""".r
            .findFirstMatchIn(inner)
          if (usingM.isDefined) {
            // encoding conversion is a no-op over an engine whose
            // strings are Unicode: every charset's round-trip through
            // a Spark string preserves the value (byte-layout details
            // like ucs2 width are a storage concern the engine does
            // not model — SURVEY §1.2)
            out.append('(').append(rewrite(usingM.get.group(1)))
              .append(')')
            i = end; true
          } else splitArgs(inner) match {
            case Seq(expr, t) if t.trim.toUpperCase == "TIME" =>
              out.append("date_format(CAST(").append(rewrite(expr))
                .append(" AS TIMESTAMP), 'HH:mm:ss')")
              i = end; true
            case Seq(expr, t) if castTarget(t).isDefined =>
              out.append("CAST(").append(rewrite(expr))
                .append(" AS ").append(castTarget(t).get).append(')')
              i = end; true
            case _ => false
          }
        } else false
        if (!handled) { out.append(c); i += 1 }
      } else if (wordAt(sql, i, "EXTRACT")) {
        // composite EXTRACT units (DAY_HOUR …, issue845) become the
        // documented positional-digit arithmetic; standard units pass
        // through to Spark's own EXTRACT
        val open = i + 7 + sql.substring(i + 7).takeWhile(_.isWhitespace).length
        val end = if (open < n && sql(open) == '(') matchParen(sql, open) else -1
        val handled = if (end > 0) {
          val inner = sql.substring(open + 1, end - 1)
          """(?is)^\s*(\w+)\s+FROM\s+(.+)$""".r.findFirstMatchIn(inner)
            .flatMap(m =>
              compositeExtract(m.group(1), rewrite(m.group(2)))) match {
            case Some(e) => out.append(e); i = end; true
            case None => false
          }
        } else false
        if (!handled) { out.append(c); i += 1 }
      } else if (wordAt(sql, i, "IS")) {
        // MySQL `x IS [NOT] TRUE/FALSE` (issue1942): Spark's parser has
        // no IS TRUE — null-safe-equality is the exact translation
        val rest = sql.substring(i)
        val m = """(?is)^IS\s+(NOT\s+)?(TRUE|FALSE)\b""".r
          .findPrefixMatchOf(rest)
        if (m.isDefined) {
          if (m.get.group(1) != null)
            out.append("IS DISTINCT FROM ").append(m.get.group(2).toUpperCase)
          else out.append("<=> ").append(m.get.group(2).toUpperCase)
          i += m.get.end
        } else { out.append(c); i += 1 }
      } else if (IntervalUnits.exists(u => wordAt(sql, i, u._1))) {
        // MySQL composite INTERVAL units → Spark's ranged spelling
        // (INTERVAL '12 10:11:12' DAY_SECOND → DAY TO SECOND, issue464).
        // EXTRACT's composites never reach here (handled above), so a
        // bare composite unit word is always interval syntax.
        val (from, to) = IntervalUnits.find(u => wordAt(sql, i, u._1)).get
        out.append(to); i += from.length
      } else if (wordAt(sql, i, "XOR")) {
        // MySQL's logical XOR: TRUTHINESS xor with NULL propagation —
        // `191 XOR 1` is 0, not bitwise and not `!=` (bit_type.test's
        // BIT column). XOR binds looser than AND/comparison and tighter
        // than OR, so the operand spans run to the nearest depth-0
        // OR/XOR/comma/clause boundary; both fold into graft_xor(l, r)
        // (Registry). Spans containing quotes fall back to `!=` (the
        // 0/1-exact translation) rather than risk a mis-extraction.
        val lhsStart = xorOperandStartBack(out.toString)
        val (rhsEnd, rhsOk) = xorOperandEndFwd(sql, i + 3)
        val lhs = out.substring(lhsStart)
        if (lhsStart >= 0 && rhsOk && !lhs.contains('\'') &&
            !lhs.contains('"') && lhs.trim.nonEmpty) {
          val rhs = sql.substring(i + 3, rhsEnd)
          out.setLength(lhsStart)
          out.append(" graft_xor(").append(lhs.trim).append(", ")
            .append(rewrite(rhs).trim).append(") ")
          i = rhsEnd
        } else { out.append(" != "); i += 3 }
      } else if (wordAt(sql, i, "STRAIGHT_JOIN")) {
        // MySQL join-order hint (issue270): as a SELECT modifier it
        // drops; as a join keyword it is INNER JOIN with a forced order
        // Catalyst re-decides anyway
        if (!prevToken(out).equalsIgnoreCase("SELECT")) out.append("JOIN")
        i += "STRAIGHT_JOIN".length
      } else if (wordAt(sql, i, "AS")) {
        // MySQL-isms in AS position: single-quoted aliases
        // (`COUNT(*) AS 'Total Rows'`, aliases.test) and the
        // CAST … AS UNSIGNED/SIGNED target types (§1.2 mapping:
        // UNSIGNED → DECIMAL(20,0), SIGNED → BIGINT)
        val rest = sql.substring(i)
        val alias = """(?is)^AS\s+['"]([^'"]*)['"]""".r
          .findPrefixMatchOf(rest)
        val uns = """(?is)^AS\s+UNSIGNED(\s+INTEGER)?\b""".r
          .findPrefixMatchOf(rest)
        val sgn = """(?is)^AS\s+SIGNED(\s+INTEGER)?\b""".r
          .findPrefixMatchOf(rest)
        val dtm = """(?is)^AS\s+DATETIME(\(\d*\))?\b""".r
          .findPrefixMatchOf(rest)
        // MySQL CAST targets Spark's parser refuses: bare CHAR (no
        // length) is a string cast, TIME has no Spark type — both ride
        // STRING (create_table.test `cast('5:4:3' as time)`,
        // `cast('b' as char)`)
        val chr = """(?is)^AS\s+(?:CHAR|TIME)\s*(\(\d*\))?\s*(?=\)|,)""".r
          .findPrefixMatchOf(rest)
        if (alias.isDefined) {
          out.append("AS `").append(alias.get.group(1)).append('`')
          i += alias.get.end
        } else if (uns.isDefined) {
          out.append("AS DECIMAL(20,0)"); i += uns.get.end
        } else if (sgn.isDefined) {
          out.append("AS BIGINT"); i += sgn.get.end
        } else if (dtm.isDefined) {
          // MySQL's DATETIME cast target (date_formats.test)
          out.append("AS TIMESTAMP"); i += dtm.get.end
        } else if (chr.isDefined) {
          out.append("AS STRING"); i += chr.get.end
        } else { out.append(c); i += 1 }
      } else if (wordAt(sql, i, "MOD")) {
        // infix `a MOD b` → `a % b` (MySQL operator; Spark only has the
        // mod(a, b) FUNCTION form — keep calls untouched)
        var j = i + 3
        while (j < n && Character.isWhitespace(sql(j))) j += 1
        // (substring, not append(x, start, end) — Scala's StringBuilder
        // lacks that overload and auto-tupling silently appended the
        // TUPLE's toString, corrupting `MOD(a,b)` calls)
        if (j < n && sql(j) == '(') {
          out.append(sql.substring(i, i + 3)); i += 3
        } else { out.append(" % "); i += 3 }
      } else if (wordAt(sql, i, "LIMIT")) {
        val rest = sql.substring(i)
        val huge = """(?is)^LIMIT\s+(\d{10,})\b""".r.findPrefixMatchOf(rest)
        LimitRe.findPrefixMatchOf(rest) match {
          case Some(m) =>
            out.append(s"LIMIT ${m.group(2)} OFFSET ${m.group(1)}")
            i += m.end
          case None if huge.isDefined =>
            // MySQL accepts LIMIT beyond 2^31; Spark's limit is an INT —
            // clamp only when actually above it (the result set cannot
            // exceed Int.MaxValue rows through a single limit anyway)
            val v = BigInt(huge.get.group(1))
            out.append("LIMIT " +
              (if (v > Int.MaxValue) Int.MaxValue.toString else v.toString))
            i += huge.get.end
          case None => out.append(c); i += 1
        }
      } else if (wordAt(sql, i, "FROM")) {
        DualRe.findPrefixMatchOf(sql.substring(i)) match {
          case Some(m) => out.append("FROM (SELECT 1) AS DUAL"); i += m.end
          case None => out.append(c); i += 1
        }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }
}
