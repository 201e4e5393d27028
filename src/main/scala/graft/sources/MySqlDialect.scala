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

  def rewrite(sql: String): String = {
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
        val bits = if (close < 0) "" else sql.substring(i + 2, close)
        if (bits.nonEmpty && bits.length <= 63
            && bits.forall(ch => ch == '0' || ch == '1')) {
          out.append(java.lang.Long.parseLong(bits, 2).toString)
          i = close + 1
        } else { out.append(c); i += 1 }
      } else if (c == '0' && i + 1 < n && (sql(i + 1) == 'b' || sql(i + 1) == 'B')
          && i + 2 < n && (sql(i + 2) == '0' || sql(i + 2) == '1')
          && (i == 0 || !isWordChar(sql(i - 1)))) {
        var j = i + 2
        while (j < n && (sql(j) == '0' || sql(j) == '1')) j += 1
        val bits = sql.substring(i + 2, j)
        if (bits.length <= 63 && (j == n || !isWordChar(sql(j)))) {
          out.append(java.lang.Long.parseLong(bits, 2).toString)
          i = j
        } else { out.append(c); i += 1 }
      } else if (c == '0' && i + 1 < n && (sql(i + 1) == 'x' || sql(i + 1) == 'X')
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
        // out (`- -9`) to survive (bigint_unsigned.test).
        val isComment = i + 2 >= n || Character.isWhitespace(sql(i + 2))
        if (isComment) {
          while (i < n && sql(i) != '\n') { out.append(sql(i)); i += 1 }
        } else { out.append("- "); i += 1 }
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
      } else if (wordAt(sql, i, "AS")) {
        // MySQL-isms in AS position: single-quoted aliases
        // (`COUNT(*) AS 'Total Rows'`, aliases.test) and the
        // CAST … AS UNSIGNED/SIGNED target types (§1.2 mapping:
        // UNSIGNED → DECIMAL(20,0), SIGNED → BIGINT)
        val rest = sql.substring(i)
        val alias = """(?is)^AS\s+'([^']*)'""".r.findPrefixMatchOf(rest)
        val uns = """(?is)^AS\s+UNSIGNED\b""".r.findPrefixMatchOf(rest)
        val sgn = """(?is)^AS\s+SIGNED\b""".r.findPrefixMatchOf(rest)
        if (alias.isDefined) {
          out.append("AS `").append(alias.get.group(1)).append('`')
          i += alias.get.end
        } else if (uns.isDefined) {
          out.append("AS DECIMAL(20,0)"); i += uns.get.end
        } else if (sgn.isDefined) {
          out.append("AS BIGINT"); i += sgn.get.end
        } else { out.append(c); i += 1 }
      } else if (wordAt(sql, i, "MOD")) {
        // infix `a MOD b` → `a % b` (MySQL operator; Spark only has the
        // mod(a, b) FUNCTION form — keep calls untouched)
        var j = i + 3
        while (j < n && Character.isWhitespace(sql(j))) j += 1
        if (j < n && sql(j) == '(') { out.append(sql, i, i + 3); i += 3 }
        else { out.append(" % "); i += 3 }
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
