package graft

import graft.functions.MySql
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Shim semantics pinned against hand-checked MySQL 5.7 results (the
  * values in comments are MySQL's own documented/verified outputs). */
class MySqlFuncSpec extends AnyFunSuite {
  private def spark = TestSession.spark

  private def eval(c: Column): Any =
    spark.range(1).select(c.as("r")).first().get(0)

  test("DIV truncates toward zero") {
    assert(eval(MySql.div(lit(7), lit(2))) === 3L)      // 7 DIV 2 = 3
    assert(eval(MySql.div(lit(-7), lit(2))) === -3L)    // -7 DIV 2 = -3
  }

  test("decDivChecked: -2^63 is a legal quotient; ±overflow is 1690") {
    import org.apache.spark.sql.types.Decimal
    def d(s: String) = Decimal(BigDecimal(s))
    // MySQL: -9223372036854775808 DIV 1 = -9223372036854775808
    assert(MySql.decDivChecked(d("-9223372036854775808"), d("1"))
      === Long.MinValue)
    // i64min DIV -1 lands at +2^63 → 1690
    intercept[ArithmeticException] {
      MySql.decDivChecked(d("-9223372036854775808"), d("-1"))
    }
    // below -2^63 → 1690 too
    intercept[ArithmeticException] {
      MySql.decDivChecked(d("-9223372036854775809"), d("1"))
    }
    // divisor 0 keeps the NULL result
    assert(MySql.decDivChecked(d("5"), d("0")) === null)
  }

  test("MOD keeps dividend sign") {
    assert(eval(MySql.mod(lit(-7), lit(2))) === -1)     // MOD(-7,2) = -1
    assert(eval(MySql.mod(lit(7), lit(-2))) === 1)      // MOD(7,-2) = 1
  }

  test("TRUNCATE toward zero") {
    assert(eval(MySql.truncate(lit(1.223), 1)) === 1.2)
    assert(eval(MySql.truncate(lit(-1.999), 1)) === -1.9)
    assert(eval(MySql.truncate(lit(122.0), -2)) === 100.0)
  }

  test("WEEK mode 0") {
    assert(eval(MySql.week(lit("2000-01-01").cast("date"))) === 0)
    assert(eval(MySql.week(lit("2000-01-09").cast("date"))) === 2)
    assert(eval(MySql.week(lit("2008-02-20").cast("date"))) === 7)
  }

  test("WEEK mode 3 = ISO") {
    assert(eval(MySql.week(lit("2008-02-20").cast("date"), 3)) === 8)
  }

  test("WEEK all modes (MySQL doc examples + boundary sweep)") {
    def w(d: String, m: Int) = eval(MySql.week(lit(d).cast("date"), m))
    // MySQL doc examples
    assert(w("2008-02-20", 0) === 7)  // WEEK('2008-02-20')   = 7
    assert(w("2008-02-20", 1) === 8)  // WEEK('2008-02-20',1) = 8
    assert(w("2008-12-31", 1) === 53) // WEEK('2008-12-31',1) = 53
    // 2000-01-01 is a Saturday: week 0 under 0-53 modes, previous
    // year's last week under week-year modes
    assert(w("2000-01-01", 0) === 0)
    assert(w("2000-01-01", 1) === 0)
    assert(w("2000-01-01", 2) === 52)
    assert(w("2000-01-01", 3) === 52) // ISO 1999-W52
    assert(w("2000-01-01", 4) === 0)
    assert(w("2000-01-01", 5) === 0)
    assert(w("2000-01-01", 6) === 52)
    assert(w("2000-01-01", 7) === 52)
    // 2008-12-31 is a Wednesday in ISO 2009-W01 (Monday-start week has
    // ≥4 days in 2009); the Sunday-start week (Dec 28-Jan 3) keeps 4
    // days in 2008, so mode 6 stays week 53 of 2008
    assert(w("2008-12-31", 3) === 1)
    assert(w("2008-12-31", 6) === 53)
    assert(w("2008-12-31", 0) === 52)
    assert(w("2008-12-31", 2) === 52)
    // 1987-01-01 is a Thursday: ISO week 1 even though mode 0 gives 0
    assert(w("1987-01-01", 0) === 0)
    assert(w("1987-01-01", 1) === 1)
    assert(w("1987-01-01", 3) === 1)
    intercept[IllegalArgumentException] {
      MySql.week(lit("2000-01-01").cast("date"), 8)
    }
  }

  test("YEARWEEK with explicit modes") {
    def yw(d: String, m: Int) = eval(MySql.yearweek(lit(d).cast("date"), m))
    assert(yw("2000-01-01", 0) === 199952)
    assert(yw("2008-12-31", 3) === 200901) // rolls into next ISO year
    assert(yw("1987-01-01", 1) === 198701)
  }

  test("DATE_FORMAT week specifiers %U/%u/%V/%v/%X/%x") {
    val d = lit("2008-12-31").cast("date")
    assert(eval(MySql.dateFormat(d, "%X-%V")) === "2008-52")
    assert(eval(MySql.dateFormat(d, "%x-%v")) === "2009-01")
    assert(eval(MySql.dateFormat(d, "%Y/%U/%u")) === "2008/52/53")
    val d2 = lit("1987-01-01").cast("date")
    assert(eval(MySql.dateFormat(d2, "%X-%V")) === "1986-52")
    assert(eval(MySql.dateFormat(d2, "%x-%v")) === "1987-01")
  }

  test("YEARWEEK borrows previous year before first Sunday") {
    assert(eval(MySql.yearweek(lit("2000-01-01").cast("date"))) === 199952)
    assert(eval(MySql.yearweek(lit("1987-01-01").cast("date"))) === 198652)
    assert(eval(MySql.yearweek(lit("2000-01-09").cast("date"))) === 200002)
  }

  test("PERIOD_ADD / PERIOD_DIFF") {
    assert(eval(MySql.periodAdd(lit(200801), lit(2))) === 200803L)
    assert(eval(MySql.periodAdd(lit(200812), lit(1))) === 200901L)
    assert(eval(MySql.periodDiff(lit(200802), lit(200703))) === 11L)
  }

  test("SEC_TO_TIME / TIME_TO_SEC") {
    assert(eval(MySql.secToTime(lit(2378))) === "00:39:38")
    assert(eval(MySql.secToTime(lit(-2378))) === "-00:39:38")
    assert(eval(MySql.secToTime(lit(100000))) === "27:46:40")
    assert(eval(MySql.timeToSec(lit("22:23:00"))) === 80580L)
    assert(eval(MySql.timeToSec(lit("-1:00:05"))) === -3605L)
  }

  test("DATE_FORMAT % patterns") {
    val d = lit("2009-10-04 22:23:00").cast("timestamp")
    assert(eval(MySql.dateFormat(d, "%W %M %Y")) === "Sunday October 2009")
    assert(eval(MySql.dateFormat(d, "%H:%i:%s")) === "22:23:00")
    assert(eval(MySql.dateFormat(d, "%Y-%m-%d")) === "2009-10-04")
    assert(eval(MySql.dateFormat(d, "%e/%c/%y %p")) === "4/10/09 PM")
    intercept[IllegalArgumentException] { MySql.mysqlFormatToJava("%D") }
  }

  test("DAYNAME / MONTHNAME") {
    val d = lit("2007-02-03").cast("date")
    assert(eval(MySql.dayname(d)) === "Saturday")
    assert(eval(MySql.monthname(d)) === "February")
  }

  test("ADDTIME") {
    val ts = lit("2007-12-31 23:59:59").cast("timestamp")
    assert(eval(MySql.addtime(ts, lit("00:01:01"))).toString
      .startsWith("2008-01-01 00:01:00"))
  }

  test("TIMESTAMPDIFF (MySQL doc examples)") {
    assert(eval(MySql.timestampDiff("MONTH",
      lit("2003-02-01").cast("timestamp"),
      lit("2003-05-01").cast("timestamp"))) === 3L)
    assert(eval(MySql.timestampDiff("YEAR",
      lit("2002-05-01").cast("timestamp"),
      lit("2001-01-01").cast("timestamp"))) === -1L)
    assert(eval(MySql.timestampDiff("MINUTE",
      lit("2003-02-01").cast("timestamp"),
      lit("2003-05-01 12:05:55").cast("timestamp"))) === 128885L)
  }

  test("TIMESTAMPADD") {
    assert(eval(MySql.timestampAdd("WEEK", lit(1),
      lit("2003-01-02").cast("timestamp"))).toString
      .startsWith("2003-01-09"))
    assert(eval(MySql.timestampAdd("MONTH", lit(2),
      lit("2003-12-31").cast("timestamp"))).toString
      .startsWith("2004-02-29"))
  }

  test("IF / IFNULL") {
    assert(eval(MySql.if_(lit(1) > 2, lit("a"), lit("b"))) === "b")
    assert(eval(MySql.ifnull(lit(null).cast("string"), lit("x"))) === "x")
  }

  test("STRCMP sign convention") {
    assert(eval(MySql.strcmp(lit("text"), lit("text2"))) === -1) // STRCMP('text','text2') = -1
    assert(eval(MySql.strcmp(lit("text2"), lit("text"))) === 1)
    assert(eval(MySql.strcmp(lit("text"), lit("text"))) === 0)
    // NULL argument → NULL, not 1 (the advisor-flagged fallthrough)
    assert(eval(MySql.strcmp(lit(null).cast("string"), lit("x"))) === null)
    assert(eval(MySql.strcmp(lit("x"), lit(null).cast("string"))) === null)
  }

  test("ELT picks 1-based, NULL out of range") {
    assert(eval(MySql.elt(lit(1), lit("Aa"), lit("Bb"), lit("Cc"))) === "Aa")
    assert(eval(MySql.elt(lit(4), lit("Aa"), lit("Bb"), lit("Cc"))) === null)
  }

  test("FIELD returns 1-based index, 0 if absent") {
    assert(eval(MySql.field(lit("Bb"), lit("Aa"), lit("Bb"), lit("Cc"))) === 2)
    assert(eval(MySql.field(lit("Gg"), lit("Aa"), lit("Bb"))) === 0)
    // duplicates resolve to the FIRST index; NULL search value → 0
    assert(eval(MySql.field(lit("Bb"), lit("Bb"), lit("Bb"), lit("Cc"))) === 1)
    assert(eval(MySql.field(lit(null).cast("string"), lit("Aa"))) === 0)
  }

  test("STR_TO_DATE %-patterns") {
    assert(eval(MySql.strToDate(lit("01,5,2013"), "%d,%m,%Y")).toString
      === "2013-05-01") // STR_TO_DATE('01,5,2013','%d,%m,%Y') = 2013-05-01
  }

  test("MAKEDATE from year + dayofyear") {
    assert(eval(MySql.makedate(lit(2011), lit(31))).toString === "2011-01-31")
    assert(eval(MySql.makedate(lit(2011), lit(32))).toString === "2011-02-01")
    assert(eval(MySql.makedate(lit(2011), lit(0))) === null) // MAKEDATE(2011,0) = NULL
  }

  test("TIMEDIFF convention: sign preserved, hours unwrapped") {
    assert(eval(MySql.timediff(
      lit("2000-01-01 12:00:30").cast("timestamp"),
      lit("2000-01-01 10:15:00").cast("timestamp"))) === "01:45:30")
    assert(eval(MySql.timediff(
      lit("2000-01-01 10:00:00").cast("timestamp"),
      lit("2000-01-03 10:00:01").cast("timestamp"))) === "-48:00:01")
  }

  test("TO_DAYS / FROM_DAYS roundtrip + MySQL anchor") {
    assert(eval(MySql.toDays(lit("2007-10-07").cast("date"))) === 733321L) // TO_DAYS('2007-10-07') = 733321
    assert(eval(MySql.fromDays(lit(730669L))).toString === "2000-07-03") // FROM_DAYS(730669) = 2000-07-03
  }

  test("ZEROFILL pads to width but never truncates wide values") {
    import graft.operators.Display.zerofill
    assert(eval(zerofill(lit(1), 8)) === "00000001")        // st1: INT(8)
    assert(eval(zerofill(lit(1234567), 8)) === "01234567")
    assert(eval(zerofill(lit(123456789), 8)) === "123456789") // wider: as-is
    assert(eval(zerofill(lit(12), 10)) === "0000000012")    // st2: TINYINT(10)
    assert(eval(zerofill(lit(7), 2)) === "07")              // st4: month/day
  }
}
