package graft

import graft.sources.MySqlDialect.rewrite
import org.scalatest.funsuite.AnyFunSuite

/** Pure unit coverage of the MySQL→Spark SELECT-dialect rewrite (the
  * character-level front end of [[graft.sources.StatementRunner]]);
  * SqlSurfaceSpec proves the same forms end-to-end through `run(sql)`. */
class DialectSpec extends AnyFunSuite {

  test("hash comments become line comments") {
    assert(rewrite("SELECT 1 # note\nFROM t") === "SELECT 1 -- note\nFROM t")
  }

  test("&& and || become AND / OR outside literals") {
    assert(rewrite("a && b || c") === "a  AND  b  OR  c")
  }

  test("string literals are never rewritten") {
    assert(rewrite("SELECT 'a && b # x' AS s") === "SELECT 'a && b # x' AS s")
    assert(rewrite("SELECT \"x || y\"") === "SELECT \"x || y\"")
    // backslash escape keeps the literal open across an escaped quote
    assert(rewrite("SELECT 'don\\'t && stop'") === "SELECT 'don\\'t && stop'")
    // quote doubling likewise
    assert(rewrite("SELECT 'it''s && fine'") === "SELECT 'it''s && fine'")
  }

  test("backtick identifiers are never rewritten") {
    assert(rewrite("SELECT `a && b` FROM t") === "SELECT `a && b` FROM t")
  }

  test("existing comments pass through untouched") {
    assert(rewrite("SELECT 1 -- a && b\n") === "SELECT 1 -- a && b\n")
    assert(rewrite("SELECT /* a && b */ 1") === "SELECT /* a && b */ 1")
  }

  test("LIMIT offset,count becomes LIMIT count OFFSET offset") {
    assert(rewrite("SELECT * FROM t LIMIT 2, 3")
      === "SELECT * FROM t LIMIT 3 OFFSET 2")
    // plain LIMIT is untouched
    assert(rewrite("SELECT * FROM t LIMIT 3") === "SELECT * FROM t LIMIT 3")
    // column named limit_x is not a LIMIT keyword
    assert(rewrite("SELECT limit_2 FROM t") === "SELECT limit_2 FROM t")
  }

  test("CAST AS CHAR(n) truncates via SUBSTRING; bare CHAR rides STRING") {
    assert(rewrite("SELECT CAST('hello world' AS CHAR(5))")
      === "SELECT SUBSTRING(CAST('hello world' AS STRING), 1, 5)")
    // nested length-ful casts unwind outermost-first
    assert(rewrite("SELECT CAST(CAST(x AS CHAR(3)) AS CHAR(2)) FROM t")
      === "SELECT SUBSTRING(CAST(SUBSTRING(CAST(x AS STRING), 1, 3)" +
        " AS STRING), 1, 2) FROM t")
    // length-less CHAR keeps the plain STRING cast (no truncation)
    assert(rewrite("SELECT CAST('b' AS CHAR)")
      === "SELECT CAST('b' AS STRING)")
  }

  test("FROM DUAL becomes a one-row derived table") {
    assert(rewrite("SELECT 1+1 FROM DUAL")
      === "SELECT 1+1 FROM (SELECT 1) AS DUAL")
    // FROM dual_table is not DUAL
    assert(rewrite("SELECT x FROM DUALITY") === "SELECT x FROM DUALITY")
  }
}
