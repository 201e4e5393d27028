package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** MySQL `GROUP_CONCAT([DISTINCT] expr [ORDER BY expr] [SEPARATOR sep])`.
  *
  * The one aggregate in the reference with no Spark built-in
  * (storage/tianmu/optimizer/aggregator_advanced.h:212,
  * `AggregatorGroupConcat`; separator/order captured in
  * core/temp_table.h:49-52; DISTINCT flag at
  * optimizer/compile/compilation_tools.cpp:117-123). MySQL truncates the
  * result at `group_concat_max_len` (the reference's TPC-H config pins it
  * to 512).
  *
  * Values are buffered per group and sorted at finish — deterministic
  * output independent of partial-aggregation order, which also makes it
  * safe under Spark's two-phase (partial/final) aggregation. Groups are
  * assumed human-scale (as in MySQL, where the result is one string);
  * this is not meant for million-value groups.
  */
class GroupConcat(sep: String, distinct: Boolean, maxLen: Int)
    extends Aggregator[String, List[String], String] {
  override def zero: List[String] = Nil
  override def reduce(b: List[String], a: String): List[String] =
    if (a == null) b else a :: b
  override def merge(a: List[String], b: List[String]): List[String] =
    a ::: b
  override def finish(r: List[String]): String = {
    val vs = if (distinct) r.distinct else r
    val s = vs.sorted.mkString(sep)
    if (maxLen > 0 && s.length > maxLen) s.substring(0, maxLen) else s
  }
  override def bufferEncoder: Encoder[List[String]] =
    ExpressionEncoder[List[String]]()
  override def outputEncoder: Encoder[String] = Encoders.STRING
}

/** GROUP_CONCAT without ORDER BY, MySQL's actual contract: values
  * concatenate in SCAN order (the statement tier's insert-order read —
  * unsigned_support_issue1267.test pins `0,127,127,0,0,129,255` for a
  * table inserted in exactly that order). The buffer is kept reversed
  * (prepend) and flipped at finish; merge stitches the later partial
  * in front so partition order survives two-phase aggregation. */
class GroupConcatScan(sep: String, maxLen: Int)
    extends Aggregator[String, List[String], String] {
  override def zero: List[String] = Nil
  override def reduce(b: List[String], a: String): List[String] =
    if (a == null) b else a :: b
  override def merge(a: List[String], b: List[String]): List[String] =
    b ::: a
  override def finish(r: List[String]): String = {
    val s = r.reverse.mkString(sep)
    if (maxLen > 0 && s.length > maxLen) s.substring(0, maxLen) else s
  }
  override def bufferEncoder: Encoder[List[String]] =
    ExpressionEncoder[List[String]]()
  override def outputEncoder: Encoder[String] = Encoders.STRING
}

/** `GROUP_CONCAT(value ORDER BY key [DESC])`: buffers (numKey, key,
  * value) triples, sorts at finish by the NUMERIC key when the key
  * parses as a number (issue938.test pins `1234,56789012,…` — a
  * lexical sort would put the 13-digit value second), falling back to
  * the string key (ties broken by value for determinism). */
class GroupConcatOrdered(sep: String, desc: Boolean, maxLen: Int)
    extends Aggregator[(java.lang.Double, String, String),
      List[(java.lang.Double, String, String)], String] {
  override def zero: List[(java.lang.Double, String, String)] = Nil
  override def reduce(b: List[(java.lang.Double, String, String)],
                      a: (java.lang.Double, String, String))
      : List[(java.lang.Double, String, String)] =
    if (a == null || a._3 == null) b else a :: b
  override def merge(a: List[(java.lang.Double, String, String)],
                     b: List[(java.lang.Double, String, String)])
      : List[(java.lang.Double, String, String)] =
    a ::: b
  override def finish(r: List[(java.lang.Double, String, String)])
      : String = {
    val sorted = r.sortBy(p =>
      (p._1 == null, if (p._1 == null) 0d else p._1.doubleValue,
        p._2, p._3))
    val ordered = if (desc) sorted.reverse else sorted
    val s = ordered.map(_._3).mkString(sep)
    if (maxLen > 0 && s.length > maxLen) s.substring(0, maxLen) else s
  }
  override def bufferEncoder
      : Encoder[List[(java.lang.Double, String, String)]] =
    ExpressionEncoder[List[(java.lang.Double, String, String)]]()
  override def outputEncoder: Encoder[String] = Encoders.STRING
}

object GroupConcat {
  /** `group_concat(c)` with MySQL-ish defaults (ascending order, no
    * truncation unless maxLen > 0). */
  def groupConcat(c: Column, sep: String = ",", distinct: Boolean = false,
                  maxLen: Int = 0): Column =
    udaf(new GroupConcat(sep, distinct, maxLen)).apply(c)

  /** `group_concat(value ORDER BY key [DESC] SEPARATOR sep)` — the
    * reference captures the ORDER BY in its SpecialInstruction
    * (core/temp_table.h:49-52); here the sort key travels in the buffer. */
  def groupConcatOrderBy(value: Column, orderKey: Column, sep: String = ",",
                         desc: Boolean = false, maxLen: Int = 0): Column =
    udaf(new GroupConcatOrdered(sep, desc, maxLen))
      .apply(orderKey.cast("double"), orderKey.cast("string"),
        value.cast("string"))
}
