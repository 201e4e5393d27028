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

object GroupConcat {
  /** `group_concat(c)` with MySQL-ish defaults (ascending order, no
    * truncation unless maxLen > 0). */
  def groupConcat(c: Column, sep: String = ",", distinct: Boolean = false,
                  maxLen: Int = 0): Column =
    udaf(new GroupConcat(sep, distinct, maxLen)).apply(c)
}
