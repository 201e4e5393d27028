package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** All character n-gram (shingle) hashes of a string in ONE pass: a
  * rolling FNV-1a window producing array<long>, one hash per position.
  *
  * Why a native Expression (SURVEY §2 preference (b)): the declarative
  * shingling — `transform(sequence(...), i => substr(...))` + per-element
  * `xxhash64` — evaluates the higher-order lambda interpreted, allocating
  * a substring per position (~1.5M per sf0.1 scan); this walks the chars
  * once with zero allocations beyond the output array. Downstream set ops
  * (array_intersect / collect_set / min-agg) treat the array as a
  * multiset, so no distinct pass is needed. */
case class ShingleHash64(child: Expression, n: Int) extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash64"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val len = s.length
    if (len < n) {
      // degenerate doc: hash the whole (short) text as its one shingle
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < len) { h ^= s.charAt(j).toLong; h *= 0x100000001b3L; j += 1 }
      new GenericArrayData(Array(h))
    } else {
      val out = new Array[Long](len - n + 1)
      var i = 0
      while (i + n <= len) {
        var h = 0xcbf29ce484222325L
        var j = i
        while (j < i + n) { h ^= s.charAt(j).toLong; h *= 0x100000001b3L; j += 1 }
        out(i) = h
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(c: Expression): ShingleHash64 =
    copy(child = c)
}

object ShingleHash64 {
  def shingleHash64(c: Column, n: Int): Column =
    GraftSqlBridge.column(ShingleHash64(GraftSqlBridge.expression(c), n))
}
