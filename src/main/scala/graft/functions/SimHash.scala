package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a space-tokenised string (Charikar 2002, "Similarity
  * estimation techniques from rounding algorithms"): hash every token with
  * FNV-1a 64, accumulate per-bit votes (+1 if the token hash has the bit
  * set, −1 otherwise), emit the sign vector as a long. Hamming-close
  * SimHashes ⇒ high token-multiset similarity.
  *
  * Implemented as a native Catalyst Expression (not a Scala UDF) so it
  * rides inside Tungsten rows without SerDe; CodegenFallback keeps it
  * interpreter-evaluated — acceptable because it is O(|text|) and called
  * once per document. */
case class SimHash64(child: Expression) extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val votes = new Array[Int](64)
    var start = 0
    var i = 0
    val n = s.length
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        if (i > start) {
          // FNV-1a 64-bit over the token's chars
          var h = 0xcbf29ce484222325L
          var j = start
          while (j < i) {
            h ^= s.charAt(j).toLong
            h *= 0x100000001b3L
            j += 1
          }
          var b = 0
          while (b < 64) {
            votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
}

object SimHash64 {
  import org.apache.spark.sql.GraftSqlBridge
  def simhash64(c: Column): Column =
    GraftSqlBridge.column(SimHash64(GraftSqlBridge.expression(c)))
}
