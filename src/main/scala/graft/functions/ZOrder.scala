package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order (Morton) interleave for multi-column pack clustering.
  *
  * The reference's Knowledge Grid skips packs per column independently
  * (DPN min/max, dpn.h:58-67), which only bites when the load order
  * clusters that column. A Z-order key makes ONE clustering order serve
  * range predicates on SEVERAL columns at once — each column keeps a
  * narrow min/max range inside every pack — so the same
  * [[graft.sources.StatsSidecar]] tri-state pruning works across
  * dimensions. This is the standard lakehouse upgrade to per-column
  * clustering (Morton 1966; used by Delta/Iceberg OPTIMIZE ZORDER).
  */
object ZOrder {

  /** Interleave the low 16 bits of up to 4 int columns into one long:
    * bit i of child j lands at position i·k + j. Children must already
    * be normalized to [0, 65535] (rank or min/max scaling). */
  case class Interleave16(children: Seq[Expression])
      extends Expression with CodegenFallback {
    require(children.nonEmpty && children.size <= 4,
      "Interleave16 takes 1-4 children")
    override def dataType: DataType = LongType
    override def nullable: Boolean = false
    override def prettyName: String = "zorder16"

    override def eval(input: InternalRow): Any = {
      val k = children.size
      var z = 0L
      var j = 0
      while (j < k) {
        val v = children(j).eval(input)
        val x = (if (v == null) 0 else v.asInstanceOf[Int]) & 0xFFFF
        var i = 0
        while (i < 16) {
          z |= ((x >> i) & 1L) << (i * k + j)
          i += 1
        }
        j += 1
      }
      z
    }

    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): Interleave16 = copy(children = c)
  }

  def interleave16(cols: Seq[Column]): Column =
    GraftSqlBridge.column(Interleave16(cols.map(GraftSqlBridge.expression)))
}
