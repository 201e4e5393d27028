package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native LSH/set micro-kernels for the dedup pipeline
  * ([[graft.operators.Dedup]]).
  *
  * Why native expressions instead of declarative compositions: each of
  * these replaces a WIDE generated operator — 8×xxhash64 over 32
  * `getItem`s, a `zip_with`+`aggregate` lambda pair, an
  * `array_intersect`+`array_union` pair — whose whole-stage codegen costs
  * one-shot Janino compile time out of proportion to the tiny candidate
  * sets they run on (PLANS.md "measured plan lessons"). A CodegenFallback
  * with a tight JVM loop keeps the generated class small and the work
  * JIT-hot; per-row cost is identical or better since every kernel is a
  * single allocation-free pass.
  */
object LshOps {

  /** All band hashes of a MinHash signature in one pass: for band b over
    * rows [b·bandSize, (b+1)·bandSize), mix the band index into the seed
    * so identical row-segments in DIFFERENT bands never collide — this
    * folds the (band, bhash) composite join key into one long. Mixing is
    * the splitmix64 finalizer (public-domain constant set, Steele et al.,
    * "Fast Splittable Pseudorandom Number Generators", OOPSLA 2014). */
  case class BandHashes64(child: Expression, nBands: Int, bandSize: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType =
      ArrayType(LongType, containsNull = false)
    override def prettyName: String = "band_hashes64"

    @inline private def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }

    override def nullSafeEval(input: Any): Any = {
      val sig = input.asInstanceOf[ArrayData]
      // explicit bounds check: UnsafeArrayData.getLong past the end reads
      // garbage rather than throwing (reachable from SQL via the registry)
      require(sig.numElements() >= nBands * bandSize,
        s"band_hashes64 needs a signature of ≥ ${nBands * bandSize} " +
          s"elements, got ${sig.numElements()}")
      val out = new Array[Long](nBands)
      var b = 0
      while (b < nBands) {
        var h = mix(b.toLong)
        var i = b * bandSize
        val end = i + bandSize
        while (i < end) { h = mix(h ^ sig.getLong(i)); i += 1 }
        out(b) = h
        b += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(c: Expression): BandHashes64 =
      copy(child = c)
  }

  /** Number of positions where two equal-length long arrays agree — the
    * MinHash collision count whose /k is the Jaccard estimate. */
  case class SigAgree(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "sig_agree"

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      var c = 0
      var i = 0
      while (i < n) {
        if (a.getLong(i) == b.getLong(i)) c += 1
        i += 1
      }
      c
    }

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): SigAgree = copy(left = l, right = r)
  }

  /** Exact Jaccard |A∩B| / |A∪B| of two long arrays that are already
    * distinct-element sets (as produced by
    * [[MinHashShingleSig]] / `array_distinct`), via one open-addressed
    * probe table — replaces the array_intersect + array_union pair (two
    * hash structures and two materialized arrays per row). */
  case class JaccardLong(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "jaccard_long"

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val na = a.numElements()
      val nb = b.numElements()
      if (na == 0 && nb == 0) return 1.0
      if (na == 0 || nb == 0) return 0.0
      val cap = Integer.highestOneBit(math.max(4, na * 2 - 1)) * 2
      val mask = cap - 1
      val table = new Array[Long](cap)
      var zeroInA = false
      var i = 0
      while (i < na) {
        val h = a.getLong(i)
        if (h == 0L) zeroInA = true
        else {
          var idx = java.lang.Long.hashCode(h * 0x9e3779b97f4a7c15L) & mask
          while (table(idx) != 0L && table(idx) != h) idx = (idx + 1) & mask
          table(idx) = h
        }
        i += 1
      }
      var inter = 0
      i = 0
      while (i < nb) {
        val h = b.getLong(i)
        if (h == 0L) { if (zeroInA) inter += 1 }
        else {
          var idx = java.lang.Long.hashCode(h * 0x9e3779b97f4a7c15L) & mask
          while (table(idx) != 0L && table(idx) != h) idx = (idx + 1) & mask
          if (table(idx) == h) inter += 1
        }
        i += 1
      }
      inter.toDouble / (na + nb - inter).toDouble
    }

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): JaccardLong = copy(left = l, right = r)
  }

  def bandHashes64(sig: Column, nBands: Int, bandSize: Int): Column =
    GraftSqlBridge.column(
      BandHashes64(GraftSqlBridge.expression(sig), nBands, bandSize))

  def sigAgree(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      SigAgree(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  def jaccardLong(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      JaccardLong(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
