package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Optimizer rule: accelerate `levenshtein(a, b) <= k` predicates.
  *
  * Two semantics-preserving rewrites, applied to every conjunct of a
  * Join or Filter condition:
  *
  *  1. **Length-band prefilter**: edit distance is bounded below by the
  *     length difference, so `abs(length(a) - length(b)) <= k` is
  *     prepended. The band is a few codegen'd instructions evaluated
  *     BEFORE the O(|a|·|b|) distance — in a fuzzy join it discards
  *     most candidate pairs for the price of two lengths (the manual
  *     blocking [[graft.operators.Dedup.editDistancePairs]] documents,
  *     now applied automatically to any user query).
  *  2. **Threshold short-circuit**: the bare `Levenshtein(a, b)` is
  *     replaced by Spark's 3-arg form `Levenshtein(a, b, k)`, whose
  *     kernel abandons a row as soon as the running distance exceeds k
  *     (O(k·min) instead of O(m·n)) and returns -1 past the threshold
  *     — `<= k` therefore becomes `lev3 >= 0 AND lev3 <= k`.
  *
  * Idempotent by construction (the rewritten conjunct carries a
  * threshold, which the matcher refuses); NULL inputs short-circuit the
  * band to NULL exactly as the original predicate did. Opt-out via
  * `spark.graft.editDistance.band=false`. No reference analog — the
  * reference has no edit-distance kernel; this is the library extending
  * its entity-resolution tier through the same public
  * `SparkSessionExtensions` hook as [[BandedRangeJoinRule]].
  */
class EditDistanceBandRule(session: SparkSession)
    extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    scala.util.Try(
      conf.getConfString("spark.graft.editDistance.band", "true").toBoolean)
      .getOrElse(true)

  /** A bare (un-thresholded) Levenshtein, possibly under a numeric
    * cast. */
  private object BareLev {
    def unapply(e: Expression): Option[Levenshtein] = e match {
      case l: Levenshtein if l.threshold.isEmpty => Some(l)
      case c: Cast => unapply(c.child)
      case _ => None
    }
  }

  private object IntBound {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(v, ByteType) => Some(v.asInstanceOf[Byte].toInt)
      case Literal(v, ShortType) => Some(v.asInstanceOf[Short].toInt)
      case Literal(v, IntegerType) => Some(v.asInstanceOf[Int])
      case Literal(v, LongType) if math.abs(v.asInstanceOf[Long]) <= Int.MaxValue =>
        Some(v.asInstanceOf[Long].toInt)
      case _ => None
    }
  }

  private def rewriteConjunct(p: Expression): Seq[Expression] = p match {
    case cmp @ LessThanOrEqual(BareLev(lev), IntBound(k)) if k >= 0 =>
      expand(cmp, lev, k)
    case cmp @ LessThan(BareLev(lev), IntBound(k)) if k >= 1 =>
      expand(cmp, lev, k - 1) // lev < k  ≡  lev <= k-1 for integers
    case other => Seq(other)
  }

  private def expand(cmp: Expression, lev: Levenshtein,
                     k: Int): Seq[Expression] = {
    val band = LessThanOrEqual(
      Abs(Subtract(Length(lev.left), Length(lev.right)), failOnError = false),
      Literal(k))
    val lev3 = Levenshtein(lev.left, lev.right, Some(Literal(k)))
    // keep the original comparison shape (casts included), with the
    // thresholded kernel substituted for the bare one
    val swapped = cmp.transform {
      case l: Levenshtein if l eq lev => lev3
    }
    Seq(band, GreaterThanOrEqual(lev3, Literal(0)), swapped)
  }

  private def rewrite(cond: Expression): Option[Expression] = {
    val conjs = graft.plans.PredicateSplit.split(cond)
    val out = conjs.flatMap(rewriteConjunct)
    if (out.length != conjs.length) Some(out.reduceLeft(And)) else None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transform {
      case j @ Join(_, _, _, Some(cond), _) =>
        rewrite(cond).map(c => j.copy(condition = Some(c))).getOrElse(j)
      case f @ Filter(cond, _) =>
        rewrite(cond).map(c => f.copy(condition = c)).getOrElse(f)
    }
  }
}

/** Conjunct splitting shared by graft rules (PredicateHelper's method,
  * exposed without inheriting the full trait). */
private[plans] object PredicateSplit {
  def split(cond: Expression): Seq[Expression] = cond match {
    case And(l, r) => split(l) ++ split(r)
    case other => Seq(other)
  }
}
