package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite a point-in-interval join —
  * `a JOIN b ON a.pt >= b.lo AND a.pt <= b.hi` — into the binned
  * equi-join of [[graft.operators.RangeJoin]], automatically.
  *
  * Spark has no range-join strategy: that condition has no equi-keys, so
  * the planner falls back to BroadcastNestedLoopJoin (or a filtered
  * cartesian) — |left|·|right| comparisons at 100 TB. The rewrite
  * explodes each interval into the fixed-width bins it covers
  * (`sequence(lo DIV w, hi DIV w)`), bins each point, equi-joins on the
  * bin, and re-applies the original predicate as an exact filter; a
  * (point, interval) pair meets in exactly one bin, so the rewrite is
  * multiplicity-exact with no dedup step.
  *
  * Opt-in: set `spark.graft.rangeJoin.binWidth` to a positive bin width
  * in the point column's units. Pick it near the typical interval width:
  * too LARGE just means bigger buckets (slower, still correct); too
  * SMALL explodes each interval into interval-width/binWidth bins — at
  * the extreme the per-row `sequence()` can exceed Spark's array-length
  * limit and fail the query, so don't set a nanosecond width for
  * day-long intervals. Applies only to INNER joins whose condition is
  * exactly the two range conjuncts over integral deterministic
  * expressions, point from one side (either one) and both bounds from
  * the other — anything else is left untouched.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {
  val BinWidthKey = "spark.graft.rangeJoin.binWidth"

  /** When true, [[RangeJoinStrategy]] owns the pattern: it plans the
    * broadcast physical join when the interval side fits the broadcast
    * threshold AT PLANNING TIME, and otherwise plans [[rewriteJoin]]'s
    * binned equi-join itself — so the pattern can never fall through to
    * BroadcastNestedLoopJoin, regardless of when stats shift.
    */
  val PhysicalKey = "spark.graft.rangeJoin.physical"

  private[plans] def binWidth: Long =
    try SQLConf.get.getConfString(BinWidthKey, "0").toLong
    catch { case _: NumberFormatException => 0L }

  private[plans] def physicalEnabled: Boolean =
    SQLConf.get.getConfString(PhysicalKey, "false").toBoolean

  private def integral(e: Expression): Boolean = e.dataType match {
    case LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  /** Interpretations of one conjunct as (point, bound, boundIsLower) —
    * `a >= b` is both "a's lower bound is b" and "b's upper bound is a",
    * so every operand orientation users write is covered.
    */
  private[plans] def interp(c: Expression): Seq[(Expression, Expression, Boolean)] = c match {
    case GreaterThanOrEqual(a, b) => Seq((a, b, true), (b, a, false))
    case LessThanOrEqual(a, b) => Seq((a, b, false), (b, a, true))
    case _ => Nil
  }

  /** (point, lo, hi) if the condition is a two-sided range on one
    * expression, whichever way each comparison is spelled.
    */
  private[plans] def asRange(cond: Expression): Option[(Expression, Expression, Expression)] =
    cond match {
      case And(c1, c2) =>
        (for {
          (p1, b1, low1) <- interp(c1)
          (p2, b2, low2) <- interp(c2)
          if low1 != low2 && p1.semanticEquals(p2)
        } yield if (low1) (p1, b1, b2) else (p1, b2, b1)).headOption
      case _ => None
    }

  /** True when pt comes wholly from `ptSide` and both bounds wholly from
    * `ivSide`, with everything integral and deterministic.
    */
  private[plans] def sidesMatch(pt: Expression, lo: Expression, hi: Expression,
      ptSide: LogicalPlan, ivSide: LogicalPlan): Boolean =
    integral(pt) && integral(lo) && integral(hi) &&
      pt.deterministic && lo.deterministic && hi.deterministic &&
      pt.references.nonEmpty && pt.references.subsetOf(ptSide.outputSet) &&
      (lo.references ++ hi.references).nonEmpty &&
      (lo.references ++ hi.references).subsetOf(ivSide.outputSet)

  /** True when the broadcast side's estimated size lets
    * [[RangeJoinStrategy]] plan the physical join.
    */
  private[plans] def fitsBroadcast(side: LogicalPlan): Boolean = {
    val threshold = SQLConf.get.autoBroadcastJoinThreshold
    threshold > 0 && side.stats.sizeInBytes <= threshold
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = binWidth
    if (w <= 0 || physicalEnabled) return plan
    // physicalEnabled: RangeJoinStrategy owns the pattern — and when the
    // interval side turns out not to fit the broadcast threshold AT
    // PLANNING TIME, the strategy itself plans rewriteJoin's binned
    // equi-join (not Nil), so no stats shift between optimize and plan
    // (e.g. AQE re-planning) can drop the query to a nested loop
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), _) if asRange(cond).exists {
            case (pt, lo, hi) =>
              sidesMatch(pt, lo, hi, left, right) || sidesMatch(pt, lo, hi, right, left)
          } =>
        rewriteJoin(j, w)
    }
  }

  /** The binned equi-join rewrite of one matched range join (shared by
    * the rule above and [[RangeJoinStrategy]]'s no-broadcast fallback).
    */
  private[plans] def rewriteJoin(j: Join, w: Long): LogicalPlan = {
    val left = j.left
    val right = j.right
    val cond = j.condition.get
    val hint = j.hint
    val (pt, lo, hi) = asRange(cond).get
    // points may sit on either join side; intervals on the other
    val pointsOnLeft = sidesMatch(pt, lo, hi, left, right)
    val (ptSide, ivSide) = if (pointsOnLeft) (left, right) else (right, left)
    val sideHint = if (pointsOnLeft) hint else JoinHint(hint.rightHint, hint.leftHint)
    val wLit = Literal(w, LongType)
    def divW(e: Expression): Expression = IntegralDivide(Cast(e, LongType), wLit)
    val ptBin = Alias(divW(pt), "__graft_pt_bin")()
    val ptBinned = Project(ptSide.output :+ ptBin, ptSide)
    // Sequence is TimeZoneAwareExpression: unresolved until the zone is
    // set, and no analyzer pass runs after an optimizer rule — set it
    // explicitly (irrelevant for integral sequences, but required)
    val gen = Explode(
      Sequence(divW(lo), divW(hi), None, Some(SQLConf.get.sessionLocalTimeZone)))
    val genOut = DataTypeUtils.toAttributes(gen.elementSchema)
    val ivBinned = Generate(gen, unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = genOut, child = ivSide)
    val binJoin = Join(ptBinned, ivBinned, Inner,
      Some(EqualTo(ptBin.toAttribute, genOut.head)), sideHint)
    Project(j.output, Filter(cond, binJoin))
  }
}
