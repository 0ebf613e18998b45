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
  * in the point column's units (the session owner knows the interval
  * scale; a wrong width is still correct, just slower). Applies only to
  * INNER joins whose condition is exactly the two range conjuncts over
  * integral deterministic expressions, point from one side and both
  * bounds from the other — anything else is left untouched.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {
  val BinWidthKey = "spark.graft.rangeJoin.binWidth"

  private def binWidth: Long =
    try SQLConf.get.getConfString(BinWidthKey, "0").toLong
    catch { case _: NumberFormatException => 0L }

  private def integral(e: Expression): Boolean = e.dataType match {
    case LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  /** (point, lo, hi) if the condition is the canonical BETWEEN shape. */
  private def asRange(cond: Expression): Option[(Expression, Expression, Expression)] =
    cond match {
      case And(GreaterThanOrEqual(p1, lo), LessThanOrEqual(p2, hi))
          if p1.semanticEquals(p2) => Some((p1, lo, hi))
      case And(LessThanOrEqual(p1, hi), GreaterThanOrEqual(p2, lo))
          if p1.semanticEquals(p2) => Some((p1, lo, hi))
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = binWidth
    if (w <= 0) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) if asRange(cond).exists {
            case (pt, lo, hi) =>
              integral(pt) && integral(lo) && integral(hi) &&
                pt.deterministic && lo.deterministic && hi.deterministic &&
                pt.references.nonEmpty && pt.references.subsetOf(left.outputSet) &&
                (lo.references ++ hi.references).nonEmpty &&
                (lo.references ++ hi.references).subsetOf(right.outputSet)
          } =>
        val (pt, lo, hi) = asRange(cond).get
        val wLit = Literal(w, LongType)
        def divW(e: Expression): Expression = IntegralDivide(Cast(e, LongType), wLit)
        val ptBin = Alias(divW(pt), "__graft_pt_bin")()
        val leftBinned = Project(left.output :+ ptBin, left)
        // Sequence is TimeZoneAwareExpression: unresolved until the zone is
        // set, and no analyzer pass runs after an optimizer rule — set it
        // explicitly (irrelevant for integral sequences, but required)
        val gen = Explode(
          Sequence(divW(lo), divW(hi), None, Some(SQLConf.get.sessionLocalTimeZone)))
        val genOut = DataTypeUtils.toAttributes(gen.elementSchema)
        val rightBinned = Generate(gen, unrequiredChildIndex = Nil, outer = false,
          qualifier = None, generatorOutput = genOut, child = right)
        val binJoin = Join(leftBinned, rightBinned, Inner,
          Some(EqualTo(ptBin.toAttribute, genOut.head)), hint)
        Project(j.output, Filter(cond, binJoin))
    }
  }
}
