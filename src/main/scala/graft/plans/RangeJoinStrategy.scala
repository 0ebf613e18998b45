package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.LongType

/** Physical planning for the point-in-interval join: when the interval
  * side is broadcast-sized, plan [[BroadcastRangeJoinExec]] directly
  * instead of letting Spark fall back to BroadcastNestedLoopJoin.
  *
  * BNLJ scans EVERY interval for every point — O(|points|·|intervals|)
  * comparisons. This node broadcasts the intervals once (through Spark's
  * own BroadcastExchange, so AQE reuse and the driver-size guard apply),
  * builds a bin → intervals hash map per task, and probes each point's
  * single bin — O(|points| + |intervals|·bins-per-interval), zero
  * shuffles, streaming-side partitioning preserved.
  *
  * Opt-in: `spark.graft.rangeJoin.physical=true` plus the shared
  * `spark.graft.rangeJoin.binWidth` (the [[RangeJoinRewrite]] knob; the
  * logical rewrite stands down when the physical flag is on). Fires only
  * when the interval side's estimated size fits the broadcast threshold —
  * otherwise returns Nil and the planner falls through (to the rewrite's
  * shuffled equi-join if binWidth is set on a later run, or BNLJ).
  */
object RangeJoinStrategy extends SparkStrategy {

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case Join(left, right, Inner, Some(cond), _)
        if RangeJoinRewrite.physicalEnabled && RangeJoinRewrite.binWidth > 0 =>
      RangeJoinRewrite.asRange(cond) match {
        case Some((pt, lo, hi)) =>
          val threshold = SQLConf.get.autoBroadcastJoinThreshold
          def fits(side: LogicalPlan) =
            threshold > 0 && side.stats.sizeInBytes <= threshold
          if (RangeJoinRewrite.sidesMatch(pt, lo, hi, left, right) && fits(right)) {
            BroadcastRangeJoinExec(pt, lo, hi, RangeJoinRewrite.binWidth,
              planLater(left), planLater(right), streamedIsLeft = true) :: Nil
          } else if (RangeJoinRewrite.sidesMatch(pt, lo, hi, right, left) && fits(left)) {
            BroadcastRangeJoinExec(pt, lo, hi, RangeJoinRewrite.binWidth,
              planLater(right), planLater(left), streamedIsLeft = false) :: Nil
          } else Nil
        case None => Nil
      }
    case _ => Nil
  }
}

/** Broadcast point-in-interval inner join. Streams the point side in
  * place; the interval side arrives via BroadcastExchange (required
  * distribution below — EnsureRequirements inserts the exchange, so the
  * broadcast is built once, size-guarded, and reusable across tasks).
  * Each task bins the broadcast intervals into a hash map keyed by
  * `value DIV binWidth` and probes one bin per point; the exact
  * `lo <= pt <= hi` check runs on the bin's candidates only. A point's
  * bin contains every interval overlapping that bin, so the probe is
  * complete, and each qualifying interval appears in the point's bin
  * exactly once, so multiplicity is exact with no dedup.
  */
final case class BroadcastRangeJoinExec(
    pt: Expression, lo: Expression, hi: Expression, binWidth: Long,
    streamed: SparkPlan, build: SparkPlan, streamedIsLeft: Boolean)
  extends BinaryExecNode {

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def left: SparkPlan = if (streamedIsLeft) streamed else build
  override def right: SparkPlan = if (streamedIsLeft) build else streamed

  override def output: Seq[Attribute] = left.output ++ right.output

  override def outputPartitioning: Partitioning = streamed.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (streamedIsLeft) Seq(UnspecifiedDistribution, BroadcastDistribution(IdentityBroadcastMode))
    else Seq(BroadcastDistribution(IdentityBroadcastMode), UnspecifiedDistribution)

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    if (streamedIsLeft) copy(streamed = newLeft, build = newRight)
    else copy(streamed = newRight, build = newLeft)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val broadcastRelation = build.executeBroadcast[Array[InternalRow]]()
    val ptBound = BindReferences.bindReference(Cast(pt, LongType), streamed.output)
    val loBound = BindReferences.bindReference(Cast(lo, LongType), build.output)
    val hiBound = BindReferences.bindReference(Cast(hi, LongType), build.output)
    val w = binWidth
    val sIsLeft = streamedIsLeft
    val outAttrs = output
    val leftAttrs = left.output
    val rightAttrs = right.output

    val fn = (iter: Iterator[InternalRow]) => {
      // bin map built per task from the broadcast value: cheap (the build
      // side is broadcast-sized by the strategy's guard) and task-local,
      // so no synchronization. (lo1, hi1, row) kept unboxed-adjacent.
      val bins = new java.util.HashMap[Long, java.util.ArrayList[(Long, Long, InternalRow)]]()
      for (row <- broadcastRelation.value) {
        val loV = loBound.eval(row)
        val hiV = hiBound.eval(row)
        if (loV != null && hiV != null) {
          val lo1 = loV.asInstanceOf[Long]; val hi1 = hiV.asInstanceOf[Long]
          var b = Math.floorDiv(lo1, w)
          val bEnd = Math.floorDiv(hi1, w)
          while (b <= bEnd) {
            var lst = bins.get(b)
            if (lst == null) { lst = new java.util.ArrayList(); bins.put(b, lst) }
            lst.add((lo1, hi1, row))
            b += 1
          }
        }
      }
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(outAttrs, leftAttrs ++ rightAttrs)
      iter.flatMap { srow =>
        val pv = ptBound.eval(srow)
        if (pv == null) Iterator.empty
        else {
          val p = pv.asInstanceOf[Long]
          val lst = bins.get(Math.floorDiv(p, w))
          if (lst == null) Iterator.empty
          else {
            val it = lst.iterator()
            new Iterator[InternalRow] {
              private var nextRow: InternalRow = null
              private def advance(): Unit = {
                nextRow = null
                while (nextRow == null && it.hasNext) {
                  val (lo1, hi1, brow) = it.next()
                  if (lo1 <= p && p <= hi1) {
                    numOutputRows += 1
                    nextRow = proj(if (sIsLeft) joined(srow, brow) else joined(brow, srow))
                  }
                }
              }
              override def hasNext: Boolean = { if (nextRow == null) advance(); nextRow != null }
              override def next(): InternalRow = {
                if (!hasNext) throw new NoSuchElementException
                val r = nextRow; nextRow = null; r
              }
            }
          }
        }
      }
    }
    streamed.execute().mapPartitions(fn, preservesPartitioning = true)
  }
}
