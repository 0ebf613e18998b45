package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
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
  * logical rewrite stands down when the physical flag is on). Plans the
  * broadcast join when the interval side's planning-time size estimate
  * fits the broadcast threshold; otherwise plans the logical rewrite's
  * binned equi-join directly — never Nil for a matched pattern, so the
  * query cannot fall through to a nested loop.
  */
object RangeJoinStrategy extends SparkStrategy {

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case Join(left, right, Inner, Some(cond), _)
        if RangeJoinRewrite.physicalEnabled && RangeJoinRewrite.binWidth > 0 =>
      RangeJoinRewrite.asRange(cond) match {
        case Some((pt, lo, hi)) =>
          val j = plan.asInstanceOf[Join]
          def fits(side: LogicalPlan) = RangeJoinRewrite.fitsBroadcast(side)
          val ptOnLeft = RangeJoinRewrite.sidesMatch(pt, lo, hi, left, right)
          val ptOnRight = RangeJoinRewrite.sidesMatch(pt, lo, hi, right, left)
          if (ptOnLeft && fits(right)) {
            BroadcastRangeJoinExec(pt, lo, hi, RangeJoinRewrite.binWidth,
              planLater(left), planLater(right), streamedIsLeft = true) :: Nil
          } else if (ptOnRight && fits(left)) {
            BroadcastRangeJoinExec(pt, lo, hi, RangeJoinRewrite.binWidth,
              planLater(right), planLater(left), streamedIsLeft = false) :: Nil
          } else if (ptOnLeft || ptOnRight) {
            // matched but not broadcastable: own the fallback too — plan
            // the binned equi-join rather than let BNLJ happen
            planLater(RangeJoinRewrite.rewriteJoin(j, RangeJoinRewrite.binWidth)) :: Nil
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
      // the bin index is built ONCE PER EXECUTOR (cached weakly against
      // the broadcast value), not once per task — thousands of tasks
      // share one build, and probes read primitive parallel arrays
      val bins = BroadcastRangeJoinExec.index(broadcastRelation.value, loBound, hiBound, w)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(outAttrs, leftAttrs ++ rightAttrs)
      iter.flatMap { srow =>
        val pv = ptBound.eval(srow)
        if (pv == null) Iterator.empty
        else {
          val p = pv.asInstanceOf[Long]
          val bucket = bins.get(Math.floorDiv(p, w))
          if (bucket == null) Iterator.empty
          else new Iterator[InternalRow] {
            private var i = 0
            private var nextRow: InternalRow = null
            private def advance(): Unit = {
              nextRow = null
              while (nextRow == null && i < bucket.los.length) {
                if (bucket.los(i) <= p && p <= bucket.his(i)) {
                  numOutputRows += 1
                  val brow = bucket.rows(i)
                  nextRow = proj(if (sIsLeft) joined(srow, brow) else joined(brow, srow))
                }
                i += 1
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
    streamed.execute().mapPartitions(fn, preservesPartitioning = true)
  }
}

object BroadcastRangeJoinExec {
  /** One bin's intervals as parallel primitive arrays — probes touch no
    * boxed values.
    */
  private[plans] final class Bucket(
    val los: Array[Long], val his: Array[Long], val rows: Array[InternalRow])

  // Executor-wide index cache keyed WEAKLY by the broadcast value array,
  // with an inner key of (canonicalized bounds, bin width): the SAME
  // broadcast value can serve two joins with different lo/hi (ReuseExchange
  // dedups exchanges by child result, not by the join using them), so the
  // value array alone would hand join B a stale index built for join A's
  // bounds. Built once per executor per distinct key; entries die with the
  // broadcast when the driver destroys it.
  private val indexCache = new java.util.WeakHashMap[Array[InternalRow],
    java.util.HashMap[String, java.util.HashMap[java.lang.Long, Bucket]]]()

  private[plans] def index(values: Array[InternalRow], loBound: Expression,
      hiBound: Expression, w: Long): java.util.HashMap[java.lang.Long, Bucket] =
    indexCache.synchronized {
      var byBounds = indexCache.get(values)
      if (byBounds == null) {
        byBounds = new java.util.HashMap[String, java.util.HashMap[java.lang.Long, Bucket]]()
        indexCache.put(values, byBounds)
      }
      val key = s"${loBound.canonicalized}|${hiBound.canonicalized}|$w"
      val got = byBounds.get(key)
      if (got != null) got
      else {
        final class Grow {
          var n = 0
          var los = new Array[Long](4); var his = new Array[Long](4)
          var rows = new Array[InternalRow](4)
          def add(lo: Long, hi: Long, r: InternalRow): Unit = {
            if (n == los.length) {
              los = java.util.Arrays.copyOf(los, n * 2)
              his = java.util.Arrays.copyOf(his, n * 2)
              rows = java.util.Arrays.copyOf(rows, n * 2)
            }
            los(n) = lo; his(n) = hi; rows(n) = r; n += 1
          }
          def freeze = new Bucket(java.util.Arrays.copyOf(los, n),
            java.util.Arrays.copyOf(his, n), java.util.Arrays.copyOf(rows, n))
        }
        val tmp = new java.util.HashMap[java.lang.Long, Grow]()
        for (row <- values) {
          val loV = loBound.eval(row)
          val hiV = hiBound.eval(row)
          if (loV != null && hiV != null) {
            val lo1 = loV.asInstanceOf[Long]; val hi1 = hiV.asInstanceOf[Long]
            var b = Math.floorDiv(lo1, w)
            val bEnd = Math.floorDiv(hi1, w)
            while (b <= bEnd) {
              var g = tmp.get(b)
              if (g == null) { g = new Grow; tmp.put(b, g) }
              g.add(lo1, hi1, row)
              b += 1
            }
          }
        }
        val built = new java.util.HashMap[java.lang.Long, Bucket](tmp.size() * 2)
        tmp.forEach((k, g) => built.put(k, g.freeze))
        byBounds.put(key, built)
        built
      }
    }
}
