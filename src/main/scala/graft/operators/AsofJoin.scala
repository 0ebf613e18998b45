package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (point-in-time) join: for each left row, the LATEST right row with
  * `rightTs <= leftTs` for the same key (direction "backward", the
  * default), or the EARLIEST right row with `rightTs >= leftTs`
  * ("forward") — the time-series join Spark has no built-in for
  * (price-at-trade-time, feature-at-event-time, config-at-request-time
  * lookups). An optional tolerance bounds how far the match may sit from
  * the left timestamp (pandas merge_asof parity).
  *
  * Composed from existing operators per the Spark-first preference order
  * (no custom plan needed): tag both sides, union, and take a running
  * `last(right-payload, ignoreNulls)` over (key, ts) ordering. ONE shuffle
  * on the key, each row carried once — never the per-row range-join
  * explosion of `left JOIN right ON rts <= lts` + windowed dedup, whose
  * intermediate is |left|·|matching right| at 100 TB. Right rows sort
  * before left rows at equal timestamps, giving the standard inclusive
  * (`<=`) as-of semantics.
  *
  * `right` must be unique per (key, ts) — pre-aggregate it otherwise (ties
  * would make "the" match nondeterministic in any engine).
  */
object AsofJoin {

  private val Reserved = Seq("__ts", "__tag", "__rv", "__m", "__bkt", "__rvb", "__carry")

  /** @param payload right-side columns to surface (null when no right row
    *                matches); all other right columns drop.
    * @param direction "backward" (latest right at or before the left ts)
    *                  or "forward" (earliest right at or after)
    * @param tolerance max allowed |leftTs - rightTs| for a match to
    *                  count (same units as the ts columns, which must be
    *                  numeric when set); beyond it the payload is null
    * @param bucket time-bucket width (ts units) for the skew-safe
    *               execution — see [[asofSkewSafe]]; any positive value
    *               is correct, only skew behavior changes
    *
    * Null semantics match SQL: right rows with a null key or null
    * timestamp never match anything (the join condition can't be true for
    * NULL), and left rows with a null key or timestamp surface null
    * payload.
    *
    * DEFAULTS TO THE SKEW-SAFE EXECUTION ([[asofSkewSafe]] — result-
    * identical, property-tested and oracle-shared): on 100 TB tick data a
    * hot key must never become a single-task sort, so safety is opt-OUT.
    * Call [[asofSingleWindow]] when keys are known well-distributed and
    * the carry join is unwanted.
    */
  def asof(left: DataFrame, right: DataFrame,
      keyCol: String, leftTs: String, rightTs: String,
      payload: Seq[String], direction: String = "backward",
      tolerance: Option[Long] = None, bucket: Long = 0L): DataFrame =
    asofSkewSafe(left, right, keyCol, leftTs, rightTs, payload, direction,
      tolerance, bucket)

  /** Single-window fast path: ONE shuffle + ONE per-key sort, no carry
    * join — the minimal plan, with the caveat that every row of a key
    * sorts in one task. Same contract and result as [[asof]]; use when
    * the key distribution is known un-skewed (or pre-capped).
    */
  def asofSingleWindow(left: DataFrame, right: DataFrame,
      keyCol: String, leftTs: String, rightTs: String,
      payload: Seq[String], direction: String = "backward",
      tolerance: Option[Long] = None): DataFrame = {
    val p = prep(left, right, keyCol, leftTs, rightTs, payload, direction, tolerance)
    val base = Window.partitionBy(col(keyCol)).orderBy(col("__ts").asc, col("__tag").asc)
    val (w, pick) =
      if (p.backward)
        (base.rowsBetween(Window.unboundedPreceding, Window.currentRow),
          last(col("__rv"), ignoreNulls = true))
      else
        (base.rowsBetween(Window.currentRow, Window.unboundedFollowing),
          first(col("__rv"), ignoreNulls = true))
    p.unioned
      .withColumn("__m", pick.over(w))
      .where(col("__tag") === 1)
      .select(left.columns.toIndexedSeq.map(col) ++
        payload.map(q => when(p.tolOk, col(s"__m.$q")).as(q)): _*)
  }

  /** Skew-safe as-of join — what [[asof]] runs by DEFAULT, mirroring
    * [[Sessions.batchSkewSafe]]. [[asofSingleWindow]]'s
    * whole computation is one `Window.partitionBy(key)`: every row of a
    * key sorts in ONE task, so a 100 TB tick-data as-of on a hot
    * instrument key is a single-task sort. Here rows first match within
    * (key, time bucket) — a hot key's rows spread across its buckets —
    * and buckets that found no local match take the boundary value
    * carried from earlier (backward) / later (forward) buckets: one row
    * per (key, bucket) crosses the second window, so per-key work in the
    * fix-up pass is bounded by the key's bucket count, never its row
    * count.
    *
    * `bucket` is the time-bucket width IN TS UNITS and is therefore
    * unit-bearing; size it so a typical key has ≪ rows per bucket than
    * total. Any positive value is correct — only the skew behavior
    * changes. `bucket` ≤ 0 picks automatically: 1024 tolerances when a
    * tolerance is given (tolerance carries the caller's unit), else one
    * day of MICROseconds — callers on millisecond/second timestamps
    * without a tolerance must pass an explicit bucket, or the buckets
    * degenerate to one per key and the single-task sort this path
    * exists to prevent quietly returns.
    */
  def asofSkewSafe(left: DataFrame, right: DataFrame,
      keyCol: String, leftTs: String, rightTs: String,
      payload: Seq[String], direction: String = "backward",
      tolerance: Option[Long] = None, bucket: Long = 0L): DataFrame = {
    val bucketW =
      if (bucket > 0) bucket
      else tolerance match {
        case Some(t) if t > 0 =>
          if (t > Long.MaxValue / 1024) Long.MaxValue else t * 1024
        case _ => 86400000000L
      }
    val p = prep(left, right, keyCol, leftTs, rightTs, payload, direction, tolerance)
    def bucketOf(ts: Column): Column = ts - pmod(ts, lit(bucketW))
    // phase 1: within-(key, bucket) running match — the hot key's rows
    // sort per bucket, not per key
    val unioned = p.unioned.withColumn("__bkt", bucketOf(col("__ts")))
    val base = Window.partitionBy(col(keyCol), col("__bkt"))
      .orderBy(col("__ts").asc, col("__tag").asc)
    val (w, pick) =
      if (p.backward)
        (base.rowsBetween(Window.unboundedPreceding, Window.currentRow),
          last(col("__rv"), ignoreNulls = true))
      else
        (base.rowsBetween(Window.currentRow, Window.unboundedFollowing),
          first(col("__rv"), ignoreNulls = true))
    val local = unioned.withColumn("__m", pick.over(w)).where(col("__tag") === 1)
    // phase 2: per (key, bucket) boundary value from the right side —
    // backward carries each bucket's LAST right row forward, forward
    // carries each bucket's FIRST right row backward. One row per
    // (key, bucket) enters the carry window, so the per-key sort is over
    // bucket counts, not row counts.
    val rBkts = p.r.groupBy(col(keyCol), bucketOf(col("__ts")).as("__bkt"))
      .agg((if (p.backward) max_by(col("__rv"), col("__ts"))
            else min_by(col("__rv"), col("__ts"))).as("__rvb"))
    // left buckets with no right rows still need the carry, so the carry
    // window runs over the union of both sides' (key, bucket) pairs
    val lBkts = p.l.select(col(keyCol), bucketOf(col("__ts")).as("__bkt")).distinct()
    val allBkts = lBkts.join(rBkts, Seq(keyCol, "__bkt"), "full_outer")
    val carryW = Window.partitionBy(col(keyCol))
      .orderBy(if (p.backward) col("__bkt").asc else col("__bkt").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = allBkts
      .withColumn("__carry", last(col("__rvb"), ignoreNulls = true).over(carryW))
      .select(col(keyCol), col("__bkt"), col("__carry"))
    // a local match always beats the carry: backward, any right row in the
    // left row's own bucket at ts' <= ts is later than every earlier
    // bucket's rows (and symmetrically forward)
    local.join(carries, Seq(keyCol, "__bkt"), "left")
      .withColumn("__m", coalesce(col("__m"), col("__carry")))
      .select(left.columns.toIndexedSeq.map(col) ++
        payload.map(q => when(p.tolOk, col(s"__m.$q")).as(q)): _*)
  }

  /** Shared validation + tagged-union prep for [[asof]]/[[asofSkewSafe]]. */
  private final case class Prep(l: DataFrame, r: DataFrame, unioned: DataFrame,
      backward: Boolean, tolOk: Column)

  private def prep(left: DataFrame, right: DataFrame,
      keyCol: String, leftTs: String, rightTs: String,
      payload: Seq[String], direction: String,
      tolerance: Option[Long]): Prep = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward or forward, got $direction")
    require(!payload.contains("__mts"), "__mts is reserved for the matched ts")
    val clash = left.columns.intersect(Reserved)
    require(clash.isEmpty, s"left columns ${clash.mkString(",")} collide with " +
      s"internal names ${Reserved.mkString(",")} — rename them first")
    val backward = direction == "backward"
    // the matched right ts rides first in the struct so tolerance can
    // compare it after the window picks the match
    val rvType = StructType(right.schema(rightTs).copy(name = "__mts", nullable = true) +:
      payload.map(p => right.schema(p).copy(nullable = true)))
    val r = right
      // SQL join semantics: a null key or null ts can never satisfy
      // `r.key = l.key AND r.ts <= l.ts`; unfiltered, a null-ts right row
      // would sort first (asc = NULLS FIRST) and become a universal
      // fallback match
      .where(col(keyCol).isNotNull && col(rightTs).isNotNull)
      .select(col(keyCol), col(rightTs).as("__ts"),
        struct((col(rightTs).as("__mts") +: payload.map(col)): _*).as("__rv"))
      // backward: right sorts BEFORE left at equal ts so the inclusive
      // match lands in [unboundedPreceding, current]; forward: right
      // sorts AFTER left so it lands in [current, unboundedFollowing]
      .withColumn("__tag", lit(if (backward) 0 else 2))
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__tag", lit(1))
      .withColumn("__rv", lit(null).cast(rvType))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val tolOk = tolerance.fold(lit(true)) { t =>
      if (backward) col("__ts") - col("__m.__mts") <= t
      else col("__m.__mts") - col("__ts") <= t
    }
    Prep(l, r, unioned, backward, tolOk)
  }
}
