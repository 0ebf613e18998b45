package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization — the bounded-data dual of
  * [[graft.streaming.GraftStreaming.sessionize]].
  *
  * Classic two-window formulation: flag rows whose gap to the previous
  * event exceeds `gap` (lag window), running-sum the flags into a session
  * index (cumulative window), then aggregate per (key, session). No
  * self-join, no collect. [[batch]] defaults to the bucketed skew-safe
  * execution ([[batchSkewSafe]]) so a pathological key never sorts in one
  * task; [[batchSingleWindow]] is the explicit minimal-plan fast path.
  */
object Sessions {

  /** Sessions per key: (key, session_id, start, end, n_events).
    * `tsCol` must be a NUMERIC column in epoch units matching `gap`
    * (TimestampType subtraction yields an interval, not a number — convert
    * with `unix_micros`/`unix_millis` first); `tieBreak` makes ordering
    * (and therefore session ids) deterministic under equal timestamps.
    *
    * DEFAULTS TO THE SKEW-SAFE EXECUTION ([[batchSkewSafe]] — result-
    * identical, property-tested and oracle-shared): a hot key (one user
    * with millions of events) must never become a single-task sort at
    * 100 TB, so safety is opt-OUT. `bucket` ≤ 0 picks an automatic width
    * (1024 gaps, at least a day of micros); call [[batchSingleWindow]]
    * when keys are known well-distributed.
    */
  def batch(df: DataFrame, keyCol: Column, tsCol: Column, tieBreak: Column,
      gap: Long, bucket: Long = 0L): DataFrame = {
    val b =
      if (bucket > 0) bucket
      else {
        // auto width: ≫ gap so phase-2 stays tiny, overflow-clamped
        val byGap = if (gap > Long.MaxValue / 1024) Long.MaxValue else gap * 1024
        math.max(86400000000L, byGap)
      }
    batchSkewSafe(df, keyCol, tsCol, tieBreak, gap, b)
  }

  /** Single-window fast path: the classic two-window formulation in ONE
    * hash shuffle + per-key sort — minimal plan, hot keys sort in one
    * task. Same contract and result as [[batch]]; use when the key
    * distribution is known un-skewed (or pre-capped).
    */
  def batchSingleWindow(df: DataFrame, keyCol: Column, tsCol: Column, tieBreak: Column,
      gap: Long): DataFrame = {
    val byTime = Window.partitionBy(keyCol).orderBy(tsCol, tieBreak)
    val newSession =
      when(tsCol - lag(tsCol, 1).over(byTime) > gap, 1).otherwise(0)
    val withSid = df.withColumn("__brk", newSession)
      .withColumn("session_id",
        sum(col("__brk")).over(byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    withSid
      .groupBy(keyCol.as("key"), col("session_id"))
      .agg(min(tsCol).as("start_ts"), max(tsCol).as("end_ts"),
        count(lit(1)).as("n_events"))
  }

  /** Skew-safe sessionization, same result as [[batch]] (same schema,
    * same 0-based per-key session ids): events first sessionize within
    * (key, time bucket) — a pathological key's events spread across its
    * buckets instead of sorting in ONE task — then the per-bucket
    * sessions (at most a few rows per bucket, never the raw events)
    * merge across boundaries with the identical gap rule at the session
    * level. A session chaining through n buckets is n sub-sessions
    * healed by the second pass; per-key data in that pass is bounded by
    * the key's session/bucket count, so the hot-key sort the event-level
    * window needed is gone.
    *
    * `bucket` must exceed `gap` (a gap can then only straddle ONE
    * boundary) and should be generous — e.g. a day of micros for minute
    * gaps — so bucket counts stay small and phase-2 stays tiny.
    */
  def batchSkewSafe(df: DataFrame, keyCol: Column, tsCol: Column, tieBreak: Column,
      gap: Long, bucket: Long): DataFrame = {
    require(bucket > gap, s"bucket ($bucket) must exceed gap ($gap)")
    // exact integral bucket start: ts - (ts mod bucket); pmod keeps
    // negative timestamps in the right bucket
    val bucketStart = (tsCol - pmod(tsCol, lit(bucket))).as("__bkt")
    val byTime = Window.partitionBy(keyCol, col("__bkt")).orderBy(tsCol, tieBreak)
    val sub = df.withColumn("__bkt", bucketStart)
      .withColumn("__brk",
        when(tsCol - lag(tsCol, 1).over(byTime) > gap, 1).otherwise(0))
      .withColumn("__sid",
        sum(col("__brk")).over(byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(keyCol.as("key"), col("__bkt"), col("__sid"))
      .agg(min(tsCol).as("start_ts"), max(tsCol).as("end_ts"),
        count(lit(1)).as("n_events"))
    // phase 2: the same gap rule over SESSION rows — merge a session with
    // its predecessor when its first event is within gap of the
    // predecessor's last event (exactly the boundary condition the
    // bucketing may have split)
    val bySession = Window.partitionBy(col("key")).orderBy(col("start_ts"), col("__bkt"), col("__sid"))
    sub
      .withColumn("__mbrk",
        when(col("start_ts") - lag(col("end_ts"), 1).over(bySession) > gap, 1).otherwise(0))
      .withColumn("session_id",
        sum(col("__mbrk")).over(bySession.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("key"), col("session_id"))
      .agg(min(col("start_ts")).as("start_ts"), max(col("end_ts")).as("end_ts"),
        sum(col("n_events")).as("n_events"))
  }

  /** Ordered funnel analysis: per key, the earliest time each stage
    * 0..nStages−1 completes IN SEQUENCE — stage i counts only at or
    * after the key's stage-(i−1) completion time (the classic
    * signup → activate → purchase question). Output: (key,
    * t_stage_0 .. t_stage_{n−1}), nulls from the first uncompleted
    * stage on (strictly monotone null suffix — a key that never reaches
    * stage i has nulls for every j ≥ i).
    *
    * Scale shape: one MIN aggregate per stage, every one keyed by the
    * funnel key, chained by co-partitioned joins on that same key —
    * under one exchange reuse the whole ladder is a single shuffle of
    * the events plus broadcast-free streamed aggregations; no windows,
    * no per-key ordering.
    */
  def funnelStages(df: DataFrame, keyCol: String, tsCol: String,
      stageCol: String, nStages: Int): DataFrame = {
    require(nStages >= 1 && nStages <= 16, s"nStages must be in [1, 16], got $nStages")
    val base = df.select(col(keyCol).as("__k"), col(tsCol).cast("long").as("__ts"),
      col(stageCol).cast("int").as("__st"))
    // each stage table is materialized once: stage i's aggregate consumes
    // stage i−1's, and the final wide row joins every stage — without the
    // checkpoint Spark re-executes each earlier stage's whole lineage
    // (events re-scanned per consumer; measured ~2x the scans on the
    // 4-stage funnel), since common subplans are not deduplicated
    var acc = Materialize.once(base.where(col("__st") === 0)
      .groupBy(col("__k")).agg(min(col("__ts")).as("t_stage_0")))
    for (i <- 1 until nStages) {
      val prev = s"t_stage_${i - 1}"
      val next = base.where(col("__st") === i)
        .join(acc.select(col("__k"), col(prev).as("__tp")), Seq("__k"))
        .where(col("__ts") >= col("__tp"))
        .groupBy(col("__k")).agg(min(col("__ts")).as(s"t_stage_$i"))
      acc = Materialize.once(acc.join(next, Seq("__k"), "left"))
    }
    acc.withColumnRenamed("__k", keyCol)
  }

  /** Cohort retention matrix: users bucketed by FIRST-activity period
    * (cohort), counted as retained in every later period they are active
    * in. Output: (cohort, period_offset, n_active) — offset 0 is the
    * cohort size by construction. `bucket` is the period width in the
    * units of `tsCol` (e.g. 7 days of nanos for weekly cohorts); all
    * arithmetic is integer floor-division so the matrix hash-oracles.
    *
    * Scale shape: first-activity is one MIN aggregate per user; the
    * distinct (user, period) activity set is one aggregate on the same
    * key; the join is co-partitioned on the user key and the matrix
    * rollup is a tiny (cohorts × offsets) aggregate.
    */
  def cohortRetention(df: DataFrame, keyCol: String, tsCol: String,
      bucket: Long): DataFrame = {
    require(bucket > 0, s"bucket must be positive, got $bucket")
    // TRUE floor division (pmod-adjusted): Spark's IntegralDivide truncates
    // toward zero, which would bucket pre-epoch (negative) timestamps off by
    // one vs DuckDB's floor-semantics `//`. (ts − pmod(ts, bucket)) is exactly
    // divisible by bucket, so the quotient is floor(ts / bucket) for any sign.
    def floorDiv(a: Column): Column = {
      val al = a.cast("long")
      org.apache.spark.sql.GraftBridge.column(
        org.apache.spark.sql.catalyst.expressions.IntegralDivide(
          org.apache.spark.sql.GraftBridge.expression(al - pmod(al, lit(bucket))),
          org.apache.spark.sql.catalyst.expressions.Literal(bucket)))
    }
    val periods = df.select(col(keyCol).as("__k"),
      floorDiv(col(tsCol)).as("__p")).distinct()
    val first = periods.groupBy(col("__k")).agg(min(col("__p")).as("__cohort"))
    periods.join(first, Seq("__k"))
      .groupBy(col("__cohort").as("cohort"),
        (col("__p") - col("__cohort")).as("period_offset"))
      .agg(count(lit(1)).cast("long").as("n_active"))
  }
}
