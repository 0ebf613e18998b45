package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling: fixed-width bucketing with gap-fill and
  * forward-fill — the densification step between an event stream and
  * anything windowed (rate limits, activity features, training-curriculum
  * time curves). The as-of join family answers "nearest value at query
  * time"; resample answers "one row per (key, bucket), including the
  * buckets where nothing happened", which is what downstream window
  * functions and charting need.
  *
  * Scale shape (100 TB of events):
  *  - the bucket aggregate is one hash aggregate keyed by (key, bucket) —
  *    map-side partial combine collapses each task to its distinct bucket
  *    set before the shuffle;
  *  - gap generation is per-key `sequence(lo, hi)` — output volume is the
  *    DENSIFIED series (keys x their active span / width), which the
  *    caller prices by choosing `bucketWidth`; nothing materializes a
  *    global time axis;
  *  - the fill join is keyed (key, bucket) against the aggregate output —
  *    two small sides derived from the same shuffle, planned by AQE; the
  *    raw event table is read exactly once;
  *  - forward-fill is `last(ignoreNulls)` over (key, bucket-order) — a
  *    per-key window whose partitions are the densified series, never the
  *    raw events.
  *
  * Determinism: counts are BIGINT, sums go through DECIMAL(28,4) (order
  * independent) and surface as DOUBLE — the registry-wide discipline.
  */
object Resample {

  /** Per (key, bucket = ts div bucketWidth): event count, value sum, with
    * empty buckets between each key's first and last filled in as
    * (n=0, total=0.0) and `filled` carrying the last non-empty bucket's
    * total forward. `tsCol` must be a nonnegative long (the events-table
    * normalization: nanos since epoch).
    * Output: (keyCol, bucket, n, total, filled).
    */
  def resample(df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    // materialized once: the aggregate output (distinct buckets — small)
    // feeds BOTH the span derivation and the fill join; without it the
    // raw-event scan and bucket aggregate would run twice via lineage
    val bucketed = Materialize.once(df
      .select(col(keyCol).as("__k"),
        expr(s"`$tsCol` div $bucketWidth").as("bucket"),
        col(valueCol).cast("decimal(28,4)").as("__v"))
      .groupBy("__k", "bucket")
      .agg(count(lit(1)).as("n"), sum(col("__v")).as("__tot")))
    val spans = bucketed.groupBy("__k")
      .agg(min(col("bucket")).as("__lo"), max(col("bucket")).as("__hi"))
    // densify in TWO chunked explode levels, never one `sequence(lo, hi)`
    // array per key: a single long-lived sparse key (span S buckets) would
    // otherwise materialize S longs as ONE array value inside a row.
    // Level 1 emits chunk ordinals (≤ S/chunk elements), level 2 emits one
    // ≤chunk-element sequence per ordinal — peak per-row memory is
    // max(S/chunk, chunk) longs, minimized around sqrt(S); chunk=65536
    // keeps both sides ≤ 0.5 MB out to S = 2^32 buckets. Output rows are
    // identical to the flat form, so oracles are unchanged.
    val chunk = 65536L
    val dense = spans
      .select(col("__k"), col("__lo"), col("__hi"),
        explode(sequence(lit(0L), expr(s"(__hi - __lo) div $chunk"))).as("__c"))
      .select(col("__k"),
        explode(sequence(
          col("__lo") + col("__c") * chunk,
          least(col("__hi"), col("__lo") + (col("__c") + 1) * chunk - 1))).as("bucket"))
    val w = Window.partitionBy(col("__k")).orderBy(col("bucket"))
    dense.join(bucketed, Seq("__k", "bucket"), "left")
      .select(col("__k"), col("bucket"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("__tot"), lit(BigDecimal(0)).cast("decimal(28,4)")).as("total"),
        last(col("__tot"), ignoreNulls = true).over(w).as("filled"))
      .select(col("__k").as(keyCol), col("bucket"), col("n"),
        col("total").cast("double").as("total"),
        col("filled").cast("double").as("filled"))
  }

  /** Rolling mean over the last `nRows` rows per key — the standard
    * consumer of a gap-filled series (a rolling window over SPARSE
    * buckets silently spans arbitrary time; over the densified series it
    * means exactly "the last `nRows` periods"). Determinism: the frame
    * sum runs through DECIMAL(28,4) (a ≤15-significant-digit double
    * round-trips decimal exactly), divided by the frame COUNT as double —
    * engine-independent, so the composition stays under the hash gate.
    */
  def rollingMean(df: DataFrame, keyCol: String, orderCol: String,
      valueCol: String, nRows: Int, outCol: String = "rolling"): DataFrame = {
    require(nRows > 0, s"nRows must be positive, got $nRows")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
      .rowsBetween(-(nRows - 1), Window.currentRow)
    df.withColumn(outCol,
      sum(col(valueCol).cast("decimal(28,4)")).over(w).cast("double") /
        count(lit(1)).over(w))
  }
}
