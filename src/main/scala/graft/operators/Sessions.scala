package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization — the bounded-data dual of
  * [[graft.streaming.GraftStreaming.sessionize]].
  *
  * Classic two-window formulation: flag rows whose gap to the previous
  * event exceeds `gap` (lag window), running-sum the flags into a session
  * index (cumulative window), then aggregate per (key, session). Both
  * windows partition by the session key, so the whole computation is ONE
  * hash shuffle on the key followed by per-partition sorts — no self-join,
  * no collect. Skewed keys (one user with millions of events) sort within
  * a single partition; cap upstream if a key can be pathological.
  */
object Sessions {

  /** Sessions per key: (key, session_id, start, end, n_events).
    * `tsCol` must be a NUMERIC column in epoch units matching `gap`
    * (TimestampType subtraction yields an interval, not a number — convert
    * with `unix_micros`/`unix_millis` first); `tieBreak` makes ordering
    * (and therefore session ids) deterministic under equal timestamps.
    */
  def batch(df: DataFrame, keyCol: Column, tsCol: Column, tieBreak: Column,
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
}
