package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Temperature-flattened source mixing — the standard knob for balancing
  * a multi-source training corpus: sampling probability per source is
  * proportional to `share^alpha` with `alpha < 1`, so dominant sources
  * are down-weighted and small ones surface. Alpha is fixed at 0.5
  * (sqrt): IEEE-754 `sqrt` is exactly rounded, so the DuckDB oracle
  * replays the arithmetic bit-identically — libm `pow` is not correctly
  * rounded and a one-ulp difference would flip rows at the threshold.
  *
  * Fully deterministic: the per-source rate becomes an integer LCG
  * threshold (same scheme as `Flow.sampleBy`), the keep decision is a
  * pure function of the row id. Scale shape: source stats are a tiny
  * aggregate (one row per source) broadcast back onto the corpus; the
  * sample itself is a map-side filter — one small shuffle for the stats,
  * zero for the data.
  */
object Mixture {

  /** Column replay of `Flow.lcg31` (ids must be non-negative; the
    * pre-multiply mask keeps the product overflow-free for 64-bit ids —
    * see Flow.lcg31).
    */
  def lcg31Col(id: Column): Column = {
    val x = id.cast("long")
    ((x.bitwiseXOR(shiftright(x, 31)).bitwiseAND(2147483647L))
      * 1103515245L + 12345L).bitwiseAND(2147483647L)
  }

  /** Per-source LCG keep-thresholds for `targetFraction` of the profiled
    * corpus with rates ∝ sqrt(source share), capped at keeping a source
    * whole: (sourceCol, __thr). Distilled once from a (static) profile —
    * one tiny aggregate — and broadcast onto whatever is being sampled;
    * the keep decision downstream is a pure function of (source, id), so
    * the SAME thresholds gate a batch corpus or an unbounded stream
    * ([[graft.streaming.GraftStreaming.mixtureStream]]) identically.
    */
  def sqrtMixtureRates(profile: DataFrame, sourceCol: String,
      targetFraction: Double): DataFrame = {
    require(targetFraction > 0 && targetFraction <= 1.0,
      s"targetFraction must be in (0, 1], got $targetFraction")
    val counts = profile.groupBy(sourceCol).agg(count(lit(1)).as("__n"))
    // integer-scaled weights so the normalizing sum is exact (a double
    // sum's value would depend on aggregation order)
    val weights = counts.withColumn("__w",
      floor(sqrt(col("__n").cast("double")) * 1000000.0).cast("long"))
    val tot = weights.agg(sum("__w").as("__sumw"), sum("__n").as("__total"))
    weights.crossJoin(broadcast(tot))
      .withColumn("__rate", least(lit(1.0),
        (col("__w").cast("double") / col("__sumw").cast("double"))
          * (col("__total").cast("double") * targetFraction) / col("__n").cast("double")))
      .withColumn("__thr", floor(col("__rate") * 2147483648.0).cast("long"))
      .select(col(sourceCol), col("__thr"))
  }

  /** Gate rows by pre-computed [[sqrtMixtureRates]] thresholds: broadcast
    * join + map-side LCG filter, zero shuffle on the data side.
    */
  def applyRates(df: DataFrame, sourceCol: String, idCol: String,
      rates: DataFrame): DataFrame =
    df.join(broadcast(rates), sourceCol)
      .where(lcg31Col(col(idCol)) < col("__thr"))
      .drop("__thr")

  /** Sample `targetFraction` of the corpus with per-source rates
    * ∝ sqrt(source share), capped at keeping a source whole.
    */
  def sqrtMixtureSample(df: DataFrame, sourceCol: String, idCol: String,
      targetFraction: Double): DataFrame =
    applyRates(df, sourceCol, idCol, sqrtMixtureRates(df, sourceCol, targetFraction))
}
