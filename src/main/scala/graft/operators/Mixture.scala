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
      targetFraction: Double): DataFrame =
    sqrtMixtureRatesBy(profile, sourceCol, lit(1L), targetFraction)

  /** [[sqrtMixtureRates]] under an arbitrary additive size measure — the
    * production budget is almost always TOKENS, not documents (a source
    * of few huge documents outweighs one of many tiny ones): source mass
    * `n_s = Σ weight`, rates ∝ sqrt(mass share), expected KEPT MASS per
    * source = targetFraction·total·sqrt-share (the keep decision stays
    * the per-row LCG threshold, so kept mass concentrates by the law of
    * large numbers over each source's rows). `weight(1)` degenerates to
    * the row-count form exactly.
    */
  def sqrtMixtureRatesBy(profile: DataFrame, sourceCol: String,
      weight: Column, targetFraction: Double): DataFrame = {
    require(targetFraction > 0 && targetFraction <= 1.0,
      s"targetFraction must be in (0, 1], got $targetFraction")
    val counts = profile.groupBy(sourceCol)
      .agg(sum(weight.cast("long")).as("__n"))
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
    *
    * Unseen-source contract: a row whose source has NO rate row — a
    * source that appeared after the profile was distilled — is DROPPED
    * by default (the inner join; restart-to-reprofile, the
    * [[graft.streaming.GraftStreaming.quantileBinStreamBy]] discipline).
    * Pass `defaultRate = Some(r)` to instead gate unseen sources at rate
    * `r` (Some(1.0) = pass through whole) via a left join + coalesced
    * threshold — same zero-shuffle shape either way.
    */
  def applyRates(df: DataFrame, sourceCol: String, idCol: String,
      rates: DataFrame, defaultRate: Option[Double] = None): DataFrame =
    defaultRate match {
      case None =>
        df.join(broadcast(rates), sourceCol)
          .where(lcg31Col(col(idCol)) < col("__thr"))
          .drop("__thr")
      case Some(r) =>
        require(r >= 0.0 && r <= 1.0, s"defaultRate must be in [0,1], got $r")
        val defThr = math.floor(r * 2147483648.0).toLong // the __thr scheme
        df.join(broadcast(rates), Seq(sourceCol), "left")
          .where(lcg31Col(col(idCol)) < coalesce(col("__thr"), lit(defThr)))
          .drop("__thr")
    }

  /** Sample `targetFraction` of the corpus with per-source rates
    * ∝ sqrt(source share), capped at keeping a source whole.
    */
  def sqrtMixtureSample(df: DataFrame, sourceCol: String, idCol: String,
      targetFraction: Double): DataFrame =
    applyRates(df, sourceCol, idCol, sqrtMixtureRates(df, sourceCol, targetFraction))

  /** UniMax budget-capped per-source quotas (Chung et al. 2023,
    * "UniMax: Fairer and More Effective Language Sampling for
    * Large-Scale Multilingual Pretraining", arXiv:2304.09151): spend a
    * token/row budget `B = total·budgetNum/budgetDen` as UNIFORMLY as
    * possible across sources, except no source repeats more than
    * `maxEpochs` times — small sources get up-sampled to the epoch cap,
    * the rest split the remainder evenly.
    *
    * The paper's greedy loop (ascending size; each source takes
    * min(n·E, remaining/left)) is replaced by its closed form so both
    * engines compute quotas with WINDOW functions over the tiny
    * per-source table, all-integer:
    *
    *  - sort sources ascending by (n, source); j = position, m = count;
    *  - source j is epoch-CAPPED iff n_j·E·(m−j+1) + E·prefix_{j−1} ≤ B
    *    (its full n_j·E fits the fair share at its turn). Because n_j is
    *    ascending this predicate is monotone — capped sources form a
    *    PREFIX, so the greedy loop and the pointwise predicate agree;
    *  - uncapped sources split the leftover evenly with floor division:
    *    quota = (B − E·Σ_capped n) // (m − K). The ≤ m−K−1 remainder
    *    rows are deliberately left unspent (deterministic; documented)
    *    rather than distributed by an arbitrary tie rule.
    *
    * Returns one row per source: (sourceCol, `n`, `quota`) — quota may
    * EXCEED n (up-sampling: repeat the source ⌊quota/n⌋ times plus a
    * deterministic partial epoch; see [[unimaxApply]]).
    *
    * Scale shape: one hash aggregate over the corpus, then windows over
    * the SOURCES-sized table (a handful of rows at any corpus scale).
    */
  def unimaxQuotas(profile: DataFrame, sourceCol: String,
      budgetNum: Long, budgetDen: Long, maxEpochs: Int): DataFrame =
    unimaxQuotasBy(profile, sourceCol, lit(1L), budgetNum, budgetDen, maxEpochs)

  /** [[unimaxQuotas]] under an arbitrary additive size measure — the
    * paper's budget is TOKENS (UniMax §3 defines n_l as language token
    * counts); `n` and `quota` are then token masses and
    * [[unimaxApply]]'s row-level epochs spend the quota in expectation
    * (full epochs repeat every row; the partial epoch is a uniform
    * hash-slice whose expected mass is the residual). `weight(1)`
    * degenerates to the row-count form exactly.
    */
  def unimaxQuotasBy(profile: DataFrame, sourceCol: String, weight: Column,
      budgetNum: Long, budgetDen: Long, maxEpochs: Int): DataFrame = {
    require(budgetNum > 0 && budgetDen > 0,
      s"budget fraction must be positive, got $budgetNum/$budgetDen")
    require(maxEpochs >= 1, s"maxEpochs must be >= 1, got $maxEpochs")
    val counts = profile.groupBy(sourceCol).agg(sum(weight.cast("long")).as("n"))
    val wAsc = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").asc, col(sourceCol).asc)
    val wPrefix = wAsc.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    def intDiv(a: Column, b: Column): Column =
      org.apache.spark.sql.GraftBridge.column(
        org.apache.spark.sql.catalyst.expressions.IntegralDivide(
          org.apache.spark.sql.GraftBridge.expression(a.cast("long")),
          org.apache.spark.sql.GraftBridge.expression(b.cast("long"))))
    // the sources table is tiny — the single-partition windows are the
    // point (quota math must see every source), not a scale hazard
    val ranked = counts
      .withColumn("__j", row_number().over(wAsc).cast("long"))
      .withColumn("__prefix", coalesce(sum(col("n")).over(wPrefix), lit(0L)))
    val tot = ranked.agg(sum(col("n")).as("__total"),
      count(lit(1)).as("__m"))
    val e = lit(maxEpochs.toLong)
    val flagged = ranked.crossJoin(broadcast(tot))
      .withColumn("__b", intDiv(col("__total") * budgetNum, lit(budgetDen)))
      .withColumn("__capped",
        col("n") * e * (col("__m") - col("__j") + 1) + e * col("__prefix") <= col("__b"))
    val cappedTot = flagged.agg(
      coalesce(sum(when(col("__capped"), col("n"))), lit(0L)).as("__pk"),
      coalesce(sum(when(col("__capped"), 1L)), lit(0L)).as("__k"))
    flagged.crossJoin(broadcast(cappedTot))
      .withColumn("quota",
        when(col("__capped"), col("n") * e)
          .otherwise(intDiv(col("__b") - e * col("__pk"), col("__m") - col("__k")))
          .cast("long"))
      .select(col(sourceCol), col("n").cast("long").as("n"), col("quota"))
  }

  /** Materialize a [[unimaxQuotas]] plan: each row of `df` appears once
    * per FULL epoch (⌊quota/n⌋ copies, `epoch` 0-based) plus once more in
    * the final partial epoch iff its LCG hash clears the residual-rate
    * threshold ((quota mod n)/n — the same deterministic thresholding the
    * mixture/sample family uses, so the partial epoch is a uniform
    * hash-slice of the source, not its head). Broadcast quota join +
    * map-side explode; zero shuffles on the corpus.
    *
    * No per-source size bound (round 12): the partial-epoch threshold
    * ⌊(quota mod n)·2^31 / n⌋ is computed on the per-SOURCE quota
    * relation in DECIMAL(38,0) integer division — exact for any long
    * `n`, so TOKEN-mass quotas ([[unimaxQuotasBy]], where a source's
    * mass passes 2^32 long before its row count does) apply without the
    * sharding workaround the old long-product threshold required. The
    * decimal arithmetic touches only the sources-sized relation; the
    * per-row work is the broadcast join + one LCG compare, unchanged.
    */
  def unimaxApply(df: DataFrame, sourceCol: String, idCol: String,
      quotas: DataFrame): DataFrame = {
    def intDiv(a: Column, b: Column): Column =
      org.apache.spark.sql.GraftBridge.column(
        org.apache.spark.sql.catalyst.expressions.IntegralDivide(
          org.apache.spark.sql.GraftBridge.expression(a),
          org.apache.spark.sql.GraftBridge.expression(b)))
    val perSource = quotas
      .withColumn("__full", intDiv(col("quota").cast("long"), col("n").cast("long")))
      .withColumn("__thr", intDiv(
        (col("quota") % col("n")).cast("decimal(38,0)") *
          lit(2147483648L).cast("decimal(19,0)"),
        col("n").cast("decimal(38,0)")).cast("long"))
    val joined = df.join(broadcast(perSource), sourceCol)
      .withColumn("__reps",
        col("__full") + when(lcg31Col(col(idCol)) < col("__thr"), 1L).otherwise(0L))
      .where(col("__reps") > 0)
    joined
      .select(df.columns.map(col) :+
        explode(sequence(lit(0L), col("__reps") - 1)).as("epoch"): _*)
  }
}
