package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier-evaluation utilities for the quality-scoring lane — once a
  * pipeline gates on a score ([[QualityModel]], [[LanguageModel]],
  * byte-entropy), the question "does the score actually separate the
  * classes?" is itself a corpus-scale aggregation. Both metrics here are
  * exact integer/rational arithmetic, so the driver's DuckDB oracle
  * hash-gates them (the q_lm_score discipline applied to EVALUATION).
  *
  * AUC is computed as the Mann–Whitney U statistic without ever ranking
  * individual rows: group by DISTINCT SCORE (counts p_s, q_s of
  * positives/negatives at score s), then one ordered pass over the
  * score groups accumulates
  *
  *   2·U = Σ_s p_s · (2·(negatives strictly below s) + q_s)
  *
  * — the q_s term is the tie correction (each tied pair counts ½, kept
  * integer by the doubling). AUC = 2U / (2·n₁·n₀).
  *
  * Scale shape: one hash aggregate over the corpus (map-side combining
  * on the score key), then a cumulative window over the DISTINCT-score
  * table only — bounded by the score's value space (integer-bits scores
  * have hundreds of distinct values at any corpus size), never by corpus
  * rows, so the single ordered task is deliberate and safe. Confusion
  * counts are a single narrow aggregate.
  */
object Eval {

  /** One-row (n_pos, n_neg, auc) — AUC of `scoreCol` (higher = predicted
    * positive) against binary `labelCol` (1 = positive). Rows with null
    * score or label are excluded. Degenerate inputs (one class empty)
    * yield auc = null rather than a fabricated 0.5.
    */
  def auc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val rows = df.select(col(scoreCol).as("__s"), col(labelCol).cast("long").as("__y"))
      .where(col("__s").isNotNull && col("__y").isNotNull)
    val g = rows.groupBy(col("__s"))
      .agg(sum(when(col("__y") === 1, 1L).otherwise(0L)).as("__p"),
        sum(when(col("__y") === 1, 0L).otherwise(1L)).as("__q"))
    // cumulative negatives STRICTLY below this score: ordered window over
    // the distinct-score aggregate (bounded key space — see scaladoc)
    val w = Window.orderBy(col("__s")).rowsBetween(Window.unboundedPreceding, -1)
    g.withColumn("__cumq", coalesce(sum(col("__q")).over(w), lit(0L)))
      .agg(
        sum(col("__p")).cast("long").as("n_pos"),
        sum(col("__q")).cast("long").as("n_neg"),
        sum(col("__p") * (col("__cumq") * 2 + col("__q"))).cast("long").as("__u2"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round(col("__u2").cast("double") /
            (col("n_pos").cast("double") * col("n_neg") * 2.0), 6))
          .otherwise(lit(null)).as("auc"))
  }

  /** [[auc]] disaggregated by a group column — per-slice evaluation (the
    * fairness/regression-hunting discipline: an aggregate AUC can hide a
    * slice where the signal inverts). Identical integer 2U arithmetic;
    * the cumulative window partitions by GROUP, so the ordered pass is
    * per-slice over that slice's distinct scores only.
    */
  def aucBy(df: DataFrame, groupCol: String, scoreCol: String,
      labelCol: String): DataFrame = {
    val rows = df.select(col(groupCol), col(scoreCol).as("__s"),
        col(labelCol).cast("long").as("__y"))
      .where(col("__s").isNotNull && col("__y").isNotNull)
    val g = rows.groupBy(col(groupCol), col("__s"))
      .agg(sum(when(col("__y") === 1, 1L).otherwise(0L)).as("__p"),
        sum(when(col("__y") === 1, 0L).otherwise(1L)).as("__q"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    g.withColumn("__cumq", coalesce(sum(col("__q")).over(w), lit(0L)))
      .groupBy(col(groupCol))
      .agg(
        sum(col("__p")).cast("long").as("n_pos"),
        sum(col("__q")).cast("long").as("n_neg"),
        sum(col("__p") * (col("__cumq") * 2 + col("__q"))).cast("long").as("__u2"))
      .select(col(groupCol), col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round(col("__u2").cast("double") /
            (col("n_pos").cast("double") * col("n_neg") * 2.0), 6))
          .otherwise(lit(null)).as("auc"))
  }

  /** LCM(1..k) — the integer scale that turns reciprocal-rank sums into
    * exact integer arithmetic (1/r · LCM is whole for every r ≤ k). Grows
    * fast: k ≤ 20 keeps per-query numerators ≤ 232,792,560, so corpus
    * sums stay inside a long up to ~4·10^10 queries.
    */
  private[graft] def lcmTo(k: Int): Long = {
    require(k >= 1 && k <= 20, s"k must be in [1, 20], got $k")
    @annotation.tailrec def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    (1 to k).foldLeft(1L)((acc, i) => acc / gcd(acc, i.toLong) * i)
  }

  /** Per-query ranking-quality metrics for top-`k` retrieval — the
    * standard IR evaluation pass (hit/precision/recall inputs, MRR and
    * average precision) over a (query, score, relevance) relation, every
    * metric an INTEGER so the whole table hash-oracles:
    *
    *  - `r_at_k` / `r_total`: relevant items inside the top k / anywhere
    *    (recall@k = r_at_k / r_total, precision@k = r_at_k / k);
    *  - `first_rank`: rank of the first relevant item within the top k
    *    (null when none) — MRR's per-query term, kept exact as
    *    `mrr_num = LCM(1..k) / first_rank` (0 when no hit);
    *  - `ap_num = Σ_{i ≤ k, rel_i} hits(i) · LCM(1..k)/i` — average
    *    precision's numerator at the same scale; AP@k =
    *    ap_num / (LCM · min(r_total, k)).
    *
    * Reciprocal ranks are sums of 1/i terms — float-summing them would
    * make the result depend on aggregation order, so both engines sum
    * LCM-scaled integers instead (the q_lm_score whole-bits discipline
    * applied to ranking metrics).
    *
    * Ranking is `scoreCol` DESC with `tieCol` ASC as the deterministic
    * tie-break. Scale shape: one window partitioned by the QUERY key
    * (run length = candidates per query, never corpus-length), then the
    * cumulative-hits window only over the k retained rows per query.
    */
  def rankingQuality(df: DataFrame, queryCol: String, scoreCol: String,
      tieCol: String, relCol: String, k: Int): DataFrame = {
    val scale = lcmTo(k)
    // IntegralDivide (`div`), not Column./ — the double quotient would be
    // exact here (LCM guarantees divisibility), but the long form mirrors
    // the oracle's `//` literally
    def intDiv(a: Column, b: Column): Column =
      org.apache.spark.sql.GraftBridge.column(
        org.apache.spark.sql.catalyst.expressions.IntegralDivide(
          org.apache.spark.sql.GraftBridge.expression(a.cast("long")),
          org.apache.spark.sql.GraftBridge.expression(b.cast("long"))))
    val wRank = Window.partitionBy(col(queryCol))
      .orderBy(col(scoreCol).desc, col(tieCol).asc)
    val ranked = df
      .select(col(queryCol), col(scoreCol), col(tieCol),
        col(relCol).cast("long").as("__y"))
      .withColumn("__r", row_number().over(wRank))
    val totals = ranked.groupBy(col(queryCol))
      .agg(sum(col("__y")).cast("long").as("r_total"))
    val wCum = Window.partitionBy(col(queryCol)).orderBy(col("__r"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val top = ranked.where(col("__r") <= k)
      .withColumn("__hits", sum(col("__y")).over(wCum))
    val perQuery = top.groupBy(col(queryCol))
      .agg(
        sum(col("__y")).cast("long").as("r_at_k"),
        min(when(col("__y") === 1, col("__r"))).cast("long").as("first_rank"),
        coalesce(intDiv(lit(scale), min(when(col("__y") === 1, col("__r")))), lit(0L))
          .cast("long").as("mrr_num"),
        coalesce(sum(when(col("__y") === 1, col("__hits") * intDiv(lit(scale), col("__r")))),
          lit(0L)).cast("long").as("ap_num"))
    perQuery.join(totals, Seq(queryCol))
      .select(col(queryCol), col("r_at_k"), col("r_total"),
        col("first_rank"), col("mrr_num"), col("ap_num"))
  }

  /** One-row corpus aggregate over [[rankingQuality]]'s per-query table:
    * exact integer sums plus the division-safe rounded metrics (each a
    * SINGLE division of two exact integers, so no float-order hazard):
    * hit_rate@k, macro precision@k (fixed denominator k·n), micro recall
    * (Σ r_at_k / Σ r_total), MRR.
    */
  def rankingSummary(perQuery: DataFrame, k: Int): DataFrame = {
    val scale = lcmTo(k)
    perQuery.agg(
      count(lit(1)).cast("long").as("n_queries"),
      sum(when(col("first_rank").isNotNull, 1L).otherwise(0L)).cast("long").as("n_hit"),
      sum(col("r_at_k")).cast("long").as("sum_r_at_k"),
      sum(col("r_total")).cast("long").as("sum_r_total"),
      sum(col("mrr_num")).cast("long").as("sum_mrr_num"))
      .select(col("n_queries"), col("n_hit"), col("sum_r_at_k"), col("sum_r_total"),
        round(col("n_hit").cast("double") / col("n_queries"), 6).as("hit_rate"),
        round(col("sum_r_at_k").cast("double") / (col("n_queries") * k), 6)
          .as("precision_at_k"),
        when(col("sum_r_total") > 0,
          round(col("sum_r_at_k").cast("double") / col("sum_r_total"), 6))
          .otherwise(lit(null)).as("micro_recall"),
        round(col("sum_mrr_num").cast("double") / (col("n_queries").cast("double") * scale), 6)
          .as("mrr"))
  }

  /** Per-bin calibration table for an integer milli-unit confidence
    * (`confMilliCol` ∈ [0, 1000)) against a binary label — the expected-
    * calibration-error decomposition (Naeini et al. 2015; Guo et al.
    * 2017), kept integer: bin b's ECE contribution is
    * (n_b/N)·|acc_b − conf̄_b| = |1000·n_pos_b − conf_sum_b| / (1000·N),
    * so `ece_num` sums to the exact global numerator and
    * ECE = Σ ece_num / (1000·N). One hash aggregate on the bin key.
    */
  def calibrationBins(df: DataFrame, confMilliCol: String, labelCol: String,
      nBins: Int): DataFrame = {
    require(nBins > 0 && 1000 % nBins == 0,
      s"nBins must divide 1000, got $nBins")
    val width = 1000L / nBins
    val conf = col(confMilliCol).cast("long")
    val y = col(labelCol).cast("long")
    // conf == 1000 is probability 1.0 — a legitimate maximally-confident
    // row; clamp it into the top bin for binning while summing its true
    // value, so ECE still uses conf̄_b = 1.0 exactly
    val bin = org.apache.spark.sql.GraftBridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.GraftBridge.expression(least(conf, lit(999L))),
        org.apache.spark.sql.catalyst.expressions.Literal(width)))
    // contract: conf must already be in milli-units — out-of-range rows
    // (negative, or > 1000) are excluded like nulls rather than silently
    // landing in a phantom bin that corrupts the ECE sum
    df.where(conf.isNotNull && y.isNotNull && conf >= 0 && conf <= 1000)
      .groupBy(bin.cast("long").as("bin"))
      .agg(
        count(lit(1)).cast("long").as("n"),
        sum(conf).cast("long").as("conf_sum"),
        sum(y).cast("long").as("n_pos"))
      .withColumn("ece_num", abs(col("n_pos") * 1000L - col("conf_sum")))
  }

  /** One-row Cohen's kappa of a binary prediction against a binary label
    * (inter-rater agreement corrected for chance). With confusion counts
    * a=tp, b=fp, c=fn, d=tn the classic form
    * κ = (p_o − p_e)/(1 − p_e) reduces to the exact integer ratio
    *
    *   κ = 2·(a·d − b·c) / ((a+b)(b+d) + (a+c)(c+d))
    *
    * — both emitted as `kappa_num`/`kappa_den` BIGINTs alongside the
    * rounded quotient (one division of two exact integers). Counts must
    * stay under ~3·10^9 rows for the products to fit a long; corpus-scale
    * eval sets are orders of magnitude below that.
    */
  def kappa(df: DataFrame, predCol: String, labelCol: String): DataFrame = {
    val p = col(predCol).cast("long")
    val y = col(labelCol).cast("long")
    def cnt(c: Column) = sum(when(c, 1L).otherwise(0L)).cast("long")
    df.where(p.isNotNull && y.isNotNull)
      .agg(
        cnt(p === 1 && y === 1).as("tp"),
        cnt(p === 1 && y === 0).as("fp"),
        cnt(p === 0 && y === 1).as("fn"),
        cnt(p === 0 && y === 0).as("tn"))
      .withColumn("kappa_num",
        (col("tp") * col("tn") - col("fp") * col("fn")) * 2L)
      .withColumn("kappa_den",
        (col("tp") + col("fp")) * (col("fp") + col("tn")) +
          (col("tp") + col("fn")) * (col("fn") + col("tn")))
      .withColumn("kappa",
        when(col("kappa_den") > 0,
          round(col("kappa_num").cast("double") / col("kappa_den"), 6))
          .otherwise(lit(null)))
  }

  /** One-row confusion counts + rational metrics for the gate
    * `scoreCol >= threshold ⇒ predicted positive`: (tp, fp, fn, tn,
    * precision, recall, f1). Ratios are exact integer divisions rounded
    * to 6 dp; empty denominators yield null.
    */
  def confusionAt(df: DataFrame, scoreCol: String, labelCol: String,
      threshold: Column): DataFrame = {
    val pred = (col(scoreCol) >= threshold).cast("long")
    val y = col(labelCol).cast("long")
    def cnt(c: Column) = sum(when(c, 1L).otherwise(0L)).cast("long")
    df.where(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .agg(
        cnt(pred === 1 && y === 1).as("tp"),
        cnt(pred === 1 && y === 0).as("fp"),
        cnt(pred === 0 && y === 1).as("fn"),
        cnt(pred === 0 && y === 0).as("tn"))
      .select(col("tp"), col("fp"), col("fn"), col("tn"),
        when(col("tp") + col("fp") > 0,
          round(col("tp").cast("double") / (col("tp") + col("fp")), 6))
          .otherwise(lit(null)).as("precision"),
        when(col("tp") + col("fn") > 0,
          round(col("tp").cast("double") / (col("tp") + col("fn")), 6))
          .otherwise(lit(null)).as("recall"),
        when(col("tp") * 2 + col("fp") + col("fn") > 0,
          round(col("tp").cast("double") * 2 /
            (col("tp") * 2 + col("fp") + col("fn")), 6))
          .otherwise(lit(null)).as("f1"))
  }
}
