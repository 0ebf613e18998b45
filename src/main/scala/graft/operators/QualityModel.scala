package graft.operators

import graft.functions.TextFunctions.qualityFeatures
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based document quality scoring — the learned companion to the
  * rule blend in [[graft.functions.TextFunctions.qualityScore]]: a
  * logistic model over the same replayable text features, with the
  * fixture-oracle discipline applied to MODEL SCORING (q_quality_model):
  * under literal weights the logit is a fixed left-to-right chain of
  * rational arithmetic (ratios, literal products, adds — no
  * transcendentals), so a DuckDB oracle replays scores bit-exactly. The
  * `keep` decision is `logit > 0`, which makes the sigmoid unnecessary
  * for gating; [[score]] exposes the probability for consumers that want
  * calibration.
  *
  * Scale shape: scoring is ONE map-side expression per document (no
  * shuffle, codegen-composable); training is batch gradient descent where
  * each iteration is ONE narrow aggregation (map-side partial sums of the
  * d+1 gradient components) and the weight vector — d+1 doubles — is the
  * only driver-side state. At 100 TB train on a bounded sample (the
  * Pq.train discipline); the distilled weights then score the full corpus
  * in a single narrow pass.
  */
object QualityModel {

  /** Feature dimension including the leading bias term. */
  val Dim = 6

  /** Fixed-order feature vector (array<double>):
    * [bias=1, alpha_ratio, punct_ratio, mean_word_len/12,
    *  min(distinct_ratio,1), min(n_words/100,1)] — every component a
    * ratio of counts (SQL-replayable; the q_quality oracle already
    * mirrors the underlying features), bounded O(1) so no single feature
    * dwarfs the gradient.
    */
  def featureVector(text: Column): Column =
    featureVectorFrom(qualityFeatures(text))

  /** [[featureVector]] from an ALREADY-BOUND features struct column.
    * Referencing a bound alias instead of re-deriving the struct matters
    * for codegen: inlining `qualityFeatures` into every array slot (and
    * the logit into every consumer) multiplies the expression tree ~70×
    * — big enough that Spark's projection codegen trips a Janino scoping
    * error ("isNull_N is not an rvalue") and silently falls back to the
    * interpreter. Staged aliases keep each projection small AND are safe
    * from CollapseProject re-inlining (a non-cheap alias referenced more
    * than once is never collapsed).
    */
  def featureVectorFrom(f: Column): Column =
    array(
      lit(1.0),
      f("alpha_ratio"),
      f("punct_ratio"),
      f("mean_word_len") / 12.0,
      least(f("distinct_ratio"), lit(1.0)),
      least(f("n_words") / 100.0, lit(1.0)))

  /** `w · x` as an EXPLICIT left-to-right add chain — the association the
    * SQL oracle mirrors term for term, so both engines round identically.
    */
  def logit(features: Column, weights: Seq[Double]): Column = {
    require(weights.length == Dim, s"expected $Dim weights")
    weights.zipWithIndex
      .map { case (w, i) => element_at(features, i + 1) * w }
      .reduce(_ + _)
  }

  /** Calibrated probability (standard sigmoid). Not used by the oracle
    * path — `exp` is transcendental and libm rounding is not guaranteed
    * identical cross-engine; gate on [[logit]] > 0 instead (the same
    * decision boundary).
    */
  def score(features: Column, weights: Seq[Double]): Column =
    lit(1.0) / (lit(1.0) + exp(-logit(features, weights)))

  /** (doc_id…, logit, keep) scoring pass under fixed weights — the shape
    * q_quality_model oracles.
    */
  def scoreDocs(df: DataFrame, idCol: String, textCol: String,
      weights: Seq[Double]): DataFrame =
    df.select(col(idCol), qualityFeatures(col(textCol)).as("__f"))
      .select(col(idCol), featureVectorFrom(col("__f")).as("__x"))
      .select(col(idCol), logit(col("__x"), weights).as("__l"))
      .select(col(idCol), round(col("__l"), 6).as("logit"), (col("__l") > 0).as("keep"))

  /** Batch-gradient logistic regression on the [[featureVector]] features
    * against a 0/1 label column. Each iteration: one aggregation computing
    * all `Dim` gradient components as map-side partial sums; weights
    * update on the driver. Features are materialized once
    * ([[Materialize.once]]) so iterations re-read the narrow (x, y)
    * projection, not the corpus.
    */
  def trainLogistic(df: DataFrame, textCol: String, labelCol: String,
      iters: Int = 30, lr: Double = 2.0): Array[Double] = {
    val feats = Materialize.once(df.select(
      featureVector(col(textCol)).as("__x"),
      col(labelCol).cast("double").as("__y")))
    val n = feats.count().toDouble
    require(n > 0, "cannot train on an empty corpus")
    var w = Array.fill(Dim)(0.0)
    for (_ <- 0 until iters) {
      // gradient as ONE aggregate over (component, x_i·err) pairs: Dim
      // parallel sums sharing the residual subtree made HashAggregate's
      // subexpression-eliminated codegen trip a Janino scoping bug
      // ("hashAgg_isNull_N is not an rvalue") and silently fall back to
      // the interpreter; exploding the bounded-length feature vector
      // keeps every stage small, codegen'd, and Dim-scalable. Still one
      // shuffle of Dim partial sums per iteration.
      val g = feats
        .withColumn("__err", score(col("__x"), w.toIndexedSeq) - col("__y"))
        .select(col("__err"), posexplode(col("__x")))
        .groupBy(col("pos"))
        .agg(sum(col("col") * col("__err")).as("__g"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      w = Array.tabulate(Dim)(i => w(i) - lr * g(i) / n)
    }
    w
  }
}
