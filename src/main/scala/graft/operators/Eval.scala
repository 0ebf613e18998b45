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
