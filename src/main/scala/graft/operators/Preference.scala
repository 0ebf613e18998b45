package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Preference/contrastive training-data prep — the post-scoring stage of
  * an RLHF/DPO or embedding-training pipeline: turn per-prompt scored
  * candidates into (chosen, rejected) pairs, and per-positive item sets
  * into deterministic negative samples. Everything is integer/LCG
  * arithmetic so the emitted datasets hash-oracle (the house sampling
  * discipline: a pure function of ids, replayable in any engine).
  */
object Preference {

  /** Per-prompt (chosen, rejected) preference pairs: chosen = the
    * highest-`scoreCol` candidate, rejected = the lowest (ties broken by
    * `tieCol` ascending on both ends), emitted only when the score gap
    * is at least `minMargin` — the standard DPO-pair construction from
    * a scored candidate pool (one pair per prompt, the max-margin pair).
    *
    * Scale shape: two rank windows partitioned by the PROMPT key (run
    * length = candidates per prompt, never corpus-length) folded into
    * one pass — rank ascending and descending computed over the same
    * partition — then a filter; no self-join.
    */
  def preferencePairs(df: DataFrame, promptCol: String, candCol: String,
      scoreCol: String, tieCol: String, minMargin: Long): DataFrame = {
    require(minMargin >= 0, s"minMargin must be >= 0, got $minMargin")
    val wTop = Window.partitionBy(col(promptCol))
      .orderBy(col(scoreCol).desc, col(tieCol).asc)
    val wBot = Window.partitionBy(col(promptCol))
      .orderBy(col(scoreCol).asc, col(tieCol).asc)
    val ranked = df.select(col(promptCol), col(candCol), col(scoreCol), col(tieCol))
      .withColumn("__rt", row_number().over(wTop))
      .withColumn("__rb", row_number().over(wBot))
    val top = ranked.where(col("__rt") === 1)
      .select(col(promptCol), col(candCol).as("chosen"),
        col(scoreCol).cast("long").as("score_chosen"))
    val bot = ranked.where(col("__rb") === 1)
      .select(col(promptCol), col(candCol).as("rejected"),
        col(scoreCol).cast("long").as("score_rejected"))
    top.join(bot, Seq(promptCol))
      .where(col("chosen") =!= col("rejected") &&
        col("score_chosen") - col("score_rejected") >= minMargin)
      .withColumn("margin", col("score_chosen") - col("score_rejected"))
  }

  /** Deterministic negative sampling for contrastive pairs: for every
    * (query, positive) row, `k` pseudo-random items drawn from `pool` by
    * the replayable LCG hash of (query·2^4 + j) over the pool's dense
    * id-ordered index — uniform-ish, engine-replayable, and stable under
    * pool repartitioning (the index is a rank, not a partition offset).
    * Draws that collide with the row's own positive are dropped (so a
    * row yields ≤ k negatives — the standard in-batch convention;
    * collisions with OTHER rows' positives are legitimate negatives).
    *
    * Scale shape: the positives explode ×k map-side; the pool is ranked
    * once (distributed sort) and joined on the sampled index — an
    * equi-join on a dense integer key that AQE broadcasts when the pool
    * is small. Nothing is collected.
    */
  def negativeSample(positives: DataFrame, queryCol: String, posCol: String,
      pool: DataFrame, itemCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 16, s"k must be in [1, 16], got $k")
    val n = lit(16L) // draw-slot stride; k <= 16 keeps (query*16 + j) distinct per draw
    // dense id-ordered pool index via the DISTRIBUTED prefix-scan rank
    // (Flow.rankBy — range-partitioned, no single-task global window);
    // item ids must be long-typed, the corpus-id convention
    val spark = pool.sparkSession
    import spark.implicits._
    val ranked = graft.core.Flow(
        pool.select(col(itemCol).cast("long")).distinct().as[Long])
      .rankBy(identity)
      .toDF.toDF("__idx", "__item")
    val poolSize = ranked.agg(count(lit(1)).as("__n"))
    val drawn = positives
      .select(col(queryCol), col(posCol),
        explode(sequence(lit(0), lit(k - 1))).as("j"))
      .crossJoin(broadcast(poolSize))
      .withColumn("__idx",
        Mixture.lcg31Col(col(queryCol).cast("long") * n + col("j")) % col("__n"))
    drawn.join(ranked, Seq("__idx"))
      .where(col("__item") =!= col(posCol))
      .select(col(queryCol), col(posCol), col("j").cast("long").as("j"),
        col("__item").as("negative"))
  }
}
