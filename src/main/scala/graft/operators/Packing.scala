package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the standard pretraining batch prep: documents are
  * concatenated in a deterministic order and split into fixed
  * token-budget examples, so no example pads and a document may straddle
  * a boundary. Each doc gets the example containing its first token plus
  * its offset there; integer arithmetic end to end, so the layout is
  * reproducible and oracle-replayable.
  *
  * Scale shape: one window (cumulative sum) partitioned by `streamCol` —
  * the stream key (source, shard, …) bounds each window's run length, so
  * packing parallelizes across streams and never needs a global sort.
  */
object Packing {

  /** @param budget tokens per packed example (> 0)
    * @return input plus `example_id` (per-stream, 0-based) and `offset`
    *         (token position of the doc inside its example)
    */
  def packByBudget(df: DataFrame, streamCol: String, orderCol: String,
      tokensCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = Window.partitionBy(col(streamCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val before = coalesce(sum(col(tokensCol)).over(w), lit(0L))
    // IntegralDivide, not `/`: Column./ is double division, which rounds
    // for cumulative sums past 2^53 and could disagree with the exact
    // integer remainder below (and with the oracle's `//`)
    def intDiv(a: Column, b: Long): Column =
      org.apache.spark.sql.GraftBridge.column(
        org.apache.spark.sql.catalyst.expressions.IntegralDivide(
          org.apache.spark.sql.GraftBridge.expression(a),
          org.apache.spark.sql.catalyst.expressions.Literal(b)))
    df.withColumn("example_id", intDiv(before, budget))
      .withColumn("offset", (before % budget).cast("long"))
  }

  /** SFT packing with loss-mask boundaries: rows are (prompt, response)
    * token pairs packed at `budget` like [[packByBudget]] (tokens =
    * prompt + response), and each doc additionally reports WHERE its
    * loss-masked span (the response) starts in the packed layout —
    * `mask_example_id`/`mask_offset` locate the first response token,
    * `mask_len` its length. A response may straddle example boundaries
    * (concatenate-then-split semantics, same as the doc itself); the
    * trainer clips spans per example. All layout arithmetic is integer.
    */
  def packWithLossMask(df: DataFrame, streamCol: String, orderCol: String,
      promptCol: String, responseCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    def intDiv(a: Column, b: Long): Column =
      org.apache.spark.sql.GraftBridge.column(
        org.apache.spark.sql.catalyst.expressions.IntegralDivide(
          org.apache.spark.sql.GraftBridge.expression(a),
          org.apache.spark.sql.catalyst.expressions.Literal(b)))
    val w = Window.partitionBy(col(streamCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val tokens = col(promptCol).cast("long") + col(responseCol).cast("long")
    val before = coalesce(sum(tokens).over(w), lit(0L))
    val maskPos = before + col(promptCol).cast("long")
    df.withColumn("example_id", intDiv(before, budget))
      .withColumn("offset", (before % budget).cast("long"))
      .withColumn("mask_example_id", intDiv(maskPos, budget))
      .withColumn("mask_offset", (maskPos % budget).cast("long"))
      .withColumn("mask_len", col(responseCol).cast("long"))
  }
}
