package graft

import org.apache.spark.sql.functions._
import graft.queries.Tables

/** Dev probe: exact ngram-jaccard pair-counting formulations at x16 —
  * the round-11 evidence that the self-join shape is optimal and that a
  * df-QUANTILE cap cannot be a semantic default on this corpus (see the
  * ngramJaccardPairs scaladoc for the full story, and SCALE.md round-11
  * for the numbers). Round 14 made the default safe WITHOUT a quantile
  * cap: [[graft.operators.PairBudget.Auto]] budgets candidate ROWS and
  * stays exact whenever the corpus fits the budget.
  *
  * Measured (x16, local[32]): index = 4.1 M (doc, shingle-hash) rows;
  * A self-join + 2-col count agg = 31-36 s producing 164,747,984 distinct
  * candidate pairs from a 1.17 G-row join stream (one broadcast-hash-join
  * stage, map-side partial agg); C grouped-array pair generator
  * (collect_list + per-element slice explode) = 150 s — slice() copies
  * the tail array per element, 4× worse than A despite generating half
  * the rows. A packed single-long agg key overflows: x16 doc_ids reach
  * 1.5e10, and id·2^32 exceeds Long range under ANSI mode.
  */
object ProbeJac2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_x16/sf0.1")
    val spark = DevSpark.session()
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[jac2] $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s  $r"); r
    }
    val docs = Tables.df(spark, dir, "documents")
    val shAll = graft.operators.Materialize.once(docs.select(col("doc_id").as("__id"),
      explode(graft.functions.HashExpressions.ngramHashes(
        graft.functions.TextFunctions.tokens(col("text")), 2)).as("__sh")))
    time("index rows")(shAll.count())
    time("A self-join 2col agg")(
      shAll.as("a").join(shAll.as("b"), col("a.__sh") === col("b.__sh"))
        .where(col("a.__id") < col("b.__id"))
        .groupBy(col("a.__id"), col("b.__id")).agg(count(lit(1))).count())
    val grouped = shAll.groupBy(col("__sh"))
      .agg(sort_array(collect_list(col("__id"))).as("__docs"))
    time("C array gen 2col agg")(
      grouped.select(col("__docs"), posexplode(col("__docs")))
        .select(col("col").as("a"),
          explode(slice(col("__docs"), col("pos") + 2,
            greatest(size(col("__docs")) - col("pos") - 1, lit(0)))).as("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1))).count())
    spark.stop()
  }
}
