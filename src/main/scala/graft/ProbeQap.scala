package graft

import org.apache.spark.sql.functions._
import graft.queries.Tables

/** Dev probe (round 11): why a filter on a quantile-bin expression is
  * pathological. A predicate referencing the projected `bin` column gets
  * predicate-pushdown-INLINED through the projection, and FilterExec has
  * no subexpression elimination, so the underlying score kernel
  * (qualityScore here) re-evaluates once per cut per predicate term.
  * Measured on the x16 corpus: counting the binned projection costs
  * 0.25 s; the same count with an element_at(bin) filter cost 4.94 s.
  * Split.curriculumSampleApprox therefore routes the threshold through a
  * 10-row broadcast join (a barrier keeping `bin` materialized) — the
  * filtered count drops back to ~0.4 s.
  */
object ProbeQap {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_x16/sf0.1")
    val spark = DevSpark.session()
    def time[A](l: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[qap] $l%-44s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r }
    val scored = Tables.df(spark, dir, "documents")
      .select(col("doc_id"), graft.functions.TextFunctions.qualityScore(col("text")).as("quality"))
    val rates = (1L to 10L).map(b => (b, 10L))
    time("warm scan")(scored.agg(sum("quality")).head())
    val binned = graft.operators.Split.byQuantileApprox(scored, "quality", 10, 1000000)
    time("binned count (bin pruned away)")(binned.count())
    val thr = rates.map { case (n, d) => n * 2147483648L / d }
    time("filter via element_at(bin) -- INLINED")(
      binned.where(graft.operators.Split.lcg31(col("doc_id")) <
        element_at(typedlit(thr), col("bin") + 1)).count())
    time("filter via broadcast thr join (shipped)")(
      graft.operators.Split.curriculumSampleApprox(
        scored, "quality", "doc_id", rates, 1000000).count())
    spark.stop()
  }
}
