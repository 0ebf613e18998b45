package graft

import org.apache.spark.sql.functions._
import graft.queries.Tables

/** Dev probe: attributes q_curriculum_fused's x16 cost after the round-11
  * bounded-heap rewrite. Findings (x16, local[32]): the executed plan has
  * ONE exchange total — scan → ObjectHashAggregate(bottomK×2) partials →
  * Exchange(source) → merge, and the RRF aggregate + rank window reuse the
  * same hash(source) partitioning (WindowGroupLimit pushes the top-k into
  * the sort). Steady-state end-to-end ~0.7 s; a cold first run pays
  * ~1.5-2.5 s of page-cache + Janino/JIT warmup of the quality kernel,
  * which is per-process overhead, not plan work.
  */
object ProbeCurr {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_x16/sf0.1")
    val spark = DevSpark.session()
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[currprobe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    def u() = {
      val docs = Tables.df(spark, dir, "documents")
        .withColumn("quality", graft.functions.TextFunctions.qualityScore(col("text")))
        .withColumn("dist", abs(col("n_chars") - 300))
      val heaps = docs.groupBy(col("source")).agg(
        graft.functions.AggExpressions.bottomK(struct((-col("quality")).as("nq"), col("doc_id")), 10).as("__hq"),
        graft.functions.AggExpressions.bottomK(struct(col("dist").as("dd"), col("doc_id")), 10).as("__hd"))
      def ranksOf(h: String) = transform(col(h), (x, i) =>
        struct((i + 1).cast("int").as("rk"), x.getField("doc_id").as("doc_id")))
      heaps.select(col("source"), explode(concat(ranksOf("__hq"), ranksOf("__hd"))).as("e"))
        .select(col("source"), col("e.doc_id").as("doc_id"), col("e.rk").as("rk"))
    }
    def rrf() = graft.operators.Retrieval.reciprocalRankFusion(
      u(), "source", "doc_id", "rk", topK = 5, k = 60L)
    time("warmup (row counts only)")(spark.read.parquet(s"$dir/documents.parquet").count())
    time("full chain, cold")(rrf().count())
    time("full chain, steady")(rrf().count())
    rrf().explain("formatted")
    spark.stop()
  }
}
