package graft

import org.apache.spark.sql.functions._

/** Dev probe: stage-by-stage cost of the brute-force ANN oracle row
  * (q_ann_cosine) on the inflated corpus — separates the embeddings
  * scan, the broadcast-nested-loop pair stream + native cosine kernel,
  * and the bounded-heap top-k, so the x16 spark/duckdb ratio can be
  * attributed instead of guessed (the ProbeFingerprint discipline; its
  * 32-task-shuffle-constant row is the shared baseline).
  */
object ProbeAnnCosine {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_x16/sf0.1")
    val spark = DevSpark.session()
    import graft.functions.VectorFunctions._
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    def t(label: String)(f: => Long): Unit = {
      f // warm
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e3
      }
      println(f"[annb] $label%-28s ${runs.min / 1000}%8.1f ms")
    }
    println(s"[annb] corpus=${emb.count()} dim=" +
      emb.select(size(col("embedding"))).head().getInt(0))
    t("scan embeddings")(emb.select(col("embedding"))
      .agg(count(col("embedding"))).head().getLong(0))
    t("scan + l2 norm")(emb.select(l2Norm(col("embedding")).as("n"))
      .agg(sum(col("n"))).head().getDouble(0).toLong)
    val q = broadcast(emb.where(col("vec_id") < 50)
      .select(col("vec_id").as("query_id"), col("embedding").as("__qv"),
        l2Norm(col("embedding")).as("__qn")))
    val c = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("__cv"),
      l2Norm(col("embedding")).as("__cn"))
    // the pair stream with the native cosine kernel but NO top-k: counts
    // every scored pair, so e2e minus this is the bounded-heap aggregate
    t("pairs + cosine (no topk)")(c.crossJoin(q)
      .where(col("query_id") =!= col("neighbor_id"))
      .select((dot(col("__qv"), col("__cv")) /
        (col("__qn") * col("__cn"))).as("cos"))
      .agg(count(col("cos"))).head().getLong(0))
    t("bruteForceTopK e2e")(
      graft.operators.Similarity.bruteForceTopK(
        emb.where(col("vec_id") < 50), emb, "vec_id", "embedding", k = 10).count())
    spark.stop()
  }
}
