package graft
import org.apache.spark.sql.functions._
object ProbeFuzzy2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_x16/sf0.1")
    val spark = DevSpark.session()
    val base0 = graft.queries.Tables.df(spark, dir, "documents").select("doc_id", "text")
    val corpus = base0.unionByName(
      base0.select((col("doc_id") + 10000).as("doc_id"),
        concat(expr("repeat('x', CAST(doc_id % 4 AS INT))"), col("text")).as("text")))
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pf2] $tag%-30s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    println("[pf2] avg len = " + corpus.agg(avg(length(col("text")))).head().getDouble(0))
    // materialize candidate pairs WITH texts to parquet, then time verify alone
    val pairs = graft.operators.Dedup.fuzzyEditDistancePairs(corpus, "doc_id", "text", 2)
    // hack: rebuild cands-with-texts directly
    val withTexts = corpus.select(col("doc_id").as("idA"), col("text").as("__ta"))
      .join(pairs.select("idA", "idB"), "idA")
      .join(corpus.select(col("doc_id").as("idB"), col("text").as("__tb")), "idB")
    withTexts.write.mode("overwrite").parquet("/tmp/pf2_pairs")
    val cached = spark.read.parquet("/tmp/pf2_pairs")
    println("[pf2] pairs cached = " + cached.count())
    time("lev(3-arg) only")(
      println("[pf2] n=" + cached.where(levenshtein(col("__ta"), col("__tb"), 2) <= 2).count()))
    time("lev(2-arg) only")(
      println("[pf2] n=" + cached.where(levenshtein(col("__ta"), col("__tb")) <= 2).count()))
    spark.stop()
  }
}
