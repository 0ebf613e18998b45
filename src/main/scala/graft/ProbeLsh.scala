package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Dev probe: LSH ANN recall/cost sweep vs exact brute force (sf0.01). */
object ProbeLsh {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = DevSpark.session()
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = emb.where(col("vec_id") < 50)
    val exact = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", k = 10)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (bits <- Seq(6, 8, 10, 12); probe <- Seq(1, 2, 3)) {
      val t0 = System.nanoTime()
      val approx = Similarity.lshTopK(q, emb, "vec_id", "embedding", k = 10,
          bits = bits, probeHamming = probe)
        .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val sec = (System.nanoTime() - t0) / 1e9
      val recall = exact.intersect(approx).size.toDouble / exact.size
      println(f"[lsh] bits=$bits%2d probe=$probe recall=$recall%.3f rows=${approx.size}%4d time=$sec%.2fs")
    }
    spark.stop()
  }
}
