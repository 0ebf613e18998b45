package graft
import org.apache.spark.sql.functions._

/** Dev probe: knnJoin cell-count scaling on the x16 corpus — the oracle
  * query pins nCells=16 for determinism, which at 16× the corpus makes
  * each cell 16× fatter (per-cell work is quadratic); the operator's
  * scale dial is nCells ∝ corpus (the IVF discipline: cell count grows,
  * per-cell cost stays flat). This measures both configs.
  */
object ProbeKnn {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_x16/sf0.1")
    val spark = DevSpark.session()
    val emb = graft.queries.Tables.df(spark, dir, "embeddings")
    println("[pknn] vectors = " + emb.count())
    for (nCells <- Seq(16, 64, 256)) {
      val t0 = System.nanoTime()
      val n = graft.operators.Similarity.knnJoin(emb, "vec_id", "embedding",
        k = 5, nCells = nCells, nProbe = 2).count()
      println(f"[pknn] nCells=$nCells%-4d ${(System.nanoTime() - t0) / 1e9}%7.2f s  $n%9d rows")
    }
    spark.stop()
  }
}
