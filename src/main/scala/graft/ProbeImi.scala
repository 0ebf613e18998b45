package graft

import org.apache.spark.sql.functions._
import graft.queries.Tables

/** Dev probe (round 11): flat-IVF vs IMI coarse assignment at matched
  * effective cell counts — the evidence that two-level assignment is
  * sublinear in c, closing the flat O(n·c) boundary documented since
  * round 10. For each effective cell count c the flat quantizer scores
  * c full-dimension centroids per vector; IMI scores 2·√c half-dimension
  * centroids (4·√c/c of the flat multiply-adds). Recall is measured for
  * both against brute-force ground truth on 50 queries at equal probe
  * fan-out.
  *
  * Compressed-path row (x16, m=8/ksub=16, refine 3, matched dial
  * c=1024): IVF-PQ refined 9.9 s vs IMI-PQ refined 3.4 s — the 3× is
  * the assignment. Recall for BOTH sits low there (0.23 / 0.16)
  * because the synthetic embeddings are RANDOM — PQ's documented worst
  * case (Pq.topK scaladoc: recall@10 0.20-0.71 on random vectors by
  * dial; clustered real corpora sit far higher) — and c=1024 cells
  * over 32k vectors at nProbe=64 reads only ~6% of the corpus. The
  * exact-path rows isolate the quantizer itself from ADC noise.
  */
object ProbeImi {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_x16/sf0.1")
    val spark = DevSpark.session()
    val emb = Tables.df(spark, dir, "embeddings")
    val n = emb.count()
    println(s"[imi] corpus $n vectors")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[imi] $label%-42s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    val queries = emb.where(col("vec_id") < 50)
    val truth = graft.operators.Similarity
      .bruteForceTopK(queries, emb, "vec_id", "embedding", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(rows: Array[org.apache.spark.sql.Row]): Double =
      (rows.map(r => (r.getLong(0), r.getLong(1))).toSet & truth).size.toDouble / truth.size
    // compressed-path comparison at one matched dial: IVF-PQ vs IMI-PQ
    // (both with exact re-rank tails), plus the persistent IMI index probe
    val books = graft.functions.Pq.train(emb, "vec_id", "embedding",
      m = 8, ksub = 16, sampleSize = 2048)
    val ivfpq = time("ivfpq refined c=1024 nProbe=64")(
      graft.functions.Pq.ivfTopKRefined(queries, emb, "vec_id", "embedding",
        books, k = 10, nCells = 1024, nProbe = 64, refine = 3).collect())
    val imipq = time("imipq refined 2x32 nProbe=64")(
      graft.functions.Pq.imiTopKRefined(queries, emb, "vec_id", "embedding",
        books, k = 10, nPerHalf = 32, nProbe = 64, refine = 3).collect())
    println(f"[imi] compressed recall: ivfpq ${recall(ivfpq)}%.3f  imipq ${recall(imipq)}%.3f")
    for (cPerHalf <- Seq(16, 32, 64)) {
      val c = cPerHalf * cPerHalf
      // warm page cache per round so assignment timing is pure compute
      emb.count()
      val flat = time(f"flat  c=$c%5d assignment+topk (nProbe ${c / 16})")(
        graft.operators.Similarity.ivfTopK(queries, emb, "vec_id", "embedding",
          k = 10, nCells = c, nProbe = c / 16).collect())
      val imi = time(f"imi   c=$c%5d (2x$cPerHalf) assignment+topk (nProbe ${c / 16})")(
        graft.operators.Similarity.imiTopK(queries, emb, "vec_id", "embedding",
          k = 10, nPerHalf = cPerHalf, nProbe = c / 16).collect())
      println(f"[imi] c=$c%5d recall: flat ${recall(flat)}%.3f  imi ${recall(imi)}%.3f")
    }
    spark.stop()
  }
}
