package graft

import org.apache.spark.sql.functions._

/** Dev probe: PQ recall/cost dial on the real embeddings table — recall@10
  * against the EXACT L2 brute force (ADC estimates squared L2; comparing
  * against cosine would conflate metric mismatch with quantization error)
  * across (m, ksub) settings. Results recorded in SCALE.md.
  */
object ProbePq {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = DevSpark.session()
    val emb = spark.read.parquet(sfDir + "/embeddings.parquet").localCheckpoint(true)
    val queries = emb.where(col("vec_id") < 50)

    // exact L2 top-10 (driver-side over collected vectors; bounded corpus)
    val all = emb.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def l2(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => (x - y).toDouble * (x - y) }.sum
    val truth = all.filter(_._1 < 50).map { case (qid, qv) =>
      qid -> all.filter(_._1 != qid)
        .map { case (nid, nv) => (l2(qv, nv), nid) }
        .sortBy(identity).take(10).map(_._2).toSet
    }.toMap

    // residual vs plain IVF-PQ at one mid dial (trained coarse quantizer)
    val cells = graft.operators.Similarity.kmeansCells(emb, "vec_id", "embedding",
      nCells = 16, iters = 3)
    for (residual <- Seq(false, true)) {
      val books =
        if (residual) graft.functions.Pq.trainResidual(emb, "vec_id", "embedding",
          cells, m = 8, ksub = 64, sampleSize = 4096)
        else graft.functions.Pq.train(emb, "vec_id", "embedding",
          m = 8, ksub = 64, sampleSize = 4096)
      val got = graft.functions.Pq.ivfTopK(queries, emb, "vec_id", "embedding",
          books, 10, nCells = 16, nProbe = 8, centroids = Some(cells),
          residual = residual)
        .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      val recall = truth.map { case (q, ws) =>
        got.get(q).map(gs => (gs intersect ws).size.toDouble / ws.size).getOrElse(0.0)
      }.sum / truth.size
      println(f"[pq] ivfpq m=8 ksub=64 nProbe=8 residual=$residual%-5s recall@10=$recall%.2f")
    }

    for ((m, ksub) <- Seq((4, 16), (8, 16), (8, 64), (16, 64), (16, 256))) {
      val t0 = System.nanoTime()
      val books = graft.functions.Pq.train(emb, "vec_id", "embedding",
        m = m, ksub = ksub, sampleSize = 4096)
      val tTrain = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val got = graft.functions.Pq.topK(queries, emb, "vec_id", "embedding", books, 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      val tQuery = (System.nanoTime() - t1) / 1e9
      val recall = truth.map { case (q, ws) =>
        got.get(q).map(gs => (gs intersect ws).size.toDouble / ws.size).getOrElse(0.0)
      }.sum / truth.size
      val dim = all(0)._2.length
      val ratio = dim * 4.0 / (m * (if (ksub <= 256) 1 else 4))
      println(f"[pq] m=$m%-3d ksub=$ksub%-4d recall@10=$recall%.2f " +
        f"train=$tTrain%5.2f s query=$tQuery%5.2f s compression=${ratio}%4.0fx")
    }
    spark.stop()
  }
}
