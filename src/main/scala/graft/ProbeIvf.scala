package graft

import org.apache.spark.sql.functions._

/** Dev probe: recall@k of IVF against brute-force ground truth on the
  * real embeddings table, untrained (lowest-id centroids) vs trained
  * (kmeansCells), across probe counts. Quantifies what the trained
  * coarse quantizer buys. Results recorded in SCALE.md.
  */
object ProbeIvf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = DevSpark.session()
    val emb = spark.read.parquet(sfDir + "/embeddings.parquet").localCheckpoint(true)
    // queries DISJOINT from the untrained seed ids (the 16 lowest), or
    // the untrained variant gets a free self-cell for every low-id query
    val queries = emb.where(col("vec_id") >= 1000 && col("vec_id") < 1050)
    val k = 10

    val truth = graft.operators.Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", k)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("query_id", "neighbor_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      val per = truth.map { case (q, t) =>
        got.get(q).map(g => (g intersect t).size.toDouble / t.size).getOrElse(0.0) }
      per.sum / truth.size
    }

    val trained = graft.operators.Similarity.kmeansCells(emb, "vec_id", "embedding",
      nCells = 16, iters = 3)
    // recall is only meaningful at equal COST: report the average fraction
    // of the corpus scanned per query alongside it (unbalanced cells buy
    // recall by scanning more)
    val n = emb.count().toDouble
    def scannedFrac(centroids: Option[org.apache.spark.sql.DataFrame], nProbe: Int): Double = {
      import graft.operators.Similarity
      val r = Similarity.ivfTopK(queries, emb, "vec_id", "embedding", k,
        nCells = 16, nProbe = nProbe, centroids = centroids)
      // reconstruct candidate volume: probed-cell sizes per query
      // (recompute assignment cheaply at probe scale)
      val _ = r // plan side only; volume measured below
      // untrained baseline = ivfTopK's own internal centroids (16 lowest ids)
      val cellsDf = centroids.getOrElse(
        broadcast(emb.orderBy("vec_id").limit(16)
          .agg(collect_list(struct(col("vec_id").as("cell"),
            expr("cast(embedding as array<double>)").as("centroid"))).as("__cells"))))
      val assigned = emb.crossJoin(cellsDf)
        .selectExpr("vec_id",
          "element_at(slice(array_sort(transform(__cells, c -> struct(" +
            "aggregate(zip_with(cast(embedding as array<double>), c.centroid, (x, y) -> (x - y) * (x - y)), cast(0.0 as double), (a, x) -> a + x) as d, c.cell as cell))), 1, 1), 1).cell as cell")
      val sizes = assigned.groupBy("cell").count().collect()
        .map(r2 => (r2.getLong(0), r2.getLong(1))).toMap
      val qCells = queries.crossJoin(cellsDf)
        .selectExpr("vec_id",
          "transform(slice(array_sort(transform(__cells, c -> struct(" +
            s"aggregate(zip_with(cast(embedding as array<double>), c.centroid, (x, y) -> (x - y) * (x - y)), cast(0.0 as double), (a, x) -> a + x) as d, c.cell as cell))), 1, $nProbe), p -> p.cell) as cells")
        .collect().map(r2 => r2.getSeq[Long](1))
      qCells.map(_.map(c => sizes.getOrElse(c, 0L)).sum.toDouble / n).sum / qCells.length
    }
    for (nProbe <- Seq(1, 2, 4, 8)) {
      val rU = recall(graft.operators.Similarity.ivfTopK(queries, emb, "vec_id", "embedding",
        k, nCells = 16, nProbe = nProbe))
      val rT = recall(graft.operators.Similarity.ivfTopK(queries, emb, "vec_id", "embedding",
        k, nCells = 16, nProbe = nProbe, centroids = Some(trained)))
      val fU = scannedFrac(None, nProbe)
      val fT = scannedFrac(Some(trained), nProbe)
      println(f"[ivf] nProbe=$nProbe%-2d recall@$k untrained=$rU%.3f (scans ${fU * 100}%.1f%%)" +
        f" trained=$rT%.3f (scans ${fT * 100}%.1f%%)")
    }
    spark.stop()
  }
}
