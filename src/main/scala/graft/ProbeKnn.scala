package graft
import org.apache.spark.sql.functions._

/** Dev probe: knnJoin cell-count scaling on the x16 corpus — the oracle
  * query pins nCells=16 for determinism, which at 16× the corpus makes
  * each cell 16× fatter (per-cell work is quadratic); the operator's
  * scale dial is nCells ∝ corpus (the IVF discipline: cell count grows,
  * per-cell cost stays flat). This measures both configs, plus the
  * STAGE LADDER of the pinned-16 configuration (the ProbeAnnCosine
  * isolation discipline): scan → assignment → pair enumeration → pair
  * kernel → top-k heap, so the sweep's slowest oracle rows carry a
  * stage-attributed floor instead of a bare total.
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

    // ---- stage ladder at the oracle-pinned nCells=16, nProbe=2, k=5 ----
    // replicates knnJoin's internal stages verbatim so each timing is a
    // prefix of the real plan; min-of-2 per stage, warm (the loop above
    // already primed scan + codegen)
    import graft.operators.{Materialize, Similarity => S}
    val c = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("__cv"),
      graft.functions.VectorFunctions.l2Norm(col("embedding")).as("__cn"))
    def timed(tag: String)(job: => Long): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); val n = job; ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[pknn] stage ${tag}%-18s ${ts.map(_._1).min}%7.2f s  ${ts.head._2}%12d rows")
    }
    timed("scan")(emb.count())
    val centroidRow = broadcast(S.defaultCells(c, 16))
    def freshBase() = Materialize.once(c.join(centroidRow)
      .withColumn("__pc", S.nearestCells(col("__cv"), col("__cells"), 2))
      .select(col("neighbor_id"), col("__cv"), col("__cn"), col("__pc")))
    timed("assign+mat")(freshBase().count())
    val base = freshBase()
    val member = base.select(col("neighbor_id"), col("__cv"), col("__cn"),
      element_at(col("__pc"), 1)("cell").as("__cell"))
    val probe = base.select(col("neighbor_id").as("query_id"),
        col("__cv").as("__qv"), col("__cn").as("__qn"),
        explode(col("__pc")).as("__probe"))
      .select(col("query_id"), col("__qv"), col("__qn"),
        col("__probe")("cell").as("__cell"))
    val paired = member.join(probe, Seq("__cell"))
      .where(col("query_id") =!= col("neighbor_id"))
    timed("pairs(no kernel)")(paired.count())
    val scored = paired.withColumn("cosine", S.pairCosine)
    // sum(cosine) forces the kernel per pair (count() would prune it)
    timed("pairs+kernel")(
      scored.agg(sum(col("cosine"))).head().getDouble(0).toLong)
    timed("full topK")(S.topKByCosine(scored, 5).count())
    spark.stop()
  }
}
