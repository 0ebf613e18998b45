package graft

import org.apache.spark.sql.functions._

/** Dev probe (r16, VERDICT r15 item 7): a PLANTED-DUP DIAL for the
  * minhash pipeline — the x256 superlinearity was ATTRIBUTED to the
  * bench recipe's dup mass (every doc carries a planted twin) rather
  * than a plan defect; this converts the attribution into a measured
  * curve. Corpus: `base` rotated copies of the sf documents (dissimilar
  * across copies — the InflatedCorpus recipe), plus one planted exact
  * twin for every doc with id % k == 0, k dialing the dup fraction
  * f = 1/k. Measured per f: total docs, near-dup PAIR COUNT (the pair
  * mass the verify joins carry), and the full-pipeline noop wall time
  * with the verify-side bloom prune OFF and ON (guide §3.2 — the prune
  * pays off exactly when f is small, because only candidate docs' 64-long
  * signatures survive into the verify joins).
  *
  * Results recorded in SCALE.md §r16.
  */
object ProbeDupDensity {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val baseCopies = sys.env.getOrElse("SPARK_GRAFT_DUP_BASE", "8").toInt
    val spark = DevSpark.session()
    val alpha = InflatedCorpus.Alpha
    def rot(i: Int) = { val k = i % alpha.length; alpha.drop(k) + alpha.take(k) }
    val docs = spark.read.parquet(sfDir + "/documents.parquet")
    val base = (0 until baseCopies).map(i =>
        docs.withColumn("doc_id", col("doc_id") + lit(i * 1000000L))
          .withColumn("text", translate(col("text"), alpha, rot(i))))
      .reduce(_ unionByName _).localCheckpoint(true)
    val nBase = base.count()

    for (k <- Seq(1L, 4L, 16L, 64L)) {
      val planted = base.where(col("doc_id") % k === 0)
        .withColumn("doc_id", col("doc_id") + 100000000L)
      val corpus = base.unionByName(planted).localCheckpoint(true)
      val nDocs = corpus.count()
      def run(bloom: Boolean): (Double, Long) = {
        def pipeline() = {
          val sigs = graft.operators.Materialize.once(corpus.select(
            col("doc_id").as("__id"),
            graft.operators.Dedup.minhashSignature(col("text"), 3, 64).as("__sig")))
          graft.operators.Dedup.minhashPairsFromSigs(sigs, 16, 0.7,
            graft.functions.HashExpressions.bandHashes(_, 16), verifyBloom = bloom)
        }
        pipeline().write.format("noop").mode("overwrite").save() // warm
        val ts = Seq.fill(3) {
          val t0 = System.nanoTime()
          pipeline().write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        (ts.min, pipeline().count())
      }
      val (tOff, pairs) = run(bloom = false)
      val (tOn, pairsOn) = run(bloom = true)
      require(pairs == pairsOn, s"bloom changed the pair count: $pairs vs $pairsOn")
      println(f"[dupdial] f=1/$k%-3d docs=$nDocs%8d (base $nBase) pairs=$pairs%8d " +
        f"t_off=$tOff%6.2f s t_on=$tOn%6.2f s")
    }
    spark.stop()
  }
}
