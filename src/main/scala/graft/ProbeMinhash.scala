package graft

import org.apache.spark.sql.functions._

/** Dev probe: run-to-run variance of the q_dedup_minhash bench query —
  * N timed passes of the identical plan on identical data, one session.
  * Pins whether a bench-to-bench delta (e.g. the r3→r4 +52% on
  * byte-identical code) is signal or the documented shuffle-bound noise.
  * Results recorded in SCALE.md.
  */
object ProbeMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val n = sys.env.getOrElse("SPARK_GRAFT_PROBE_N", "10").toInt
    val spark = DevSpark.session()
    def run(): Long = {
      val docs = spark.read.parquet(sfDir + "/documents.parquet")
      val dups = docs.unionByName(docs.withColumn("doc_id", col("doc_id") + 10000))
      graft.operators.Dedup.minhashNearDuplicates(dups, "doc_id", "text",
        shingle = 3, numHashes = 64, bands = 16, threshold = 0.7).count()
    }
    run() // warm-up
    val times = (1 to n).map { i =>
      val t0 = System.nanoTime()
      val rows = run()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[minhash] pass $i%2d: $t%6.3f s ($rows rows)")
      t
    }
    println(f"[minhash] n=$n min=${times.min}%6.3f median=${times.sorted.apply(n / 2)}%6.3f " +
      f"max=${times.max}%6.3f mean=${times.sum / n}%6.3f s")

    // Optional stage breakdown at a SCALED corpus (ProbeScale's rotation
    // recipe): where does minhash time go when the input grows — the
    // map-side signature kernel, the banding explode, the bucket join, or
    // the verify joins? SPARK_GRAFT_PROBE_SCALE=16 to enable.
    val factor = sys.env.getOrElse("SPARK_GRAFT_PROBE_SCALE", "0").toInt
    if (factor > 0) {
      val alpha = "etaoinshrdlcumwf"
      def rot(i: Int) = { val k = i % alpha.length; alpha.drop(k) + alpha.take(k) }
      val docs = spark.read.parquet(sfDir + "/documents.parquet")
      val scaled = (0 until factor).map(i =>
          docs.withColumn("doc_id", col("doc_id") + lit(i * 1000000L))
            .withColumn("text", translate(col("text"), alpha, rot(i))))
        .reduce(_ unionByName _).localCheckpoint(true)
      def t(label: String)(f: => Any): Unit = {
        f // warm
        val runs = (1 to 2).map { _ =>
          val t0 = System.nanoTime(); val r = f; ((System.nanoTime() - t0) / 1e6, r)
        }
        println(f"[minhash-stage] x$factor $label%-14s ${runs.map(_._1).min}%7.0f ms (${runs.head._2})")
      }
      import graft.functions.HashExpressions
      val sig = graft.operators.Dedup.minhashSignature(col("text"), 3, 64)
      // max over element_at forces the full kernel per row (custom
      // expression: no partial pruning) while aggregating to one tiny
      // row; NOT sum — signature values span the full long range and an
      // 80k-row ANSI sum overflows
      t("signatures") {
        scaled.select(element_at(sig, 1).as("s1"))
          .agg(max(col("s1"))).head.getLong(0)
      }
      val sigs = scaled.select(col("doc_id").as("__id"), sig.as("__sig"))
      t("sig+banding") {
        sigs.select(col("__id"), posexplode(HashExpressions.bandHashes(col("__sig"), 16)))
          .agg(max(col("col"))).head.getLong(0)
      }
      // candidate join + first-agree, NO signature-verify joins, over a
      // checkpointed sig table (isolates the bucket join itself)
      t("candidates") {
        val s = sigs.localCheckpoint(true)
        val withBh = s.select(col("__id"), HashExpressions.bandHashes(col("__sig"), 16).as("__bh"))
        val banded = withBh.select(col("__id"), col("__bh"), posexplode(col("__bh")))
          .withColumnsRenamed(Map("pos" -> "__band", "col" -> "__bucket"))
        val l = banded.select(col("__band"), col("__bucket"), col("__id").as("idA"), col("__bh").as("__bhA"))
        val rg = banded.select(col("__band"), col("__bucket"), col("__id").as("idB"), col("__bh").as("__bhB"))
        val firstAgree = array_position(
          zip_with(col("__bhA"), col("__bhB"), (a, b) => a === b), true)
        val n = l.join(rg, Seq("__band", "__bucket"))
          .where(col("idA") < col("idB"))
          .where(col("__band") === firstAgree - 1).count()
        s.unpersist(); n
      }
      // the production pipeline but with sigs EAGERLY checkpointed: if
      // this is fast while full-pipeline is slow, the gap is the lazy
      // Materialize.once path, not the joins
      t("pipeline-eager") {
        val s = sigs.localCheckpoint(true)
        val n = graft.operators.Dedup.minhashPairsFromSigs(s, 16, 0.7,
          HashExpressions.bandHashes(_, 16)).count()
        s.unpersist(); n
      }
      t("full-pipeline") {
        graft.operators.Dedup.minhashNearDuplicates(scaled, "doc_id", "text",
          shingle = 3, numHashes = 64, bands = 16, threshold = 0.7).count()
      }
    }
    spark.stop()
  }
}
