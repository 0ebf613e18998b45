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
    spark.stop()
  }
}
