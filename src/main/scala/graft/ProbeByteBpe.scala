package graft

/** Dev probe: train byte-level BPE merges on a testdata documents table
  * and print the ordered rule list (hex-byte symbols) — the source of
  * the fixture merge table hardcoded in q_bpe_bytes (trained once on
  * sf0.01; constants thereafter, so the oracle SQL can interpolate the
  * SAME rules as replace() steps over hex()).
  */
object ProbeByteBpe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val n = sys.env.getOrElse("SPARK_GRAFT_BPE_MERGES", "16").toInt
    val spark = DevSpark.session()
    val docs = spark.read.parquet(sfDir + "/documents.parquet")
    val t0 = System.nanoTime()
    val merges = graft.functions.ByteBpe.train(docs, "text", n)
    println(f"[bytebpe] trained ${merges.size} merges in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      println(s"""[bytebpe] $i: ("$a", "$b") -> "$a$b"""")
    }
    spark.stop()
  }
}
