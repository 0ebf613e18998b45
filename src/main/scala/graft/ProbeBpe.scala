package graft

/** Dev probe: train BPE merges on a testdata documents table and print the
  * ordered rule list — the source of the fixture merge table hardcoded in
  * q_bpe_apply (trained once on sf0.01; constants thereafter, so the
  * oracle SQL can interpolate the SAME rules).
  */
object ProbeBpe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val n = sys.env.getOrElse("SPARK_GRAFT_BPE_MERGES", "16").toInt
    val spark = DevSpark.session()
    val docs = spark.read.parquet(sfDir + "/documents.parquet")
    val t0 = System.nanoTime()
    val merges = graft.functions.Bpe.train(docs, "text", n)
    println(f"[bpe] trained ${merges.size} merges in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      println(s"""[bpe] $i: ("$a", "$b") -> "$a$b"""")
    }
    // apply-path A/B: codegen'd whole-text expression vs the transform-HOF
    // formulation (interpreted lambda per word)
    import org.apache.spark.sql.functions._
    val d = docs.localCheckpoint(true)
    def time(c: org.apache.spark.sql.Column): Double = {
      def run(): Long =
        d.select(sum(length(c)).as("n")).head().getLong(0)
      run() // warm-up
      (1 to 3).map { _ =>
        val s = System.nanoTime(); run(); (System.nanoTime() - s) / 1e6
      }.min
    }
    val expr = time(graft.functions.Bpe.bpeTextExpr(col("text"), merges))
    val hof = time(graft.functions.Bpe.bpeTextHof(col("text"), merges))
    println(f"[bpe] apply sf=$sfDir: single-expr=$expr%.0f ms  transform-HOF=$hof%.0f ms  (expr/hof=${expr / hof}%.2f)")
    spark.stop()
  }
}
