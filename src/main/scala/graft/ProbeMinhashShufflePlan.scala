package graft

import org.apache.spark.sql.functions._

/** Dev probe (r16): the minhash bucket self-join in the SHUFFLE regime
  * (auto-broadcast off — the cluster-scale shape where the banded
  * stream cannot broadcast): confirms the identical-projection alias
  * restructure lets ReuseExchange materialize the banded exchange ONCE
  * (the pre-r16 pre-join renames gave the sides different plans and the
  * stream shuffled twice), and dumps the plan for the plans/ record.
  */
object ProbeMinhashShufflePlan {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = args.headOption.getOrElse("plans/r16/q_dedup_minhash_shuffle_after.txt")
    val spark = DevSpark.session()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val docs = spark.read.parquet(sfDir + "/documents.parquet")
    val dups = docs.unionByName(docs.withColumn("doc_id", col("doc_id") + 10000))
    val pairs = graft.operators.Dedup.minhashNearDuplicates(dups, "doc_id", "text",
      shingle = 3, numHashes = 64, bands = 16, threshold = 0.7)
    pairs.collect() // executes THIS Dataset's queryExecution (a write would plan its own)
    // AQE applies exchange reuse at RUNTIME (stage cache): the executed
    // final plan shows the shared stage, the static dump cannot
    val txt = pairs.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), txt)
    val reused = txt.linesIterator.count(l =>
      l.contains("ReusedExchange") || l.contains("(Reuses: "))
    val stages = txt.linesIterator.count(_.contains("ShuffleQueryStage"))
    println(s"[mhplan] wrote $out reused=$reused shuffle_stages=$stages")
    spark.stop()
  }
}
