package graft

import org.apache.spark.sql.SparkSession

/** Train the q_unigram_apply fixture vocabulary once on the sf0.01
  * documents corpus and print it as the Scala constant the query file
  * pastes (the BpeFixtureMerges discipline: train is deterministic, the
  * DuckDB oracle interpolates the SAME pieces/costs).
  */
object ProbeUnigram {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val t0 = System.nanoTime()
    val vocab = graft.functions.Unigram.train(docs, "text",
      vocabSize = 160, maxPieceLen = 4, iters = 3, seed = 2048)
    println(f"[unigram] trained ${vocab.size} pieces in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    println(vocab.map { case (p, c) =>
      val esc = p.replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", "\\n").replace("\t", "\\t").replace("\r", "\\r")
      s"""("$esc", ${c}L)"""
    }.grouped(4).map(_.mkString(", ")).mkString("Seq(\n    ", ",\n    ", ")"))
    spark.stop()
  }
}
