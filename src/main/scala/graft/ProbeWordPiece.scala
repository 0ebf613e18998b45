package graft

import org.apache.spark.sql.functions._

/** Dev probe: train the WordPiece fixture vocab on a documents corpus
  * and print it as the Scala literal ExtQueries interpolates into the
  * q_wordpiece_apply oracle (the ProbeBpe/ProbeUnigram discipline —
  * training is deterministic, so one print pins the fixture).
  */
object ProbeWordPiece {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val merges = args.lift(1).map(_.toInt).getOrElse(24)
    val spark = DevSpark.session()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val t0 = System.nanoTime()
    val vocab = graft.functions.WordPiece.train(docs, "text", numMerges = merges)
    println(f"[wp] trained ${vocab.size} pieces ($merges merges) in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    println(vocab.map(p => "\"" + p + "\"").grouped(8).map(_.mkString(", "))
      .mkString("  Seq(\n    ", ",\n    ", ")"))
    // smoke: segment a few corpus words
    docs.limit(2).select(explode(split(trim(col("text")), "\\s+")).as("w")).limit(8)
      .select(col("w"), graft.functions.WordPiece.wordpieceWord(col("w"), vocab).as("pieces"))
      .collect().foreach(r => println(s"[wp] ${r.getString(0)} -> ${r.getString(1)}"))
    spark.stop()
  }
}
