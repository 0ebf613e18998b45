package graft

import org.apache.spark.sql.functions._

/** Dev probe (r15): attribute q_bpe_bytes' length-lane cost across its
  * pipeline stages — regex tokenize, the per-word byte-BPE kernel via
  * transform(), the concat_ws join, and the n_pieces tail — each timed
  * with the noop sink on one data dir.
  */
object ProbeBpeParts {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_x4len16/sf0.1")
    val spark = DevSpark.session()
    val docs = graft.queries.Tables.df(spark, dir, "documents")
    def t(tag: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      def pass(): Double = {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      pass(); pass()
      val ts = Seq.fill(3)(pass())
      println(f"[bpeparts] $tag%-28s min=${ts.min}%6.2f s median=${ts.sorted.apply(1)}%6.2f s")
    }
    import graft.functions.TextFunctions.tokens
    val merges = graft.queries.ExtQueries.ByteBpeFixtureMerges
    t("scan only")(docs.select(col("doc_id"), length(col("text")).as("l")))
    t("tokenize only")(docs.select(col("doc_id"), tokens(col("text")).as("t")))
    t("tokenize+size")(docs.select(col("doc_id"), size(tokens(col("text"))).as("n")))
    t("transform identity")(docs.select(col("doc_id"),
      concat_ws(" ", transform(tokens(col("text")), w => w)).as("x")))
    t("transform upper")(docs.select(col("doc_id"),
      concat_ws(" ", transform(tokens(col("text")), w => upper(w))).as("x")))
    t("full byteBpeText")(docs.select(col("doc_id"),
      graft.functions.ByteBpe.byteBpeText(col("text"), merges).as("x")))
    spark.stop()
  }
}
