package graft

import org.apache.spark.sql.functions._

/** Dev probe (r15): A/B the distilled-LM scorer's row-keeping shapes on
  * one data dir — the pre-r15 where(isNotNull) formulation vs the
  * KeepRows explode — plus the fold-only control, to attribute the
  * q_lm_score_distilled x16 cost.
  */
object ProbeDistill {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_x16/sf0.1")
    val spark = DevSpark.session()
    val docs = graft.queries.Tables.df(spark, dir, "documents")
    val lm = graft.operators.LanguageModel.train(
      docs.where(col("doc_id") % 3 === 0), "doc_id", "text", minCount = 2L)
    val d = graft.operators.LanguageModel.distill(lm)
    println(s"[distill] model: ${d.uni.size} uni + ${d.bi.size} bi entries")
    def t(tag: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      def pass(): Double = {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      pass()
      val ts = Seq.fill(2)(pass())
      println(f"[distill] $tag%-24s min=${ts.min}%7.2f s")
    }
    val sc = graft.operators.LanguageModel.scoreColumn(col("text"), d)
    t("fold only")(docs.select(col("doc_id"), sc.as("__s")))
    t("old where(isNotNull)")(docs.select(col("doc_id"), sc.as("__s"))
      .where(col("__s").isNotNull)
      .select(col("doc_id"), col("__s.n_tokens"), col("__s.lm_bits"),
        col("__s.bits_per_token")))
    t("keeprows explode")(
      graft.operators.KeepRows.nonNull(
          docs.select(col("doc_id"), col("text")), "__s", sc)
        .select(col("doc_id"), col("__s.n_tokens"), col("__s.lm_bits"),
          col("__s.bits_per_token")))
    spark.stop()
  }
}
