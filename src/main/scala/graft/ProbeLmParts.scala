package graft

import org.apache.spark.sql.functions._

/** Dev probe (r16): attribute q_lm_score's length-lane cost across its
  * phases under the distilled auto path — training (reference tokenize +
  * two count aggregates + TV action), distillation (two counts + two
  * collects), and the zero-join scoring pass — each timed separately on
  * one data dir (min of 3 after warm-up).
  */
object ProbeLmParts {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_x4len16/sf0.1")
    val spark = DevSpark.session()
    val docs = graft.queries.Tables.df(spark, dir, "documents")
    import graft.operators.LanguageModel
    def t(tag: String)(f: => Any): Unit = {
      f
      val ts = Seq.fill(3) {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[lmparts] $tag%-24s min=${ts.min}%6.2f s median=${ts.sorted.apply(1)}%6.2f s")
    }
    t("train") {
      LanguageModel.train(docs.where(col("doc_id") % 3 === 0), "doc_id", "text", minCount = 2L)
    }
    val lm = LanguageModel.train(docs.where(col("doc_id") % 3 === 0), "doc_id", "text",
      minCount = 2L)
    t("distill") { LanguageModel.distillIfFits(lm).get }
    val d = LanguageModel.distillIfFits(lm).get
    println(s"[lmparts] model size uni=${d.uni.size} bi=${d.bi.size}")
    t("score-distilled") {
      LanguageModel.scoreDocsDistilled(docs, "doc_id", "text", d)
        .write.format("noop").mode("overwrite").save()
    }
    t("score-joined") {
      LanguageModel.scoreDocs(docs, "doc_id", "text", lm)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
