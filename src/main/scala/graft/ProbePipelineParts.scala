package graft

import org.apache.spark.sql.functions._

/** Dev probe (r15): time q_pipeline's constituent passes in isolation on
  * one data dir, to attribute the composed query's wall time before
  * optimizing it. Each piece is timed with the same count() action the
  * bench uses; the scored checkpoint is rebuilt per pass exactly as
  * qd.fn does.
  */
object ProbePipelineParts {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_x4len16/sf0.1")
    val spark = DevSpark.session()
    import graft.queries.Tables
    def t(tag: String)(f: => Unit): Unit = {
      (1 to 2).foreach(_ => f) // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[parts] $tag%-28s min=${ts.min}%6.2f s median=${ts.sorted.apply(1)}%6.2f s")
    }
    val docs = Tables.df(spark, dir, "documents")
    import graft.functions.TextFunctions.{qualityScore, fingerprint}
    t("quality only") {
      docs.select(col("doc_id"), qualityScore(col("text")).as("q")).count()
    }
    t("fingerprint only") {
      docs.select(col("doc_id"), fingerprint(col("text")).as("fp")).count()
    }
    t("scored ckpt (as q_pipeline)") {
      graft.operators.Materialize.once(docs
        .select(col("doc_id"), col("source"),
          qualityScore(col("text")).as("quality"),
          fingerprint(col("text")).as("__fp"))
        .where(col("quality") > 0.5 && col("doc_id") % 50 =!= 0)).count()
    }
    t("ckpt, no quality filter") {
      graft.operators.Materialize.once(docs
        .select(col("doc_id"), col("source"),
          qualityScore(col("text")).as("quality"),
          fingerprint(col("text")).as("__fp"))
        .where(col("doc_id") % 50 =!= 0)).count()
    }
    t("proj+filter, no ckpt") {
      docs.select(col("doc_id"), col("source"),
          qualityScore(col("text")).as("quality"),
          fingerprint(col("text")).as("__fp"))
        .where(col("quality") > 0.5 && col("doc_id") % 50 =!= 0)
        .write.format("noop").mode("overwrite").save()
    }
    t("proj only, noop") {
      docs.select(col("doc_id"), col("source"),
          qualityScore(col("text")).as("quality"),
          fingerprint(col("text")).as("__fp"))
        .write.format("noop").mode("overwrite").save()
    }
    t("ckpt-all + post-filter") {
      graft.operators.Materialize.once(docs
        .where(col("doc_id") % 50 =!= 0)
        .select(col("doc_id"), col("source"),
          qualityScore(col("text")).as("quality"),
          fingerprint(col("text")).as("__fp")))
        .where(col("quality") > 0.5).count()
    }
    t("generate-drop + ckpt") {
      val q = docs.where(col("doc_id") % 50 =!= 0)
        .select(col("doc_id"), col("source"), col("text"),
          qualityScore(col("text")).as("__q"))
        .select(col("doc_id"), col("source"),
          explode(when(col("__q") > 0.5,
            array(struct(col("__q").as("quality"),
              fingerprint(col("text")).as("__fp"))))
            .otherwise(array())).as("__s"))
        .select(col("doc_id"), col("source"),
          col("__s.quality").as("quality"), col("__s.__fp").as("__fp"))
      graft.operators.Materialize.once(q).count()
    }
    t("contamination branch") {
      graft.operators.Dedup.ngramContamination(
        docs.where(col("doc_id") % 50 =!= 0),
        docs.where(col("doc_id") % 50 === 0),
        "doc_id", "text", shingle = 3).count()
    }
    spark.stop()
  }
}
