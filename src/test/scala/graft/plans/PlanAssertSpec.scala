package graft.plans

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The ProbeQap lesson as a standing gate: no curated pipeline may
  * evaluate a heavy graft kernel inside a filter predicate (FilterExec
  * has no CSE; pushdown inlines projected aliases — see PlanAssert).
  */
class PlanAssertSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("positive control: a predicate on a kernel column IS detected") {
    // pushdown inlines the projected entropy kernel into the filter —
    // exactly the shape the check exists to catch
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val trapped = docs
      .select(col("doc_id"),
        graft.functions.HashExpressions.byteEntropyBits(
          encode(col("text"), "UTF-8")).as("ent"))
      .where(col("ent") > 3000)
    val ks = PlanAssert.heavyFilterKernels(trapped)
    assert(ks.nonEmpty, "the entropy kernel must be seen inside the filter")
    intercept[IllegalArgumentException] {
      PlanAssert.assertNoHeavyFilter(trapped, "control")
    }
    // and a clean shape on the same data passes: filter on a plain
    // column, kernel only in the projection
    val clean = docs.where(length(col("text")) > 10)
      .select(col("doc_id"),
        graft.functions.HashExpressions.byteEntropyBits(
          encode(col("text"), "UTF-8")).as("ent"))
    PlanAssert.assertNoHeavyFilter(clean, "clean-control")
  }

  test("q_pipeline / q_pipeline_curated / q_pipeline_signals never filter on a kernel") {
    for (name <- Seq("q_pipeline", "q_pipeline_curated", "q_pipeline_signals")) {
      val df = graft.queries.Queries.queries(name)(spark, sfDir)
      PlanAssert.assertNoHeavyFilter(df, name)
    }
  }
}
