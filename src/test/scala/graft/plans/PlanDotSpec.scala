package graft.plans

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PlanDot renders an executed plan as a well-formed DOT digraph
  * (reference pigpen-viz viz.clj:28-60 parity).
  */
class PlanDotSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("toDot emits one node per plan operator and child→parent edges") {
    val df = Seq((1, "a"), (2, "b")).toDF("k", "v")
      .where(col("k") > 0).groupBy("v").agg(count(lit(1)).as("n"))
    df.collect()
    val plan = df.queryExecution.executedPlan
    val dot = PlanDot.toDot(plan, "test-plan")
    assert(dot.startsWith("digraph \"test-plan\" {"))
    assert(dot.trim.endsWith("}"))
    val nodes = dot.linesIterator.count(_.matches("""\s*n\d+ \[label=.*"""))
    val edges = dot.linesIterator.count(_.matches("""\s*n\d+ -> n\d+;"""))
    // a tree with N nodes has N-1 edges
    assert(nodes >= 3, s"expected at least scan/filter/agg nodes:\n$dot")
    assert(edges == nodes - 1, s"tree edge count mismatch:\n$dot")
    assert(dot.contains("HashAggregate"), dot)
    // labels are quote-escaped: no raw quotes breaking the DOT syntax
    dot.linesIterator.filter(_.contains("[label=")).foreach { l =>
      assert(l.trim.matches("""n\d+ \[label="([^"\\]|\\.)*"\];"""), s"bad label line: $l")
    }
  }
}
