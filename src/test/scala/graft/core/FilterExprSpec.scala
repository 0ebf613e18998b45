package graft.core

import graft.SparkTestSession
import graft.core.FilterExpr._
import org.scalatest.funsuite.AnyFunSuite

/** The expression-filter mini-DSL compiles to Catalyst columns and reaches
  * the parquet scan as a pushed filter (the reference needed the
  * expand-load-filters oven rewrite for this; here it's Catalyst).
  */
class FilterExprSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val expr = and(
    Gt(field("p_size"), value(40)),
    or(Eq(field("p_brand"), value("Brand#11")), Eq(field("p_brand"), value("Brand#22"))))

  test("filter expr evaluates like the equivalent SQL") {
    val df = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    val got = df.filter(expr.compile).count()
    df.createOrReplaceTempView("part_fe")
    val want = spark.sql(
      "SELECT COUNT(*) FROM part_fe WHERE p_size > 40 AND p_brand IN ('Brand#11','Brand#22')")
      .head.getLong(0)
    assert(got == want && got > 0)
  }

  test("load-filter is pushed into the parquet scan") {
    val df = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
      .filter(Gt(field("p_size"), value(40)).compile)
      .select("p_partkey")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(p_size,40)"),
      s"expected pushed filter in:\n$plan")
  }

  test("let-scope inlines bound sub-expressions (script.clj:102-105 semantics)") {
    val df = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    // (let [big (> ?p_size 40) b11 (= ?p_brand "Brand#11")] (and big (or b11 (= ?p_brand "Brand#22"))))
    val letExpr = let(
      "big" -> Gt(field("p_size"), value(40)),
      "b11" -> Eq(field("p_brand"), value("Brand#11")))(
      and(sym("big"), or(sym("b11"), Eq(field("p_brand"), value("Brand#22")))))
    assert(df.filter(letExpr.compile).count() == df.filter(expr.compile).count())
    // bindings may reference each other (scope is built before evaluation)
    val chained = let(
      "small" -> Leq(field("p_size"), value(10)),
      "tiny" -> and(sym("small"), Lt(field("p_size"), value(3))))(sym("tiny"))
    assert(df.filter(chained.compile).count() ==
      df.filter(Lt(field("p_size"), value(3)).compile).count())
    // inlined let stays pushdown-eligible
    val plan = df.filter(let("b" -> Gt(field("p_size"), value(40)))(sym("b")).compile)
      .select("p_partkey").queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(p_size,40)"))
    // unresolved symbol throws like the reference
    assertThrows[IllegalArgumentException](sym("nope").compile)
  }

  test("not / neq / leq / geq / lt compile correctly") {
    val df = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    assert(df.filter(Not(Leq(field("p_size"), value(40))).compile).count() ==
      df.filter(Gt(field("p_size"), value(40)).compile).count())
    assert(df.filter(Neq(field("p_size"), value(1)).compile).count() ==
      df.filter(Or(Seq(Lt(field("p_size"), value(1)), Gt(field("p_size"), value(1)))).compile).count())
    assert(df.filter(Geq(field("p_size"), value(1)).compile).count() == df.count())
  }
}
