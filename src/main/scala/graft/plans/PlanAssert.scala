package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.Filter

/** Reusable plan-shape assertions — the ProbeQap lesson as a machine
  * check instead of prose.
  *
  * The trap (measured round 11, `ProbeQap`): Spark's `FilterExec`
  * performs NO subexpression elimination, and predicate pushdown INLINES
  * projected aliases into the filter condition — so a predicate over a
  * heavy projected column (`.where(f(qualityScore))`) re-evaluates the
  * heavy expression once per reference in the predicate. A quantile-bin
  * comparison chain that inlined a regex-kernel quality score went
  * 0.25 s → 4.9 s. Only Project/HashAggregate codegen have CSE; the safe
  * shapes are a tiny broadcast-join barrier on the derived column
  * ([[graft.operators.Split.curriculumSampleApprox]]'s pattern) or an
  * aggregate.
  *
  * The check inspects the OPTIMIZED logical plan — that is where
  * pushdown decides filter placement and alias inlining, and each
  * logical `Filter` maps 1:1 onto the `FilterExec` that would execute
  * it (no AQE indirection to unwrap). "Heavy kernel" = any custom graft
  * Catalyst expression (package `graft.*` — the codegen'd text/hash/
  * score kernels); built-in comparisons and column refs are exempt.
  */
object PlanAssert {

  /** True iff `e` itself is a graft kernel expression. */
  def isGraftKernel(e: Expression): Boolean =
    e.getClass.getName.startsWith("graft.")

  /** Distinct graft kernel class names appearing anywhere inside a
    * `Filter` condition of `df`'s optimized plan (empty = clean).
    */
  def heavyFilterKernels(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case f: Filter =>
        f.condition.collect { case e if isGraftKernel(e) =>
          e.getClass.getSimpleName }
    }.flatten.distinct

  /** Assert `df`'s plan never evaluates a graft kernel inside a filter
    * predicate; the failure message carries the fix direction.
    */
  def assertNoHeavyFilter(df: DataFrame, label: String): Unit = {
    val ks = heavyFilterKernels(df)
    require(ks.isEmpty,
      s"$label: a Filter would evaluate graft kernel(s) ${ks.mkString(", ")} " +
        "in its predicate. FilterExec has no subexpression elimination and " +
        "pushdown inlines projected aliases, so the kernel re-evaluates per " +
        "reference (ProbeQap: 0.25 s -> 4.9 s). Route the predicate through " +
        "a broadcast-join barrier on the derived column or an aggregate.")
  }
}
