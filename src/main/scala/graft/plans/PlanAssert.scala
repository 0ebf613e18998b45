package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate}
import org.apache.spark.sql.types.{BinaryType, StringType}

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

  /** Generate nodes that fan rows out from a CONSTANT collection while
    * carrying a string/binary payload column through — the d65debf
    * "single-scan" corpus shape (explode over a literal array with the
    * payload in `requiredChildOutput`). Generate materializes every
    * carried column per output row, so such a node copies every payload
    * byte N× for zero per-row variety; on 4.8 KB documents that read
    * +40% vs re-scanning page-cached parquet (SCALE.md r12-s2 — the
    * cost model is bytes MOVED per row, not scan count). A constant
    * fan-out over a payload is always replaceable by a UNION of scans
    * (or by fanning out only the key and re-joining).
    *
    * Generators that CONSUME a column (grams/bands/chunks — non-foldable
    * children) are exempt: their fan-out is data-dependent work, and
    * whether the payload rides along is a semantic choice
    * ([[graft.operators.Mixture.unimaxApply]]'s epoch repetition is such
    * a case — its `sequence` ends at a quota COLUMN, so it stays
    * exempt). Returns one descriptor per offending node (empty = clean).
    */
  def payloadExplodes(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case g: Generate if g.generator.children.nonEmpty &&
          g.generator.children.forall(_.foldable) =>
        val carried = g.requiredChildOutput.collect {
          case a if a.dataType == StringType || a.dataType == BinaryType => a.name
        }
        if (carried.isEmpty) None
        else Some(s"${g.generator.getClass.getSimpleName}(carries ${carried.mkString(",")})")
    }.flatten

  /** Assert `df`'s plan never duplicates a payload column through a
    * constant-collection Generate; the failure message carries the fix
    * direction.
    */
  def assertNoPayloadExplode(df: DataFrame, label: String): Unit = {
    val hits = payloadExplodes(df)
    require(hits.isEmpty,
      s"$label: ${hits.mkString("; ")} — a Generate over a constant " +
        "collection copies every carried payload byte per output row " +
        "(d65debf: +40% on 4.8 KB docs). Use a UNION of scans, or fan " +
        "out only the key and re-join the payload.")
  }
}
