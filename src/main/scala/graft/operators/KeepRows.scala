package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keep/drop rows on an EXPENSIVE computed column without re-evaluating
  * the expression (round 15).
  *
  * The natural `df.withColumn(n, e).where(pred(n))` shape re-evaluates
  * `e` per row: predicate pushdown substitutes the alias through the
  * Project (PushPredicateThroughNonJoin rewrites pred(n) to pred(e)
  * under the Project unconditionally), and FilterExec runs no
  * subexpression elimination — so a kernel/fold expression is computed
  * once for the predicate and again for the projection, and a
  * struct-typed expression once more per field read in the filter.
  * Measured on the 9.6 KB-doc length twin: q_pipeline's quality cut in
  * this shape cost 8.9 s vs 2.2 s without it (ProbePipelineParts).
  *
  * These helpers express the keep-decision as a single-element array
  * `filter` + `explode` instead: the expensive expression is evaluated
  * exactly once, in the Project BELOW the Generate (the generator only
  * references the resulting attribute), the lambda predicate decides
  * membership of the one element, and Generate drops rows whose array
  * came out empty — no Filter node exists for pushdown to mangle.
  * (`InferFiltersFromGenerate` is excluded in every graft session for
  * exactly this family of reasons; even if present it would only filter
  * on the cheap attribute.)
  *
  * Column order: the attached column is appended after `df`'s columns,
  * identical to `withColumn`.
  */
object KeepRows {
  /** Attach `e` as column `name`, keeping only rows where `pred(e)` is
    * TRUE (null and false both drop — `array_filter` semantics, matching
    * `.where`'s null-drops behavior). `e` evaluates exactly once per row.
    */
  def matching(df: DataFrame, name: String, e: Column,
      pred: Column => Column): DataFrame = {
    // withColumn REPLACES a same-named column; this append-shaped rewrite
    // would instead produce duplicate column names and ambiguous
    // downstream col(name) references — fail loudly at build time
    require(!df.columns.contains(name) && !df.columns.contains(s"__kr_$name"),
      s"KeepRows: column '$name' (or '__kr_$name') already exists in " +
        df.columns.mkString("[", ", ", "]"))
    val keep = df.columns.map(col).toSeq
    df.select(keep :+ e.as(s"__kr_$name"): _*)
      .select(keep :+
        explode(filter(array(col(s"__kr_$name")), x => pred(x))).as(name): _*)
  }

  /** Attach `e` as column `name`, dropping rows where it is null. */
  def nonNull(df: DataFrame, name: String, e: Column): DataFrame =
    matching(df, name, e, _.isNotNull)
}
