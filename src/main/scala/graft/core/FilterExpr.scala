package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lit}

/** The reference's filter-expression mini-DSL (`and or = not= < > <= >=`
  * over `?field` symbols and string/number literals —
  * pigpen-pig/src/main/clojure/pigpen/pig/script.clj:70-116, local eval
  * local.clj:324-345; used by `filter$` and the load `:filter` option).
  *
  * Compiled to a Catalyst [[Column]], so a FilterExpr attached to a load is
  * a *pushdown-eligible* predicate: Catalyst's PushDownPredicates moves it
  * into the scan (the reference needed a dedicated oven rewrite,
  * expand-load-filters, to get the same effect — SURVEY.md §4.1).
  */
sealed trait FilterExpr {
  def compile: Column = compileWith(Map.empty)

  /** Compile under a `let` scope (symbol → bound sub-expression). The
    * reference resolves bound symbols by substituting and re-evaluating the
    * bound expression under the same scope (script.clj:95-105), i.e. pure
    * inlining — there is no runtime variable, so the compiled Column stays
    * pushdown-eligible exactly like the unscoped forms.
    */
  def compileWith(scope: Map[String, FilterExpr]): Column = this match {
    case FilterExpr.Field(n) => col(n)
    case FilterExpr.Lit(v) => lit(v)
    case FilterExpr.Sym(n) =>
      scope.getOrElse(n, throw new IllegalArgumentException(s"Unable to resolve symbol $n in filter let-scope")).compileWith(scope)
    case FilterExpr.Let(bindings, body) => body.compileWith(scope ++ bindings)
    case FilterExpr.Eq(a, b) => a.compileWith(scope) === b.compileWith(scope)
    case FilterExpr.Neq(a, b) => a.compileWith(scope) =!= b.compileWith(scope)
    case FilterExpr.Lt(a, b) => a.compileWith(scope) < b.compileWith(scope)
    case FilterExpr.Gt(a, b) => a.compileWith(scope) > b.compileWith(scope)
    case FilterExpr.Leq(a, b) => a.compileWith(scope) <= b.compileWith(scope)
    case FilterExpr.Geq(a, b) => a.compileWith(scope) >= b.compileWith(scope)
    case FilterExpr.And(es) => es.map(_.compileWith(scope)).reduce(_ && _)
    case FilterExpr.Or(es) => es.map(_.compileWith(scope)).reduce(_ || _)
    case FilterExpr.Not(e) => !e.compileWith(scope)
  }
}

object FilterExpr {
  final case class Field(name: String) extends FilterExpr
  final case class Lit(value: Any) extends FilterExpr
  final case class Eq(a: FilterExpr, b: FilterExpr) extends FilterExpr
  final case class Neq(a: FilterExpr, b: FilterExpr) extends FilterExpr
  final case class Lt(a: FilterExpr, b: FilterExpr) extends FilterExpr
  final case class Gt(a: FilterExpr, b: FilterExpr) extends FilterExpr
  final case class Leq(a: FilterExpr, b: FilterExpr) extends FilterExpr
  final case class Geq(a: FilterExpr, b: FilterExpr) extends FilterExpr
  final case class And(es: Seq[FilterExpr]) extends FilterExpr
  final case class Or(es: Seq[FilterExpr]) extends FilterExpr
  final case class Not(e: FilterExpr) extends FilterExpr

  /** A let-bound symbol reference (the reference's non-`?field` symbols). */
  final case class Sym(name: String) extends FilterExpr

  /** `(let [sym expr ...] body)` — script.clj:102-105. The whole binding
    * map is in scope for every bound expression (the reference builds the
    * scope before evaluating anything), so bindings may reference each
    * other; cycles are the caller's bug and would overflow at compile time.
    */
  final case class Let(bindings: Map[String, FilterExpr], body: FilterExpr) extends FilterExpr

  // combinator sugar mirroring the reference's s-expression surface
  def field(n: String): FilterExpr = Field(n)
  def value(v: Any): FilterExpr = Lit(v)
  def and(es: FilterExpr*): FilterExpr = And(es)
  def or(es: FilterExpr*): FilterExpr = Or(es)
  def not(e: FilterExpr): FilterExpr = Not(e)
  def sym(n: String): FilterExpr = Sym(n)
  def let(bindings: (String, FilterExpr)*)(body: FilterExpr): FilterExpr = Let(bindings.toMap, body)
}
