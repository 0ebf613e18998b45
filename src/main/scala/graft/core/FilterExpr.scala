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
  def compile: Column = this match {
    case FilterExpr.Field(n) => col(n)
    case FilterExpr.Lit(v) => lit(v)
    case FilterExpr.Eq(a, b) => a.compile === b.compile
    case FilterExpr.Neq(a, b) => a.compile =!= b.compile
    case FilterExpr.Lt(a, b) => a.compile < b.compile
    case FilterExpr.Gt(a, b) => a.compile > b.compile
    case FilterExpr.Leq(a, b) => a.compile <= b.compile
    case FilterExpr.Geq(a, b) => a.compile >= b.compile
    case FilterExpr.And(es) => es.map(_.compile).reduce(_ && _)
    case FilterExpr.Or(es) => es.map(_.compile).reduce(_ || _)
    case FilterExpr.Not(e) => !e.compile
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

  // combinator sugar mirroring the reference's s-expression surface
  def field(n: String): FilterExpr = Field(n)
  def value(v: Any): FilterExpr = Lit(v)
  def and(es: FilterExpr*): FilterExpr = And(es)
  def or(es: FilterExpr*): FilterExpr = Or(es)
  def not(e: FilterExpr): FilterExpr = Not(e)
}
