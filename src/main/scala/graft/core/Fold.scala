package graft.core

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Algebraic aggregate: the engine's parallel-aggregation primitive.
  *
  * Mirrors the reference fold record `{:pre :combinef :reducef :post}`
  * (reference: pigpen-core/src/main/clojure/pigpen/fold.clj:29-51,
  * pigpen/join.clj:280-314): `zero` seeds a per-partition buffer,
  * `reduce` folds one input into the buffer (map side), `merge` combines
  * partial buffers (shuffle/reduce side), `finish` post-processes. This is
  * exactly Spark's `Aggregator[IN, BUF, OUT]` shape, so every fold gets
  * map-side partial aggregation for free at any scale — there is never a
  * single-reducer path for a fold.
  */
final case class Fold[A, B, C](
    zero: () => B,
    reduce: (B, A) => B,
    merge: (B, B) => B,
    finish: B => C,
) extends Serializable {

  /** Post-process the result (reference fold.clj `post` composition). */
  def andThen[D](f: C => D): Fold[A, B, D] =
    Fold(zero, reduce, merge, finish.andThen(f))

  /** Pre-map inputs (reference `fold/map`, fold.clj:107-115). */
  def premap[Z](f: Z => A): Fold[Z, B, C] =
    Fold(zero, (b: B, z: Z) => reduce(b, f(z)), merge, finish)

  /** Pre-filter inputs (reference `fold/filter`, fold.clj:117-125). */
  def prefilter(p: A => Boolean): Fold[A, B, C] =
    Fold(zero, (b: B, a: A) => if (p(a)) reduce(b, a) else b, merge, finish)

  /** Pre-mapcat inputs (reference `fold/mapcat`, fold.clj:127-131). */
  def premapcat[Z](f: Z => IterableOnce[A]): Fold[Z, B, C] =
    Fold(zero, (b: B, z: Z) => f(z).iterator.foldLeft(b)(reduce), merge, finish)

  /** reference `fold/keep` (fold.clj:133-137): map then drop nulls/None. */
  def prekeep[Z](f: Z => Option[A]): Fold[Z, B, C] =
    Fold(
      zero,
      (b: B, z: Z) => f(z).fold(b)(reduce(b, _)),
      merge,
      finish)

  /** Run this fold over a plain collection (local semantics oracle). */
  def foldLocal(xs: IterableOnce[A]): C =
    finish(xs.iterator.foldLeft(zero())(reduce))

  /** Bridge to a Spark typed aggregation column. The buffer travels as a
    * kryo blob (arbitrary Scala values, like the reference's frozen lane);
    * partial+final aggregation is handled by Spark's hash aggregate.
    */
  def toColumn(implicit outEnc: Encoder[C]): TypedColumn[A, C] =
    new FoldAggregator(this)(Encoders.kryo[Wrap[B]], outEnc).toColumn
}

/** Kryo-safe box (kryo encoders dislike some raw container types). */
final case class Wrap[B](var b: B)

final class FoldAggregator[A, B, C](f: Fold[A, B, C])(
    implicit bufEnc: Encoder[Wrap[B]],
    outEnc: Encoder[C],
) extends Aggregator[A, Wrap[B], C] {
  override def zero: Wrap[B] = Wrap(f.zero())
  override def reduce(b: Wrap[B], a: A): Wrap[B] = { b.b = f.reduce(b.b, a); b }
  override def merge(x: Wrap[B], y: Wrap[B]): Wrap[B] = { x.b = f.merge(x.b, y.b); x }
  override def finish(b: Wrap[B]): C = f.finish(b.b)
  override def bufferEncoder: Encoder[Wrap[B]] = bufEnc
  override def outputEncoder: Encoder[C] = outEnc
}

/** The fold library (reference pigpen/fold.clj §2.5 of SURVEY.md).
  *
  * Every fold is algebraic (associative+commutative merge), so at 100 TB
  * each is a two-phase hash aggregate with map-side combine — never a
  * materialized group bag.
  */
object Fold {

  /** Collect to a vector (reference fold.clj:90-105 `vec`, the default
    * fold). Unbounded per group — same hazard as the reference.
    */
  def vec[A]: Fold[A, Vector[A], Vector[A]] =
    Fold(() => Vector.empty[A], (b: Vector[A], a: A) => b :+ a, (x: Vector[A], y: Vector[A]) => x ++ y, identity[Vector[A]])

  /** reference fold.clj:139-153. */
  def distinct[A]: Fold[A, Set[A], Set[A]] =
    Fold(() => Set.empty[A], (b: Set[A], a: A) => b + a, (x: Set[A], y: Set[A]) => x ++ y, identity[Set[A]])

  /** Count including nulls (reference fold.clj:298-319). */
  def count[A]: Fold[A, Long, Long] =
    Fold(() => 0L, (b: Long, _: A) => b + 1, (x: Long, y: Long) => x + y, identity[Long])

  def sum[A](implicit num: Numeric[A]): Fold[A, A, A] =
    Fold(() => num.zero, num.plus, num.plus, identity[A])

  /** Average; None on empty input (reference fold.clj:345-375 returns nil). */
  def avg[A](implicit num: Numeric[A]): Fold[A, (A, Long), Option[Double]] =
    Fold[A, (A, Long), Option[Double]](
      () => (num.zero, 0L),
      (b, a) => (num.plus(b._1, a), b._2 + 1),
      (x, y) => (num.plus(x._1, y._1), x._2 + y._2),
      b => if (b._2 == 0) None else Some(num.toDouble(b._1) / b._2))

  /** Extrema; None on empty (reference sentinel `::nil` seed fold.clj:416-423). */
  def min[A](implicit ord: Ordering[A]): Fold[A, Option[A], Option[A]] = minBy(identity[A])
  def max[A](implicit ord: Ordering[A]): Fold[A, Option[A], Option[A]] = maxBy(identity[A])

  def minBy[A, K](key: A => K)(implicit ord: Ordering[K]): Fold[A, Option[A], Option[A]] =
    Fold[A, Option[A], Option[A]](
      () => None,
      (b, a) => Some(b.fold(a)(x => if (ord.lteq(key(x), key(a))) x else a)),
      (x, y) => (x, y) match {
        case (Some(a), Some(b)) => Some(if (ord.lteq(key(a), key(b))) a else b)
        case _ => x.orElse(y)
      },
      identity[Option[A]])

  def maxBy[A, K](key: A => K)(implicit ord: Ordering[K]): Fold[A, Option[A], Option[A]] =
    minBy(key)(ord.reverse)

  /** First / last of the accumulated sequence. Like the reference
    * (fold.clj:171-210) these are order-sensitive and therefore only
    * deterministic after a sort; prefer min/max.
    */
  def first[A]: Fold[A, Option[A], Option[A]] =
    Fold[A, Option[A], Option[A]](() => None, (b, a) => b.orElse(Some(a)), (x, y) => x.orElse(y), identity[Option[A]])
  def last[A]: Fold[A, Option[A], Option[A]] =
    Fold[A, Option[A], Option[A]](() => None, (_, a) => Some(a), (x, y) => y.orElse(x), identity[Option[A]])

  /** Top-n by an ordering — bounded-heap accumulate, so per-group state is
    * O(n) at any scale (reference fold.clj:377-409 `top`/`top-by` sorts the
    * whole bag; we keep only n).
    */
  def top[A](n: Int)(implicit ord: Ordering[A]): Fold[A, Vector[A], Vector[A]] = topBy(n)(identity[A])

  def topBy[A, K](n: Int)(key: A => K)(implicit ord: Ordering[K]): Fold[A, Vector[A], Vector[A]] = {
    def trim(v: Vector[A]): Vector[A] =
      if (v.size <= n) v else v.sortBy(key)(ord.reverse).take(n)
    Fold[A, Vector[A], Vector[A]](
      () => Vector.empty[A],
      // amortize: let the buffer grow to 2n before re-sorting
      (b, a) => { val v = b :+ a; if (v.size >= 2 * n) trim(v) else v },
      (x, y) => trim(x ++ y),
      v => v.sortBy(key)(ord.reverse).take(n))
  }

  /** Sort the accumulated bag (reference fold.clj:212-260). Unbounded;
    * compose with take for top-k instead when n is known.
    */
  def sort[A](implicit ord: Ordering[A]): Fold[A, Vector[A], Vector[A]] =
    vec[A].andThen(_.sorted(ord))
  def sortBy[A, K](key: A => K)(implicit ord: Ordering[K]): Fold[A, Vector[A], Vector[A]] =
    vec[A].andThen(_.sortBy(key)(ord))

  /** First n of the (sorted) result seq (reference fold.clj:155-169). */
  def take[A](n: Int): Fold[A, Vector[A], Vector[A]] =
    vec[A].andThen(_.take(n))

  /** Run two folds over the same data (reference `juxt` fold.clj:262-296).
    * N-way juxt = nest pairs, or pass several folds to `GroupedFlow.agg`.
    */
  def juxt[A, B1, C1, B2, C2](f1: Fold[A, B1, C1], f2: Fold[A, B2, C2]): Fold[A, (B1, B2), (C1, C2)] =
    Fold[A, (B1, B2), (C1, C2)](
      () => (f1.zero(), f2.zero()),
      (b, a) => (f1.reduce(b._1, a), f2.reduce(b._2, a)),
      (x, y) => (f1.merge(x._1, y._1), f2.merge(x._2, y._2)),
      b => (f1.finish(b._1), f2.finish(b._2)))

  def juxt3[A, B1, C1, B2, C2, B3, C3](
      f1: Fold[A, B1, C1], f2: Fold[A, B2, C2], f3: Fold[A, B3, C3]): Fold[A, ((B1, B2), B3), ((C1, C2), C3)] =
    juxt(juxt(f1, f2), f3)

  /** N-ary juxt (the reference's `juxt` takes any number of folds,
    * fold.clj:262-296): one pass, every fold's buffer advances per row;
    * the result is index-aligned with `folds`. Buffers/results ride as
    * `IndexedSeq[Any]` (kryo lane) — use [[juxt]]/[[juxt3]] when static
    * result types matter.
    */
  def juxtN[A](folds: Fold[A, _, _]*): Fold[A, Array[Any], IndexedSeq[Any]] = {
    require(folds.nonEmpty, "juxtN needs at least one fold")
    val fs: IndexedSeq[Fold[A, Any, Any]] =
      folds.toIndexedSeq.map(_.asInstanceOf[Fold[A, Any, Any]])
    // buffer is a mutable Array updated in place: per-row cost is O(folds)
    // slot writes, zero allocation; an immutable view only at finish.
    // (Aggregator buffers are private to a task, so in-place mutation is
    // safe — Spark's own ImperativeAggregates do the same.)
    Fold[A, Array[Any], IndexedSeq[Any]](
      () => Array.tabulate[Any](fs.length)(i => fs(i).zero()),
      (b, a) => { var i = 0; while (i < fs.length) { b(i) = fs(i).reduce(b(i), a); i += 1 }; b },
      (x, y) => { var i = 0; while (i < fs.length) { x(i) = fs(i).merge(x(i), y(i)); i += 1 }; x },
      b => fs.indices.map(i => fs(i).finish(b(i))))
  }
}
