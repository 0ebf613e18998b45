package graft.corpus

import graft.SparkTestSession
import graft.core.{Flow, Fold}
import org.scalatest.funsuite.AnyFunSuite

/** Test-for-test port of the reference's functional fold corpus
  * (pigpen-core/src/test/clojure/pigpen/functional/fold_test.clj, 300 LoC).
  * The reference's default comparator sorts ascending, so its `top` takes
  * the SMALLEST n — mapped to `Fold.top(n)(Ordering.reverse)` here (our
  * `top` is largest-first); min/max/avg surface empty input as None where
  * the reference returns nil. Records `{:foo n :bar s}` ride as (Int,
  * String) tuples.
  */
class CorpusFoldSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def flow[T: org.apache.spark.sql.Encoder](xs: T*): Flow[T] =
    Flow.of(spark)(xs)

  // fold_test.clj:132-141 / 264-300 — {:foo n :bar s} records
  private def records = flow((1, "d"), (2, "c"), (3, "b"), (4, "a"))

  test("test-vec: pouring values into a vector") {
    assert(flow(1, 2, 3, 4).foldAll(Fold.vec[Int]).dump() == Seq(Vector(1, 2, 3, 4)))
  }

  test("test-map: fold/map") {
    val r = flow(1, 2, 3, 4).foldAll(Fold.vec[Int].premap[Int](x => x * x)).dump()
    assert(r == Seq(Vector(1, 4, 9, 16)))
  }

  test("test-mapcat: fold/mapcat") {
    val r = flow(1, 2, 3, 4)
      .foldAll(Fold.vec[Int].premapcat[Int](x => Seq(x + 1, x - 1))).dump()
    assert(r == Seq(Vector(2, 0, 3, 1, 4, 2, 5, 3)))
  }

  test("test-filter: fold/filter") {
    assert(flow(1, 2, 3, 4).foldAll(Fold.vec[Int].prefilter(_ % 2 == 0)).dump() ==
      Seq(Vector(2, 4)))
  }

  test("test-remove: fold/remove") {
    assert(flow(1, 2, 3, 4).foldAll(Fold.vec[Int].prefilter(_ % 2 != 0)).dump() ==
      Seq(Vector(1, 3)))
  }

  test("test-keep: fold/keep drops nils") {
    val r = flow[Option[Int]](Some(1), Some(2), None, Some(3), Some(4))
      .foldAll(Fold.vec[Int].prekeep[Option[Int]](identity)).dump()
    assert(r == Seq(Vector(1, 2, 3, 4)))
  }

  test("test-distinct: fold/distinct") {
    val r = flow(1, 2, 3, 4, 1, 2, 3, 4)
      .foldAll(Fold.distinct[Int].andThen(_.toVector.sorted)).dump()
    assert(r == Seq(Vector(1, 2, 3, 4)))
  }

  test("test-take: any 2 of the input") {
    val raw = Set(1, 2, 3, 4)
    val r = flow(raw.toSeq: _*).foldAll(Fold.take[Int](2)).dump()
    assert(r.size == 1 && r.head.size == 2 && r.head.forall(raw))
  }

  test("test-first: any one of the input") {
    val raw = Set(1, 2, 3, 4)
    val r = flow(raw.toSeq: _*).foldAll(Fold.first[Int]).dump()
    assert(r.size == 1 && r.head.exists(raw))
  }

  test("test-last: any one of the input") {
    val raw = Set(1, 2, 3, 4)
    val r = flow(raw.toSeq: _*).foldAll(Fold.last[Int]).dump()
    assert(r.size == 1 && r.head.exists(raw))
  }

  test("test-sort: fold/sort") {
    assert(flow(2, 4, 1, 3, 2, 3, 5).foldAll(Fold.sort[Int]).dump() ==
      Seq(Vector(1, 2, 2, 3, 3, 4, 5)))
  }

  test("test-sort-desc: fold/sort descending") {
    assert(flow(2, 4, 1, 3, 2, 3, 5).foldAll(Fold.sort(Ordering[Int].reverse)).dump() ==
      Seq(Vector(5, 4, 3, 3, 2, 2, 1)))
  }

  test("test-sort-by: fold/sort-by") {
    val r = records.foldAll(Fold.sortBy[(Int, String), String](_._2)).dump()
    assert(r == Seq(Vector((4, "a"), (3, "b"), (2, "c"), (1, "d"))))
  }

  test("test-sort-by-desc: fold/sort-by descending") {
    val r = records
      .foldAll(Fold.sortBy[(Int, String), String](_._2)(Ordering[String].reverse)).dump()
    assert(r == Seq(Vector((1, "d"), (2, "c"), (3, "b"), (4, "a"))))
  }

  test("test-juxt-stats: juxt count/sum/avg in one pass") {
    implicit val anySeq: org.apache.spark.sql.Encoder[IndexedSeq[Any]] =
      org.apache.spark.sql.Encoders.kryo[IndexedSeq[Any]]
    val r = flow(1, 2, 3, 4)
      .foldAll(Fold.juxtN(Fold.count[Int], Fold.sum[Int], Fold.avg[Int])).dump()
    assert(r == Seq(IndexedSeq(4L, 10, Some(2.5))))
  }

  test("test-juxt-min-max: juxt with min/max over a mapped field") {
    val r = records.foldAll(Fold.juxt(
      Fold.min[Int].premap[(Int, String)](_._1),
      Fold.max[Int].premap[(Int, String)](_._1))).dump()
    assert(r == Seq((Some(1), Some(4))))
  }

  test("test-count") {
    assert(flow(1, 2, 3, 4).foldAll(Fold.count[Int]).dump() == Seq(4L))
  }

  test("test-sum") {
    assert(flow(1, 2, 3, 4).foldAll(Fold.sum[Int]).dump() == Seq(10))
  }

  test("test-avg: 5/2 = 2.5") {
    assert(flow(1, 2, 3, 4).foldAll(Fold.avg[Int]).dump() == Seq(Some(2.5)))
  }

  test("test-avg-with-cogroup: cogroup with sum and avg folds") {
    val foos = flow(1, 2, 2, 3, 3, 3)
    val bars = flow(1, 1, 1, 2, 2, 3)
    // avg yields Option[Double]; unwrap inside the fold (groups are
    // non-empty here) — cogroupFold's own Option would otherwise nest
    val avg = Fold.avg[Int].andThen(_.get)
    val r = foos.cogroupFold(bars)(identity)(identity)(Fold.sum[Int], avg)
      .map(p => (p._1, p._2.get, p._3.get)).dump()
    assert(r.toSet == Set((1, 1, 1.0), (2, 4, 2.0), (3, 9, 3.0)))
  }

  test("test-top: smallest 2 (reference default comparator is ascending)") {
    assert(flow(1, 2, 3, 4).foldAll(Fold.top(2)(Ordering[Int].reverse)).dump() ==
      Seq(Vector(1, 2)))
  }

  test("test-top-desc: largest 2") {
    assert(flow(1, 2, 3, 4).foldAll(Fold.top[Int](2)).dump() == Seq(Vector(4, 3)))
  }

  test("test-top-by: smallest 2 by :bar") {
    val r = records
      .foldAll(Fold.topBy[(Int, String), String](2)(_._2)(Ordering[String].reverse)).dump()
    assert(r == Seq(Vector((4, "a"), (3, "b"))))
  }

  test("test-top-by-desc: largest 2 by :bar") {
    val r = records.foldAll(Fold.topBy[(Int, String), String](2)(_._2)).dump()
    assert(r == Seq(Vector((1, "d"), (2, "c"))))
  }

  test("test-min") {
    assert(flow(2, 1, 4, 3).foldAll(Fold.min[Int]).dump() == Seq(Some(1)))
  }

  test("test-min+map: map :foo then min") {
    assert(records.foldAll(Fold.min[Int].premap[(Int, String)](_._1)).dump() ==
      Seq(Some(1)))
  }

  test("test-min-key: argmin record") {
    assert(records.foldAll(Fold.minBy[(Int, String), Int](_._1)).dump() ==
      Seq(Some((1, "d"))))
  }

  test("test-max") {
    assert(flow(2, 1, 4, 3).foldAll(Fold.max[Int]).dump() == Seq(Some(4)))
  }

  test("test-max-key: argmax record") {
    assert(records.foldAll(Fold.maxBy[(Int, String), Int](_._1)).dump() ==
      Seq(Some((4, "a"))))
  }
}
