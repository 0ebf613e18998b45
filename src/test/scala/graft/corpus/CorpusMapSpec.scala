package graft.corpus

import graft.SparkTestSession
import graft.core.{Flow, Fold}
import org.scalatest.funsuite.AnyFunSuite

/** Test-for-test port of the reference's functional map corpus
  * (pigpen-core/src/test/clojure/pigpen/functional/map_test.clj, 159 LoC).
  * Each test name carries the reference deftest name; CORPUS.md maps the
  * full corpus. Reference maps `{:x N :y M}` / `{:a N}` ride as tuples;
  * unordered results compare sorted, ORDERED results (sort, map-indexed)
  * compare as sequences — order is part of those operators' contract.
  */
class CorpusMapSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def flow[T: org.apache.spark.sql.Encoder](xs: T*): Flow[T] =
    Flow.of(spark)(xs)

  test("test-map: normal map") {
    val r = flow((1, 2), (2, 4)).map { case (x, y) => x + y }.dump()
    assert(r.sorted == Seq(3, 6))
  }

  test("test-mapcat: normal mapcat") {
    val r = flow((1, 2), (2, 4)).mapcat { case (x, y) => Seq(x, y) }.dump()
    assert(r.sorted == Seq(1, 2, 2, 4))
  }

  test("test-map-indexed: normal map-indexed") {
    // without a sort the index is input order (zipWithIndex partition order)
    val r = flow(2, 1, 3).mapIndexed((i, a) => (i, a)).dump()
    assert(r == Seq((0L, 2), (1L, 1), (2L, 3)))
  }

  test("test-map-indexed+sort: sort + map-indexed") {
    val r = flow(2, 1, 3).sortBy(identity[Int]).mapIndexed((i, a) => (i, a)).dump()
    assert(r == Seq((0L, 1), (1L, 2), (2L, 3)))
  }

  test("test-sort: normal sort") {
    assert(flow(2, 1, 4, 3).sortBy(identity[Int]).dump() == Seq(1, 2, 3, 4))
  }

  test("test-sort-desc: descending sort") {
    assert(flow(2, 1, 4, 3).sortBy(identity[Int], asc = false).dump() == Seq(4, 3, 2, 1))
  }

  test("test-sort-by: normal sort-by") {
    val r = flow(Tuple1(2), Tuple1(1), Tuple1(3)).sortBy(_._1).dump()
    assert(r == Seq(Tuple1(1), Tuple1(2), Tuple1(3)))
  }

  test("test-sort-by-desc: descending sort-by") {
    val r = flow(Tuple1(2), Tuple1(1), Tuple1(3)).sortBy(_._1, asc = false).dump()
    assert(r == Seq(Tuple1(3), Tuple1(2), Tuple1(1)))
  }

  test("test-sort-by-with-duplicates: sort-by with duplicate input values") {
    val r = flow(1, 2, 3, 1, 2, 3, 1, 2, 3).sortBy(identity[Int]).dump()
    assert(r == Seq(1, 1, 1, 2, 2, 2, 3, 3, 3))
  }

  test("test-map+fold1: map followed by a fold with a filter") {
    val r = flow(-2, -1, 0, 1, 2).map(_ + 1)
      .foldAll(Fold.count[Int].prefilter(_ > 0)).dump()
    assert(r == Seq(3L))
  }

  test("test-map+fold2: map to boolean followed by a fold with a filter") {
    val r = flow(-2, -1, 0, 1, 2).map(_ > 0)
      .foldAll(Fold.count[Boolean].prefilter(identity)).dump()
    assert(r == Seq(2L))
  }

  test("test-map-nil: nils should stay nil") {
    val r = flow(1, 2).map(_ => null: String).dump()
    assert(r == Seq(null, null))
  }

  test("test-mapcat-nil: nils should stay nil") {
    val r = flow(1, 2).mapcat(n => Seq.fill(n)(null: String)).dump()
    assert(r == Seq(null, null, null))
  }
}
