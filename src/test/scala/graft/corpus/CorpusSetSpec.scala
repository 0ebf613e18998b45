package graft.corpus

import graft.SparkTestSession
import graft.core.Flow
import org.scalatest.funsuite.AnyFunSuite

/** Test-for-test port of the reference's functional set corpus
  * (pigpen-core/src/test/clojure/pigpen/functional/set_test.clj, 122 LoC).
  * Each test name carries the reference deftest name; CORPUS.md maps the
  * full corpus. All reference inputs/expected bags are reproduced verbatim;
  * bags compare sorted (relations are unordered).
  */
class CorpusSetSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def flow[T: org.apache.spark.sql.Encoder](xs: T*): Flow[T] =
    Flow.of(spark)(xs)

  test("test-distinct: normal distinct") {
    assert(flow(5, 1, 2, 3, 4, 3, 2, 1, 5).distinct.dump().sorted == Seq(1, 2, 3, 4, 5))
  }

  test("test-concat: normal concat") {
    val r = flow(1, 2, 3).concat(flow(2, 3, 4), flow(3, 4, 5)).dump().sorted
    assert(r == Seq(1, 2, 2, 3, 3, 3, 4, 4, 5))
  }

  test("test-union: normal union") {
    val r = flow(1, 2, 3).union(flow(2, 3, 4), flow(3, 4, 5)).dump().toSet
    assert(r == Set(1, 2, 3, 4, 5))
  }

  test("test-union-multiset: normal union multiset") {
    val r = flow(1, 2, 3).unionMultiset(flow(2, 3, 4), flow(3, 4, 5)).dump().sorted
    assert(r == Seq(1, 2, 2, 3, 3, 3, 4, 4, 5))
  }

  test("test-intersection: normal intersection") {
    val r = flow(1, 2, 3, 3).intersection(flow(3, 2, 3, 4, 3), flow(3, 4, 3, 5, 2))
      .dump().sorted
    assert(r == Seq(2, 3))
  }

  test("test-intersection-multiset: normal intersection multiset") {
    // min multiplicity across the three bags: 2→1, 3→2
    val r = flow(1, 2, 3, 3).intersectionMultiset(flow(3, 2, 3, 4, 3), flow(3, 4, 3, 5, 2))
      .dump().sorted
    assert(r == Seq(2, 3, 3))
  }

  test("test-difference: normal difference") {
    val r = flow(1, 2, 3, 3, 3, 4, 5).difference(flow(1, 2), flow(4, 5)).dump().sorted
    assert(r == Seq(3))
  }

  test("test-difference-multiset: normal difference multiset") {
    // multiplicity of 3: 3 − 1 − 1 = 1
    val r = flow(1, 2, 3, 3, 3, 4, 5).differenceMultiset(flow(1, 2, 3), flow(3, 4, 5))
      .dump().sorted
    assert(r == Seq(3))
  }
}
