package graft.corpus

import graft.SparkTestSession
import graft.core.Flow
import org.scalatest.funsuite.AnyFunSuite

/** Test-for-test port of the reference's functional filter corpus
  * (pigpen-core/src/test/clojure/pigpen/functional/filter_test.clj, 64 LoC).
  * Each test name carries the reference deftest name; CORPUS.md maps the
  * full corpus.
  */
class CorpusFilterSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def flow[T: org.apache.spark.sql.Encoder](xs: T*): Flow[T] =
    Flow.of(spark)(xs)

  test("test-filter: normal filter") {
    assert(flow(1, 2).filter(_ % 2 == 1).dump() == Seq(1))
  }

  test("test-remove: normal remove") {
    assert(flow(1, 2).remove(_ % 2 == 1).dump() == Seq(2))
  }

  test("test-take: normal take") {
    val r = flow(0 until 10: _*).take(5).dump()
    assert(r.sorted == Seq(0, 1, 2, 3, 4))
  }

  test("test-sample: normal sample") {
    // reference: 1000 rows at p=0.5, expects (400, 600) exclusive
    val n = flow(Seq.fill(1000)((1, 2)): _*).sample(0.5).dump().size
    assert(n > 400 && n < 600)
  }
}
