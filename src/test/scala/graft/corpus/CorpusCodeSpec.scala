package graft.corpus

import graft.SparkTestSession
import graft.core.Flow
import org.scalatest.funsuite.AnyFunSuite

/** Test-for-test port of the reference's functional code corpus
  * (pigpen-core/src/test/clojure/pigpen/functional/code_test.clj, 55 LoC):
  * user code and its closed-over environment must serialize into the job.
  * The reference stresses Clojure closure capture; the Scala analog is
  * lambda + enclosing-scope capture through Dataset encoders/closures.
  * CORPUS.md maps the full corpus.
  */
/** User code lives outside the test class: a method on the suite would drag
  * `this` (and scalatest's unserializable Engine) into the closure — the
  * Scala spelling of the hidden-state hazard the reference corpus guards
  * against.
  */
object CorpusCodeSpec {
  // top-level fn referenced from inside a closure (reference test-fn)
  def testFn(x: Int): Int = x * x

  // fn taking a parameter plus a let-bound local, both captured
  // (reference test-param: y from the arg list, z from a let)
  def testParam(y: Int, data: Flow[Int]): Flow[Int] = {
    implicit val e = org.apache.spark.sql.Encoders.scalaInt
    val z = 42
    data.map(x => testFn(x) + y + z)
  }
}

class CorpusCodeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def flow[T: org.apache.spark.sql.Encoder](xs: T*): Flow[T] =
    Flow.of(spark)(xs)

  test("test-closure: fns and their environment serialize into the job") {
    val r = CorpusCodeSpec.testParam(37, flow(1, 2, 3)).dump()
    assert(r.sorted == Seq(80, 83, 88))
  }

  test("test-for: comprehension-built flows carry no unserializable hidden state") {
    val flows = for (x <- Seq(1, 2, 3)) yield flow(1, 2, 3).map(y => x + y)
    val r = flows.head.concat(flows.tail: _*).dump()
    assert(r.sorted == Seq(2, 3, 3, 4, 4, 4, 5, 5, 6))
  }
}
