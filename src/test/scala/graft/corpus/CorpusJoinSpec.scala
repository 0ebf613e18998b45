package graft.corpus

import graft.SparkTestSession
import graft.core.{Flow, Fold, JoinKind}
import org.scalatest.funsuite.AnyFunSuite

/** Test-for-test port of the reference's functional join corpus
  * (pigpen-core/src/test/clojure/pigpen/functional/join_test.clj, 711 LoC).
  * Each test name carries the reference deftest name; CORPUS.md maps the
  * full corpus. Reference maps `{:k K :v N}` ride as tuples with Option
  * keys (nil ⇒ None); bags compare as sorted Seqs (the reference compares
  * sets — relations are unordered).
  */
class CorpusJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def flow[T: org.apache.spark.sql.Encoder](xs: T*): Flow[T] =
    Flow.of(spark)(xs)

  // join_test.clj:228-242 — join-data1 / join-data2
  private def joinData1 = flow[(Option[String], Int)](
    (None, 1), (None, 3), (Some("i"), 5), (Some("i"), 7), (Some("l"), 9), (Some("l"), 11))
  private def joinData2 = flow[(Option[String], Int)](
    (None, 2), (None, 4), (Some("i"), 6), (Some("i"), 8), (Some("r"), 10), (Some("r"), 12))

  // join_test.clj:102-107 — fold-data
  private def foldData = flow(("foo", 1), ("foo", 2), ("foo", 3), ("bar", 4), ("bar", 5))

  // ---- group / into / reduce (join_test.clj:25-100) ----

  test("test-group-by: normal group-by") {
    val r = flow((1, 2), (1, 3), (2, 4)).groupBy(_._1)
      .bags.map(p => (p._1, p._2.map(_._2).sorted)).dump()
    assert(r.toSet == Set((1, Seq(2, 3)), (2, Seq(4))))
  }

  test("test-group-false: false & nil aren't conflated as group keys") {
    val r = flow[Option[Boolean]](None, Some(true), Some(false))
      .groupBy(identity).bags.map(p => (p._1, p._2.size)).dump()
    assert(r.toSet == Set((None: Option[Boolean], 1), (Some(true), 1), (Some(false), 1)))
  }

  test("test-into: normal into") {
    assert(flow(2, 4, 6).intoSeq.dump() == Seq(Vector(2, 4, 6)))
  }

  test("test-into-empty: empty seq returns nothing") {
    assert(flow[Int]().intoSeq.dump().isEmpty)
  }

  test("test-reduce-conj: reduce into vector with conj") {
    assert(flow(2, 4, 6).foldAll(Fold.vec[Int]).dump() == Seq(Vector(2, 4, 6)))
  }

  test("test-reduce-+: reduce with +") {
    assert(flow(2, 4, 6).reduce(_ + _).dump() == Seq(12))
  }

  test("test-reduce-empty: reduce empty seq returns nothing") {
    assert(flow[Int]().reduce(_ + _).dump().isEmpty)
  }

  // ---- folds in group/cogroup (join_test.clj:109-226) ----

  test("test-fold-inline-sum: fold sum defined inline") {
    val r = foldData.groupBy(_._1).fold(Fold.sum[Int].premap[(String, Int)](_._2)).dump()
    assert(r.toSet == Set(("foo", 6), ("bar", 9)))
  }

  test("test-fold-inline-count: fold count defined inline") {
    val inline = Fold[(String, Int), Long, Long](() => 0L, (b, _) => b + 1, _ + _, identity)
    val r = foldData.groupBy(_._1).fold(inline).dump()
    assert(r.toSet == Set(("foo", 3L), ("bar", 2L)))
  }

  test("test-fold-count: fold/count from the library") {
    val r = foldData.groupBy(_._1).fold(Fold.count[(String, Int)]).dump()
    assert(r.toSet == Set(("foo", 3L), ("bar", 2L)))
  }

  test("test-fold-cogroup-single: single fold co-group (other side stays a bag)") {
    val data0 = flow(("foo", 1), ("foo", 2), ("foo", 3), ("bar", 4), ("bar", 5))
    val data1 = flow(("foo", 1), ("foo", 2), ("bar", 3), ("bar", 4), ("bar", 5))
    val r = data0.cogroupFold(data1)(_._1)(_._1)(
        Fold.sum[Int].premap[(String, Int)](_._2),
        Fold.vec[Int].premap[(String, Int)](_._2).andThen(_.sorted))
      .map(p => (p._1, p._2.get, p._3.get)).dump()
    assert(r.toSet == Set(("foo", 6, Vector(1, 2)), ("bar", 9, Vector(3, 4, 5))))
  }

  test("test-fold-cogroup-dual: dual fold co-group") {
    val data0 = flow(("foo", 1), ("foo", 2), ("foo", 3), ("bar", 4), ("bar", 5))
    val data1 = flow(("foo", 1), ("foo", 2), ("bar", 3), ("bar", 4), ("bar", 5))
    val r = data0.cogroupFold(data1)(_._1)(_._1)(
        Fold.sum[Int].premap[(String, Int)](_._2),
        Fold.sum[Int].premap[(String, Int)](_._2))
      .map(p => (p._1, p._2.get, p._3.get)).dump()
    assert(r.toSet == Set(("foo", 6, 3), ("bar", 9, 12)))
  }

  test("test-fold-all-sum: fold all records with sum") {
    assert(flow(1, 2, 3, 4).foldAll(Fold.sum[Int]).dump() == Seq(10))
  }

  test("test-fold-all-count: fold all records with count") {
    assert(flow(1, 2, 3, 4).foldAll(Fold.count[Int]).dump() == Seq(4L))
  }

  test("test-fold-all-empty: fold all records, no input, returns nothing") {
    assert(flow[Int]().foldAll(Fold.count[Int]).dump().isEmpty)
  }

  // ---- cogroup shape matrix (join_test.clj:244-359) ----

  private def cg(leftReq: Boolean, rightReq: Boolean, nils: Boolean) =
    joinData1.cogroupWith(joinData2, leftReq, rightReq, nils)(_._1)(_._1) {
      (k, ls, rs) => Iterator((k, ls.map(_._2).sorted, rs.map(_._2).sorted))
    }.dump().toSet

  test("test-cogroup-inner: inner cogroup drops nil keys") {
    assert(cg(leftReq = true, rightReq = true, nils = false) ==
      Set((Some("i"), Seq(5, 7), Seq(6, 8))))
  }

  test("test-cogroup-left-outer: left's nil bag surfaces alone") {
    assert(cg(leftReq = true, rightReq = false, nils = false) == Set(
      (None, Seq(1, 3), Seq()),
      (Some("i"), Seq(5, 7), Seq(6, 8)),
      (Some("l"), Seq(9, 11), Seq())))
  }

  test("test-cogroup-right-outer") {
    assert(cg(leftReq = false, rightReq = true, nils = false) == Set(
      (None, Seq(), Seq(2, 4)),
      (Some("i"), Seq(5, 7), Seq(6, 8)),
      (Some("r"), Seq(), Seq(10, 12))))
  }

  test("test-cogroup-full-outer: each side's nil bag is its own row") {
    assert(cg(leftReq = false, rightReq = false, nils = false) == Set(
      (None, Seq(1, 3), Seq()),
      (None, Seq(), Seq(2, 4)),
      (Some("i"), Seq(5, 7), Seq(6, 8)),
      (Some("l"), Seq(9, 11), Seq()),
      (Some("r"), Seq(), Seq(10, 12))))
  }

  test("test-cogroup-inner-join-nils: nil bags meet") {
    assert(cg(leftReq = true, rightReq = true, nils = true) == Set(
      (None, Seq(1, 3), Seq(2, 4)),
      (Some("i"), Seq(5, 7), Seq(6, 8))))
  }

  test("test-cogroup-left-outer-join-nils") {
    assert(cg(leftReq = true, rightReq = false, nils = true) == Set(
      (None, Seq(1, 3), Seq(2, 4)),
      (Some("i"), Seq(5, 7), Seq(6, 8)),
      (Some("l"), Seq(9, 11), Seq())))
  }

  test("test-cogroup-right-outer-join-nils") {
    assert(cg(leftReq = false, rightReq = true, nils = true) == Set(
      (None, Seq(1, 3), Seq(2, 4)),
      (Some("i"), Seq(5, 7), Seq(6, 8)),
      (Some("r"), Seq(), Seq(10, 12))))
  }

  test("test-cogroup-full-outer-join-nils") {
    assert(cg(leftReq = false, rightReq = false, nils = true) == Set(
      (None, Seq(1, 3), Seq(2, 4)),
      (Some("i"), Seq(5, 7), Seq(6, 8)),
      (Some("l"), Seq(9, 11), Seq()),
      (Some("r"), Seq(), Seq(10, 12))))
  }

  test("test-cogroup-self-join") {
    val data = flow(0, 1, 2)
    val r = data.cogroupWith(data)(identity)(identity) {
      (k, ls, rs) => Iterator((k, ls.sorted, rs.sorted))
    }.dump()
    assert(r.toSet == Set((0, Seq(0), Seq(0)), (1, Seq(1), Seq(1)), (2, Seq(2), Seq(2))))
  }

  test("test-cogroup-self-join+fold: both sides folded") {
    val data = flow(0, 1, 2)
    val r = data.cogroupFold(data)(identity)(identity)(Fold.count[Int], Fold.count[Int])
      .map(p => (p._1, p._2.get, p._3.get)).dump()
    assert(r.toSet == Set((0, 1L, 1L), (1, 1L, 1L), (2, 1L, 1L)))
  }

  test("test-cogroup-self-join+left-fold: one fold, one bag") {
    val data = flow(0, 1, 2)
    val r = data.cogroupFold(data)(identity)(identity)(Fold.count[Int], Fold.vec[Int])
      .map(p => (p._1, p._2.get, p._3.get)).dump()
    assert(r.toSet == Set((0, 1L, Vector(0)), (1, 1L, Vector(1)), (2, 1L, Vector(2))))
  }

  test("test-cogroup-self-join+right-fold: one bag, one fold") {
    val data = flow(0, 1, 2)
    val r = data.cogroupFold(data)(identity)(identity)(Fold.vec[Int], Fold.count[Int])
      .map(p => (p._1, p._2.get, p._3.get)).dump()
    assert(r.toSet == Set((0, Vector(0), 1L), (1, Vector(1), 1L), (2, Vector(2), 1L)))
  }

  // ---- join shape matrix (join_test.clj:421-625) ----

  private def jw(kind: JoinKind, nils: Boolean) =
    joinData1.joinWith(joinData2, kind, joinNils = nils)(_._1)(_._1)
      .map(p => (p._1.map(_._2), p._2.map(_._2))).dump().toSet

  private val innerPairs: Set[(Option[Int], Option[Int])] = Set(
    (Some(5), Some(6)), (Some(5), Some(8)), (Some(7), Some(6)), (Some(7), Some(8)))
  private val nilPairs: Set[(Option[Int], Option[Int])] = Set(
    (Some(1), Some(2)), (Some(1), Some(4)), (Some(3), Some(2)), (Some(3), Some(4)))
  private val leftMisses: Set[(Option[Int], Option[Int])] = Set(
    (Some(9), None), (Some(11), None))
  private val leftNilMisses: Set[(Option[Int], Option[Int])] = Set(
    (Some(1), None), (Some(3), None))
  private val rightMisses: Set[(Option[Int], Option[Int])] = Set(
    (None, Some(10)), (None, Some(12)))
  private val rightNilMisses: Set[(Option[Int], Option[Int])] = Set(
    (None, Some(2)), (None, Some(4)))

  test("test-join-inner-implicit: inner join, implicit :required") {
    val r = joinData1.join(joinData2)(_._1)(_._1)((l, rr) => (l._2, rr._2)).dump()
    assert(r.toSet == innerPairs.map(p => (p._1.get, p._2.get)))
  }

  test("test-join-inner") {
    assert(jw(JoinKind.Inner, nils = false) == innerPairs)
  }

  test("test-join-left-outer") {
    assert(jw(JoinKind.Left, nils = false) == innerPairs ++ leftMisses ++ leftNilMisses)
  }

  test("test-join-right-outer") {
    assert(jw(JoinKind.Right, nils = false) == innerPairs ++ rightMisses ++ rightNilMisses)
  }

  test("test-join-full-outer") {
    assert(jw(JoinKind.Full, nils = false) ==
      innerPairs ++ leftMisses ++ leftNilMisses ++ rightMisses ++ rightNilMisses)
  }

  test("test-join-inner-join-nils") {
    assert(jw(JoinKind.Inner, nils = true) == innerPairs ++ nilPairs)
  }

  test("test-join-left-outer-join-nils") {
    assert(jw(JoinKind.Left, nils = true) == innerPairs ++ nilPairs ++ leftMisses)
  }

  test("test-join-right-outer-join-nils") {
    assert(jw(JoinKind.Right, nils = true) == innerPairs ++ nilPairs ++ rightMisses)
  }

  test("test-join-full-outer-join-nils") {
    assert(jw(JoinKind.Full, nils = true) ==
      innerPairs ++ nilPairs ++ leftMisses ++ rightMisses)
  }

  test("test-join-self-join") {
    val data = flow(0, 1, 2)
    val r = data.join(data)(identity)(identity)((a, b) => (a, b)).dump()
    assert(r.toSet == Set((0, 0), (1, 1), (2, 2)))
  }

  test("test-join-default-key-selector: key-selector defaults to identity") {
    val r = flow(1, 2).join(flow(2, 3))(identity)(identity)((a, b) => (a, b)).dump()
    assert(r.toSet == Set((2, 2)))
  }

  // ---- filter-by / remove-by (join_test.clj:627-711) ----

  test("test-filter-by") {
    val keys = flow[Option[String]](Some("i"))
    val r = joinData1.filterBy(keys)(_._1).map(_._2).dump()
    assert(r.toSet == Set(5, 7))
  }

  test("test-filter-by-nil-keys: nil in keys keeps nil-key rows") {
    val keys = flow[Option[String]](Some("i"), None)
    val r = joinData1.filterBy(keys)(_._1).map(_._2).dump()
    assert(r.toSet == Set(1, 3, 5, 7))
  }

  test("test-filter-by-duplicate-keys: duplicate keys duplicate rows") {
    val keys = flow[Option[String]](Some("i"), Some("i"))
    val r = joinData1.filterBy(keys)(_._1).map(_._2).dump()
    assert(r.sorted == Seq(5, 5, 7, 7))
  }

  test("test-remove-by") {
    val keys = flow[Option[String]](Some("i"))
    val r = joinData1.removeBy(keys)(_._1).map(_._2).dump()
    assert(r.toSet == Set(1, 3, 9, 11))
  }

  test("test-remove-by-nil-keys: nil in keys removes nil-key rows") {
    val keys = flow[Option[String]](Some("i"), None)
    val r = joinData1.removeBy(keys)(_._1).map(_._2).dump()
    assert(r.toSet == Set(9, 11))
  }

  test("test-remove-by-duplicate-keys: multiplicity of keys is irrelevant") {
    val keys = flow[Option[String]](Some("i"), Some("i"))
    val r = joinData1.removeBy(keys)(_._1).map(_._2).dump()
    assert(r.toSet == Set(1, 3, 9, 11))
  }
}
