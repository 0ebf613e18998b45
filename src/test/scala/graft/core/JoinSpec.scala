package graft.core

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** The nil-semantics matrix and join shapes, ported from the reference's
  * functional/join_test.clj (711 LoC corpus — SURVEY.md §5.4, §7.4.1):
  * nil keys don't match by default, {:join-nils true} matches them,
  * filter-by duplicates output per duplicate key, remove-by keeps nil-key
  * rows unless nil ∈ keys, and false/nil are distinct group keys.
  */
class JoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def flow[T: org.apache.spark.sql.Encoder](xs: T*): Flow[T] =
    Flow.of(spark)(xs)

  // join-data1/join-data2 shape (FIXTURES.md §1): {:k K :v N}, K nullable
  private val left = flow[(Option[String], Int)](
    (None, 1), (Some("i"), 3), (Some("l"), 5))
  private val right = flow[(Option[String], Int)](
    (None, 2), (Some("i"), 4), (Some("r"), 6))

  test("inner join: nil keys do NOT match by default") {
    val r = left.join(right)(_._1)(_._1)((l, rr) => (l._2, rr._2)).dump()
    assert(r.toSet == Set((3, 4)))
  }

  test("inner join with joinNils: nil keys match (reference {:join-nils true})") {
    val r = left.joinWith(right, JoinKind.Inner, joinNils = true)(_._1)(_._1)
      .map(p => (p._1.get._2, p._2.get._2)).dump()
    assert(r.toSet == Set((1, 2), (3, 4)))
  }

  test("left outer join surfaces misses as None; nil-key left rows are kept unmatched") {
    val r = left.joinWith(right, JoinKind.Left)(_._1)(_._1)
      .map(p => (p._1.get._2, p._2.map(_._2))).dump()
    assert(r.toSet == Set((1, None), (3, Some(4)), (5, None)))
  }

  test("right outer join") {
    val r = left.joinWith(right, JoinKind.Right)(_._1)(_._1)
      .map(p => (p._1.map(_._2), p._2.get._2)).dump()
    assert(r.toSet == Set((None, 2), (Some(3), 4), (None, 6)))
  }

  test("full outer join") {
    val r = left.joinWith(right, JoinKind.Full)(_._1)(_._1)
      .map(p => (p._1.map(_._2), p._2.map(_._2))).dump()
    assert(r.toSet == Set(
      (Some(1), None), (Some(3), Some(4)), (Some(5), None),
      (None, Some(2)), (None, Some(6))))
  }

  test("full outer with joinNils pairs the nil keys") {
    val r = left.joinWith(right, JoinKind.Full, joinNils = true)(_._1)(_._1)
      .map(p => (p._1.map(_._2), p._2.map(_._2))).dump()
    assert(r.toSet == Set(
      (Some(1), Some(2)), (Some(3), Some(4)), (Some(5), None), (None, Some(6))))
  }

  test("self-join (same flow both sides) works without ambiguity") {
    val xs = flow(1, 2, 3)
    val r = xs.join(xs)(identity)(identity)((a, b) => (a, b)).dump()
    assert(r.toSet == Set((1, 1), (2, 2), (3, 3)))
  }

  test("join produces the per-key cross product") {
    val a = flow("k" -> 1, "k" -> 2)
    val b = flow("k" -> 10, "k" -> 20)
    val r = a.join(b)(_._1)(_._1)((l, rr) => (l._2, rr._2)).dump()
    assert(r.toSet == Set((1, 10), (1, 20), (2, 10), (2, 20)))
  }

  // reference functional/join_test.clj:655-667: duplicate keys duplicate rows
  test("filterBy preserves duplicate keys (NOT left_semi)") {
    val data = flow("i" -> 1, "j" -> 2, "k" -> 3)
    val keys = flow("i", "i", "k")
    val r = data.filterBy(keys)(_._1).dump()
    assert(r.sorted == Seq("i" -> 1, "i" -> 1, "k" -> 3))
  }

  test("filterBy: nil keys pass iff nil in keys") {
    val data = flow[(Option[String], Int)]((None, 1), (Some("i"), 2))
    assert(data.filterBy(flow[Option[String]](Some("i")))(_._1).dump() == Seq(Some("i") -> 2))
    assert(data.filterBy(flow[Option[String]](None, Some("i")))(_._1).dump().toSet ==
      Set((None, 1), (Some("i"), 2)))
  }

  test("removeBy: anti-join; nil-key rows kept unless nil in keys") {
    val data = flow[(Option[String], Int)]((None, 1), (Some("i"), 2), (Some("j"), 3))
    assert(data.removeBy(flow[Option[String]](Some("i")))(_._1).dump().toSet ==
      Set((None, 1), (Some("j"), 3)))
    assert(data.removeBy(flow[Option[String]](None, Some("i")))(_._1).dump().toSet ==
      Set((Some("j") -> 3)))
    // duplicate keys in `keys` don't duplicate (or double-remove) output
    assert(data.removeBy(flow[Option[String]](Some("i"), Some("i")))(_._1).dump().toSet ==
      Set((None, 1), (Some("j"), 3)))
  }

  // reference functional/join_test.clj:39-49 "false & nil aren't conflated"
  test("groupBy: false and nil remain distinct keys") {
    val data = flow[(Option[Boolean], Int)](
      (None, 1), (Some(false), 2), (Some(true), 3), (Some(false), 4))
    val r = data.groupBy(_._1).fold(Fold.count[(Option[Boolean], Int)]).dump()
    assert(r.toSet == Set(
      (None, 1L), (Some(false), 2L), (Some(true), 1L)))
  }

  test("cogroup streams both bags per key, including one-sided keys") {
    val a = flow("x" -> 1, "x" -> 2, "y" -> 3)
    val b = flow("y" -> 10, "z" -> 20)
    val r = a.cogroup(b)(_._1)(_._1)((k, as, bs) =>
      Iterator.single((k, as.map(_._2).toSeq.sorted, bs.map(_._2).toSeq.sorted))).dump()
    assert(r.toSet == Set(
      ("x", Seq(1, 2), Seq()), ("y", Seq(3), Seq(10)), ("z", Seq(), Seq(20))))
  }

  test("cogroup3: one-shuffle 3-way cogroup covers keys present in any input") {
    val a = flow("x" -> 1, "y" -> 2)
    val b = flow("y" -> 10, "z" -> 20, "z" -> 21)
    val c = flow("w" -> 100, "x" -> 101)
    val r = a.cogroup3(b, c)(_._1)(_._1)(_._1)((k, as, bs, cs) =>
      Iterator.single((k, as.map(_._2).sorted, bs.map(_._2).sorted, cs.map(_._2).sorted))).dump()
    assert(r.toSet == Set(
      ("x", Seq(1), Seq(), Seq(101)),
      ("y", Seq(2), Seq(10), Seq()),
      ("z", Seq(), Seq(20, 21), Seq()),
      ("w", Seq(), Seq(), Seq(100))))
  }

  test("cogroup3 with heterogeneous types") {
    val a = flow(1 -> "a")
    val b = Flow.of[(Int, Double)](spark)(Seq(1 -> 1.5, 2 -> 2.5))
    val c = Flow.of[(Int, Boolean)](spark)(Seq(2 -> true))
    val r = a.cogroup3(b, c)(_._1)(_._1)(_._1)((k, as, bs, cs) =>
      Iterator.single((k, as.size, bs.size, cs.size))).dump()
    assert(r.toSet == Set((1, 1, 1, 0), (2, 0, 1, 1)))
  }

  test("cogroupN: arbitrary arity, one shuffle, empty bags for missing keys") {
    val a = flow("x" -> 1, "y" -> 2)
    val b = flow("y" -> 10, "z" -> 20)
    val c = flow("x" -> 100)
    val d4 = flow("w" -> 7, "x" -> 8)
    val e5 = flow("x" -> 1000)
    val r = Flow.cogroupN[String, (String, Int, Int, Int, Int, Int)](Seq(
        Flow.in(a)(_._1), Flow.in(b)(_._1), Flow.in(c)(_._1),
        Flow.in(d4)(_._1), Flow.in(e5)(_._1))) { (k, bags) =>
      Iterator.single((k, bags(0).size, bags(1).size, bags(2).size, bags(3).size, bags(4).size))
    }
    assert(r.dump().toSet == Set(
      ("x", 1, 0, 1, 1, 1),
      ("y", 1, 1, 0, 0, 0),
      ("z", 0, 1, 0, 0, 0),
      ("w", 0, 0, 0, 1, 0)))
    // one-shuffle claim: exactly one Exchange in the (final) physical plan
    // (AdaptiveSparkPlan.toString appends an "Initial Plan" copy — cut it)
    val plan = r.ds.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"expected a single shuffle:\n$plan")
  }

  test("cogroupNFold: N-way per-input folds, one shuffle, partial aggregation, no bags") {
    val a = flow("x" -> 1L, "x" -> 2L, "y" -> 3L)
    val b = flow("y" -> 10L, "z" -> 20L, "z" -> 22L)
    val c = flow("x" -> 5L)
    val r = Flow.cogroupNFold[String, (String, Option[Long], Option[Long], Option[Vector[Long]])](Seq(
        Flow.inFold(a)(_._1)(Fold.sum[Long].premap[(String, Long)](_._2)),
        Flow.inFold(b)(_._1)(Fold.count[(String, Long)]),
        // a bag-shaped select is Fold.vec — mixing composes
        Flow.inFold(c)(_._1)(Fold.vec[Long].premap[(String, Long)](_._2)))) { (k, rs) =>
      Iterator.single((k,
        rs(0).map(_.asInstanceOf[Long]),
        rs(1).map(_.asInstanceOf[Long]),
        rs(2).map(_.asInstanceOf[Vector[Long]])))
    }
    assert(r.dump().toSet == Set(
      ("x", Some(3L), None, Some(Vector(5L))),
      ("y", Some(3L), Some(1L), None),
      ("z", None, Some(2L), None)))
    val plan = r.ds.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"expected a single shuffle:\n$plan")
    // buffers must combine map-side: a partial aggregate below the shuffle
    assert(plan.contains("Aggregate") && plan.toLowerCase.contains("partial"),
      s"expected partial (map-side) aggregation:\n$plan")
  }

  test("cogroupNFold == cogroupN-with-bags folded locally (random data)") {
    val rnd = new scala.util.Random(17)
    val a = flow((0 until 200).map(_ => (s"k${rnd.nextInt(10)}", rnd.nextLong(100))): _*)
    val b = flow((0 until 150).map(_ => (s"k${rnd.nextInt(12)}", rnd.nextLong(100))): _*)
    val sumF = Fold.sum[Long].premap[(String, Long)](_._2)
    val cntF = Fold.count[(String, Long)]
    val got = Flow.cogroupNFold[String, (String, Option[Long], Option[Long])](Seq(
        Flow.inFold(a)(_._1)(sumF), Flow.inFold(b)(_._1)(cntF))) { (k, rs) =>
      Iterator.single((k, rs(0).map(_.asInstanceOf[Long]), rs(1).map(_.asInstanceOf[Long])))
    }.dump().toSet
    val want = Flow.cogroupN[String, (String, Option[Long], Option[Long])](Seq(
        Flow.in(a)(_._1), Flow.in(b)(_._1))) { (k, bags) =>
      Iterator.single((k,
        if (bags(0).isEmpty) None else Some(sumF.foldLocal(bags(0).asInstanceOf[Seq[(String, Long)]])),
        if (bags(1).isEmpty) None else Some(cntF.foldLocal(bags(1).asInstanceOf[Seq[(String, Long)]]))))
    }.dump().toSet
    assert(got == want)
  }

  test("cogroupFold pre-aggregates each input; outer keys surface None") {
    val a = flow("x" -> 1L, "x" -> 2L, "y" -> 3L)
    val b = flow("y" -> 10L, "z" -> 20L)
    val r = a.cogroupFold(b)(_._1)(_._1)(
      Fold.sum[Long].premap[(String, Long)](_._2),
      Fold.count[(String, Long)]).dump()
    assert(r.toSet == Set(
      ("x", Some(3L), None),
      ("y", Some(3L), Some(1L)),
      ("z", None, Some(1L))))
  }

  test("groupBy.bags materializes (key, bag)") {
    val r = flow("a" -> 1, "a" -> 2, "b" -> 3).groupBy(_._1)
      .bags.map { case (k, vs) => (k, vs.map(_._2).sorted) }.dump()
    assert(r.toSet == Set(("a", Seq(1, 2)), ("b", Seq(3))))
  }
}
