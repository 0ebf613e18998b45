package graft.core

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Fold library semantics (reference pigpen/fold.clj, SURVEY.md §2.5) +
  * algebra laws checked property-style over seeded random inputs: every
  * fold's merge must be associative and commutative with zero as identity,
  * or distributed partial aggregation would be order-dependent.
  */
class FoldSpec extends AnyFunSuite {

  /** Deterministic property driver (scalacheck-style, offline-friendly). */
  private def forAllLists(body: (List[Int], List[Int], List[Int]) => Unit): Unit = {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 100) {
      def list() = List.fill(rnd.nextInt(20))(rnd.nextInt(100) - 50)
      body(list(), list(), list())
    }
  }
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def flow[T: org.apache.spark.sql.Encoder](xs: T*): Flow[T] =
    Flow.of(spark)(xs)

  test("count includes every record") {
    val r = flow("a" -> 1, "a" -> 2, "b" -> 3).groupBy(_._1)
      .fold(Fold.count[(String, Int)]).dump()
    assert(r.toSet == Set("a" -> 2L, "b" -> 1L))
  }

  test("sum/avg/min/max per group") {
    val data = flow("a" -> 1, "a" -> 3, "b" -> 10)
    val sums = data.groupBy(_._1).fold(Fold.sum[Int].premap[(String, Int)](_._2)).dump()
    assert(sums.toSet == Set("a" -> 4, "b" -> 10))
    val avgs = data.groupBy(_._1).fold(Fold.avg[Int].premap[(String, Int)](_._2)).dump()
    assert(avgs.toSet == Set("a" -> Some(2.0), "b" -> Some(10.0)))
    val mins = data.groupBy(_._1)
      .fold(Fold.min[Int].premap[(String, Int)](_._2)).dump()
    assert(mins.toSet == Set("a" -> Some(1), "b" -> Some(10)))
  }

  test("minBy/maxBy return the argmin/argmax record") {
    val data = flow(("a", 1, "x"), ("a", 3, "y"), ("a", 2, "z"))
    val r = data.groupBy(_._1).fold(Fold.maxBy[(String, Int, String), Int](_._2)).dump()
    assert(r == Seq("a" -> Some(("a", 3, "y"))))
  }

  test("vec collects; distinct collects a set") {
    val data = flow("a" -> 1, "a" -> 1, "a" -> 2)
    val vecs = data.groupBy(_._1).fold(Fold.vec[(String, Int)].andThen(_.map(_._2).sorted)).dump()
    assert(vecs == Seq("a" -> Vector(1, 1, 2)))
    val sets = data.groupBy(_._1)
      .fold(Fold.distinct[(String, Int)].andThen(s => s.map(_._2).toVector.sorted)).dump()
    assert(sets == Seq("a" -> Vector(1, 2)))
  }

  test("topBy keeps the n largest by key with bounded state") {
    val data = flow((1 to 1000).map(i => "g" -> i): _*)
    val r = data.groupBy(_._1).fold(Fold.topBy[(String, Int), Int](3)(_._2)).dump()
    assert(r.head._2.map(_._2) == Vector(1000, 999, 998))
  }

  test("first/last after sort are head/tail") {
    val sorted = flow(3, 1, 2).sortBy(identity)
    assert(sorted.foldAll(Fold.first[Int]).dump() == Seq(Some(1)))
  }

  test("juxt runs two folds over one pass") {
    val r = flow(1, 2, 3, 4).foldAll(Fold.juxt(Fold.count[Int], Fold.sum[Int])).dump()
    assert(r == Seq((4L, 10)))
  }

  test("prefilter/premapcat/prekeep stages") {
    val f = Fold.sum[Int].prefilter(_ % 2 == 0)
    assert(flow(1, 2, 3, 4).foldAll(f).dump() == Seq(6))
    val g = Fold.count[Int].premapcat[String](s => s.map(_.toInt))
    assert(flow("ab", "c").foldAll(g).dump() == Seq(3L))
    val h = Fold.sum[Int].prekeep[String](s => if (s.isEmpty) None else Some(s.length))
    assert(flow("ab", "", "c").foldAll(h).dump() == Seq(3))
  }

  test("avg of empty group is None (reference: nil, not 0)") {
    assert(Fold.avg[Int].foldLocal(Nil) == None)
    assert(Fold.min[Int].foldLocal(Nil) == None)
  }

  // ---- algebra laws (ScalaCheck) ----

  private def lawfulOn[B](f: Fold[Int, B, _], xs: List[Int], ys: List[Int], zs: List[Int]): Unit = {
    val (a, b, c) = (
      xs.foldLeft(f.zero())(f.reduce),
      ys.foldLeft(f.zero())(f.reduce),
      zs.foldLeft(f.zero())(f.reduce))
    // merge associative + commutative, zero is identity
    assert(f.finish(f.merge(f.merge(a, b), c)) == f.finish(f.merge(a, f.merge(b, c))))
    val (a2, b2) = (
      xs.foldLeft(f.zero())(f.reduce),
      ys.foldLeft(f.zero())(f.reduce))
    assert(f.finish(f.merge(a2, b2)) == f.finish(f.merge(b2, a2)))
    val a3 = xs.foldLeft(f.zero())(f.reduce)
    assert(f.finish(f.merge(a3, f.zero())) == f.finish(a3))
  }

  test("law: merge is associative/commutative with zero identity (count, sum, min, distinct, top)") {
    forAllLists { (xs, ys, zs) =>
      lawfulOn(Fold.count[Int], xs, ys, zs)
      lawfulOn(Fold.sum[Int], xs, ys, zs)
      lawfulOn(Fold.min[Int], xs, ys, zs)
      lawfulOn(Fold.distinct[Int], xs, ys, zs)
      lawfulOn(Fold.top[Int](3), xs, ys, zs)
    }
  }

  test("law: partition-split invariance — foldLocal == split-and-merge (juxt, avg)") {
    forAllLists { (xs, ys, _) =>
      val k = if (xs.isEmpty) 0 else math.abs(ys.length) % (xs.size + 1)
      val (l, r) = xs.splitAt(k)
      val f = Fold.juxt(Fold.sum[Int], Fold.count[Int])
      assert(f.finish(f.merge(
        l.foldLeft(f.zero())(f.reduce), r.foldLeft(f.zero())(f.reduce))) == f.foldLocal(xs))
      val g = Fold.avg[Int]
      assert(g.finish(g.merge(
        l.foldLeft(g.zero())(g.reduce), r.foldLeft(g.zero())(g.reduce))) == g.foldLocal(xs))
    }
  }
}
