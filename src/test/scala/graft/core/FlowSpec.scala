package graft.core

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Map/filter/set-op semantics ported from the reference functional corpus
  * (pigpen functional/{map,filter,set}_test.clj — see FIXTURES.md §1).
  * Comparisons are set/multiset-based: relations are unordered bags.
  */
class FlowSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def flow[T: org.apache.spark.sql.Encoder](xs: T*): Flow[T] =
    Flow.of(spark)(xs)

  test("map is 1->1") {
    assert(flow(1, 2, 3, 4).map(_ * 2).dump().sorted == Seq(2, 4, 6, 8))
  }

  test("mapcat is 1->N") {
    assert(flow(1, 2).mapcat(x => Seq(x, x + 10)).dump().sorted == Seq(1, 2, 11, 12))
  }

  test("filter and remove partition the bag") {
    val f = flow(1, 2, 3, 4, 5, 6)
    assert(f.filter(_ % 2 == 0).dump().sorted == Seq(2, 4, 6))
    assert(f.remove(_ % 2 == 0).dump().sorted == Seq(1, 3, 5))
  }

  test("take limits") {
    assert(flow(1, 2, 3, 4, 5).take(2).dump().size == 2)
  }

  test("sample is approximate but bounded") {
    val n = flow(1 to 1000: _*).sample(0.5).dump().size
    assert(n > 300 && n < 700)
  }

  test("sampleBy is deterministic, key-stable, and near p") {
    val f = flow(1 to 1000: _*)
    val a = f.sampleBy(0.3)(_.toLong).dump().sorted
    val b = f.sampleBy(0.3)(_.toLong).dump().sorted
    assert(a == b) // same rows every run
    assert(a.size > 200 && a.size < 400)
    // p=0 and p=1 are exact
    assert(f.sampleBy(0.0)(_.toLong).dump().isEmpty)
    assert(f.sampleBy(1.0)(_.toLong).dump().size == 1000)
    // keys sharing their low 31 bits must NOT share decisions (xor-fold):
    // shard-style ids k and k | 2^31 diverge for some k
    val low = f.sampleBy(0.3)(_.toLong).dump().toSet
    val high = f.sampleBy(0.3)(i => i.toLong | (1L << 31)).dump().toSet
    assert(low != high)
  }

  test("sampleWeighted: weight 0 drops, weight 1 keeps, fraction tracks the weight") {
    val f = flow(1 to 1000: _*)
    assert(f.sampleWeighted(_ => 0.0)(_.toLong).dump().isEmpty)
    assert(f.sampleWeighted(_ => 1.0)(_.toLong).dump().size == 1000)
    // out-of-range weights clamp rather than misbehave
    assert(f.sampleWeighted(_ => 7.5)(_.toLong).dump().size == 1000)
    assert(f.sampleWeighted(_ => -3.0)(_.toLong).dump().isEmpty)
    val n = f.sampleWeighted(_ => 0.25)(_.toLong).dump().size
    assert(n > 150 && n < 350, s"got $n for weight 0.25")
    // deterministic
    assert(f.sampleWeighted(_ => 0.25)(_.toLong).dump().sorted ==
      f.sampleWeighted(_ => 0.25)(_.toLong).dump().sorted)
  }

  test("sampleFixed: exact size, deterministic, bounded-heap plan (no full sort)") {
    val f = flow(1 to 1000: _*)
    val a = f.sampleFixed(50)(_.toLong).dump()
    assert(a.size == 50)
    assert(a.sorted == f.sampleFixed(50)(_.toLong).dump().sorted)
    // fewer rows than n → all of them
    assert(flow(1, 2, 3).sampleFixed(50)(_.toLong).dump().sorted == Seq(1, 2, 3))
    // the limit must fuse into the sort: TakeOrderedAndProject, not Sort
    val plan = f.sampleFixed(50)(_.toLong).ds.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("TakeOrderedAndProject"), s"expected bounded top-k plan:\n$plan")
  }

  test("sortBy asc/desc gives total order and drops the key") {
    val xs = flow("bb" -> 2, "a" -> 1, "ccc" -> 3)
    assert(xs.sortBy(_._2).dump().map(_._1) == Seq("a", "bb", "ccc"))
    assert(xs.sortBy(_._2, asc = false).dump().map(_._1) == Seq("ccc", "bb", "a"))
  }

  test("rankBy indexes from 0 in key order") {
    val r = flow(30, 10, 20).rankBy(identity).dump()
    assert(r.sortBy(_._1) == Seq((0L, 10), (1L, 20), (2L, 30)))
  }

  test("rankTiesBy: ties share index; dense makes indexes sequential") {
    val xs = flow("a" -> 10, "b" -> 10, "c" -> 20, "d" -> 30, "e" -> 30, "f" -> 30)
    val sparse = xs.rankTiesBy(_._2).dump().map(p => p._2._1 -> p._1).toMap
    assert(sparse == Map("a" -> 0L, "b" -> 0L, "c" -> 2L, "d" -> 3L, "e" -> 3L, "f" -> 3L))
    val dense = xs.rankTiesBy(_._2, dense = true).dump().map(p => p._2._1 -> p._1).toMap
    assert(dense == Map("a" -> 0L, "b" -> 0L, "c" -> 1L, "d" -> 2L, "e" -> 2L, "f" -> 2L))
  }

  test("distinctPartitionBy dedups under a custom partitioner") {
    val r = flow(1, 2, 2, 3, 3, 3).distinctPartitionBy(3)(identity).dump()
    assert(r.sorted == Seq(1, 2, 3))
  }

  test("distinctPartitionBy places each value at exactly fn(v) mod n and survives hash collisions") {
    import spark.implicits._
    // negative fn values and duplicates; verify exact placement
    val f = Flow(Seq(-4, -4, 1, 5, 9, 9, 2).toDS())
    val got = f.distinctPartitionBy(4)(identity).ds.rdd
      .mapPartitionsWithIndex((pi, it) => it.map(v => (pi, v)))
      .collect().toSet
    assert(got == Set((0, -4), (1, 1), (1, 5), (1, 9), (2, 2)))
    // equal-hashCode, unequal values must BOTH survive the run scan
    // (strings with colliding hashCode)
    val a = "Aa"; val b = "BB" // classic java collision: "Aa".hashCode == "BB".hashCode
    assert(a.hashCode == b.hashCode)
    val s = Flow(Seq(a, b, a, b, a).toDS()).distinctPartitionBy(2)(_.length).dump()
    assert(s.sorted == Seq("Aa", "BB"))
  }

  test("debugString renders type-tab-value") {
    assert(flow(1).debugString.dump() == Seq("Integer\t1"))
  }

  test("mapIndexed covers all rows with distinct indexes") {
    val r = flow(1 to 100: _*).mapIndexed((i, v) => i).dump()
    assert(r.sorted == (0L until 100L))
  }

  // multiset discipline (SURVEY.md §7.4.3): concat/union-multiset never dedup
  test("concat keeps duplicates, union dedups") {
    val a = flow(1, 2, 2)
    val b = flow(2, 3)
    assert(a.concat(b).dump().sorted == Seq(1, 2, 2, 2, 3))
    assert(a.union(b).dump().sorted == Seq(1, 2, 3))
  }

  test("intersection is distinct; intersectionMultiset keeps min multiplicity") {
    val a = flow(1, 2, 2, 2, 3)
    val b = flow(2, 2, 3, 4)
    assert(a.intersection(b).dump().sorted == Seq(2, 3))
    assert(a.intersectionMultiset(b).dump().sorted == Seq(2, 2, 3))
  }

  test("difference is distinct; differenceMultiset subtracts multiplicity") {
    val a = flow(1, 2, 2, 2, 3)
    val b = flow(2, 3, 4)
    assert(a.difference(b).dump().sorted == Seq(1))
    assert(a.differenceMultiset(b).dump().sorted == Seq(1, 2, 2))
  }

  test("N-ary concat (3 inputs)") {
    assert(flow(1).concat(flow(2), flow(3)).dump().sorted == Seq(1, 2, 3))
  }

  test("distinct on tuples") {
    assert(flow(1 -> "a", 1 -> "a", 2 -> "b").distinct.dump().size == 2)
  }

  // reference: "there is no defined order" — reduce/foldAll on empty input
  test("reduce on empty relation yields empty, not zero") {
    assert(flow[Int]().reduce(_ + _).dump().isEmpty)
  }

  test("reduce sums across partitions") {
    assert(flow(1 to 100: _*).parallel(7).reduce(_ + _).dump() == Seq(5050))
  }

  test("foldAll empty => empty; non-empty => one record") {
    assert(flow[Int]().foldAll(Fold.count[Int]).dump().isEmpty)
    assert(flow(1, 2, 3).foldAll(Fold.count[Int]).dump() == Seq(3L))
  }

  test("intoSeq pours the whole relation into one collection") {
    val r = flow(3, 1, 2).intoSeq.dump()
    assert(r.size == 1 && r.head.sorted == Vector(1, 2, 3))
    assert(flow[Int]().intoSeq.dump().isEmpty)
  }

  test("flattenProduct multiplies flattened projections per row") {
    import spark.implicits._
    val data = Flow(spark.createDataset(Seq(
      ("r1", Seq(1, 2), Seq("a", "b")),
      ("r2", Seq(3), Seq("c")),
      ("r3", Seq.empty[Int], Seq("d")))))
    val r = data.flattenProduct(t => (t._2, t._3)).dump()
    assert(r.toSet == Set((1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "c")))
    // empty side annihilates the row (cross product with empty = empty)
    assert(!r.exists(_._2 == "d"))
  }
}
