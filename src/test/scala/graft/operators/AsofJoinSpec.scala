package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class AsofJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("asof: latest right row with rts <= lts per key; equal ts matches; no match → null") {
    val left = Seq((1, 10L, "l1"), (1, 20L, "l2"), (1, 25L, "l3"), (2, 5L, "l4"))
      .toDF("k", "ts", "lv")
    val right = Seq((1, 10L, "a"), (1, 20L, "b"), (2, 99L, "c"))
      .toDF("k", "rts", "rv")
    val got = AsofJoin.asof(left, right, "k", "ts", "rts", Seq("rv"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getString(3))).toSet
    assert(got == Set(
      (1, 10L, "l1", "a"), // equal ts: inclusive
      (1, 20L, "l2", "b"),
      (1, 25L, "l3", "b"), // latest preceding, not first
      (2, 5L, "l4", null))) // nothing precedes → null
  }

  test("asof: null right ts/key never matches (SQL semantics); null left key gets null payload") {
    val left = Seq((Some(1), Some(5L), "l1"), (None, Some(7L), "l2"))
      .toDF("k", "ts", "lv")
    // the null-ts right row would otherwise sort first and match everything
    val right = Seq((Some(1), None: Option[Long], "bad"), (None, Some(1L), "alsobad"))
      .toDF("k", "rts", "rv")
    val got = AsofJoin.asof(left, right, "k", "ts", "rts", Seq("rv"))
      .collect().map(r => (r.getString(2), r.getString(3))).toSet
    assert(got == Set(("l1", null), ("l2", null)))
  }

  test("asof forward: earliest right at-or-after; equal ts inclusive; nothing after → null") {
    val left = Seq((1, 10L, "l1"), (1, 20L, "l2"), (1, 26L, "l3"), (2, 5L, "l4"))
      .toDF("k", "ts", "lv")
    val right = Seq((1, 10L, "a"), (1, 25L, "b"), (2, 1L, "c")).toDF("k", "rts", "rv")
    val got = AsofJoin.asof(left, right, "k", "ts", "rts", Seq("rv"),
      direction = "forward")
      .collect().map(r => (r.getString(2), r.getString(3))).toSet
    assert(got == Set(
      ("l1", "a"),  // equal ts: inclusive
      ("l2", "b"),  // earliest following, not latest
      ("l3", null), // nothing at/after 26
      ("l4", null)))
  }

  test("asof tolerance: matches farther than the bound null out, closer ones survive") {
    val left = Seq((1, 10L, "near"), (1, 100L, "far")).toDF("k", "ts", "lv")
    val right = Seq((1, 8L, "m")).toDF("k", "rts", "rv")
    val got = AsofJoin.asof(left, right, "k", "ts", "rts", Seq("rv"),
      tolerance = Some(5L))
      .collect().map(r => (r.getString(2), r.getString(3))).toSet
    assert(got == Set(("near", "m"), ("far", null)))
  }

  test("asof matches a brute-force reference on random data, all directions x tolerance") {
    val rnd = new scala.util.Random(29)
    for (trial <- 1 to 3) {
      val left = (0 until 200).map(i =>
        (rnd.nextInt(5), rnd.nextInt(100).toLong, s"l$i"))
      // unique (key, ts) on the right, as the operator contract requires
      val right = rnd.shuffle(
        (for (k <- 0 until 5; t <- 0 until 100) yield (k, t.toLong)).toList)
        .take(120).map { case (k, t) => (k, t, s"r$k-$t") }
      val lDf = left.toDF("k", "ts", "lv")
      val rDf = right.toDF("k", "rts", "rv")
      for (dir <- Seq("backward", "forward"); tol <- Seq(None, Some(7L))) {
        def expected(k: Int, ts: Long): String = {
          val c = right.filter(r => r._1 == k &&
            (if (dir == "backward") r._2 <= ts else r._2 >= ts))
          val best =
            if (c.isEmpty) None
            else Some(if (dir == "backward") c.maxBy(_._2) else c.minBy(_._2))
          best.filter(b => tol.forall(t => math.abs(ts - b._2) <= t)).map(_._3).orNull
        }
        val got = AsofJoin.asof(lDf, rDf, "k", "ts", "rts", Seq("rv"),
            direction = dir, tolerance = tol)
          .collect().map(r => (r.getString(2), r.getString(3))).toMap
        left.foreach { case (k, ts, lv) =>
          assert(got(lv) == expected(k, ts),
            s"trial $trial $dir tol=$tol: left ($k,$ts) got ${got(lv)}, want ${expected(k, ts)}")
        }
      }
    }
  }

  test("asofSkewSafe == asofSingleWindow on random data, all directions x tolerance x bucket widths") {
    val rnd = new scala.util.Random(31)
    // one deliberately hot key (0) holding half the rows
    val left = (0 until 300).map(i =>
      (if (i % 2 == 0) 0 else rnd.nextInt(5), rnd.nextInt(200).toLong, s"l$i"))
    val right = rnd.shuffle(
      (for (k <- 0 until 5; t <- 0 until 200) yield (k, t.toLong)).toList)
      .take(150).map { case (k, t) => (k, t, s"r$k-$t") }
    val lDf = left.toDF("k", "ts", "lv")
    val rDf = right.toDF("k", "rts", "rv")
    for (dir <- Seq("backward", "forward"); tol <- Seq(None, Some(9L));
         bucket <- Seq(1L, 7L, 64L, 1000L)) {
      val want = AsofJoin.asofSingleWindow(lDf, rDf, "k", "ts", "rts", Seq("rv"),
          direction = dir, tolerance = tol)
        .collect().map(r => (r.getString(2), r.getString(3))).toMap
      val got = AsofJoin.asofSkewSafe(lDf, rDf, "k", "ts", "rts", Seq("rv"),
          direction = dir, tolerance = tol, bucket = bucket)
        .collect().map(r => (r.getString(2), r.getString(3))).toMap
      assert(got == want, s"$dir tol=$tol bucket=$bucket")
    }
  }

  test("asofSkewSafe: match carried across empty buckets; right-only buckets carry too") {
    // right row in bucket [0,10); left rows in buckets [20,30) and [40,50):
    // both must see the bucket-0 value through the carry chain
    val left = Seq((1, 25L, "l1"), (1, 45L, "l2")).toDF("k", "ts", "lv")
    val right = Seq((1, 3L, "a")).toDF("k", "rts", "rv")
    val got = AsofJoin.asofSkewSafe(left, right, "k", "ts", "rts", Seq("rv"), bucket = 10L)
      .collect().map(r => (r.getString(2), r.getString(3))).toSet
    assert(got == Set(("l1", "a"), ("l2", "a")))
  }

  test("asofSkewSafe: the row-level window is bucketed (partition spec carries __bkt)") {
    val left = Seq((1, 10L, "x")).toDF("k", "ts", "lv")
    val right = Seq((1, 5L, "a")).toDF("k", "rts", "rv")
    val plan = AsofJoin.asofSkewSafe(left, right, "k", "ts", "rts", Seq("rv"), bucket = 10L)
      .queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // the phase-1 running-match window must partition by (k, __bkt) — a
    // spec of the shape `windowspecdefinition(k#.., __bkt#.., __ts#..`
    // (key then bucket as PARTITION columns, before the ordered __ts)
    assert("windowspecdefinition\\(k#\\d+, __bkt#\\d+L?, __ts#".r.findFirstIn(plan).isDefined,
      s"expected a (k, __bkt)-partitioned window:\n$plan")
  }

  test("asof DEFAULTS to the skew-safe execution (bucketed window in the plan)") {
    // safety is opt-OUT: the bare entry point must never plan the
    // single-task-per-key window on 100 TB tick data with a hot key
    val left = Seq((1, 10L, "x")).toDF("k", "ts", "lv")
    val right = Seq((1, 5L, "a")).toDF("k", "rts", "rv")
    val plan = AsofJoin.asof(left, right, "k", "ts", "rts", Seq("rv"))
      .queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert("windowspecdefinition\\(k#\\d+, __bkt#\\d+L?, __ts#".r.findFirstIn(plan).isDefined,
      s"default asof must run the bucketed skew-safe window:\n$plan")
  }

  test("rangeJoin: exact containment, boundaries inclusive, intervals spanning bins, no dup pairs") {
    val points = Seq((1L, 10L), (2L, 100L), (3L, 250L), (4L, 999L)).toDF("pid", "t")
    // interval B spans multiple 100-wide bins; A and B overlap
    val intervals = Seq(("A", 0L, 100L), ("B", 90L, 260L)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, "t", intervals, "lo", "hi", binWidth = 100L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getString(1))).toList
    assert(got.distinct.size == got.size, "a pair must appear exactly once")
    assert(got.toSet == Set((1L, "A"), (2L, "A"), (2L, "B"), (3L, "B")))
  }

  test("intervalOverlap == brute force on random intervals; exactly-once emission") {
    val rnd = new scala.util.Random(7)
    val as = (0 until 60).map(i => (i.toLong, rnd.nextInt(1000).toLong))
      .map { case (id, lo) => (id, lo, lo + rnd.nextInt(300).toLong) }
    val bs = (0 until 60).map(i => (i.toLong, rnd.nextInt(1000).toLong))
      .map { case (id, lo) => (id, lo, lo + rnd.nextInt(300).toLong) }
    val want = (for {
      (ai, alo, ahi) <- as; (bi, blo, bhi) <- bs
      if alo <= bhi && blo <= ahi
    } yield (ai, bi)).toSet
    // binWidth far smaller than typical width: intervals span MANY bins,
    // exercising the emit-at-first-shared-bin dedup the hardest
    for (bw <- Seq(7L, 100L, 1000L)) {
      val got = RangeJoin.intervalOverlap(
        as.toDF("a_id", "a_lo", "a_hi"), "a_lo", "a_hi",
        bs.toDF("b_id", "b_lo", "b_hi"), "b_lo", "b_hi", binWidth = bw)
        .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toList
      assert(got.distinct.size == got.size, s"binWidth=$bw: a pair must emit exactly once")
      assert(got.toSet == want, s"binWidth=$bw: pair set must match brute force")
    }
    // touching boundaries are overlaps (closed intervals)
    val touch = RangeJoin.intervalOverlap(
      Seq((1L, 0L, 10L)).toDF("a_id", "a_lo", "a_hi"), "a_lo", "a_hi",
      Seq((2L, 10L, 20L)).toDF("b_id", "b_lo", "b_hi"), "b_lo", "b_hi", binWidth = 4L)
    assert(touch.count() == 1, "hi == lo boundary contact must pair")
  }

  test("asofSingleWindow plans one shuffle (union + window), no range-join explosion") {
    val left = Seq((1, 10L, "x")).toDF("k", "ts", "lv")
    val right = Seq((1, 5L, "a")).toDF("k", "rts", "rv")
    val plan = AsofJoin.asofSingleWindow(left, right, "k", "ts", "rts", Seq("rv"))
      .queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"expected a single shuffle:\n$plan")
    assert(!plan.contains("Join"), s"expected no join operator:\n$plan")
  }
}
