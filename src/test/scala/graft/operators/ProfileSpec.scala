package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class ProfileSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def df() = Seq(
    (Some(1L), Some("a")), (Some(2L), None), (Some(2L), Some("b")),
    (None, Some("a")), (Some(5L), Some("c"))
  ).toDF("id", "tag")

  test("profile: exact per-column counts, nulls, distinct, min/max") {
    val got = Profile.profile(df(), Seq("id", "tag")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))
    assert(got.toSeq == Seq(
      ("id", 5L, 1L, 3L, "1", "5"),
      ("tag", 5L, 1L, 3L, "a", "c")))
  }

  test("numeric: mean/stddev/percentiles with interpolation matching quantile_cont") {
    val d = Seq(1L, 2L, 3L, 4L).toDF("v")
    val got = Profile.numeric(d, Seq("v")).collect().map(r =>
      (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq
    // quantile_cont on [1,2,3,4]: p25 = 1.75, p50 = 2.5, p75 = 3.25
    assert(got == Seq(("v", 2.5, 1.290994, 1.75, 2.5, 3.25)))
  }

  test("topValues: per-column top-k with deterministic ties, nulls skipped") {
    val d = Seq(
      (Some("x"), Some("p")), (Some("x"), Some("q")), (Some("y"), Some("q")),
      (Some("y"), None), (Some("z"), Some("r")), (None, Some("p"))
    ).toDF("a", "b")
    val got = Profile.topValues(d, Seq("a", "b"), k = 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // a: x=2, y=2 (tie -> value asc), z=1 cut; b: p=2, q=2 tie, r cut
    assert(got == Set(("a", "x", 2L), ("a", "y", 2L), ("b", "p", 2L), ("b", "q", 2L)))
  }

  test("numericApprox: exact-discrete at accuracy >= n; sketch error bounded below it") {
    val n = 20000
    val d = (1 to n).map(_.toLong).toDF("v")
    // accuracy >= n: the GK sketch holds every rank — values are exact
    // DISCRETE percentiles (an element at the target rank)
    val exact = Profile.numericApprox(d, Seq("v"), accuracy = n + 1).head()
    assert(exact.getDouble(3) == 5000.0 && exact.getDouble(4) == 10000.0 &&
      exact.getDouble(5) == 15000.0, s"exact-mode percentiles off: $exact")
    // mean/stddev are sketch-independent (same aggregates as the exact twin)
    val twin = Profile.numeric(d, Seq("v")).head()
    assert(exact.getDouble(1) == twin.getDouble(1) &&
      exact.getDouble(2) == twin.getDouble(2))
    // accuracy = 100 ⇒ rank error ≤ n/100 = 1% of rows ⇒ value error ≤ 1%
    // of the uniform domain (GK guarantee, with headroom for partial-merge
    // slack: assert 2x the bound)
    val sketched = Profile.numericApprox(d, Seq("v"), accuracy = 100).head()
    Seq(3 -> 5000.0, 4 -> 10000.0, 5 -> 15000.0).foreach { case (i, want) =>
      assert(math.abs(sketched.getDouble(i) - want) <= 2.0 * n / 100,
        s"p at col $i drifted past the GK bound: ${sketched.getDouble(i)} vs $want")
    }
    // the scale story: NO per-column Sort in the plan (the exact twin's
    // `percentile` buffers/sorts full columns; the sketch streams)
    val plan = Profile.numericApprox(d, Seq("v"), accuracy = 100)
      .queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("Sort"), s"sketch profile must not sort:\n$plan")
  }

  test("approx: HLL distinct within rsd, exact rows/nulls/minmax, NO Expand in the plan") {
    val wide = (1 to 2000).map(i => (i.toLong, s"t${i % 37}")).toDF("id", "tag")
    val res = Profile.approx(wide, Seq("id", "tag"), rsd = 0.05)
    val plan = res.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("Expand"),
      s"approx profile must not multiply rows through Expand:\n$plan")
    val byCol = res.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(byCol("id")._1 == 2000 && byCol("id")._2 == 0)
    assert(math.abs(byCol("id")._3 - 2000.0) / 2000.0 < 0.15, s"hll far off: ${byCol("id")._3}")
    assert(math.abs(byCol("tag")._3 - 37.0) / 37.0 < 0.15, s"hll far off: ${byCol("tag")._3}")
    // the exact variant DOES expand (the documented cost trade)
    val exactPlan = Profile.profile(wide, Seq("id", "tag"))
      .queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(exactPlan.contains("Expand"))
  }

  test("keySkew: hand-computed Gini on planted distributions; uniform ≈ 0, hot key high") {
    import spark.implicits._
    // uniform: 4 keys × 5 rows each → sorted counts (5,5,5,5),
    // num = Σ(2i−n−1)·c = (−3−1+1+3)·5 = 0 → gini 0
    val uniform = (0 until 20).map(i => (i % 4).toLong).toDF("k")
    val u = Profile.keySkew(uniform, "k").head()
    assert(u.getLong(0) == 4 && u.getLong(1) == 20)
    assert(u.getDouble(2) == 0.25 && u.getDouble(3) == 0.0)
    // skewed: counts (1,1,1,17) sorted asc →
    // num = (2·1−5)·1 + (2·2−5)·1 + (2·3−5)·1 + (2·4−5)·17 = −3−1+1+51 = 48
    // gini = 48 / (4·20) = 0.6; top1 = 17/20
    val hot = ((0 until 17).map(_ => 0L) ++ Seq(1L, 2L, 3L)).toDF("k")
    val h = Profile.keySkew(hot, "k").head()
    assert(h.getLong(0) == 4 && h.getLong(1) == 20)
    assert(h.getDouble(2) == 0.85 && h.getDouble(3) == 0.6,
      s"got top1=${h.getDouble(2)} gini=${h.getDouble(3)}")
  }

  test("spearman: exact on monotone, anti-monotone, and hand-computed permuted data") {
    // perfectly monotone: rho = 1 regardless of nonlinearity
    val mono = (1L to 50L).map(i => (i, i.toDouble, (i * i).toDouble))
    val r1 = Profile.spearman(mono.toDF("id", "x", "y"), "id", "x", "y").head()
    assert(r1.getLong(0) == 50 && r1.getLong(1) == 0 && r1.getDouble(2) == 1.0)
    // anti-monotone: rho = -1
    val anti = (1L to 50L).map(i => (i, i.toDouble, -i.toDouble))
    assert(Profile.spearman(anti.toDF("id", "x", "y"), "id", "x", "y")
      .head().getDouble(2) == -1.0)
    // hand-computed permutation: x ranks 1..4, y order (2,1,4,3) -> d = ±1
    // each, sum_d2 = 4, rho = 1 - 24/(4*15) = 0.6
    val perm = Seq((1L, 1.0, 20.0), (2L, 2.0, 10.0), (3L, 3.0, 40.0), (4L, 4.0, 30.0))
    val r3 = Profile.spearman(perm.toDF("id", "x", "y"), "id", "x", "y").head()
    assert(r3.getLong(1) == 4 && r3.getDouble(2) == 0.6)
  }

  test("spearman: null x or y rows are pairwise-deleted, not an encoding error") {
    // two null-bearing rows drop; the surviving 4 rows are the hand-computed
    // permutation above (rho = 0.6)
    val rows = Seq(
      (1L, Some(1.0), Some(20.0)), (2L, Some(2.0), Some(10.0)),
      (3L, Some(3.0), Some(40.0)), (4L, Some(4.0), Some(30.0)),
      (5L, None, Some(99.0)), (6L, Some(99.0), None))
    val r = Profile.spearman(rows.toDF("id", "x", "y"), "id", "x", "y").head()
    assert(r.getLong(0) == 4 && r.getLong(1) == 4 && r.getDouble(2) == 0.6)
  }

  test("spearmanSampled: num >= 2^32 raises instead of silently sampling nothing") {
    // num * 2^31 overflows a signed long for num >= 2^32 — the threshold
    // would go negative and the sample empty; the guard must raise
    val df = (1L to 10L).map(i => (i, i.toDouble, i.toDouble)).toDF("id", "x", "y")
    intercept[ArithmeticException] {
      Profile.spearmanSampled(df, "id", "x", "y", 1L << 32, 1L << 33).head()
    }
    // a full-rate sample (num == den, in range) is the exact statistic
    assert(Profile.spearmanSampled(df, "id", "x", "y", 7L, 7L)
      .head().getDouble(2) == 1.0)
  }

  test("hllRegisters: hand-computed buckets and rho; duplicate-insensitive; mergeable by MAX") {
    // p=8, value width w=22: rho = 23 - bitlen(h >> 8), or 23 when the
    // value bits are all zero
    val hs = Seq(0L, 0L, 256L, 257L, 5L + (1L << 29))
    val r = Profile.hllRegisters(hs.toDF("h"), "h", 8)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // h=0: bucket 0, v=0 -> rho 23; h=256: bucket 0, v=1 -> rho 22 (max keeps 23)
    // h=257: bucket 1, v=1 -> rho 22; h=2^29+5: bucket 5, v=2^21 (bitlen 22) -> rho 1
    assert(r == Map(0L -> 23L, 1L -> 22L, 5L -> 1L))
    // merge = per-bucket MAX of part registers == registers of the union
    val (p1, p2) = (hs.take(2), hs.drop(2))
    val merged = Profile.hllRegisters(p1.toDF("h"), "h", 8)
      .unionByName(Profile.hllRegisters(p2.toDF("h"), "h", 8))
      .groupBy("bucket").agg(org.apache.spark.sql.functions.max("rho").as("rho"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(merged == r)
  }

  test("hllEstimate: within the ±3·1.04/√m error band on a 20k-distinct stream") {
    // deterministic avalanche-mixed hashes (splitmix64 finalizer mod the
    // fixture prime): HLL needs hash bits that LOOK independent — a raw
    // Weyl sequence i·c mod p has structured high bits and biases the
    // per-bucket max-rho registers ~2x high (measured)
    def mix(x: Long): Long = {
      var z = x + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val n = 20000
    val hs = (0 until n).map(i => java.lang.Math.floorMod(mix(i.toLong), 1000000007L))
    val truth = hs.distinct.size
    val est = Profile.hllEstimate(
      Profile.hllRegisters(hs.toDF("h"), "h", 8), 8).head()
    val (m, e) = (est.getLong(0), est.getDouble(3))
    assert(m == 256)
    val band = 3 * 1.04 / math.sqrt(256.0) // ~19.5%
    assert(math.abs(e - truth) / truth < band, s"estimate $e vs true $truth outside $band")
    // s_scaled is the exact integer the estimate divides into
    assert(est.getLong(2) > 0 && est.getLong(1) <= 256)
  }

  test("vector: zero-vector count, norm bounds, exact mean norm") {
    import spark.implicits._
    val vecs = Seq(
      Array(3.0f, 4.0f),   // norm2 = 25
      Array(0.0f, 0.0f),   // zero vector
      Array(1.0f, 0.0f)    // norm2 = 1
    ).toDF("embedding")
    val r = Profile.vector(vecs, "embedding").head()
    assert(r.getLong(0) == 3 && r.getLong(1) == 1)
    assert(r.getDouble(2) == 0.0 && r.getDouble(3) == 25.0)
    assert(math.abs(r.getDouble(4) - 26.0 / 3) < 1e-9)
  }
}
