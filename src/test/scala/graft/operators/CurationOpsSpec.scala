package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Split / Snapshot / Frequent / Retrieval / fuzzy-dedup operators on
  * constructed fixtures: determinism, exact proportions, leakage safety,
  * sketch guarantees, and brute-force agreement.
  */
class CurationOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val Parts = Seq(("train", 90L), ("val", 5L), ("test", 5L))

  // ---------------- Split ----------------

  test("byHash: deterministic partition of ids, weights roughly honored, layout-independent") {
    val df = spark.range(0, 10000).toDF("id")
    val r = Split.byHash(df, "id", Parts)
      .collect().map(x => (x.getLong(0), x.getString(1))).toMap
    assert(r.size == 10000)
    val counts = r.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts("train") > 8700 && counts("train") < 9300)
    assert(counts("val") > 300 && counts("val") < 700)
    // identical assignment regardless of physical layout
    val r2 = Split.byHash(df.repartition(7), "id", Parts)
      .collect().map(x => (x.getLong(0), x.getString(1))).toMap
    assert(r2 == r)
  }

  test("stratifiedExact: integer cut proportions hit exactly per stratum") {
    val df = (0 until 100).map(i => (i.toLong, "big")) ++
      (1000 until 1037).map(i => (i.toLong, "small"))
    val r = Split.stratifiedExact(df.toDF("id", "lang"), "id", "lang",
      Seq(("train", 80L), ("val", 10L), ("test", 10L)))
      .groupBy("lang", "split").count()
      .collect().map(x => ((x.getString(0), x.getString(1)), x.getLong(2))).toMap
    assert(r(("big", "train")) == 80 && r(("big", "val")) == 10 && r(("big", "test")) == 10)
    // n=37: rn*100 <= 37*80 → 29 train; <= 37*90 → rank 33 → 4 val; rest 4
    assert(r(("small", "train")) == 29 && r(("small", "val")) == 4 && r(("small", "test")) == 4)
  }

  test("groupAware: no group ever straddles a split boundary") {
    val df = spark.range(0, 5000).toDF("id")
      .withColumn("rep", col("id") % 97) // 97 groups, ~52 members each
    val straddlers = Split.groupAware(df, "rep", Parts)
      .groupBy("rep").agg(countDistinct("split").as("k"))
      .where(col("k") > 1).count()
    assert(straddlers == 0)
  }

  // ---------------- Snapshot ----------------

  private def snap(rows: (Long, String)*): DataFrame = rows.toDF("doc_id", "text")

  test("diff classifies added / removed / changed / unchanged (normalized compare)") {
    val oldS = snap(1L -> "alpha beta", 2L -> "gone", 3L -> "stable text", 4L -> "CASE  test")
    val newS = snap(1L -> "alpha beta edited", 3L -> "stable text", 4L -> "case test", 5L -> "brand new")
    val r = Snapshot.diff(oldS, newS, "doc_id", "text")
      .collect().map(x => (x.getLong(0), x.getString(1))).toMap
    assert(r == Map(1L -> "changed", 2L -> "removed", 3L -> "unchanged",
      4L -> "unchanged", // fingerprint normalizes case/whitespace
      5L -> "added"))
  }

  test("incremental == full recompute, and fn only sees dirty rows") {
    val oldS = snap((0L until 50L).map(i => i -> s"doc $i words ${"pad " * (i % 5).toInt}"): _*)
    val newS = snap(((5L until 50L).map(i =>
      i -> (if (i % 7 == 0) s"doc $i words CHANGED" else s"doc $i words ${"pad " * (i % 5).toInt}")) ++
      Seq(100L -> "fresh doc one", 101L -> "fresh doc two")): _*)
    var fnSaw = -1L
    val fn: DataFrame => DataFrame = df => {
      fnSaw = df.count()
      df.select(col("doc_id"), length(col("text")).cast("long").as("n"))
    }
    val full = fn(newS).collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    val inc = Snapshot.incremental(oldS, newS, fn(oldS), "doc_id", "text")(fn)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(inc == full)
    // last fn invocation (the incremental one) saw only added+changed rows
    val dirty = (5L until 50L).count(i => i % 7 == 0) + 2
    assert(fnSaw == dirty, s"fn saw $fnSaw rows, expected only the $dirty dirty ones")
  }

  // ---------------- Frequent ----------------

  test("misra-gries: superset of heavy hitters with the n/(k+1) error bound, merge-safe") {
    // skewed stream: word w_i appears 2^(9-i) times, i=0..9 → n=1023
    val words = (0 until 10).flatMap(i => Seq.fill(1 << (9 - i))(s"w$i"))
    val truth = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = words.size.toLong
    for (parts <- Seq(1, 8)) { // single-partition vs heavily-merged sketches
      val df = words.map(w => ("g", w)).toDF("grp", "text").repartition(parts)
      val k = 4
      val est = Frequent.misraGries(df, "grp", "text", k)
        .collect().map(x => (x.getString(1), x.getLong(2))).toMap
      assert(est.size <= k)
      val bound = n / (k + 1)
      truth.foreach { case (w, c) =>
        if (c > bound) assert(est.contains(w), s"heavy item $w (count $c > $bound) missing @$parts")
      }
      est.foreach { case (w, e) =>
        assert(e <= truth(w), s"$w overestimated @$parts")
        assert(truth(w) - e <= bound, s"$w error beyond bound @$parts")
      }
    }
  }

  test("frequentTokens: exact relative support per group") {
    val df = Seq(
      ("a", "x x x x y"), ("a", "x y z"),
      ("b", "q q q q q q q r")).toDF("src", "text")
    // group a: 8 tokens → x:5 (62.5%), y:2 (25%), z:1 (12.5%); support 20% → x, y
    val r = Frequent.frequentTokens(df, "src", "text", 1, 5)
      .collect().map(x => (x.getString(0), x.getString(1), x.getLong(2))).toSet
    assert(r == Set(("a", "x", 5L), ("a", "y", 2L), ("b", "q", 7L)))
  }

  // ---------------- Retrieval (BM25) ----------------

  test("bm25: ranking follows tf at equal dl, and scores equal the rational formula") {
    val docs = Seq(
      (1L, "x x x y"), (2L, "x y y y"), (3L, "y y y y"), (4L, "x x y y")
    ).toDF("doc_id", "text")
    val r = Retrieval.bm25(docs, "doc_id", "text", Seq("x"), topK = 10)
      .orderBy("rank").collect()
    assert(r.map(_.getLong(2)).toSeq == Seq(1L, 4L, 2L)) // tf 3 > 2 > 1; doc 3 absent
    // bit-exact against the same fixed-order IEEE arithmetic in Scala
    val (nuTf, dTf, dConst, dDlN) = Retrieval.bm25Coefficients(6, 5, 3, 4)
    val (nn, sumdl, dfn) = (4L, 16L, 3L)
    def score(tf: Long, dl: Long): Double =
      ((2 * (nn - dfn) + 1).toDouble / (2 * dfn + 1).toDouble) *
        ((nuTf * sumdl * tf).toDouble /
          (dTf * sumdl * tf + dConst * sumdl + dDlN * dl * nn).toDouble)
    val got = r.map(x => x.getLong(2) -> x.getDouble(3)).toMap
    assert(got(1L) == score(3, 4) && got(4L) == score(2, 4) && got(2L) == score(1, 4))
  }

  // ---------------- Fuzzy edit-distance dedup ----------------

  private def bruteForcePairs(rows: Seq[(Long, String)], maxDist: Int): Set[(Long, Long, Long)] = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    (for {
      (ia, ta) <- rows; (ib, tb) <- rows if ia < ib
      dist = lev(ta, tb) if dist <= maxDist
    } yield (ia, ib, dist.toLong)).toSet
  }

  test("fuzzyEditDistancePairs == brute force, incl. bucket-straddling and reversed-id pairs") {
    // lengths straddle bucket boundaries both ways: with maxDist=2 (w=3),
    // "abc" (len 3, bucket 1) vs "ab" (len 2, bucket 0); higher id in the
    // LOWER bucket exercises the bidirectional probe
    val rows = Seq(
      (1L, "abc"), (9L, "ab"), // dist 1, buckets 1 vs 0, high id low bucket
      (2L, "abcdef"), (3L, "abcdxf"), // dist 1, same bucket
      (4L, "zzzzzz"), // dist >2 from all
      (5L, "abcdefgh"), (6L, "abcdef"), // dist 2, adjacent buckets (2 vs 2? len 8 b=2, len 6 b=2)
      (7L, "kmqtvz"), (8L, "kmqtv")) // dist 1
    val got = Dedup.fuzzyEditDistancePairs(rows.toDF("doc_id", "text"), "doc_id", "text", maxDist = 2)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    assert(got == bruteForcePairs(rows, 2))
  }

  test("fuzzyEditDistancePairs maxLen: distances computed on the head window only") {
    val rows = Seq((1L, "prefix-same-TAIL-A" * 10), (2L, "prefix-same-TAIL-B" * 10))
    val full = Dedup.fuzzyEditDistancePairs(rows.toDF("doc_id", "text"), "doc_id", "text", 2)
    assert(full.count() == 0) // 10 scattered edits — over threshold on full text
    val head = Dedup.fuzzyEditDistancePairs(rows.toDF("doc_id", "text"), "doc_id", "text", 2, maxLen = 12)
    assert(head.collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq ==
      Seq((1L, 2L, 0L))) // identical 12-char heads
  }

  test("reciprocalRankFusion: consensus beats single-list wins; integer scores exact") {
    // query q: list A ranks (x=1, y=2, z=3); list B ranks (y=1, w=2).
    // y appears in both (ranks 2+1) and must fuse above x (rank 1 once):
    //   y: 1e12//62 + 1e12//61 = 16129032258 + 16393442622 = 32522474880
    //   x: 1e12//61                                        = 16393442622
    //   w: 1e12//62                                        = 16129032258
    //   z: 1e12//63                                        = 15873015873
    val rows = Seq(("q", "x", 1L), ("q", "y", 2L), ("q", "z", 3L),
      ("q", "y", 1L), ("q", "w", 2L))
    val got = Retrieval.reciprocalRankFusion(rows.toDF("q", "item", "rk"),
        "q", "item", "rk", topK = 3, k = 60L)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.sortBy(_._3).toSeq == Seq(
      ("y", 32522474880L, 1L), ("x", 16393442622L, 2L), ("w", 16129032258L, 3L)))
    // topK enforced: z (4th) is cut
    assert(!got.exists(_._1 == "z"))
  }

  test("chunkByTokens: exact window layout, overlap, short-doc and boundary cases") {
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, words(10)),  // n < C: one chunk, all 10 tokens
      (2L, words(12)),  // n = C + S exactly... see below
      (3L, words(5)),
      (4L, "")          // empty text -> one chunk of the single empty token
    ).toDF("doc_id", "text")
    // C=5, S=3: doc1 (10 toks) -> ceil((10-5)/3)=2 -> chunks 0,1,2 at
    // starts 0,3,6 with lengths 5,5,4; doc2 (12) -> ceil(7/3)=3 -> starts
    // 0,3,6,9 lengths 5,5,5,3; doc3 (5) -> 1 chunk; doc4 -> 1 chunk
    val got = Retrieval.chunkByTokens(docs, "doc_id", "text", chunkTokens = 5, stride = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getString(3))).toMap
    assert(got.size == 3 + 4 + 1 + 1)
    assert(got((1L, 0L)) == ((5L, "w1 w2 w3 w4 w5")))
    assert(got((1L, 1L)) == ((5L, "w4 w5 w6 w7 w8")))
    assert(got((1L, 2L)) == ((4L, "w7 w8 w9 w10")))
    assert(got((2L, 3L)) == ((3L, "w10 w11 w12")))
    assert(got((3L, 0L)) == ((5L, "w1 w2 w3 w4 w5")))
    assert(got((4L, 0L)) == ((1L, ""))) // whitespace split of "" is [""]
    // stride == chunkTokens: disjoint cover, no overlap
    val disjoint = Retrieval.chunkByTokens(docs.where(col("doc_id") === 1), "doc_id", "text", 5, 5)
      .collect().map(r => r.getString(3))
    assert(disjoint.toSet == Set("w1 w2 w3 w4 w5", "w6 w7 w8 w9 w10"))
    intercept[IllegalArgumentException](
      Retrieval.chunkByTokens(docs, "doc_id", "text", 5, 6))
  }
}
