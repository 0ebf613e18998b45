package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Aho–Corasick kernel vs a naive per-pattern overlapping scan:
  * the automaton's fail-closure must count a short pattern ending inside
  * a long pattern's hit, self-overlapping hits, and shared-suffix
  * transitions, on pinned adversarial strings AND seeded random text.
  */
class AhoCorasickSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def naive(text: String, p: String): Long =
    if (text.length < p.length) 0L
    else (0 to text.length - p.length).count(i => text.regionMatches(i, p, 0, p.length)).toLong

  private def kernel(text: String, patterns: Seq[String]): Seq[Long] = {
    import spark.implicits._
    Seq(text).toDF("t")
      .select(AhoCorasick.countsCol(col("t"), patterns).as("c"))
      .collect()(0).getSeq[Long](0)
  }

  test("pinned adversarial cases: overlaps, substring patterns, shared suffixes") {
    val ps = Seq("slow", "batch batch", "a batch", "dup", "aa")
    val t1 = "a batch batch batch slowdup merge slow aaa"
    val got = kernel(t1, ps)
    val want = ps.map(p => naive(t1, p))
    assert(got == want, s"kernel $got vs naive $want")
    // the overlap and containment facts themselves, pinned:
    assert(naive(t1, "batch batch") == 2L, "self-overlap must count both")
    assert(naive(t1, "aa") == 2L, "aaa contains aa twice (overlapping)")
    assert(naive(t1, "slow") == 2L, "slow inside slowdup AND merge slow")
  }

  test("empty text, no-hit text, and a pattern longer than the text") {
    val ps = Seq("xyz", "longer than the text entirely")
    assert(kernel("", ps) == Seq(0L, 0L))
    assert(kernel("short", ps) == Seq(0L, 0L))
  }

  test("seeded random text agrees with the naive scan for 200 cases") {
    import spark.implicits._
    val rnd = new scala.util.Random(71)
    val alpha = "ab "
    val ps = Seq("a", "ab", "ba", "ab ab", " a", "b b")
    val texts = (1 to 200).map(i =>
      (i, (1 to (1 + rnd.nextInt(60))).map(_ => alpha(rnd.nextInt(alpha.length))).mkString))
    val got = texts.toDF("i", "t")
      .select(col("i"), AhoCorasick.countsCol(col("t"), ps).as("c"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    texts.foreach { case (i, t) =>
      val want = ps.map(p => naive(t, p))
      assert(got(i) == want, s"text '$t': kernel ${got(i)} vs naive $want")
    }
  }

  test("non-ASCII patterns ride the wide-transition path") {
    val ps = Seq("é", "café", "fé")
    val t = "café au lait café écafé"
    assert(kernel(t, ps) == ps.map(p => naive(t, p)))
  }
}
