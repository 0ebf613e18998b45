package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Real BPE train/apply (Sennrich et al. 2016). The trainer fixture is the
  * paper's classic word set, hand-derived: with vocab
  * {low:5, lower:2, newest:6, widest:3} the weighted pair counts give
  * (e,s)=9 and (s,t)=9 tied — lexicographic tie-break picks (e,s) — then
  * (es,t)=9, then (l,o)=7 and (o,w)=7 tied → (l,o), then (lo,w)=7.
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sennrich: Seq[(String, Long)] =
    Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  private def corpus() = sennrich
    .flatMap { case (w, c) => Seq.fill(c.toInt)(w) }
    .grouped(4).map(_.mkString(" ")).toSeq
    .toDF("text")

  test("train reproduces the hand-derived merge sequence with deterministic ties") {
    val merges = Bpe.train(corpus(), "text", 4)
    assert(merges == Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
  }

  test("train stops early when no pair repeats") {
    // every word distinct, every char distinct: all pair counts are 1
    val df = Seq("ab cd ef").toDF("text")
    assert(Bpe.train(df, "text", 10).isEmpty)
  }

  test("applyWord: textbook application, left-to-right non-overlapping") {
    val m = Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"))
    def app(w: String) = BpeRuntime.applyWord(UTF8String.fromString(w),
      m.map(_._1).toArray, m.map(_._2).toArray).toString
    assert(app("lowest") == "low est")
    assert(app("newest") == "n e w est")
    assert(app("low") == "low")
    assert(app("") == "")
    assert(app("x") == "x")
    // overlap: "aaa" under (a,a) merges the FIRST pair only (non-overlapping)
    val aa = BpeRuntime.applyWord(UTF8String.fromString("aaa"),
      Array("a"), Array("a")).toString
    assert(aa == "aa a")
  }

  /** The DuckDB oracle replays BPE as a chain of literal string replaces
    * over DOUBLE-delimited symbols ('|a||b||c|', rule = '|a||b|'→'|ab|').
    * Java's String.replace has the same semantics as DuckDB replace
    * (literal, left-to-right, non-overlapping), so the chain algebra is
    * testable here against the kernel — on exactly the words the corpus
    * lacks: a merged symbol whose SUFFIX is a later rule's left side
    * ('erow': rule (r,ow) must not rewrite the tail of merged 'er'), and
    * ADJACENT matches of one rule (single shared delimiters would make
    * the second of two back-to-back matches miss).
    */
  test("oracle replace-chain algebra == kernel on suffix-misfire and adjacent-match words") {
    val merges = graft.queries.ExtQueries.BpeFixtureMerges
    def chain(word: String): String = {
      val init = "|" + word.map(_.toString).mkString("||") + "|"
      val done = merges.foldLeft(init) { case (acc, (a, b)) =>
        acc.replace(s"|$a||$b|", s"|$a$b|") }
      done.replace("||", " ").stripPrefix("|").stripSuffix("|")
    }
    def kernel(word: String): String = BpeRuntime.applyWord(
      UTF8String.fromString(word),
      merges.map(_._1).toArray, merges.map(_._2).toArray).toString
    // 'erow' is the advisor's misfire: old trailing-only anchoring let
    // (r,ow) rewrite 'er|ow|' into one bogus 'erow' symbol
    val adversarial = Seq("erow", "merower", "rowerow", "stst", "ststst",
      "erer", "parparpar", "joinjoin", "hashash", "washerow", "owow")
    adversarial.foreach { w =>
      assert(chain(w) == kernel(w), s"chain != kernel on '$w'")
    }
    val rnd = new scala.util.Random(7)
    val syms = Seq("e", "r", "o", "w", "s", "t", "a", "m", "p", "j", "i", "n", "l", "u", "h")
    (1 to 500).foreach { _ =>
      val w = (1 to (rnd.nextInt(12) + 1)).map(_ => syms(rnd.nextInt(syms.size))).mkString
      assert(chain(w) == kernel(w), s"chain != kernel on random '$w'")
    }
  }

  test("initial symbols are code points: surrogate pairs are one symbol") {
    val grin = new String(Character.toChars(0x1F600)) // astral-plane emoji
    val noMerges = BpeRuntime.applyWord(UTF8String.fromString(grin + "a" + grin),
      Array.empty, Array.empty).toString
    assert(noMerges == s"$grin a $grin")
    val merged = BpeRuntime.applyWord(UTF8String.fromString(grin + grin),
      Array(grin), Array(grin)).toString
    assert(merged == grin + grin)
  }

  test("merged symbols never re-merge within the same rule pass") {
    // (a,b)->ab then (ab,ab)->abab: "abab" needs TWO rules, rule 1 alone
    // must produce "ab ab", not chain into "abab"
    val one = BpeRuntime.applyWord(UTF8String.fromString("abab"),
      Array("a"), Array("b")).toString
    assert(one == "ab ab")
    val two = BpeRuntime.applyWord(UTF8String.fromString("abab"),
      Array("a", "ab"), Array("b", "ab")).toString
    assert(two == "abab")
  }

  test("bpeText/bpePieceCount columns agree with applyWord, inside codegen") {
    val m = Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"))
    val df = Seq("lowest low", "newest").toDF("text")
      .select(Bpe.bpeText(col("text"), m).as("t"),
        Bpe.bpePieceCount(col("text"), m).as("n"))
    val got = df.collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(got == Set(("low est low", 3), ("n e w est", 4)))
  }

  test("single-expression BpeApplyText equals the transform-HOF formulation on whitespace-laden inputs") {
    val m = Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"), ("a", "b"))
    val rnd = new scala.util.Random(99L)
    val chars = "abelostw \t\n"
    val cases = Seq("", " ", "\t", "  lowest  ", "a\tb", "\tlow\n", " \t ") ++
      (1 to 40).map(_ => (0 until rnd.nextInt(25)).map(_ =>
        chars(rnd.nextInt(chars.length))).mkString)
    val df = cases.toDF("text")
      .select(col("text"),
        Bpe.bpeTextExpr(col("text"), m).as("fast"),
        Bpe.bpeTextHof(col("text"), m).as("ref"))
    val bad = df.where(col("fast") =!= col("ref") ||
      col("fast").isNull =!= col("ref").isNull).collect()
    assert(bad.isEmpty, bad.map(r => s"[${r.getString(0)}] fast=[${r.getString(1)}] " +
      s"ref=[${r.getString(2)}]").mkString("\n"))
  }

  test("train-then-apply round trip on the training corpus compresses to whole subwords") {
    val merges = Bpe.train(corpus(), "text", 16)
    val pieces = corpus()
      .select(explode(split(Bpe.bpeText(col("text"), merges), " ")).as("p"))
      .groupBy("p").count().collect().map(_.getString(0)).toSet
    // 16 merges on this 4-word vocab fully merge every word
    assert(pieces == Set("low", "lower", "newest", "widest"))
  }
}
