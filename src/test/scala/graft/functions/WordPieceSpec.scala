package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** WordPiece: greedy longest-match semantics pinned by hand cases (##
  * continuations, [UNK] whole-word fallback), the likelihood-score
  * argmax distinguished from BPE's count argmax by a planted corpus,
  * and kernel-vs-reference equality on random words.
  */
class WordPieceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def applyOne(w: String, vocab: Seq[String]): String =
    Seq(Tuple1(w)).toDF("w")
      .select(WordPiece.wordpieceWord(col("w"), vocab)).head().getString(0)

  test("greedy longest-match-first with ## continuations; whole-word [UNK] fallback") {
    val vocab = Seq("un", "##aff", "##able", "##ffa", "u", "##n", "##a", "##f",
      "##b", "##l", "##e", "x")
    // longest-first: "un" beats "u"; then "##aff" (len 3) beats "##a"
    assert(applyOne("unaffable", vocab) == "un ##aff ##able")
    // unmatched position (no "q" or "##q") -> the WHOLE word is [UNK],
    // even though a prefix matched
    assert(applyOne("unq", vocab) == "[UNK]")
    assert(applyOne("q", vocab) == "[UNK]")
    assert(applyOne("x", vocab) == "x")
    assert(applyOne("", vocab) == "")
  }

  test("train argmax is the WordPiece likelihood score, not BPE's raw pair count") {
    // pair (a,##b) occurs 10x > (c,##d) 9x, but a/b also flood the corpus
    // as singles -> count(ab)/(count(a)count(b)) tiny; c/d appear ONLY in
    // "cd" -> 9/(9*9) wins. BPE would merge ab first; WordPiece must
    // merge cd first.
    val words =
      Seq.fill(10)("ab") ++ Seq.fill(9)("cd") ++
        Seq.fill(100)("a") ++ Seq.fill(100)("b")
    val df = Seq(Tuple1(words.mkString(" "))).toDF("text")
    val vocab = WordPiece.train(df, "text", numMerges = 1)
    assert(vocab.contains("cd"), s"expected likelihood winner cd in $vocab")
    assert(!vocab.contains("ab"), s"count winner ab must not merge first: $vocab")
    val bpe = Bpe.train(df, "text", numMerges = 1)
    assert(bpe == Seq(("a", "b")), s"BPE control: count argmax is (a,b): $bpe")
  }

  test("kernel == reference greedy segmentation on random words over a trained vocab") {
    val rnd = new scala.util.Random(7L)
    val corpus = (0 until 400)
      .map(_ => Seq.fill(8)("abcdef".charAt(rnd.nextInt(6))).mkString)
      .mkString(" ")
    val df = Seq(Tuple1(corpus)).toDF("text")
    val vocab = WordPiece.train(df, "text", numMerges = 24)
    val vs = vocab.toSet
    val maxLen = vocab.map(p => if (p.startsWith("##")) p.length - 2 else p.length).max
    def ref(w: String): String = {
      if (w.isEmpty) return ""
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var pos = 0
      while (pos < w.length) {
        val hit = (math.min(maxLen, w.length - pos) to 1 by -1).find { l =>
          vs.contains((if (pos == 0) "" else "##") + w.substring(pos, pos + l))
        }.getOrElse(return "[UNK]")
        out += (if (pos == 0) "" else "##") + w.substring(pos, pos + hit)
        pos += hit
      }
      out.mkString(" ")
    }
    val words = (0 until 300).map(_ =>
      Seq.fill(1 + rnd.nextInt(10))("abcdefgh".charAt(rnd.nextInt(8))).mkString)
    val got = words.toDF("w")
      .select(col("w"), WordPiece.wordpieceWord(col("w"), vocab))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    words.foreach(w => assert(got(w) == ref(w), s"word $w"))
    // coverage: the base alphabet is retained, so corpus-alphabet words
    // never [UNK]
    assert(words.filter(_.forall("abcdef".contains(_)))
      .forall(w => got(w) != "[UNK]"))
  }
}
