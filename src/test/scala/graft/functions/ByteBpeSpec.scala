package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Byte-level BPE (GPT-2/tiktoken-style, 256-byte base alphabet):
  * byte-fallback on non-ASCII, lossless round-trip (no [UNK] ever),
  * merge reassembly of frequent multi-byte characters, train
  * determinism, and kernel == naive reference on random words.
  */
class ByteBpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def applyW(w: String, merges: Seq[(String, String)]): String =
    BpeRuntime.applyWordBytes(UTF8String.fromString(w),
      merges.map(_._1).toArray, merges.map(_._2).toArray).toString

  /** Naive reference: hex-byte symbols, each rule applied everywhere
    * left-to-right non-overlapping before the next.
    */
  private def reference(w: String, merges: Seq[(String, String)]): String = {
    var syms = w.getBytes("UTF-8").map(b => f"${b & 0xff}%02X").toVector
    for ((a, b) <- merges) {
      val out = Vector.newBuilder[String]
      var j = 0
      while (j < syms.length) {
        if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
          out += (a + b); j += 2
        } else { out += syms(j); j += 1 }
      }
      syms = out.result()
    }
    syms.mkString(" ")
  }

  test("byte fallback: unmerged non-ASCII splits into its UTF-8 bytes, no [UNK]") {
    assert(applyW("café", Nil) == "63 61 66 C3 A9")
    assert(applyW("日", Nil) == "E6 97 A5")
    // with the (C3, A9) merge learned, é reassembles into one piece
    assert(applyW("café", Seq(("C3", "A9"))) == "63 61 66 C3A9")
  }

  test("lossless: pieces always re-concatenate to the word's exact bytes") {
    val rnd = new scala.util.Random(7)
    val merges = Seq(("C3", "A9"), ("61", "62"), ("6162", "63"))
    (1 to 200).foreach { _ =>
      val w = (1 to (1 + rnd.nextInt(12))).map(_ =>
        "aé日bc€x".charAt(rnd.nextInt(7))).mkString
      val hex = applyW(w, merges).replace(" ", "")
      assert(hex == w.getBytes("UTF-8").map(b => f"${b & 0xff}%02X").mkString,
        s"round-trip failed for '$w'")
    }
  }

  test("kernel == naive reference on random words over a trained table") {
    val corpus = Seq("résumé naïve café crème café café naïve",
      "über schön größer straße öl öl öl",
      "data caffé data data résumé").toDF("text")
    val merges = ByteBpe.train(corpus, "text", numMerges = 24)
    assert(merges.nonEmpty)
    val rnd = new scala.util.Random(13)
    val alphabet = "aeéöüßr és"
    (1 to 300).foreach { _ =>
      val w = (0 to rnd.nextInt(10)).map(_ =>
        alphabet.charAt(rnd.nextInt(alphabet.length))).mkString.trim
      assert(applyW(w, merges) == reference(w, merges))
    }
  }

  test("train is deterministic and learns the multi-byte reassembly first on a planted corpus") {
    val corpus = Seq.fill(5)("é é é é").toDF("text")
    val m1 = ByteBpe.train(corpus, "text", numMerges = 4)
    val m2 = ByteBpe.train(corpus, "text", numMerges = 4)
    assert(m1 == m2)
    assert(m1.head == ("C3", "A9"), s"expected the é bytes to merge first, got $m1")
    // the corpus is a single repeated 2-byte word: after (C3,A9) there is
    // no adjacent pair left with weighted count >= 2 inside any word
    assert(m1 == Seq(("C3", "A9")))
  }

  test("column surface: byteBpeText/pieceCount agree with per-word kernel composition") {
    val merges = Seq(("C3", "A9"), ("68", "69"))
    val df = Seq((1L, "hi café"), (2L, ""), (3L, "xyz")).toDF("id", "text")
    val got = df.select(col("id"),
        ByteBpe.byteBpeText(col("text"), merges).as("t"),
        ByteBpe.byteBpePieceCount(col("text"), merges).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(got.contains((1L, "6869 63 61 66 C3A9", 5)))
    assert(got.contains((3L, "78 79 7A", 3)))
  }

  /** The q_bpe_bytes oracle's double-delimited replace chain (see
    * BpeSpec's char-level twin for the suffix-misfire / adjacent-match
    * hazards it exists to rule out), validated against the byte kernel
    * on the fixture rules — here the misfire word is 'erow' again: rule
    * (72,6F77) must not rewrite the tail of merged 6572.
    */
  test("oracle replace-chain algebra == byte kernel on suffix-misfire and adjacent-match words") {
    val merges = graft.queries.ExtQueries.ByteBpeFixtureMerges
    def chain(word: String): String = {
      val hexSyms = word.getBytes("UTF-8").map(b => f"${b & 0xff}%02X")
      val init = "|" + hexSyms.mkString("||") + "|"
      val done = merges.foldLeft(init) { case (acc, (a, b)) =>
        acc.replace(s"|$a||$b|", s"|$a$b|") }
      done.replace("||", " ").stripPrefix("|").stripSuffix("|")
    }
    val adversarial = Seq("erow", "merower", "rowerow", "stst", "ststst",
      "erer", "parparpar", "joinjoin", "hashash", "washerow", "owow", "café")
    adversarial.foreach { w =>
      assert(chain(w) == applyW(w, merges), s"chain != kernel on '$w'")
    }
    val rnd = new scala.util.Random(13)
    val syms = Seq("e", "r", "o", "w", "s", "t", "a", "m", "p", "j", "i", "n", "l", "u", "h")
    (1 to 500).foreach { _ =>
      val w = (1 to (rnd.nextInt(12) + 1)).map(_ => syms(rnd.nextInt(syms.size))).mkString
      assert(chain(w) == applyW(w, merges), s"chain != kernel on random '$w'")
    }
  }

  test("spacePieceCount == size(split(_, \" \")) on piece strings incl. empties and unicode") {
    val cases = Seq("", " ", "  ", "61", "61 62", " 61 62 ", "61  62", "é ß", "78 ",
      "6869 63 61 66 C3A9")
    val df = cases.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    val got = df.select(graft.functions.Bpe.spacePieceCount(col("s"))).collect().map(_.getInt(0))
    val want = df.select(size(split(col("s"), " "))).collect().map(_.getInt(0))
    assert(got.toSeq == want.toSeq)
  }

  test("whole-document kernel == split+transform+concat_ws composition on whitespace-laden docs") {
    // r16: byteBpeText is ONE ByteBpeApplyText call per document; it must
    // replicate the HOF composition's semantics byte for byte — trim
    // strips ASCII spaces only, split("\\s+") with limit -1 keeps leading
    // AND trailing empty tokens (for non-0x20 whitespace surviving trim),
    // concat_ws keeps empty strings, multi-byte UTF-8 is untouched by the
    // byte-level separator scan
    val merges = graft.queries.ExtQueries.ByteBpeFixtureMerges
    val hand = Seq(
      "", " ", "  ", "\t", "\t\t", " \t ", "a", " a", "a ", "\ta", "a\t",
      "\ta\t", "a b", "a  b", "a\t\tb", "a\nb\rc", "erow merower\trowerow",
      "caféßü", "the hash join\n\nrow store", "  padded  ", "\f\fx\f")
    val rnd = new scala.util.Random(1616)
    val seps = " \t\n\f\r"
    val syms = "erowstampjinluh café"
    val random = (1 to 300).map { _ =>
      (0 until rnd.nextInt(40)).map { _ =>
        if (rnd.nextInt(4) == 0) seps(rnd.nextInt(seps.length))
        else syms(rnd.nextInt(syms.length))
      }.mkString
    }
    val df = (hand ++ random).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val both = df.select(col("id"),
        ByteBpe.byteBpeText(col("text"), merges).as("kernel"),
        ByteBpe.byteBpeTextHof(col("text"), merges).as("hof"))
      .collect()
    both.foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"doc ${r.getLong(0)}: kernel '${r.getString(1)}' != hof '${r.getString(2)}'")
    }
    // interpreted eval agrees with the plan path on a tricky doc
    val lefts = merges.map(m => BpeRuntime.decodeHex(m._1)).toArray
    val rights = merges.map(m => BpeRuntime.decodeHex(m._2)).toArray
    assert(BpeRuntime.applyTextBytes(UTF8String.fromString("\ta  b\t"), lefts, rights).toString
      == " 61 62 ")
  }

  test("span-based fast path == string-based reference on random words x random merge tables") {
    // r15: the expression runs applyWordBytesFast (int-span symbols,
    // pre-decoded rule bytes, direct hex rendering); it must match the
    // string-symbol implementation byte for byte, including chain-merge
    // rules whose left side is itself a merged symbol, unicode bytes,
    // and the empty word
    val rnd = new scala.util.Random(99)
    val alphabet = "abcdeé ßü"
    def randWord(max: Int) =
      (0 until rnd.nextInt(max)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString.trim
    def fast(w: String, merges: Seq[(String, String)]): String =
      BpeRuntime.applyWordBytesFast(UTF8String.fromString(w),
        merges.map(m => BpeRuntime.decodeHex(m._1)).toArray,
        merges.map(m => BpeRuntime.decodeHex(m._2)).toArray).toString
    def hex(s: String) = s.getBytes("UTF-8").map(b => f"${b & 0xff}%02X").mkString
    (1 to 300).foreach { i =>
      // random rule table, including chained merges (left side = an
      // earlier rule's merged OUTPUT symbol)
      var merges = Vector.empty[(String, String)]
      (0 until rnd.nextInt(8)).foreach { _ =>
        val l = if (merges.nonEmpty && rnd.nextBoolean()) {
          val (pa, pb) = merges(rnd.nextInt(merges.size)); pa + pb
        } else hex(alphabet(rnd.nextInt(alphabet.length)).toString)
        val r = hex(alphabet(rnd.nextInt(alphabet.length)).toString)
        merges :+= ((l, r))
      }
      val w = randWord(16)
      assert(fast(w, merges) == applyW(w, merges),
        s"fast != reference on '$w' with merges $merges (case $i)")
    }
    assert(fast("", Nil) == "")
  }
}
