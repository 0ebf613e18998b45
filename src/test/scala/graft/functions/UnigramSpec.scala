package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Unigram-LM tokenizer gates: the codegen Viterbi against an
  * independent reference DP, planted-vocab segmentations, packed
  * tie-break semantics, codepoint handling, and the trainer's planted
  * frequent-substring recovery.
  */
class UnigramSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Independent reference: plain recursive-style DP over codepoints,
    * written against the objective statement (min packed cost·2^16+n),
    * sharing NO code with UnigramRuntime.
    */
  private def refPacked(text: String, vocab: Map[String, Long], maxLen: Int,
      unk: Long): Long = {
    val cps = text.codePoints().toArray
    val n = cps.length
    val dp = Array.fill(n + 1)(Long.MaxValue)
    dp(0) = 0L
    for (j <- 1 to n; len <- 1 to math.min(maxLen, j)) {
      val piece = new String(cps, j - len, len)
      val cost = vocab.get(piece).orElse(if (len == 1) Some(unk) else None)
      cost.foreach { c =>
        if (dp(j - len) != Long.MaxValue)
          dp(j) = math.min(dp(j), dp(j - len) + (c << 16) + 1L)
      }
    }
    dp(n)
  }

  private val planted: Seq[(String, Long)] = Seq(
    ("a", 10L), ("b", 20L), ("ab", 25L), ("ba", 25L), ("aba", 70L), (" ", 5L))

  test("kernel == reference DP on random strings over the planted alphabet") {
    val vocabMap = planted.toMap
    val rnd = new scala.util.Random(1317L) // deterministic property driver
    val alphabet = "abc "
    val samples = (0 until 120).map { _ =>
      val n = rnd.nextInt(24)
      (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    } :+ "" :+ "a" :+ " " :+ "ababab ababab"
    // one Spark job for all samples (a per-sample job is 120 plan builds)
    val got = samples.toDF("text")
      .select(col("text"), Unigram.packed(col("text"), planted, 3, 100L).as("p"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    samples.foreach { s =>
      assert(got(s) == refPacked(s, vocabMap, 3, 100L), s"text='$s'")
    }
  }

  test("planted segmentation: cheaper multi-codepoint piece wins; pieces reconstruct the text") {
    // 'ab' (25) beats 'a'+'b' (30); 'c' is unk
    val byText = Seq("abab", "ab a", "ccc", "").toDF("text")
      .select(col("text"),
        Unigram.pieces(col("text"), planted, 3, 100L).as("pieces"),
        Unigram.packed(col("text"), planted, 3, 100L).as("packed"))
      .collect()
      .map(r => r.getString(0) -> ((r.getSeq[String](1), r.getLong(2))))
      .toMap
    byText("abab")._1 shouldBe Seq("ab", "ab")
    byText("abab")._2 shouldBe ((50L << 16) + 2L)
    byText("ab a")._1 shouldBe Seq("ab", " ", "a")
    byText("ccc")._1 shouldBe Seq("c", "c", "c") // unk per codepoint
    byText("ccc")._2 shouldBe ((300L << 16) + 3L)
    byText("")._1 shouldBe Seq.empty
    byText("")._2 shouldBe 0L
    // every segmentation concatenates back to its text
    byText.foreach { case (t, (ps, _)) => ps.mkString("") shouldBe t }
  }

  test("packed tie-break: equal cost prefers fewer pieces") {
    // 'xy' costs exactly 'x'+'y': the packed objective must pick ONE piece
    val v = Seq(("x", 10L), ("y", 10L), ("xy", 20L))
    val got = spark.range(1).select(
      Unigram.pieces(lit("xy"), v, 2, 100L).as("p")).head().getSeq[String](0)
    got shouldBe Seq("xy")
  }

  test("codepoint semantics: a surrogate pair is one symbol") {
    val clef = new String(Character.toChars(0x1D11E)) // 𝄞, supplementary plane
    val v = Seq((clef, 7L), ("a", 10L))
    val df = Seq(s"a${clef}a").toDF("text").select(
      Unigram.pieces(col("text"), v, 2, 100L).as("p"),
      Unigram.packed(col("text"), v, 2, 100L).as("k"))
    val r = df.head()
    r.getSeq[String](0) shouldBe Seq("a", clef, "a")
    r.getLong(1) shouldBe ((27L << 16) + 3L)
  }

  test("train recovers a planted frequent substring and apply uses it") {
    // 'xy' is planted densely; training must admit it to the vocab and
    // the Viterbi apply must prefer it over per-char segmentation
    val docs = (0 until 200).map(i => s"xyxyxy q$i").toDF("text")
    val vocab = Unigram.train(docs, "text", vocabSize = 40,
      maxPieceLen = 3, iters = 2, seed = 64)
    assert(vocab.exists(_._1 == "xy") || vocab.exists(_._1 == "xyx"),
      s"planted bigram missing from ${vocab.map(_._1)}")
    val pieces = docs.limit(1).select(
      Unigram.pieces(col("text"), vocab, 3, 10000L).as("p"))
      .head().getSeq[String](0)
    assert(pieces.length < "xyxyxy q0".length,
      s"apply should compress beyond chars, got $pieces")
    // vocab is deterministic: same call, same result
    val vocab2 = Unigram.train(docs, "text", vocabSize = 40,
      maxPieceLen = 3, iters = 2, seed = 64)
    vocab2 shouldBe vocab
  }

  test("interpreted eval == codegen for packed and pieces") {
    // force interpreted path via an eval on the expression directly
    val e = UnigramPacked(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString("abab"),
        org.apache.spark.sql.types.StringType),
      planted, 3, 100L)
    val interp = e.eval(null).asInstanceOf[Long]
    val codegen = spark.range(1).select(
      Unigram.packed(lit("abab"), planted, 3, 100L)).head().getLong(0)
    interp shouldBe codegen
  }
}
