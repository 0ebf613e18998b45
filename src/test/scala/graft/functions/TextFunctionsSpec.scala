package graft.functions

import graft.SparkTestSession
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class TextFunctionsSpec extends AnyFunSuite {

  test("normalizeText: NFC composition, control strip, whitespace collapse") {
    val sp = SparkTestSession.spark
    import sp.implicits._
    import org.apache.spark.sql.functions.col
    // "e" + combining acute (U+0301) must equal precomposed e-acute after NFC
    val decomposed = "Cafe\u0301   menu\t\ttwo"
    val precomposed = "Caf\u00e9 menu two"
    val got = Seq(decomposed).toDF("t")
      .select(TextFunctions.normalizeText(col("t"))).collect().head.getString(0)
    assert(got == precomposed)
    // newlines survive (only spaces/tabs collapse; controls except \n\t strip)
    val nl = Seq("a\nb\u0000c").toDF("t")
      .select(TextFunctions.normalizeText(col("t"))).collect().head.getString(0)
    assert(nl == "a\nbc")
  }

  test("tokenChunks: overlap windows, stride>size emits no empty window, short text one window") {
    val sp = SparkTestSession.spark
    import sp.implicits._
    def chunks(text: String, size: Int, stride: Int): Seq[String] =
      Seq(text).toDF("t").select(TextFunctions.tokenChunks(col("t"), size, stride))
        .collect().head.getSeq[String](0)
    val ten = (1 to 10).map(i => s"w$i").mkString(" ")
    // overlapping windows (stride < size)
    assert(chunks(ten, 4, 3) == Seq("w1 w2 w3 w4", "w4 w5 w6 w7", "w7 w8 w9 w10"))
    // stride > size: starts 0 and 5 only — start 10 is past the last token
    // and must not yield an empty chunk (ADVICE r01)
    assert(chunks(ten, 2, 5) == Seq("w1 w2", "w6 w7"))
    // text shorter than one window → exactly one partial window
    assert(chunks("a b", 40, 30) == Seq("a b"))
  }

  test("tokenChunks properties: windows cover every token; correct starts for any size/stride") {
    val sp = SparkTestSession.spark
    import sp.implicits._
    val words = (1 to 23).map(i => s"t$i")
    val text = words.mkString(" ")
    for (size <- Seq(1, 3, 7, 23, 40); stride <- Seq(1, 3, 7, 25)) {
      val chunks = Seq(text).toDF("t")
        .select(TextFunctions.tokenChunks(col("t"), size, stride))
        .collect().head.getSeq[String](0)
      assert(chunks.nonEmpty)
      chunks.zipWithIndex.foreach { case (c, i) =>
        val start = i * stride
        assert(start < 23, s"size=$size stride=$stride: window $i starts past the text")
        assert(c == words.slice(start, start + size).mkString(" "),
          s"size=$size stride=$stride window $i")
      }
      // coverage: when stride <= size every token appears in some window,
      // and no window beyond the first one to reach the tail is emitted
      if (stride <= size) {
        val seen = chunks.flatMap(_.split(" ")).toSet
        assert(words.forall(seen.contains), s"size=$size stride=$stride misses tokens")
        if (chunks.size > 1)
          assert((chunks.size - 2) * stride + size < 23,
            s"size=$size stride=$stride emits a redundant trailing window")
      }
    }
  }

  test("redactPii scrubs emails/urls/phones, leaves ordinary text alone") {
    val sp = SparkTestSession.spark
    import sp.implicits._
    def red(s: String): String =
      Seq(s).toDF("t").select(TextFunctions.redactPii(col("t"))).collect().head.getString(0)
    assert(red("mail me at jo.do+x@sub.example.org please") == "mail me at <EMAIL> please")
    assert(red("see https://example.com/a?b=1#c and ftp://host/f") == "see <URL> and <URL>")
    assert(red("call +1 (555) 010-4567 today") == "call <PHONE> today")
    assert(red("or (555) 010-4567 works") == "or <PHONE> works")
    // conservative: a phone needs a '+' or parens anchor — bare digit runs
    // (versions, years, ISO dates, ranges, IPs, ISBNs) all survive
    assert(red("v2.3.1 released in 2024, section 3.4") == "v2.3.1 released in 2024, section 3.4")
    assert(red("released on 2024-01-15, the war of 1914-1918")
      == "released on 2024-01-15, the war of 1914-1918")
    assert(red("server at 192.168.10.1, ISBN 978-0-13-468599-1")
      == "server at 192.168.10.1, ISBN 978-0-13-468599-1")
  }

  test("multimodal resize updates image meta + payload, leaves non-images alone") {
    val sp = SparkTestSession.spark
    val media = graft.operators.Multimodal.synthetic(sp, 30)
    val resized = graft.operators.Multimodal.resize(media, 32, 32).collect()
    resized.filter(_.meta.mediaType == "image").foreach { m =>
      assert(m.meta.width == 32 && m.meta.height == 32)
      assert(m.payload.nonEmpty)
    }
    val orig = media.collect().map(m => m.id -> m).toMap
    resized.filter(_.meta.mediaType != "image").foreach { m =>
      assert(m.meta == orig(m.id).meta && m.payload.sameElements(orig(m.id).payload))
    }
  }
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def one(text: String, c: org.apache.spark.sql.Column): Any =
    Seq(text).toDF("t").select(c).collect().head.get(0)

  test("tokenCount splits on whitespace runs") {
    assert(one("a  b\tc\nd", tokenCount(col("t"))) == 4)
    assert(one("  spaced  ", tokenCount(col("t"))) == 1)
  }

  test("bpeTokenCount counts letter runs, digit runs, punct, contractions") {
    assert(one("it's 42 ok!", bpeTokenCount(col("t"))) == 5) // it | 's | " 42" | " ok" | !
  }

  test("fingerprint is whitespace/case-canonical md5") {
    val a = one("Hello   World", fingerprint(col("t")))
    val b = one("hello world", fingerprint(col("t")))
    val c = one("hello worlds", fingerprint(col("t")))
    assert(a == b && a != c)
  }

  test("fingerprint64 matches xxhash64 semantics and differs across texts") {
    val a = one("abc", fingerprint64(col("t")))
    val b = one("abd", fingerprint64(col("t")))
    assert(a != b)
  }

  test("wordShingles builds n-grams; short texts degrade to one shingle") {
    assert(one("a b c d", wordShingles(col("t"), 3)) ==
      Seq("a b c", "b c d"))
    assert(one("a b", wordShingles(col("t"), 3)) == Seq("a b"))
  }

  test("langId identifies real multilingual samples") {
    val samples = Seq(
      ("the cat is on the table and it is happy to be there with his friends", "en"),
      ("der Hund ist nicht mit der Katze im Haus und das ist auch gut für alle", "de"),
      ("le chat est dans la maison et il est très content de la situation", "fr"),
      ("el perro está en la casa y no quiere salir de su lugar por la noche", "es"),
      ("这是一个中文句子用来测试语言识别功能是否正常工作", "zh"),
      ("これは日本語のテスト文です言語識別のために書かれました", "ja"),
      ("이것은 한국어 테스트 문장입니다 언어 식별을 위해 작성되었습니다", "ko"),
      ("это русское предложение для проверки определения языка в системе", "ru"))
    val got = samples.map(_._1).toDF("t").select(langId(col("t"))).collect().map(_.getString(0))
    val expected = samples.map(_._2)
    assert(got.toSeq == expected)
  }

  test("langId edge semantics: empty/und, shared-stopword tie keeps list order") {
    def id(s: String): String =
      Seq(s).toDF("t").select(langId(col("t"))).head().getString(0)
    assert(id("") == "und")
    assert(id("   ") == "und")
    assert(id("xyzzy plugh quux") == "und")
    // "la" is a stopword of fr, es AND it: equal scores must keep the
    // EARLIEST language in the candidate order (fr before es/it) — the
    // strictly-greater fold the Column composition used
    assert(id("la la la") == "fr")
    // script gate precedence: kana (checked first) beats a han-heavy mix
    // once STRICTLY above the 5% bar (2/20 = 10%)...
    assert(id("中中中中中中中中中中中中中中中中中中けけ") == "ja")
    // ...but exactly AT the bar (1/20 = 5%) the strictly-greater test
    // falls through to the han branch
    assert(id("中中中中中中中中中中中中中中中中中中中け") == "zh")
  }

  test("qualityFeatures: native expression == the r1-r8 Column composition, bit for bit") {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.functions._
    // the retired composition, kept verbatim as the reference impl
    def legacy(text: Column): Column = {
      val t = trim(text)
      val nChars = length(t).cast("double")
      val toks = TextFunctions.tokens(t)
      val nWords = size(toks).cast("double")
      val alpha = length(regexp_replace(t, "[^\\p{L}]", "")).cast("double")
      val punct = length(regexp_replace(t, "[^\\p{Punct}]", "")).cast("double")
      val stop = size(filter(toks, w => lower(w).isin(TextFunctions.EnStop: _*))).cast("double")
      val uniq = size(array_distinct(toks)).cast("double")
      struct(
        nChars.as("n_chars"),
        nWords.as("n_words"),
        (alpha / greatest(nChars, lit(1.0))).as("alpha_ratio"),
        (punct / greatest(nChars, lit(1.0))).as("punct_ratio"),
        (stop / greatest(nWords, lit(1.0))).as("stopword_ratio"),
        (nChars / greatest(nWords, lit(1.0))).as("mean_word_len"),
        (uniq / greatest(nWords, lit(1.0))).as("distinct_ratio"))
    }
    val sp = SparkTestSession.spark
    import sp.implicits._
    val samples = Seq(
      "", "   ", "The quick brown fox jumps over the lazy dog.",
      "THE THE the ThE", "a", "!!! ??? ... ;;;",
      "Café déjà vu über straße",
      "中文文本 and english mixed",
      "num8er5 m1xed w1th w0rds 12345",
      "tabs\tand\nnewlines   collapse?", "😀 emoji 🎉 test",
      "repeat repeat repeat repeat unique",
      "AKT the of and (Kelvin-sign edge)",
      "punct-uation: semi;colons, (parens) [brackets] {braces} @at #hash")
    val df = samples.toDF("t")
    val both = df.select(
      qualityFeatures(col("t")).as("n"), legacy(col("t")).as("l"),
      qualityScore(col("t")).as("ns"))
      .collect()
    both.zip(samples).foreach { case (r, s) =>
      assert(r.getStruct(0) == r.getStruct(1), s"features diverge on: '$s'")
    }
  }

  test("qualityScore favors diverse prose over degenerate text") {
    val prose = "The quick brown fox jumps over the lazy dog near a quiet river bank today."
    val repeated = "spam spam spam spam spam spam spam spam spam spam spam spam"
    val punct = "!!! ??? *** !!! ??? *** !!! ??? ***"
    val sp = one(prose, qualityScore(col("t"))).asInstanceOf[Double]
    val sr = one(repeated, qualityScore(col("t"))).asInstanceOf[Double]
    val sx = one(punct, qualityScore(col("t"))).asInstanceOf[Double]
    assert(sp > sr && sr > sx)
    assert(sp > 0.8 && sx < 0.6)
  }

  test("qualityFeatures exposes the raw ratios") {
    val r = Seq("ab cd!").toDF("t").select(qualityFeatures(col("t")).as("f"))
      .select("f.n_chars", "f.n_words", "f.punct_ratio").collect().head
    assert(r.getDouble(0) == 6.0 && r.getDouble(1) == 2.0)
    assert(math.abs(r.getDouble(2) - 1.0 / 6.0) < 1e-12)
  }
}
