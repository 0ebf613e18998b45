package graft.operators

import graft.SparkTestSession
import graft.functions.CdcRuntime
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Content-defined chunking: kernel vs naive reference, the
  * shift-robustness property the operator exists for (a prefix edit
  * re-synchronizes downstream boundaries; fixed windows lose every
  * downstream match), dial contracts, and pair mining on planted
  * shifted copies.
  */
class CdcSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ref(text: String, mn: Int, bits: Int, mx: Int): Seq[(Int, Int)] = {
    val b = text.getBytes("UTF-8")
    val mask = (1L << bits) - 1
    var h = 0L; var start = 0
    val out = Seq.newBuilder[(Int, Int)]
    for (i <- b.indices) {
      h = ((h << 1) + CdcRuntime.Gear(b(i) & 0xff)) & 0xFFFFFFFFL
      val len = i - start + 1
      if ((len >= mn && (h & mask) == 0L) || len >= mx) {
        out += ((start + 1, len)); start = i + 1; h = 0L
      }
    }
    if (start < b.length) out += ((start + 1, b.length - start))
    out.result()
  }

  test("kernel boundaries == per-byte reference on random text; md5 fps are the chunk bytes'") {
    val rnd = new scala.util.Random(11)
    (1 to 100).foreach { _ =>
      val t = (1 to (rnd.nextInt(600) + 1)).map(_ => ('a' + rnd.nextInt(26)).toChar)
        .mkString.grouped(8).mkString(" ")
      val got = CdcRuntime.boundaries(t.getBytes("UTF-8"), 32, 6, 256)
        .grouped(2).map(a => (a(0) + 1, a(1))).toSeq
      assert(got == ref(t, 32, 6, 256), s"boundary mismatch on len=${t.length}")
    }
  }

  test("chunks cover the text exactly: contiguous, non-overlapping, total = byte length") {
    val t = ("the quick brown fox jumps over the lazy dog " * 20).trim
    val b = CdcRuntime.boundaries(t.getBytes("UTF-8"), 32, 6, 256).grouped(2).toSeq
    assert(b.head(0) == 0)
    b.sliding(2).foreach { case Seq(a, c) => assert(a(0) + a(1) == c(0)); case _ => () }
    assert(b.map(_(1)).sum == t.getBytes("UTF-8").length)
    assert(b.forall(a => a(1) <= 256))
    assert(b.dropRight(1).forall(a => a(1) >= 32), "every non-final chunk >= minSize")
  }

  test("shift-robust: a 3-byte prefix edit re-synchronizes, most chunks survive") {
    // long NON-repetitive text: eligibility of a cut point is
    // content-determined (the gear hash's low mask bits see only the
    // last ~avgBits bytes), so two greedy boundary walks from offset 0
    // and offset 3 converge once they pick one common eligible point —
    // after which every chunk is byte-identical. Repetitive text can
    // alias the min-size suppression window against the period and stay
    // out of phase, which is WHY this fixture is random.
    val rnd = new scala.util.Random(31)
    val base = (1 to 400).map(_ => s"w${rnd.nextInt(100000)}").mkString(" ")
    val shifted = "zq " + base
    def fps(t: String) = CdcRuntime.boundaries(t.getBytes("UTF-8"), 32, 6, 256)
      .grouped(2).map { a =>
        new String(t.getBytes("UTF-8"), a(0), a(1), "UTF-8")
      }.toSeq
    val a = fps(base); val b = fps(shifted)
    val shared = a.toSet.intersect(b.toSet)
    assert(a.size >= 10, s"fixture must produce many chunks, got ${a.size}")
    assert(shared.size >= a.size / 2 && shared.size >= 5,
      s"expected most chunks shared after re-sync, got ${shared.size} of ${a.size}")
    // the contrast: FIXED 64-byte windows share nothing after a 3-byte shift
    def fixed(t: String) = t.getBytes("UTF-8").grouped(64).map(new String(_, "UTF-8")).toSet
    assert(fixed(base).intersect(fixed(shifted)).size <= 1,
      "fixed windows must lose (nearly) every match under the shift — else this operator is pointless")
  }

  test("boundary snap: a cut that would split a multi-byte codepoint lands after it") {
    // 255 ASCII bytes then 'é' (2 bytes at offsets 255-256): the
    // maxSize=256 force-close would cut mid-codepoint; the snap must
    // absorb the continuation byte so every piece is valid UTF-8 and
    // pieces re-concatenate losslessly
    val t = ("a" * 255) + "é" + ("b" * 100)
    val bytes = t.getBytes("UTF-8")
    val b = CdcRuntime.boundaries(bytes, 256, 20, 256).grouped(2).toSeq
    assert(b.head(1) == 257, s"first chunk must absorb the continuation byte, got len ${b.head(1)}")
    val pieces = b.map(a => new String(bytes, a(0), a(1), "UTF-8"))
    assert(pieces.mkString == t, "pieces must re-concatenate to the original text")
    assert(pieces.forall(p => new String(p.getBytes("UTF-8"), "UTF-8") == p),
      "every piece must be self-contained valid UTF-8")
  }

  test("dedupAgainst drops cataloged chunks, reassembles survivors, drops all-cataloged docs") {
    val rnd = new scala.util.Random(41)
    def words(n: Int) = (1 to n).map(_ => s"w${rnd.nextInt(9999)}").mkString(" ")
    val keepPart = words(60)
    val contaminated = words(60)
    val docs = Seq(
      (1L, keepPart + " " + contaminated), // loses its resynced tail chunks
      (2L, contaminated),                  // all chunks cataloged -> drops wholesale
      (3L, words(60))                      // untouched
    ).toDF("doc_id", "text")
    val catalog = Cdc.chunkCatalog(Seq(Tuple1(contaminated)).toDF("text"), "text")
    val out = Cdc.dedupAgainst(docs, "doc_id", "text", catalog)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(!out.contains(2L), "fully-cataloged doc must drop wholesale")
    assert(out(3L) == docs.collect().find(_.getLong(0) == 3L).get.getString(1),
      "doc sharing nothing with the catalog must pass through byte-identical")
    assert(out(1L).length < (keepPart + " " + contaminated).length,
      "contaminated doc must lose its cataloged chunks")
    assert(out(1L).startsWith(keepPart.take(32)),
      "surviving head content must reassemble in order")
  }

  test("Cdc.pairs finds planted shifted copies; unrelated docs do not pair") {
    val rnd = new scala.util.Random(23)
    // ~800-byte docs -> ~6-10 chunks each, so a shifted copy shares well
    // past minShared even after losing its head chunk
    def doc(i: Int) = (1 to 120).map(_ => s"w${rnd.nextInt(5000)}").mkString(" ")
    val base = (1L to 20L).map(i => (i, doc(i.toInt)))
    val corpus = (base ++ base.take(5).map { case (i, t) => (i + 100L, "zq " + t) })
      .toDF("doc_id", "text")
    val got = Cdc.pairs(corpus, "doc_id", "text", minShared = Some(2))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (1L to 5L).foreach(i => assert(got.contains((i, i + 100L)),
      s"planted shifted copy of doc $i must pair"))
    assert(got.forall { case (a, b) => b == a + 100L },
      s"unrelated docs paired: ${got.filterNot { case (a, b) => b == a + 100L }}")
  }

  test("Cdc.pairs auto minShared: derived bar keeps planted copies, cuts weak-overlap pairs") {
    val rnd = new scala.util.Random(53)
    val shared = (1 to 100).map(_ => s"s${rnd.nextInt(5000)}").mkString(" ")
    // every doc carries the same ~660-byte boilerplate head (weak
    // overlap: ~6 shared chunks each) plus a ~20 KB unique body (~200
    // chunks -> derived bar ~10); planted copies share nearly ALL their
    // chunks — the derived bar must separate the two where the floor
    // bar of 2 cannot
    def doc() = shared + " " + (1 to 3000).map(_ => s"w${rnd.nextInt(5000)}").mkString(" ")
    val base = (1L to 12L).map(i => (i, doc()))
    val corpus = (base ++ base.take(4).map { case (i, t) => (i + 100L, "zq " + t) })
      .toDF("doc_id", "text")
    val auto = Cdc.pairs(corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (1L to 4L).foreach(i => assert(auto.contains((i, i + 100L)),
      s"planted shifted copy of doc $i must survive the auto bar"))
    assert(auto.forall { case (a, b) => b == a + 100L },
      s"boilerplate-only overlap must fall under the auto bar: ${auto.filterNot { case (a, b) => b == a + 100L }}")
    // manual floor bar reports the boilerplate pairs the auto bar cuts
    val manual = Cdc.pairs(corpus, "doc_id", "text", minShared = Some(2)).count()
    assert(manual > auto.size, "the derived bar must be stricter than the floor on long docs")
  }

  test("Cdc.pairs on an empty corpus returns empty (auto dials must not throw)") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Cdc.pairs(empty, "doc_id", "text").count() == 0L)
  }

  test("dedupAgainst keeps empty/null docs with clean_text '' (they are not cataloged)") {
    val rnd = new scala.util.Random(61)
    def words(n: Int) = (1 to n).map(_ => s"w${rnd.nextInt(9999)}").mkString(" ")
    val contaminated = words(60)
    val docs = Seq((1L, words(60)), (2L, ""), (3L, null: String), (4L, contaminated))
      .toDF("doc_id", "text")
    val catalog = Cdc.chunkCatalog(Seq(Tuple1(contaminated)).toDF("text"), "text")
    val out = Cdc.dedupAgainst(docs, "doc_id", "text", catalog)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.get(2L).contains(""), "empty doc must survive with clean_text ''")
    assert(out.get(3L).contains(""), "null doc must survive with clean_text ''")
    assert(!out.contains(4L), "fully-cataloged doc still drops wholesale")
    assert(out.contains(1L))
  }

  test("contaminationBloom scores empty/null docs 0.0 (not null), non-empty in [0,1]") {
    val rnd = new scala.util.Random(67)
    def words(n: Int) = (1 to n).map(_ => s"w${rnd.nextInt(9999)}").mkString(" ")
    val contaminated = words(60)
    val docs = Seq((1L, contaminated), (2L, ""), (3L, null: String), (4L, words(60)))
      .toDF("doc_id", "text")
    val cat = Seq(Tuple1(contaminated)).toDF("text")
    val got = Cdc.contaminationBloom(docs, cat, "doc_id", "text", mBits = 1 << 12)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) == 1.0, "fully-cataloged doc must score 1.0")
    assert(got(2L) == 0.0, "empty doc must score 0.0, not null")
    assert(got(3L) == 0.0, "null doc must score 0.0, not null")
    assert(got(4L) >= 0.0 && got(4L) <= 1.0)
  }
}
