package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** RefinedWeb line-wise corrections: each rule pinned independently,
  * blank-line structure preserved, exact-integer uppercase-ratio
  * boundary, the whole-doc removed-bytes drop, and the zero-shuffle
  * plan shape.
  */

class LineCorrectionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("each rule fires independently; blanks kept; doc drops past the removed-bytes budget") {
    val docs = Seq(
      (1L, "real content line here\nTHIS IS AN ALL CAPS HEADER\nmore real content"),
      (2L, "good line\n12345\n$$$ !!!\nanother good line"),
      (3L, "good line\n42 likes\n7 comments\nanother good line"),
      (4L, "good line with plenty of real content\nplease sign in\nclick here\nread more\nanother good line with plenty more content"),
      (5L, "first\n\nsecond"), // blank line is structure, kept
      (6L, "ok\nTHIS ENTIRE DOCUMENT IS A GIANT SHOUTING ALL CAPS HEADER BLOCK")
    ).toDF("doc_id", "text")
    val out = LineCorrections.clean(docs, "doc_id", "text",
        maxRemovedNum = 1, maxRemovedDen = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "real content line here\nmore real content")
    assert(out(2L) == "good line\nanother good line")
    assert(out(3L) == "good line\nanother good line")
    assert(out(4L) == "good line with plenty of real content\nanother good line with plenty more content")
    assert(out(5L) == "first\n\nsecond")
    assert(!out.contains(6L), "doc with >1/2 of its line bytes removed must drop wholesale")
  }

  test("mixed-case and short-uppercase boundaries: ratio is an exact integer comparison") {
    val docs = Seq(
      (1L, "AAAAb"),   // 4 upper / 5 letters = 0.8 > 0.6 -> drop -> doc empties, rm>1/2 -> doc drops
      (2L, "AAAbb"),   // 3/5 = 0.6, NOT > 0.6 -> kept
      (3L, "A b c d e f g h")).toDF("doc_id", "text") // 1/8 upper, kept
    val out = LineCorrections.clean(docs, "doc_id", "text",
        maxRemovedNum = 1, maxRemovedDen = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(!out.contains(1L))
    assert(out(2L) == "AAAbb")
    assert(out(3L) == "A b c d e f g h")
  }

  test("RE2 split/ws parity: trailing tab/CR is a kept edge field; \\x0B is not whitespace") {
    val docs = Seq(
      // 'log in now\t' splits to 4 fields (trailing empty KEPT, matching
      // regexp_split_to_array / Spark split(limit=-1)) -> stub rule off
      (1L, "solid opening content line\nlog in now\t\nsolid closing content line"),
      // CRLF document: every line ends in \r after splitting on \n; the
      // \r survives the space-only trim and still counts a field boundary
      (2L, "solid opening content line\r\nplease log in\r\nsolid closing content line\r"),
      // \x0B is NOT RE2 whitespace: the counter's \s*$ must not consume
      // it, so '42 likes\x0B' is not a counter line and is kept
      (3L, "solid opening content line\n42 likes" + "\u000B" + "\nsolid closing content line"),
      // control: the same stub with a trailing SPACE is trimmed -> 3
      // fields -> dropped
      (4L, "solid opening content line\nplease log in \nsolid closing content line")
    ).toDF("doc_id", "text")
    val out = LineCorrections.clean(docs, "doc_id", "text",
        maxRemovedNum = 1, maxRemovedDen = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "solid opening content line\nlog in now\t\nsolid closing content line")
    assert(out(2L) == "solid opening content line\r\nplease log in\r\nsolid closing content line\r")
    assert(out(3L) == "solid opening content line\n42 likes" + "\u000B" + "\nsolid closing content line")
    assert(out(4L) == "solid opening content line\nsolid closing content line")
  }

  test("zero-shuffle: the operator is a pure projection + filter") {
    val docs = Seq((1L, "a line\nB LINE")).toDF("doc_id", "text")
    val out = LineCorrections.clean(docs, "doc_id", "text")
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
