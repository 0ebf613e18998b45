package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Classic Aho–Corasick multi-pattern automaton (Aho & Corasick, CACM
  * 1975) over UTF-16 chars: ONE pass over the text counts every
  * occurrence of every pattern — including overlapping occurrences and
  * patterns that are substrings of other patterns — where the naive
  * stage (and the SQL oracle) pays one text scan per pattern. This is
  * the C4/RefinedWeb badwords/blocklist content-filtering stage
  * (reference surface: the filter-expression mini-DSL and per-row
  * `bind` closures express a per-pattern `contains`; this kernel is the
  * many-pattern form that survives a 10^4-entry blocklist at 100 TB —
  * automaton size is O(Σ|pattern|), scan cost stays O(|text|)).
  *
  * Build: goto trie over the patterns; BFS fail links (longest proper
  * suffix that is a trie node); per-node OUTPUT COUNT aggregated through
  * the fail chain at build time (`hits(node) = #patterns ending at node
  * + hits(fail(node))`) plus the per-pattern index lists for the
  * counts-vector form — the scan never walks fail chains for output.
  * ASCII transitions are dense int arrays (the hot path on this
  * corpus); non-ASCII chars ride a per-node hash map.
  *
  * Semantics contract (what the oracle replays): occurrences counted at
  * every ending position, overlaps included — "batch batch batch"
  * contains "batch batch" TWICE. Case-sensitive; callers lower() both
  * sides for case-insensitive gating.
  */
final class AcAutomaton(val patterns: Array[String]) extends Serializable {
  require(patterns.nonEmpty, "empty pattern set — gate on nothing is identity")
  require(patterns.forall(_.nonEmpty), "empty-string pattern would match everywhere")

  // trie arrays, grown during build; node 0 = root
  private var asciiNext: Array[Array[Int]] = Array(Array.fill(128)(-1))
  private var wideNext: Array[java.util.HashMap[Character, Integer]] = Array(null)
  private var fail: Array[Int] = Array(0)
  // pattern indices ending EXACTLY at this node (pre-fail-closure)
  private var ends: Array[List[Int]] = Array(Nil)

  private def addNode(): Int = {
    asciiNext :+= Array.fill(128)(-1)
    wideNext :+= null
    fail :+= 0
    ends :+= Nil
    asciiNext.length - 1
  }

  private def childOf(s: Int, c: Char): Int =
    if (c < 128) asciiNext(s)(c)
    else {
      val m = wideNext(s)
      if (m == null) -1 else { val v = m.get(c); if (v == null) -1 else v.intValue() }
    }

  private def link(s: Int, c: Char, t: Int): Unit =
    if (c < 128) asciiNext(s)(c) = t
    else {
      if (wideNext(s) == null) wideNext(s) = new java.util.HashMap[Character, Integer]()
      wideNext(s).put(c, t)
    }

  // ---- build: trie + BFS fail links + fail-closed outputs ----
  patterns.zipWithIndex.foreach { case (p, pi) =>
    var s = 0
    var i = 0
    while (i < p.length) {
      val c = p.charAt(i)
      var t = childOf(s, c)
      if (t < 0) { t = addNode(); link(s, c, t) }
      s = t
      i += 1
    }
    ends(s) = pi :: ends(s)
  }
  /** pattern indices matched when the scan is AT this node (fail-closed). */
  private val outIdx: Array[Array[Int]] = {
    val out = Array.fill(fail.length)(Array.empty[Int])
    val queue = new java.util.ArrayDeque[Int]()
    // depth-1 nodes fail to root
    var c = 0
    while (c < 128) { val t = asciiNext(0)(c); if (t > 0) { fail(t) = 0; queue.add(t) }; c += 1 }
    if (wideNext(0) != null) wideNext(0).values().forEach(t => { fail(t) = 0; queue.add(t) })
    out(0) = ends(0).toArray
    // BFS in fail order so out(fail(t)) is final before out(t) reads it
    val order = new scala.collection.mutable.ArrayBuffer[Int]()
    while (!queue.isEmpty) {
      val s = queue.poll()
      order += s
      def push(ch: Char, t: Int): Unit = {
        // fail(t): follow s's fail chain until a node with a ch-child
        var f = fail(s)
        while (f != 0 && childOf(f, ch) < 0) f = fail(f)
        val ft = childOf(f, ch)
        fail(t) = if (ft >= 0 && ft != t) ft else 0
        queue.add(t)
      }
      var c2 = 0
      while (c2 < 128) { val t = asciiNext(s)(c2); if (t >= 0) push(c2.toChar, t); c2 += 1 }
      if (wideNext(s) != null) wideNext(s).forEach((ch, t) => push(ch.charValue(), t.intValue()))
    }
    order.foreach { s => out(s) = (ends(s) ++ out(fail(s))).toArray }
    out
  }

  /** Next state from `s` on char `c` (goto with fail fallback). */
  private def step(s0: Int, c: Char): Int = {
    var s = s0
    var t = childOf(s, c)
    while (t < 0 && s != 0) { s = fail(s); t = childOf(s, c) }
    if (t < 0) 0 else t
  }

  /** Per-pattern occurrence counts over `text` in one pass. */
  def countAll(text: UTF8String): Array[Long] = {
    val counts = new Array[Long](patterns.length)
    if (text == null) return counts
    val s = text.toString
    var state = 0
    var i = 0
    while (i < s.length) {
      state = step(state, s.charAt(i))
      val out = outIdx(state)
      var j = 0
      while (j < out.length) { counts(out(j)) += 1L; j += 1 }
      i += 1
    }
    counts
  }
}

/** graft_ac_counts(text): array<long> of per-pattern occurrence counts
  * (overlaps included) under a plan-constant automaton — one codegen'd
  * scan for the whole blocklist.
  */
case class AcCounts(child: Expression, patterns: Seq[String]) extends UnaryExpression {
  override def prettyName: String = "graft_ac_counts"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  @transient private lazy val ac = new AcAutomaton(patterns.toArray)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.simpleString}")
  }
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(ac.countAll(input.asInstanceOf[UTF8String]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("graftAc", ac, classOf[AcAutomaton].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($acRef.countAll($v));")
  }
  override protected def withNewChildInternal(c: Expression): AcCounts =
    copy(child = c)
}

object AhoCorasick {
  /** Per-pattern occurrence counts of `patterns` in `text` (one scan). */
  def countsCol(text: Column, patterns: Seq[String]): Column =
    GraftBridge.column(AcCounts(GraftBridge.expression(text), patterns))
}
