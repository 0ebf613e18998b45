package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The safe-default candidate-generation dial: Auto derives the largest
  * df cap whose pair join fits rowsPerDoc × nDocs, stays EXACT when the
  * corpus affords it, and the exact lane is opt-in.
  */
class PairBudgetSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def index(rows: (Long, String)*) = rows.toDF("id", "key")

  test("Exact and Cap pass through; Cap requires a sane cap") {
    val idx = index(1L -> "a")
    assert(PairBudget.resolve(idx, "id", "key", PairBudget.Exact).isEmpty)
    assert(PairBudget.resolve(idx, "id", "key", PairBudget.Cap(7L)).contains(7L))
    intercept[IllegalArgumentException](PairBudget.Cap(0L))
    intercept[IllegalArgumentException](PairBudget.Auto(0L))
  }

  test("Auto stays exact (no cap) when the whole join fits the budget") {
    // 4 docs, one shared key of df 2 -> 1 candidate pair; budget 256*4
    val idx = index(1L -> "a", 2L -> "a", 3L -> "b", 4L -> "c")
    assert(PairBudget.resolve(idx, "id", "key", PairBudget.Auto()).isEmpty)
  }

  test("Auto derives the largest cap whose cumulative pair rows fit") {
    // df histogram: 6 keys at df=2 (6 pairs), 1 key at df=4 (6 pairs),
    // 1 key at df=6 (15 pairs). nDocs = 6; budget = 2*6 = 12.
    // cum: df2 -> 6 <= 12; df4 -> 12 <= 12; df6 -> 27 > 12  => cap = 4
    val idx = (
      // 6 keys each in exactly 2 docs
      (0 until 6).flatMap(k => Seq((1L + k % 3, s"r$k"), (4L + k % 3, s"r$k"))) ++
      // one key in 4 docs
      (1L to 4L).map(d => (d, "mid")) ++
      // one key in all 6 docs
      (1L to 6L).map(d => (d, "hot"))
    ).toDF("id", "key")
    assert(PairBudget.resolve(idx, "id", "key", PairBudget.Auto(2L)).contains(4L))
    // a roomier budget admits the df-6 key too -> no cap binds
    assert(PairBudget.resolve(idx, "id", "key", PairBudget.Auto(5L)).isEmpty)
  }

  test("Auto floors at 2 when even the smallest df group overflows") {
    // 12 keys at df=2 (12 pairs) over 4 docs; budget 1*4 = 4 < 12
    val idx = (0 until 12).flatMap(k =>
      Seq((1L + k % 2, s"k$k"), (3L + k % 2, s"k$k"))).toDF("id", "key")
    assert(PairBudget.resolve(idx, "id", "key", PairBudget.Auto(1L)).contains(2L))
  }

  test("ngramJaccardPairs Auto default == Exact on a corpus that fits") {
    val docs = Seq(
      (0L, "alpha beta gamma delta"),
      (1L, "alpha beta gamma delta"),
      (2L, "epsilon zeta eta theta"),
      (3L, "iota kappa lambda mu")).toDF("doc_id", "text")
    val auto = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      shingle = 2, threshold = 0.0).collect().toSet
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      shingle = 2, threshold = 0.0, budget = PairBudget.Exact).collect().toSet
    assert(auto == exact && auto.nonEmpty)
  }

  test("Winnow.pairs auto dials: planted near-dups kept, boilerplate join bounded") {
    // 30 docs of distinct text sharing one LONG boilerplate run (12
    // tokens -> 10 shared 3-grams; winnow selection inside a window
    // fully contained in the run is context-independent, so df=30
    // fingerprints are guaranteed), plus one planted FULL near-duplicate
    // pair (docs 100/101)
    val boiler = "all rights reserved terms of service apply contact the site administrator today"
    val dup = "the quick brown fox jumps over the lazy dog again and again until dawn"
    val docs = ((1L to 30L).map(i =>
        (i, s"unique$i lead$i words$i $boiler tail$i end$i")) ++
      Seq((100L, dup), (101L, dup))).toDF("doc_id", "text")
    val got = Winnow.pairs(docs, "doc_id", "text", k = 3, w = 4,
      minShared = None, budget = PairBudget.Auto(1L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((100L, 101L)), "planted full near-dup must survive auto dials")
    // the boilerplate fingerprints (df 30 -> 435 pairs each) blow the
    // 1-row/doc budget, so the 30 boilerplate-only docs pair with nobody
    assert(got.forall { case (a, b) => a >= 100L && b >= 100L },
      s"boilerplate-only pairs leaked through the auto cap: $got")
  }
}
