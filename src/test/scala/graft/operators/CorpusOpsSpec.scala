package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant tests for the corpus-construction operators: sequence
  * packing layout arithmetic and temperature mixture sampling.
  */
class CorpusOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("packByBudget invariants: offsets in range, ids monotone, layout matches cumsum") {
    val rnd = new scala.util.Random(17)
    val docs = (0 until 300).map(i => (s"s${i % 3}", i.toLong, 1L + rnd.nextInt(200)))
    val out = Packing.packByBudget(docs.toDF("src", "id", "toks"), "src", "id", "toks", 128L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    for ((src, group) <- out.groupBy(_._1)) {
      var cum = 0L
      for ((_, _, toks, exampleId, offset) <- group.sortBy(_._2)) {
        assert(offset >= 0 && offset < 128, s"$src offset $offset out of range")
        assert(exampleId == cum / 128 && offset == cum % 128,
          s"$src layout diverged from the cumulative sum")
        cum += toks
      }
      val ids = group.sortBy(_._2).map(_._4)
      assert(ids.sameElements(ids.sorted), s"$src example ids must be monotone in doc order")
    }
  }

  test("packWithLossMask: mask span sits right after the prompt, straddles boundaries") {
    // budget 10. stream layout (order by id):
    //   id 1: p=3 r=4  -> doc at 0,  mask at 3      (example 0)
    //   id 2: p=2 r=5  -> doc at 7,  mask at 9: example 0 offset 9,
    //                     response tokens 9..13 STRADDLE into example 1
    //   id 3: p=1 r=1  -> doc at 14 (example 1, offset 4), mask at 15
    val df = Seq(("s", 1L, 3L, 4L), ("s", 2L, 2L, 5L), ("s", 3L, 1L, 1L))
      .toDF("src", "id", "p", "r")
    val out = Packing.packWithLossMask(df, "src", "id", "p", "r", budget = 10L)
      .collect().map(r => r.getLong(1) ->
        (r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8))).toMap
    //                 (example_id, offset, mask_example_id, mask_offset, mask_len)
    assert(out(1L) == ((0L, 0L, 0L, 3L, 4L)))
    assert(out(2L) == ((0L, 7L, 0L, 9L, 5L)))
    assert(out(3L) == ((1L, 4L, 1L, 5L, 1L)))
  }

  test("preferencePairs: max-margin pair per prompt, ties to smaller id, margin gate") {
    val rows = Seq(
      ("p1", 1L, 100L), ("p1", 2L, 900L), ("p1", 3L, 900L), ("p1", 4L, 50L),
      ("p2", 5L, 10L), ("p2", 6L, 15L),   // margin 5 < 100: filtered
      ("p3", 7L, 42L))                     // single candidate: chosen == rejected, dropped
    val got = Preference.preferencePairs(rows.toDF("p", "cand", "s"),
        "p", "cand", "s", "cand", minMargin = 100L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    // p1: chosen = id 2 (900, tie beats 3), rejected = id 4 (50), margin 850
    assert(got.toSeq == Seq("p1" -> ((2L, 900L, 4L, 50L, 850L))))
  }

  test("negativeSample: deterministic LCG draws from the ranked pool, positives excluded") {
    val positives = Seq((10L, 100L), (11L, 101L)).toDF("q", "pos")
    val pool = (100L to 119L).toDF("item")
    val got = Preference.negativeSample(positives, "q", "pos", pool, "item", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // replay: idx = lcg31(q*16 + j) % 20 over the sorted pool
    val items = (100L to 119L).toArray
    val want = (for {
      (q, pos) <- Seq((10L, 100L), (11L, 101L)); j <- 0L until 4L
      neg = items((graft.core.Flow.lcg31(q * 16 + j) % 20).toInt) if neg != pos
    } yield (q, pos, j, neg)).toSet
    assert(got.toSet == want)
    assert(got.forall { case (_, pos, _, neg) => neg != pos && neg >= 100 && neg <= 119 })
    assert(got.groupBy(_._1).forall(_._2.length <= 4))
  }

  test("mixture sample is deterministic, caps at whole sources, and flattens shares") {
    // source a dominates 10:1; sqrt flattening must keep a smaller share
    // of a than of b
    val rows = (0 until 2000).map(i => (i.toLong, if (i % 11 == 0) "b" else "a"))
    val df = rows.toDF("id", "src")
    val s1 = Mixture.sqrtMixtureSample(df, "src", "id", 0.5)
      .collect().map(_.getLong(1)).toSet
    val s2 = Mixture.sqrtMixtureSample(df, "src", "id", 0.5)
      .collect().map(_.getLong(1)).toSet
    assert(s1 == s2, "same inputs must sample the same rows")
    val byId = rows.toMap
    val keptA = s1.count(byId(_) == "a").toDouble / rows.count(_._2 == "a")
    val keptB = s1.count(byId(_) == "b").toDouble / rows.count(_._2 == "b")
    assert(keptB > keptA, s"sqrt flattening must favor the minority source ($keptA vs $keptB)")
    assert(keptB <= 1.0)
    // total lands near the target fraction (LCG is uniform-ish)
    val total = s1.size.toDouble / rows.size
    assert(total > 0.35 && total < 0.65, s"total kept fraction $total far from 0.5")
  }

  test("token-weighted mixture: mass decides the rates, weight(1) degenerates to row counts") {
    // source 'big' = 10 docs x 100 tokens (1000 tokens); 'many' = 100 docs
    // x 1 token (100 tokens). By DOC count 'many' dominates 10:1; by TOKEN
    // mass 'big' dominates 10:1 — the two weightings must flip which
    // source gets the capped/high rate
    val rows = (0 until 10).map(i => (i.toLong, "big", 100L)) ++
      (100 until 200).map(i => (i.toLong, "many", 1L))
    val df = rows.toDF("id", "src", "n_tok")
    def thr(rates: org.apache.spark.sql.DataFrame): Map[String, Long] =
      rates.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val byDoc = thr(Mixture.sqrtMixtureRates(df, "src", 0.5))
    val byTok = thr(Mixture.sqrtMixtureRatesBy(df, "src", col("n_tok"), 0.5))
    assert(byDoc("big") > byDoc("many"),
      s"doc-count weighting must up-rate the FEW-docs source: $byDoc")
    assert(byTok("many") > byTok("big"),
      s"token weighting must up-rate the LOW-mass source: $byTok")
    // weight(1) is exactly the row-count form
    assert(thr(Mixture.sqrtMixtureRatesBy(df, "src", lit(1L), 0.5)) == byDoc)
    // expected kept token mass ~ 0.5 * total (law of large numbers over
    // the per-row LCG; wide band — 110 rows)
    val kept = Mixture.applyRates(df, "src", "id",
        Mixture.sqrtMixtureRatesBy(df, "src", col("n_tok"), 0.5))
      .agg(org.apache.spark.sql.functions.sum(col("n_tok"))).head().getLong(0)
    assert(kept > 300 && kept < 800, s"kept token mass $kept far from 550")
  }

  /** Reference greedy UniMax loop (ascending size; source j capped iff its
    * full n·E fits the fair share n·E·left ≤ remaining; uncapped sources
    * split the final remainder with floor division) — the semantics
    * unimaxQuotas' closed-form window math must reproduce.
    */
  private def greedyUnimax(sizes: Seq[(String, Long)], budgetNum: Long,
      budgetDen: Long, e: Long): Map[String, Long] = {
    val total = sizes.map(_._2).sum
    val b = total * budgetNum / budgetDen
    val asc = sizes.sortBy(x => (x._2, x._1))
    var remaining = b
    var left = asc.size
    val out = scala.collection.mutable.Map[String, Long]()
    var uncapped = List.empty[String]
    for ((s, n) <- asc) {
      if (n * e * left <= remaining) { out(s) = n * e; remaining -= n * e; left -= 1 }
      else uncapped ::= s
    }
    val share = if (uncapped.isEmpty) 0L else remaining / uncapped.size
    uncapped.foreach(out(_) = share)
    out.toMap
  }

  test("unimaxQuotas == greedy reference across budget/epoch regimes") {
    val sizes = Seq("a" -> 2L, "b" -> 4L, "c" -> 8L, "d" -> 30L, "e" -> 100L, "f" -> 400L)
    val rows = sizes.flatMap { case (s, n) => (0L until n).map(i => (s, i)) }
    val df = rows.toDF("src", "id")
    for ((num, den, e) <- Seq((3L, 2L, 4), (1L, 2L, 4), (1L, 1L, 2), (4L, 1L, 2), (10L, 1L, 3))) {
      val got = Mixture.unimaxQuotas(df, "src", num, den, e)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val want = greedyUnimax(sizes, num, den, e.toLong)
      assert(got.view.mapValues(_._2).toMap == want,
        s"budget $num/$den E=$e: ${got.view.mapValues(_._2).toMap} != $want")
      assert(got.forall { case (s, (n, _)) => n == sizes.toMap.apply(s) })
      // invariants: quota never exceeds n·E; budget never overspent
      assert(got.values.forall { case (n, q) => q <= n * e })
      val total = sizes.map(_._2).sum
      assert(got.values.map(_._2).sum <= total * num / den)
    }
    // budget >= E·total: every source capped at exactly E epochs
    val all = Mixture.unimaxQuotas(df, "src", 10, 1, 2)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(all == sizes.map { case (s, n) => s -> n * 2 }.toMap)
  }

  test("unimaxQuotasBy: token-mass quotas match the greedy reference on masses") {
    // rows carry a token weight; quotas must be computed on the MASS
    // (a few huge docs = a big source), matching greedyUnimax run on the
    // per-source mass totals
    val rows = Seq(("big", 1L, 500L), ("big", 2L, 500L),   // mass 1000
      ("mid", 3L, 50L), ("mid", 4L, 50L), ("mid", 5L, 100L), // mass 200
      ("tiny", 6L, 10L))                                     // mass 10
    val df = rows.toDF("src", "id", "w")
    val masses = Seq("big" -> 1000L, "mid" -> 200L, "tiny" -> 10L)
    for ((num, den, e) <- Seq((3L, 2L, 4), (1L, 2L, 2), (10L, 1L, 3))) {
      val got = Mixture.unimaxQuotasBy(df, "src", col("w"), num, den, e)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got.view.mapValues(_._2).toMap == greedyUnimax(masses, num, den, e.toLong),
        s"budget $num/$den E=$e")
      assert(got.view.mapValues(_._1).toMap == masses.toMap, "n must be the mass")
    }
    // weight(1) degenerates to the row-count form exactly
    val byOne = Mixture.unimaxQuotasBy(df, "src", lit(1L), 3, 2, 4)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val byCount = Mixture.unimaxQuotas(df, "src", 3, 2, 4)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(byOne == byCount)
  }

  test("unimaxApply: full epochs exact, partial epoch deterministic and within the source") {
    val sizes = Seq("a" -> 4L, "b" -> 100L)
    val rows = sizes.flatMap { case (s, n) => (0L until n).map(i => (s, s.hashCode.toLong * 1000 + i)) }
    val df = rows.toDF("src", "id")
    // budget = 52, E=4: a capped at 16 (4·4·2 + 0 = 32 <= 52); b gets 36
    val quotas = Mixture.unimaxQuotas(df, "src", 1, 2, 4)
    val q = quotas.collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(q == Map("a" -> 16L, "b" -> 36L))
    val applied = Mixture.unimaxApply(df, "src", "id", quotas)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // a: quota 16 = 4 FULL epochs of 4 rows — exact, no partial
    assert(applied.count(_._1 == "a") == 16)
    assert(applied.filter(_._1 == "a").map(_._3).toSet == Set(0L, 1L, 2L, 3L))
    // b: quota 36 = 0 full epochs + partial ~36/100: every kept row has
    // epoch 0 and appears once; count is LCG-approximate, not exact
    val bRows = applied.filter(_._1 == "b")
    assert(bRows.forall(_._3 == 0L))
    assert(bRows.map(_._2).distinct.length == bRows.length)
    assert(bRows.length > 15 && bRows.length < 60, s"partial epoch kept ${bRows.length} of ~36")
    // deterministic end to end
    val again = Mixture.unimaxApply(df, "src", "id", quotas)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(applied.sorted.sameElements(again.sorted))
  }

  test("unimaxApply: token-mass quotas with n >= 2^32 compute the exact threshold (no overflow)") {
    // the old long-product threshold overflowed for n >= 2^32 and raised;
    // the decimal(38,0) per-source division is exact at any long mass —
    // n = 2^32, quota = 1.5n: full = 1, residual rate 1/2, so the partial
    // epoch keeps exactly the rows with lcg31(id) < 2^30
    val ids = (0L until 64L).toSeq
    val df = ids.map(("a", _)).toDF("src", "id")
    val quotas = Seq(("a", 4294967296L, 6442450944L)).toDF("src", "n", "quota")
    val got = Mixture.unimaxApply(df, "src", "id", quotas)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val expectedPartial = ids.filter(graft.core.Flow.lcg31(_) < 1073741824L).toSet
    assert(got.count(_._2 == 0L) == 64, "every row gets the one full epoch")
    assert(got.filter(_._2 == 1L).map(_._1).toSet == expectedPartial,
      "partial epoch is the exact lcg31 < 2^30 slice")
    // negative-threshold silent drop would have emptied the partial epoch
    assert(expectedPartial.nonEmpty)
  }
}
