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
}
