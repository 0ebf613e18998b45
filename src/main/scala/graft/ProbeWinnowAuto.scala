package graft

import org.apache.spark.sql.functions._

/** A/B for the Winnow.pairs auto dials (round-14 directive #4): on a
  * documents corpus with PLANTED full near-duplicates (every 97th doc
  * re-added under id+10^7 with identical text), compare
  *   A: the r13 manual dials (minShared=2, df cap 50)
  *   B: the auto dials (minShared from the per-doc fp profile, df cap
  *      from the row budget)
  * on planted-pair recall (both must be 100%), total pair output
  * (B must be bounded on long-doc corpora) and wall time. Run on the
  * length twin (/tmp/graft_x4len16/sf0.1) where the manual dials were
  * measured output-bound (4.39 M pairs, SCALE.md r13).
  */
object ProbeWinnowAuto {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_x4len16/sf0.1")
    val spark = DevSpark.session()
    import graft.operators.{PairBudget, Winnow}
    val docs = spark.read.parquet(sfDir + "/documents.parquet")
      .select(col("doc_id"), col("text"))
    val Off = 10000000L
    val planted = docs.where(col("doc_id") % 97 === 0)
      .select((col("doc_id") + Off).as("doc_id"), col("text"))
    val corpus = docs.union(planted).localCheckpoint(true)
    val nPlanted = planted.count()
    println(s"[winnowAuto] corpus=${corpus.count()} rows, planted=$nPlanted dup pairs")

    def run(tag: String, minShared: Option[Int], budget: PairBudget): Unit = {
      def once(): (Long, Long) = {
        val p = Winnow.pairs(corpus, "doc_id", "text", k = 3, w = 4,
          minShared = minShared, budget = budget).localCheckpoint(true)
        val total = p.count()
        val hits = p.where(col("idB") === col("idA") + Off &&
          col("idA") % 97 === 0).count()
        (total, hits)
      }
      once() // warm
      val t0 = System.nanoTime()
      val (total, hits) = once()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[winnowAuto] $tag%-28s pairs=$total%9d plantedRecall=$hits/$nPlanted time=$sec%.2f s")
    }
    run("A manual (ms=2, cap=50)", Some(2), PairBudget.Cap(50L))
    run("B auto  (derived dials)", None, PairBudget.Auto())
    spark.stop()
  }
}
