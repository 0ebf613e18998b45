package graft

/** Scale ladder for the three >2× x16 headliners (round-14 directive
  * #1): q_revenue_by_nation / q_dedup_exact / q_ann_cosine at x1, x16
  * and x64 of sf0.1, all in ONE JVM session (2 warm-ups + 5 timed
  * passes per (query, dir); min AND median printed) so cross-scale
  * ratios are same-session comparable. Pair with
  * `scripts/duckdb_bench.py` anchors taken the same session — the
  * "constants amortize" attribution predicts monotone-FALLING
  * spark/duckdb ratios as data grows.
  */
object ProbeLadder {
  private val Queries = Seq("q_revenue_by_nation", "q_dedup_exact", "q_ann_cosine")

  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/graft_x16/sf0.1", "/tmp/graft_x64/sf0.1")
    val spark = DevSpark.session()
    val qs = graft.queries.Queries.all.filter(q => Queries.contains(q.name))
    for (dir <- dirs; qd <- qs) {
      def pass(): Double = {
        val t0 = System.nanoTime()
        qd.fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      pass(); pass() // two warm-ups: page cache + Janino + C2
      val ts = Seq.fill(5)(pass()).sorted
      println(f"[ladder] $dir%-28s ${qd.name}%-22s min=${ts.head}%6.2f s  median=${ts(2)}%6.2f s  max=${ts.last}%6.2f s")
    }
    spark.stop()
  }
}
