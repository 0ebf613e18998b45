package graft

/** Scale ladder for bench headliners (round-14 directive #1, extended to
  * the FULL headliner set by round-15 directive #6): every bench-flagged
  * query at x1, x16 and x64 of sf0.1, all in ONE JVM session (2 warm-ups
  * + 5 timed passes per (query, dir); min AND median printed) so
  * cross-scale ratios are same-session comparable. Pair with
  * `scripts/duckdb_bench.py` anchors taken the same session — the
  * "constants amortize" attribution predicts monotone-FALLING
  * spark/duckdb ratios as data grows, so any future >2× row is
  * adjudicated from the three-point curve instead of re-argued.
  *
  * `SPARK_GRAFT_LADDER_QUERIES` (comma list) restricts the query set;
  * args restrict the dirs.
  */
object ProbeLadder {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/graft_x16/sf0.1", "/tmp/graft_x64/sf0.1")
    val wanted = sys.env.get("SPARK_GRAFT_LADDER_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val spark = DevSpark.session()
    val qs = graft.queries.Queries.all
      .filter(q => wanted.fold(q.bench)(_.contains(q.name)))
    // SPARK_GRAFT_LADDER_ACTION=noop times the noop sink (computes every
    // output column — the r15 Bench methodology); default stays count()
    // so pre-r15 ladder tables remain comparable
    val useNoop = sys.env.get("SPARK_GRAFT_LADDER_ACTION").contains("noop")
    for (dir <- dirs; qd <- qs) {
      def pass(): Double = {
        val t0 = System.nanoTime()
        if (useNoop) qd.fn(spark, dir).write.format("noop").mode("overwrite").save()
        else qd.fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      pass(); pass() // two warm-ups: page cache + Janino + C2
      val ts = Seq.fill(5)(pass()).sorted
      println(f"[ladder] $dir%-28s ${qd.name}%-22s min=${ts.head}%6.2f s  median=${ts(2)}%6.2f s  max=${ts.last}%6.2f s")
    }
    spark.stop()
  }
}
