package graft

/** Dev probe: run NAMED queries against an arbitrary data dir (default
  * the x16 corpus) — timing + row count + error capture; the targeted
  * companion to [[ProbeAllScale]].
  *
  * `--warm` runs every selected query twice and reports the SECOND
  * time: a first-in-session execution pays page-cache and Janino/JIT
  * warm-in (measured 2-3× its steady state on kernel-heavy queries —
  * ProbeCurr), so cold single-shot rows must never be quoted as a
  * query's cost. Without the flag, output is the cold time (useful for
  * spotting compile-cost regressions, labeled as such).
  */
object ProbeQueriesAt {
  def main(args: Array[String]): Unit = {
    val warm = args.contains("--warm")
    // --noop (r16): time the noop sink instead of count() — count lets
    // the optimizer prune computed output columns (guide §1.4), so
    // kernel-tailed queries (q_bpe_bytes, the LM family) under-read
    val noop = args.contains("--noop")
    val rest = args.filterNot(a => a == "--warm" || a == "--noop")
    val dir = rest.headOption.getOrElse("/tmp/graft_x16/sf0.1")
    val names = rest.drop(1).toSet
    val spark = DevSpark.session()
    val tag = (if (warm) "[probeq:warm]" else "[probeq]") + (if (noop) "[noop]" else "")
    graft.queries.Queries.all
      .filter(qd => names.isEmpty || names.contains(qd.name))
      .foreach { qd =>
        try {
          def pass(): (Long, Double) = {
            val t0 = System.nanoTime()
            val df = qd.fn(spark, dir)
            val n = if (noop) {
              df.write.format("noop").mode("overwrite").save(); -1L
            } else df.count()
            (n, (System.nanoTime() - t0) / 1e9)
          }
          if (warm) pass()
          val (n, t) = pass()
          println(f"$tag ${qd.name}%-36s $t%7.2f s  $n%9d rows")
        } catch {
          case e: Throwable => println(f"$tag ${qd.name}%-36s   ERROR  " +
            e.getClass.getSimpleName + ": " +
            Option(e.getMessage).getOrElse("").replaceAll("\\s+", " ").take(160))
        }
      }
    spark.stop()
  }
}
