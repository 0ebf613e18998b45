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
    val rest = args.filterNot(_ == "--warm")
    val dir = rest.headOption.getOrElse("/tmp/graft_x16/sf0.1")
    val names = rest.drop(1).toSet
    val spark = DevSpark.session()
    val tag = if (warm) "[probeq:warm]" else "[probeq]"
    graft.queries.Queries.all
      .filter(qd => names.isEmpty || names.contains(qd.name))
      .foreach { qd =>
        try {
          def pass(): (Long, Double) = {
            val t0 = System.nanoTime()
            val n = qd.fn(spark, dir).count()
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
