package graft

/** Dev probe: run NAMED queries against an arbitrary data dir (default
  * the x16 corpus) — timing + row count + error capture; the targeted
  * companion to [[ProbeAllScale]].
  */
object ProbeQueriesAt {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_x16/sf0.1")
    val names = args.drop(1).toSet
    val spark = DevSpark.session()
    graft.queries.Queries.all
      .filter(qd => names.isEmpty || names.contains(qd.name))
      .foreach { qd =>
        val t0 = System.nanoTime()
        try {
          val n = qd.fn(spark, dir).count()
          println(f"[probeq] ${qd.name}%-36s ${(System.nanoTime() - t0) / 1e9}%7.2f s  $n%9d rows")
        } catch {
          case e: Throwable => println(f"[probeq] ${qd.name}%-36s   ERROR  " +
            e.getClass.getSimpleName + ": " +
            Option(e.getMessage).getOrElse("").replaceAll("\\s+", " ").take(160))
        }
      }
    spark.stop()
  }
}
