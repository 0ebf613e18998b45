package graft

/** Dev probe (round 11): why does the x16 calibration read inflate by
  * suite end? Hypothesis: accumulated persistent RDD blocks from
  * Materialize.once localCheckpoints (never unpersisted) + garbage.
  */
object ProbeCal {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_x16/sf0.1")
    val spark = DevSpark.session()
    val all = graft.queries.Queries.all.filter(_.bench)
    def q1 = all.find(_.name == "q_q1").get
    def t(qd: graft.queries.QueryDef): Double = {
      val t0 = System.nanoTime(); qd.fn(spark, dir).count(); (System.nanoTime() - t0) / 1e9
    }
    def cal(tag: String): Unit = {
      val r = Seq.fill(3)(t(q1)).sorted
      println(f"[cal] $tag%-28s q_q1 median ${r(1)}%.3f s (${r.map(x => f"$x%.3f").mkString(",")})  persistentRDDs=${spark.sparkContext.getPersistentRDDs.size}")
    }
    (1 to 3).foreach(_ => t(q1)) // C2 prime
    cal("fresh")
    for (p <- 1 to 3; qd <- all) t(qd) // the suite x3 passes
    cal("after suite")
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    cal("after unpersist")
    System.gc()
    cal("after gc")
    spark.stop()
  }
}
