package graft

/** Dev probe (r15): time every bench headliner under BOTH actions —
  * `.count()` (the historical bench action; lets the optimizer prune
  * computed output columns, guide §1.4) and the noop sink (computes
  * every column of every row) — to quantify which bench rows the count
  * action under-measures. Args: [dir].
  */
object ProbeAction {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = DevSpark.session()
    val qs = graft.queries.Queries.all.filter(_.bench)
    qs.foreach { qd =>
      def cnt(): Double = {
        val t0 = System.nanoTime(); qd.fn(spark, dir).count(); (System.nanoTime() - t0) / 1e9
      }
      def noop(): Double = {
        val t0 = System.nanoTime()
        qd.fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      try {
        cnt(); noop() // warm both paths
        val c = Seq.fill(3)(cnt()).min
        val n = Seq.fill(3)(noop()).min
        println(f"[action] ${qd.name}%-24s count=$c%6.2f s  noop=$n%6.2f s  noop/count=${n / c}%5.2f")
      } catch {
        case e: Throwable => println(s"[action] ${qd.name}: ERROR ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
