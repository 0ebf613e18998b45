package graft

/** Dev probe: run EVERY registered query once against the inflated x16
  * corpus (timing + row count + error capture, no oracle) — a
  * robustness sweep that smoke-tests each operator at 16× the verified
  * scale and surfaces pathological plans by sorting the slowest first.
  * (This is how schema/scale hazards like the r7 events.ts drama or the
  * r8 single-partition signing stall would surface BEFORE an artifact.)
  */
object ProbeAllScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_x16/sf0.1")
    val spark = DevSpark.session()
    val results = graft.queries.Queries.all.map { qd =>
      val t0 = System.nanoTime()
      val r = try Right((qd.fn(spark, dir).count(), (System.nanoTime() - t0) / 1e9))
      catch {
        case e: Throwable => Left(e.getClass.getSimpleName + ": " +
          Option(e.getMessage).getOrElse("").replaceAll("\\s+", " ").take(160))
      }
      r match {
        case Right((n, t)) => println(f"[allx16] ${qd.name}%-36s $t%7.2f s  $n%9d rows")
        case Left(err) => println(f"[allx16] ${qd.name}%-36s   ERROR  $err")
      }
      qd.name -> r
    }
    val errs = results.collect { case (n, Left(e)) => s"$n: $e" }
    val slow = results.collect { case (n, Right((_, t))) => (n, t) }
      .sortBy(-_._2).take(12)
    println(s"[allx16] === ${results.size} queries, ${errs.size} errors ===")
    errs.foreach(e => println(s"[allx16] ERR $e"))
    println("[allx16] slowest: " +
      slow.map { case (n, t) => f"$n=$t%.1fs" }.mkString("  "))
    spark.stop()
  }
}
