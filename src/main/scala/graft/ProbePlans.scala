package graft

/** Dev probe (optimization rounds): write `.explain("formatted")` for a
  * set of registry queries to files, so plan claims in OPTIMIZATION_r*.md
  * are checkable against committed artifacts without running Spark.
  *
  * Usage: `ProbePlans <outDir> <suffix> [query ...]`
  *   - outDir: directory for the plan files (created if missing)
  *   - suffix: appended to each file name, e.g. "before" / "after"
  *   - queries: registry names; default = every bench headliner.
  *
  * Plans are captured on `SPARK_GRAFT_SF_DIR` (default sf0.1). Analysis
  * only — nothing executes, so the capture takes seconds and shows the
  * static plan (AdaptiveSparkPlan isFinalPlan=false), which is the level
  * at which Exchange counts / join strategies / PushedFilters are
  * compared before vs after.
  */
object ProbePlans {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r15")
    val suffix = args.lift(1).getOrElse("before")
    val only = args.drop(2).toSet
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val spark = DevSpark.session()
    val qs = graft.queries.Queries.all
      .filter(qd => if (only.isEmpty) qd.bench else only.contains(qd.name))
    qs.foreach { qd =>
      try {
        val df = qd.fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val p = java.nio.file.Paths.get(outDir, s"${qd.name}_$suffix.txt")
        java.nio.file.Files.writeString(p, txt)
        println(s"[plans] wrote $p (${txt.linesIterator.size} lines)")
      } catch {
        case e: Throwable =>
          println(s"[plans] ${qd.name}: ERROR ${e.getClass.getSimpleName}: " +
            Option(e.getMessage).getOrElse("").replaceAll("\\s+", " ").take(160))
      }
    }
    spark.stop()
  }
}
