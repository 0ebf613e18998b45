package graft
object ProbeLangId {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_x16/sf0.1")
    val spark = DevSpark.session()
    import org.apache.spark.sql.functions._
    val docs = graft.queries.Tables.df(spark, dir, "documents").select("text")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = docs.select(graft.functions.TextFunctions.langId(col("text")).as("l"))
        .groupBy("l").count().collect().map(_.getLong(1)).sum
      println(f"[langid] run$i ${(System.nanoTime()-t0)/1e9}%6.2f s  $n rows")
    }
    spark.stop()
  }
}
