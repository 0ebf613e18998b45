package graft
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev probe: stage-by-stage attribution of the prefix-filtered
  * n-gram-Jaccard pipeline on the x16 corpus.
  */
object ProbeJaccard {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_x16/sf0.1")
    val spark = DevSpark.session()
    val base = graft.queries.Tables.df(spark, dir, "documents").select("doc_id", "text")
    val corpus = base.unionByName(base.withColumn("doc_id", col("doc_id") + 10000))
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pj] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    val threshold = 0.5
    val shAll = graft.operators.Materialize.once(corpus.select(col("doc_id").as("__id"),
      explode(graft.functions.HashExpressions.ngramHashes(
        graft.functions.TextFunctions.tokens(col("text")), 3)).as("__sh")))
    time("shAll rows")(println("[pj] sh=" + shAll.count()))
    val dfRank = shAll.groupBy("__sh").agg(count(lit(1)).as("__df"))
    time("distinct shingles")(println("[pj] nsh=" + dfRank.count()))
    println("[pj] df histogram (top 10 by df):")
    dfRank.orderBy(col("__df").desc).limit(10).collect()
      .foreach(r => println("[pj]   sh=" + r.getLong(0) + " df=" + r.getLong(1)))
    val sizes = shAll.groupBy("__id").agg(count(lit(1)).as("__n"))
    val w = Window.partitionBy(col("__id")).orderBy(col("__df"), col("__sh"))
    val prefix = graft.operators.Materialize.once(
      shAll.join(dfRank, "__sh")
        .withColumn("__rk", row_number().over(w))
        .join(sizes, "__id")
        .where(col("__rk") <= col("__n") - ceil(col("__n") * threshold) + 1)
        .select(col("__id"), col("__sh")))
    time("prefix rows")(println("[pj] prefix=" + prefix.count()))
    val pv = prefix.groupBy("__sh").agg(count(lit(1)).as("pdf"))
    time("join volume")(println("[pj] sum pdf^2 = " +
      pv.agg(sum(col("pdf") * col("pdf"))).head().getLong(0)))
    val allv = dfRank.agg(sum(col("__df") * col("__df")).as("s")).head().getLong(0)
    println("[pj] sum df^2 (unfiltered) = " + allv)
    val cands = prefix.as("a").join(prefix.as("b"), Seq("__sh"))
      .where(col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("idA"), col("b.__id").as("idB"))
      .dropDuplicates("idA", "idB")
    time("distinct cands")(println("[pj] cands=" + cands.count()))
    spark.stop()
  }
}
