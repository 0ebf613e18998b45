package graft
import org.apache.spark.sql.functions._
object ProbeFuzzy {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_x16/sf0.1")
    val spark = DevSpark.session()
    val base0 = graft.queries.Tables.df(spark, dir, "documents").select("doc_id", "text")
    val corpus = base0.unionByName(
      base0.select((col("doc_id") + 10000).as("doc_id"),
        concat(expr("repeat('x', CAST(doc_id % 4 AS INT))"), col("text")).as("text")))
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pfz] $tag%-26s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    val maxDist = 2; val k = maxDist + 1
    val base = graft.operators.Materialize.once(
      corpus.select(col("doc_id").as("__id"), col("text").as("__t"))
        .withColumn("__len", length(col("__t"))))
    def segCols(d: org.apache.spark.sql.DataFrame) = d
      .withColumn("__q", expr(s"__nb div $k"))
      .withColumn("__r", expr(s"__nb % $k"))
      .withColumn("__sl", (col("__q") + when(col("__seg") >= lit(k) - col("__r"), 1).otherwise(0)).cast("int"))
      .withColumn("__p", (col("__seg") * col("__q") + greatest(lit(0), col("__seg") - (lit(k) - col("__r")))).cast("int"))
    val idx = segCols(base.select(col("__id"), col("__t"), col("__len").cast("long").as("__nb"),
        explode(sequence(lit(0), lit(k - 1))).as("__seg")))
      .select(col("__id"), col("__nb"), col("__seg"),
        xxhash64(col("__t").substr(col("__p") + 1, col("__sl"))).as("__h"))
    val lo = greatest(lit(0), col("__p") - lit(maxDist))
    val hi = least(col("__len") - col("__sl"), col("__p") + lit(maxDist))
    val probes = segCols(base.select(col("__id"), col("__t"), col("__len"),
        explode(sequence(col("__len").cast("long") - maxDist, col("__len").cast("long") + maxDist)).as("__nb"))
        .where(col("__nb") >= 0)
        .withColumn("__seg", explode(sequence(lit(0), lit(k - 1)))))
      .where(hi >= lo)
      .select(col("__id"), col("__nb"), col("__seg"), col("__t"),
        explode(sequence(lo.cast("long"), hi.cast("long"))).as("__s"), col("__sl"))
      .select(col("__id"), col("__nb"), col("__seg"),
        xxhash64(col("__t").substr(col("__s").cast("int") + 1, col("__sl"))).as("__h"))
    time("idx rows")(println("[pfz] idx=" + idx.count()))
    time("probe rows")(println("[pfz] probes=" + probes.count()))
    val raw = probes.as("a").join(idx.as("b"), Seq("__nb", "__seg", "__h"))
      .where(col("a.__id") =!= col("b.__id"))
    time("raw candidate rows")(println("[pfz] raw=" + raw.count()))
    val cands = raw.select(least(col("a.__id"), col("b.__id")).as("idA"),
        greatest(col("a.__id"), col("b.__id")).as("idB"))
      .dropDuplicates("idA", "idB")
    time("distinct cands")(println("[pfz] cands=" + cands.count()))
    val out = cands
      .join(base.select(col("__id").as("idA"), col("__t").as("__ta")), "idA")
      .join(base.select(col("__id").as("idB"), col("__t").as("__tb")), "idB")
      .withColumn("dist", levenshtein(col("__ta"), col("__tb"), maxDist).cast("long"))
      .where(col("dist") >= 0 && col("dist") <= maxDist)
    time("verified pairs")(println("[pfz] out=" + out.count()))
    spark.stop()
  }
}
