package graft

import graft.operators.{Bloom, Dedup}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dev probe: the bloom scoring kernel A/B — the shipped native
  * [[graft.functions.BloomHits]] codegen Expression vs the same
  * arithmetic phrased as a `filter` higher-order function (HOFs are
  * CodegenFallback: interpreted per element). Same fixture corpus, same
  * filter bits, identical results asserted; the delta is purely the
  * evaluation regime. Results recorded in SCALE.md's bloom row.
  */
object ProbeBloom {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = DevSpark.session()
    val mBits = 1 << 16
    val k = 3

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    // 16x char-rotated copies (the ProbeScale discipline): enough rows
    // that the probe kernel, not job overhead, is what's measured
    val alpha = "etaoinshrdlcumwf"
    def rot(i: Int): String = { val m = i % alpha.length; alpha.drop(m) + alpha.take(m) }
    val docs = (0 until 16).map(i =>
        base.withColumn("doc_id", col("doc_id") + lit(i * 1000000L))
          .withColumn("text", translate(col("text"), alpha, rot(i))))
      .reduce(_ unionByName _).localCheckpoint(true)
    val corpus = docs.where(col("doc_id") % 50 =!= 0)
    val bench = docs.where(col("doc_id") % 50 === 0)

    val grams = array_distinct(Dedup.fixtureWindowHashes(col("text"), 3))
    val posOf = (g: Column) => Bloom.positionExprs(g, mBits, k)

    // probe-local bitmap build (the operator's buildBits is private)
    val words = new Array[Long](mBits / 64)
    bench.select(explode(grams).as("__g"))
      .select(explode(array(posOf(col("__g")): _*)).as("__pos"))
      .distinct().collect()
      .foreach { r => val p = r.getLong(0).toInt; words(p >> 6) |= 1L << (p & 63) }
    val wordsLit = typedlit(words.toSeq)

    def might(g: Column): Column = posOf(g).map { p =>
      call_function("shiftright",
        element_at(wordsLit, (p / 64).cast("int") + 1), (p % 64).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)

    val native = Bloom.ngramContaminationBloomFixture(corpus, bench,
      "doc_id", "text", shingle = 3, mBits = mBits, k = k)
    val hof = corpus.select(col("doc_id"), grams.as("__grams"))
      .select(col("doc_id"),
        round(size(filter(col("__grams"), might(_))).cast("double") /
          size(col("__grams")), 6).as("contamination_bloom"))

    def time2(df: DataFrame): Double = {
      df.count() // warm-up
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); df.count(); (System.nanoTime() - t0) / 1e6
      }.min
    }
    val tNative = time2(native)
    val tHof = time2(hof)
    // identical results — the A/B isolates the evaluation regime only
    val a = native.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = hof.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    require(a == b, s"kernels disagree: ${a.size} vs ${b.size} rows")
    println(f"[bloom] native=$tNative%7.0f ms  hof=$tHof%7.0f ms  " +
      f"speedup=${tHof / tNative}%.2fx  (docs=${a.size}, mBits=$mBits, k=$k)")
    spark.stop()
  }
}
