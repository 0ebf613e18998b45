package graft.sources

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Debug taps (reference oven.clj:163-184): every tapped stage of a
  * store-many graph lands as a parquet tap that matches the stage's
  * in-pipeline output.
  */
class DebugTapsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("storeAll writes every tapped stage plus the final sinks") {
    val dir = Files.createTempDirectory("debug-taps").toFile.getAbsolutePath
    val taps = new GraftIO.DebugTaps(dir + "/taps")

    val base = taps.tap("base", Seq((1, "a"), (2, "b"), (3, "a"), (4, "b")).toDF("k", "tag"))
    val filtered = taps.tap("filtered", base.where(col("k") > 1))
    val agg = taps.tap("agg", filtered.groupBy("tag").agg(count(lit(1)).as("n")))

    val out = dir + "/final"
    taps.storeAll((GraftIO.storeParquet(out), agg))

    assert(taps.stageNames == Seq("base", "filtered", "agg"))
    // each tap exists and matches the stage it teed
    assert(spark.read.parquet(taps.pathOf("base")).count() == 4)
    assert(spark.read.parquet(taps.pathOf("filtered")).as[(Int, String)].collect().sorted.toSeq ==
      Seq((2, "b"), (3, "a"), (4, "b")))
    val tapAgg = spark.read.parquet(taps.pathOf("agg")).as[(String, Long)].collect().sorted.toSeq
    assert(tapAgg == Seq(("a", 1L), ("b", 2L)))
    // the final sink matches the last tap (same stage, same rows)
    val fin = spark.read.parquet(out).as[(String, Long)].collect().sorted.toSeq
    assert(fin == tapAgg)
  }

  test("tap returns its input unchanged for inline chaining") {
    val taps = new GraftIO.DebugTaps(Files.createTempDirectory("debug-taps2").toFile.getAbsolutePath)
    val df = Seq(1, 2, 3).toDF("x")
    assert(taps.tap("t", df) eq df)
  }
}
