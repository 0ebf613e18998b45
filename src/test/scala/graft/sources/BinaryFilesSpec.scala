package graft.sources

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** storeBinaryFiles export-boundary validation: names are DATA, so the
  * writer must reject traversal/null/duplicate names BEFORE the
  * destructive target-dir delete runs (ADVICE r8).
  */
class BinaryFilesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def dir() =
    java.nio.file.Files.createTempDirectory("binfiles").toString + "/out"

  private def df(rows: (String, String)*) =
    rows.toDF("name", "text").select(col("name"), col("text").cast("binary").as("payload"))

  test("round-trips clean names") {
    val d = dir()
    GraftIO.storeBinaryFiles(d)(df("a.bin" -> "alpha", "b.bin" -> "beta"))
    val back = GraftIO.loadBinaryFiles(spark, d)
      .select(regexp_extract(col("path"), "([ab]\\.bin)$", 1).as("name"),
        col("content").cast("string").as("text"))
      .as[(String, String)].collect().toMap
    assert(back == Map("a.bin" -> "alpha", "b.bin" -> "beta"))
  }

  test("rejects path traversal, and the target survives untouched") {
    val d = dir()
    GraftIO.storeBinaryFiles(d)(df("keep.bin" -> "v1"))
    val ex = intercept[IllegalArgumentException] {
      GraftIO.storeBinaryFiles(d)(df("../escape.bin" -> "evil"))
    }
    assert(ex.getMessage.contains("invalid export names"))
    // the pre-validation failure must fire BEFORE the recursive delete
    assert(GraftIO.loadBinaryFiles(spark, d).count() == 1)
  }

  test("rejects separators, null names, empty names and duplicates") {
    for (bad <- Seq(df("sub/f.bin" -> "x"), df("a\\b.bin" -> "x"),
        df("" -> "x"), df("dup.bin" -> "x", "dup.bin" -> "y"))) {
      intercept[IllegalArgumentException] { GraftIO.storeBinaryFiles(dir())(bad) }
    }
    val nullName = Seq(("ok.bin", "x"), (null, "y")).toDF("name", "text")
      .select(col("name"), col("text").cast("binary").as("payload"))
    intercept[IllegalArgumentException] { GraftIO.storeBinaryFiles(dir())(nullName) }
  }

  test("rejects a null payload") {
    val nullPayload = Seq("a.bin", "b.bin").toDF("name")
      .select(col("name"),
        when(col("name") === "a.bin", lit("x").cast("binary")).as("payload"))
    intercept[IllegalArgumentException] { GraftIO.storeBinaryFiles(dir())(nullPayload) }
  }
}
