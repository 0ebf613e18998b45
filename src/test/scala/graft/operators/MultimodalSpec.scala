package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("synthetic media table has the declared schema") {
    val m = Multimodal.synthetic(spark, 30)
    assert(m.schema.fieldNames.toSeq == Seq("id", "meta", "payload"))
    assert(m.count() == 30)
  }

  test("extractFeatures is deterministic and preserves ids") {
    val m = Multimodal.synthetic(spark, 50)
    val f1 = Multimodal.extractFeatures(m, dim = 8).collect().sortBy(_.id)
    val f2 = Multimodal.extractFeatures(m, dim = 8).collect().sortBy(_.id)
    assert(f1.map(_.id).toSeq == (0L until 50L))
    assert(f1.zip(f2).forall { case (a, b) => a.features.sameElements(b.features) })
    assert(f1.forall(_.featureDim == 8))
  }

  test("null/empty payloads pass through as empty features, not task failure") {
    val rows = Seq(
      Multimodal.MediaRow(0L, Multimodal.MediaMeta("image", "jpeg", 64, 64, 0), Array[Byte](1, 2)),
      Multimodal.MediaRow(1L, Multimodal.MediaMeta("image", "jpeg", 64, 64, 0), Array.empty[Byte]))
    val ds = spark.createDataset(rows)
    val f = Multimodal.extractFeatures(ds, dim = 4).collect().sortBy(_.id)
    assert(f(0).featureDim == 4 && f(1).featureDim == 0)
  }

  test("metadata filter prunes payload from the parquet scan (columnar contract)") {
    val path = "/root/repo/target/test_media_parquet"
    Multimodal.synthetic(spark, 30).write.mode("overwrite").parquet(path)
    val m = spark.read.parquet(path)
    val plan = Multimodal.filterByMeta(m, "image", 64).queryExecution
      .executedPlan.toString
    assert(!plan.contains("payload"), s"payload must be pruned from the scan:\n$plan")
    assert(plan.contains("PushedFilters: ["), "meta predicates should reach the scan")
  }

  test("fromKeyedText derives media schema + UTF-8 payload from any keyed text source") {
    import spark.implicits._
    val src = Seq((0L, "héllo"), (1L, "ab"), (2L, "xyz")).toDF("doc_id", "text")
    val m = Multimodal.fromKeyedText(src, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(m(0L).getStruct(1).getString(0) == "image")
    assert(m(1L).getStruct(1).getString(0) == "audio")
    assert(m(2L).getStruct(1).getString(0) == "video")
    // payload is the text's UTF-8 bytes (é = 2 bytes)
    assert(m(0L).getAs[Array[Byte]](2).length == 6)
    assert(m(0L).getStruct(1).getInt(2) == 64 && m(1L).getStruct(1).getInt(2) == 96)
  }

  test("sampleFrames emits bounded rows per video") {
    val m = Multimodal.synthetic(spark, 30)
    val frames = Multimodal.sampleFrames(m, stride = 100).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.getInt(1) % 100 == 0))
  }
}
