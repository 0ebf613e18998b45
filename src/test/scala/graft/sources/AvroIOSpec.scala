package graft.sources

import graft.SparkTestSession
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Avro container IO beyond the flat Verify query: nested records,
  * nullable unions, arrays, and bytes round-trip through the Hadoop
  * formats (the reference's nested-schema surface, pigpen-avro
  * avro/core.clj:58-88 — Spark structs nest natively instead of
  * dotted-name flattening).
  */
class AvroIOSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val schema =
    """{"type":"record","name":"outer","fields":[
       {"name":"id","type":"long"},
       {"name":"name","type":["null","string"],"default":null},
       {"name":"tags","type":{"type":"array","items":"string"}},
       {"name":"blob","type":"bytes"},
       {"name":"inner","type":{"type":"record","name":"innerRec","fields":[
         {"name":"x","type":"int"},
         {"name":"y","type":["null","double"],"default":null}]}}]}"""

  test("nested record with nullable union, array, bytes round-trips") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("a"), Seq("t1", "t2"), Array[Byte](1, 2, 3), (10, Some(1.5))),
      (2L, None, Seq.empty[String], Array.empty[Byte], (20, None))
    ).toDF("id", "name", "tags", "blob", "inner")
      .selectExpr("id", "name", "tags", "blob",
        "named_struct('x', inner._1, 'y', inner._2) AS inner")
    val path = "target/io_tmp/avro_nested"
    AvroIO.storeAvro(path, schema)(df)
    val back = AvroIO.loadAvro(spark, path, schema)
    assert(back.schema.fieldNames.toSeq == Seq("id", "name", "tags", "blob", "inner"))
    val rows = back.collect().sortBy(_.getLong(0))
    assert(rows(0).getLong(0) == 1L && rows(0).getString(1) == "a")
    assert(rows(0).getSeq[String](2) == Seq("t1", "t2"))
    assert(rows(0).getAs[Array[Byte]](3).toSeq == Seq[Byte](1, 2, 3))
    val inner0 = rows(0).getStruct(4)
    assert(inner0.getInt(0) == 10 && inner0.getDouble(1) == 1.5)
    assert(rows(1).isNullAt(1), "null union field survives")
    val inner1 = rows(1).getStruct(4)
    assert(inner1.getInt(0) == 20 && inner1.isNullAt(1))
  }

  test("overwrite semantics: second store replaces the first") {
    import spark.implicits._
    val s2 = """{"type":"record","name":"r","fields":[{"name":"id","type":"long"}]}"""
    val path = "target/io_tmp/avro_overwrite"
    AvroIO.storeAvro(path, s2)(Seq(1L, 2L, 3L).toDF("id"))
    AvroIO.storeAvro(path, s2)(Seq(9L).toDF("id"))
    assert(AvroIO.loadAvro(spark, path, s2).collect().map(_.getLong(0)).toSeq == Seq(9L))
  }
}
