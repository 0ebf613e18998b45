package graft.functions

import graft.SparkTestSession
import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Differential tests: the native codegen expressions must be bit-identical
  * to the higher-order-function formulations they replace (same index-order
  * double accumulation), including on float inputs and negative values.
  */
class VectorExpressionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def vectors(n: Int, dim: Int) = {
    val rnd = new scala.util.Random(13)
    (0 until n).map { i =>
      (Array.fill(dim)(rnd.nextFloat() * 2 - 1), Array.fill(dim)(rnd.nextFloat() * 2 - 1))
    }.toDF("a", "b")
  }

  test("native dot == HOF dot, bit-exact, on float arrays") {
    val df = vectors(200, 64)
    val rows = df.select(
      dot(col("a"), col("b")).as("native"),
      dotHof(asDouble(col("a")), asDouble(col("b"))).as("hof")).collect()
    assert(rows.forall(r => r.getDouble(0) == r.getDouble(1)))
  }

  test("native cosine == HOF cosine, bit-exact") {
    val df = vectors(200, 64)
    val rows = df.select(
      cosineSimilarity(asDouble(col("a")), asDouble(col("b"))).as("native"),
      cosineSimilarityHof(asDouble(col("a")), asDouble(col("b"))).as("hof")).collect()
    assert(rows.forall(r => r.getDouble(0) == r.getDouble(1)))
  }

  test("native quantizedDot == HOF quantizedDot (SQL half-away-from-zero rounding)") {
    val df = vectors(200, 64)
    val rows = df.select(
      quantizedDot(col("a"), col("b")).as("native"),
      quantizedDotHof(col("a"), col("b")).as("hof")).collect()
    assert(rows.forall(r => r.getLong(0) == r.getLong(1)))
    // explicit negative-half: round(-0.0005*1000) must be -1, not 0
    val edge = Seq((Array(-0.5e-3f * 1000f), Array(1f))).toDF("a", "b") // -0.5 after scale/1000... construct directly:
    val e2 = Seq((Array(-0.0005, 0.0005, 1.0), Array(1.0, 1.0, 1.0))).toDF("a", "b")
    val got = e2.select(quantizedDot(col("a"), col("b"))).collect().head.getLong(0)
    val hof = e2.select(quantizedDotHof(col("a"), col("b"))).collect().head.getLong(0)
    assert(got == hof)
  }

  test("native l2 == HOF l2, bit-exact") {
    val df = vectors(200, 64)
    val rows = df.select(
      l2Distance(col("a"), col("b")).as("native"),
      l2DistanceHof(col("a"), col("b")).as("hof")).collect()
    assert(rows.forall(r => r.getDouble(0) == r.getDouble(1)))
  }

  test("hyperplane signature: deterministic, sign-sensitive, float==double input") {
    val df = Seq(
      (1L, Array(1f, 0f, 0.5f, -0.2f)),
      (2L, Array(1f, 0f, 0.5f, -0.2f)),    // identical → same signature
      (3L, Array(-1f, 0f, -0.5f, 0.2f))    // negated → complement-ish signature
    ).toDF("id", "v")
    val sigs = df.select(col("id"), hyperplaneSignature(col("v"), bits = 16).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
    // float input and its exact-double image give the same signature
    val d1 = Seq(Tuple1(Array(1f, 0f, 0.5f, -0.2f))).toDF("v")
      .select(hyperplaneSignature(col("v"), 16)).collect().head.getLong(0)
    val d2 = Seq(Tuple1(Array(1f.toDouble, 0f.toDouble, 0.5f.toDouble, -0.2f.toDouble))).toDF("v")
      .select(hyperplaneSignature(col("v"), 16)).collect().head.getLong(0)
    assert(d1 == d2)
    // interpreted eval matches codegen
    val lit = org.apache.spark.sql.catalyst.expressions.Literal.create(
      Seq(1.0, 0.0, 0.5, -0.2), org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType))
    val interp = HyperplaneSignature(lit, 16, 42).eval(null).asInstanceOf[Long]
    assert(interp == d1)
  }

  test("mismatched lengths use the common prefix; empty arrays give 0/NaN") {
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0))).toDF("a", "b")
    assert(df.select(dot(col("a"), col("b"))).collect().head.getDouble(0) == 14.0)
    val empty = Seq((Array.empty[Double], Array.empty[Double])).toDF("a", "b")
    assert(empty.select(dot(col("a"), col("b"))).collect().head.getDouble(0) == 0.0)
  }

  test("null arrays propagate null") {
    val df = Seq((Some(Array(1.0)), Option.empty[Array[Double]])).toDF("a", "b")
    assert(df.select(dot(col("a"), col("b"))).collect().head.isNullAt(0))
  }

  test("int8 quantize/dequantize round-trip: error < scale/127, zero vector safe") {
    val df = Seq(
      Tuple1(Array(0.5f, -1.0f, 0.25f, 0.0f)),
      Tuple1(Array(0.0f, 0.0f, 0.0f, 0.0f))).toDF("v")
    val rows = df.select(col("v"), dequantizeInt8(quantizeInt8(col("v"))).as("r"),
      quantizeInt8(col("v"))("scale").as("s")).collect()
    val (v0, r0, s0) = (rows(0).getSeq[Float](0), rows(0).getSeq[Double](1), rows(0).getDouble(2))
    assert(s0 == 1.0)
    v0.zip(r0).foreach { case (x, y) => assert(math.abs(x - y) < s0 / 127.0 + 1e-12) }
    assert(rows(1).getSeq[Double](1).forall(_ == 0.0), "zero vector round-trips to zeros")
  }
}
