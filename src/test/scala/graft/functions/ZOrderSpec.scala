package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order clustering: the interleave matches a local reference, and the
  * LAYOUT claim holds — z-sorted files cover compact rectangles of the
  * key plane (narrow per-file min/max on BOTH columns), where a
  * single-column sort leaves the second column's per-file range global.
  */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def zRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | ((x >> i) & 1L) << (2 * i) | ((y >> i) & 1L) << (2 * i + 1)
    }

  test("zValue matches a local bit-interleave reference, including mask truncation") {
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (123456L, 7L), (40000L, 20000L), (7L, 123456L))
    val got = rows.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zValue(col("x"), col("y"), 16).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    rows.foreach { case (x, y) =>
      assert(got((x, y)) == zRef(x & 0xffffL, y & 0xffffL, 16), s"($x,$y)")
    }
  }

  test("z-ordered files cover compact rectangles: both dims prune, unlike a 1-column sort") {
    val n = 20000
    val rnd = new scala.util.Random(11)
    val df = (0 until n).map(_ => (rnd.nextInt(1 << 14).toLong, rnd.nextInt(1 << 14).toLong))
      .toDF("a", "b")
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val files = 16
    ZOrder.writeZOrdered(df, s"$dir/z", "a", "b", numFiles = files, bits = 14)
    df.repartitionByRange(files, col("a")).sortWithinPartitions("a")
      .write.mode("overwrite").parquet(s"$dir/plain")

    // per-FILE min/max footprint of each dimension, as a fraction of the
    // global range — what parquet footer pruning actually sees
    def spans(path: String): (Double, Double) = {
      val perFile = spark.read.parquet(path)
        .withColumn("__file", input_file_name())
        .groupBy("__file")
        .agg(((max("a") - min("a")) / (1 << 14).toDouble).as("sa"),
          ((max("b") - min("b")) / (1 << 14).toDouble).as("sb"))
        .agg(avg("sa"), avg("sb")).head()
      (perFile.getDouble(0), perFile.getDouble(1))
    }
    val (za, zb) = spans(s"$dir/z")
    val (pa, pb) = spans(s"$dir/plain")
    // plain sort: 'a' is tightly ranged, 'b' spans ~the whole domain
    assert(pa < 0.2, f"plain sort should range-cluster a (avg span $pa%.2f)")
    assert(pb > 0.8, f"plain sort leaves b global (avg span $pb%.2f)")
    // z-order: BOTH dims well below global — each file a compact rectangle.
    // 16 files ≈ 4 z-octave splits → expected per-dim span ~1/4 of domain
    assert(za < 0.55 && zb < 0.55,
      f"z-order must bound both dims per file (a $za%.2f, b $zb%.2f)")
    assert(za + zb < pa + pb,
      f"z-order total footprint ($za%.2f+$zb%.2f) must beat 1-col sort ($pa%.2f+$pb%.2f)")
  }
}
