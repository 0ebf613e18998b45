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

  private def zRefN(vals: Seq[Long], bits: Int): Long = {
    val n = vals.size
    (for { i <- 0 until bits; j <- 0 until n }
      yield ((vals(j) >> i) & 1L) << (i * n + j)).foldLeft(0L)(_ | _)
  }

  test("N-column zValue matches the reference; 2-column layout unchanged") {
    val rows = Seq(Seq(0L, 0L, 0L), Seq(1L, 2L, 4L), Seq(7L, 7L, 7L),
      Seq(1048575L, 0L, 1048575L), Seq(123456L, 654321L, 111L))
    val got = rows.map(_.mkString(",")).toDF("k")
      .select(col("k"), ZOrder.zValue(
        (0 until 3).map(i => split(col("k"), ",")(i).cast("long")), bits = 21).as("z"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { v =>
      assert(got(v.mkString(",")) == zRefN(v.map(_ & 0x1fffffL), 21), v.toString)
    }
    // the Seq-API 2-column value is bit-identical to the original pair API
    val pair = Seq((3L, 9L)).toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y"), 16).as("a"),
        ZOrder.zValue(Seq(col("x"), col("y")), 16).as("b")).head()
    assert(pair.getLong(0) == pair.getLong(1))
  }

  test("3-column z-order bounds every dim per file where a 1-column sort leaves two global") {
    val n = 20000
    val rnd = new scala.util.Random(13)
    val df = (0 until n).map(_ => (rnd.nextInt(1 << 10).toLong,
        rnd.nextInt(1 << 10).toLong, rnd.nextInt(1 << 10).toLong))
      .toDF("a", "b", "c")
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder3").toString
    val files = 16
    ZOrder.writeZOrdered(df, s"$dir/z", Seq("a", "b", "c"), numFiles = files, bits = 10)
    df.repartitionByRange(files, col("a")).sortWithinPartitions("a")
      .write.mode("overwrite").parquet(s"$dir/plain")
    def spans(path: String): (Double, Double, Double) = {
      val r = spark.read.parquet(path)
        .withColumn("__file", input_file_name())
        .groupBy("__file")
        .agg(((max("a") - min("a")) / (1 << 10).toDouble).as("sa"),
          ((max("b") - min("b")) / (1 << 10).toDouble).as("sb"),
          ((max("c") - min("c")) / (1 << 10).toDouble).as("sc"))
        .agg(avg("sa"), avg("sb"), avg("sc")).head()
      (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    }
    val (za, zb, zc) = spans(s"$dir/z")
    val (pa, pb, pc) = spans(s"$dir/plain")
    assert(pa < 0.2 && pb > 0.8 && pc > 0.8,
      f"1-col sort should cluster a only (a $pa%.2f b $pb%.2f c $pc%.2f)")
    // 16 files ≈ 4 octave splits spread over 3 dims → each dim's per-file
    // span well below global, if not as tight as the 2-dim case
    assert(za < 0.8 && zb < 0.8 && zc < 0.8,
      f"z-order must bound all three dims (a $za%.2f b $zb%.2f c $zc%.2f)")
    assert(za + zb + zc < pa + pb + pc,
      f"z-order total footprint must beat the 1-col sort")
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
