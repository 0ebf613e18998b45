package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQ8 scalar quantization: quantizer arithmetic pinned against
  * hand-computed codes, constant-dimension degeneracy, bounds training
  * determinism, and recall vs exact L2 on planted clusters — SQ8's
  * midpoint recon error is ≤ span/512 per dimension, so unlike PQ the
  * planted-cluster recall bar is exact top-k recovery, not cluster
  * membership.
  */
class SqSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def planted(): org.apache.spark.sql.DataFrame = {
    val rnd = new scala.util.Random(11L)
    val centers = Array.fill(16)(Array.fill(8)(rnd.nextFloat() * 10 - 5))
    (0 until 320).map { i =>
      val c = centers(i % 16)
      // noise an order of magnitude above SQ8's midpoint recon error
      // (span/512 per dim ~ 0.02) so within-cluster ranking is a real
      // signal, not a quantization-noise coin flip
      (i.toLong, c.map(x => x + (rnd.nextFloat() - 0.5f) * 1.0f))
    }.toDF("vec_id", "embedding")
  }

  test("encode matches the closed-form affine quantizer, clamped") {
    // bounds per dim: [0, 10]; v = 0 -> 0, v = 10 -> floor(255) = 255,
    // v = 5 -> floor(127.5) = 127
    val df = Seq(
      (0L, Array(0.0f, 10.0f, 5.0f)),
      (1L, Array(10.0f, 0.0f, 0.0f)),
      (2L, Array(5.0f, 5.0f, 10.0f))).toDF("vec_id", "embedding")
    val (mins, maxs) = Sq.trainBounds(df, "embedding")
    assert(mins.toSeq == Seq(0.0, 0.0, 0.0) && maxs.toSeq == Seq(10.0, 10.0, 10.0))
    val codes = df.orderBy("vec_id")
      .select(Sq.encodeCol(col("embedding"), mins, maxs)).collect()
      .map(_.getSeq[Int](0))
    assert(codes(0) == Seq(0, 255, 127))
    assert(codes(1) == Seq(255, 0, 0))
    assert(codes(2) == Seq(127, 127, 255))
  }

  test("a constant dimension codes to 0 and reconstructs exactly (adc ignores it)") {
    val df = Seq(
      (0L, Array(3.5f, 1.0f)),
      (1L, Array(3.5f, 2.0f))).toDF("vec_id", "embedding")
    val (mins, maxs) = Sq.trainBounds(df, "embedding")
    assert(mins(0) == 3.5 && maxs(0) == 3.5)
    val codes = df.select(Sq.encodeCol(col("embedding"), mins, maxs)).collect()
      .map(_.getSeq[Int](0))
    assert(codes.forall(_.head == 0))
    // recon of dim 0 is exactly mn -> a query with the same constant value
    // contributes 0 from that dimension
    val adist = df.where($"vec_id" === 0L)
      .select(Sq.adcCol(col("embedding"),
        Sq.encodeCol(col("embedding"), mins, maxs), mins, maxs))
      .head().getDouble(0)
    // dim 0 contributes 0; dim 1 contributes at most (span/512)^2 * ... :
    // span = 1, code(1.0) = 0, recon = 1 + 0.5/255, err^2 = (0.5/255)^2
    val e = 0.5 / 255.0
    assert(math.abs(adist - e * e) < 1e-12)
  }

  test("trainBounds rejects ragged vectors") {
    val df = Seq((0L, Array(1.0f, 2.0f)), (1L, Array(1.0f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] { Sq.trainBounds(df, "embedding") }
  }

  test("ivf-sq: persistent-index probe == in-flight ivfTopK; index scan is partition-pruned") {
    val df = planted()
    val queries = df.where(col("vec_id") < 16)
    val path = "target/io_tmp/ivfsq_idx_spec"
    graft.operators.AnnIndex.buildIvfSq(df, "vec_id", "embedding", path, nCells = 8)
    val want = Sq.ivfTopK(queries, df, "vec_id", "embedding",
        k = 5, nCells = 8, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1))).toSet
    // AQE hides scans inside query stages — plan asserts need it off
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val probe = graft.operators.AnnIndex.probeIvfSq(spark, path, queries,
        "vec_id", "embedding", k = 5, nProbe = 3)
      val got = probe.collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1))).toSet
      assert(got == want && got.nonEmpty)
      val pf = probe.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.partitionFilters.nonEmpty => f
      }.flatMap(_.partitionFilters)
      assert(pf.exists(_.references.map(_.name).toSet == Set("__cell")),
        s"partition filters must target __cell: $pf")
      assert(!pf.exists(_.exists(
          _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.Cast])),
        s"partition filter wraps the partition column in a cast: $pf")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("topKRefined recovers exact top-k on planted clusters; bare topK recall is near-exact") {
    val df = planted()
    val queries = df.where(col("vec_id") < 16)
    val all = df.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def l2(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum
    val want = all.filter(_._1 < 16).map { case (qid, qv) =>
      qid -> all.filter(_._1 != qid)
        .map { case (nid, nv) => (l2(qv, nv), nid) }
        .sortBy(identity).take(10).map(_._2).toSet
    }.toMap
    def recall(got: Map[Long, Set[Long]]): Double =
      want.keys.toSeq.map(q => (got.getOrElse(q, Set.empty) & want(q)).size / 10.0)
        .sum / want.size
    val sq = Sq.topK(queries, df, "vec_id", "embedding", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert(recall(sq) >= 0.9, s"bare SQ8 recall ${recall(sq)}")
    val refined = Sq.topKRefined(queries, df, "vec_id", "embedding", k = 10, refine = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert(recall(refined) == 1.0, s"refined recall ${recall(refined)}")
  }
}
