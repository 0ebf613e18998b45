package graft.functions

import graft.SparkTestSession
import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Product quantization: codebook training determinism, exact
  * reconstruction of centroid-aligned vectors, and measured recall vs the
  * exact brute force on planted clusters (the ProbeIvf fixture
  * discipline).
  */
class PqSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 16 well-separated cluster centers in 8-dim, 20 members each with tiny
  // deterministic jitter: near neighbors are same-cluster by construction
  private def planted(): org.apache.spark.sql.DataFrame = {
    val rnd = new scala.util.Random(7L)
    val centers = Array.fill(16)(Array.fill(8)(rnd.nextFloat() * 10 - 5))
    (0 until 320).map { i =>
      val c = centers(i % 16)
      (i.toLong, c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.1f))
    }.toDF("vec_id", "embedding")
  }

  test("train is deterministic and shapes to [m][ksub][subDim]") {
    val df = planted()
    val b1 = Pq.train(df, "vec_id", "embedding", m = 4, ksub = 8, sampleSize = 300)
    val b2 = Pq.train(df, "vec_id", "embedding", m = 4, ksub = 8, sampleSize = 300)
    assert(b1.length == 4 && b1(0).length == 8 && b1(0)(0).length == 2)
    assert(b1.flatten.flatten.toSeq == b2.flatten.flatten.toSeq)
  }

  test("a vector equal to concatenated centroids encodes to them and self-ADC is 0") {
    val df = planted()
    val books = Pq.train(df, "vec_id", "embedding", m = 4, ksub = 8, sampleSize = 300)
    // build the vector from centroid 3 of each subspace
    val v = books.flatMap(sub => sub(3 % sub.length))
    val one = Seq((1L, v)).toDF("vec_id", "embedding")
    val codes = one.select(Pq.encodeCol(col("embedding"), books).as("c"))
      .head().getSeq[Int](0)
    assert(codes == Seq.fill(4)(3 % books(0).length))
    val adist = one.select(Pq.adcCol(
        Pq.lutCol(col("embedding"), books),
        Pq.encodeCol(col("embedding"), books), books(0).length).as("d"))
      .head().getDouble(0)
    assert(adist == 0.0)
  }

  test("pqTopK recall vs brute force is high on planted clusters at 32x compression") {
    val df = planted()
    val queries = df.where(col("vec_id") < 16)
    val books = Pq.train(df, "vec_id", "embedding", m = 4, ksub = 16, sampleSize = 320)
    val got = Pq.topK(queries, df, "vec_id", "embedding", books, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    // exact L2 reference (ADC estimates SQUARED L2 — comparing against the
    // cosine brute force would conflate metric mismatch with quantization)
    val all = df.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def l2(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val want = all.filter(_._1 < 16).map { case (qid, qv) =>
      qid -> all.filter(_._1 != qid)
        .map { case (nid, nv) => (l2(qv, nv), nid) }
        .sortBy(identity).take(10).map(_._2).toSet
    }.toMap
    // PQ collapses a tight cluster to ONE code word, so the jitter-level
    // ordering inside a cluster is unrecoverable by construction — the
    // property quantization must preserve is the COARSE geometry: a
    // query's returned neighbors live in its own cluster
    val clusterPurity = got.map { case (q, ns) =>
      ns.count(n => n % 16 == q % 16).toDouble / ns.size }
    val meanPurity = clusterPurity.sum / clusterPurity.size
    assert(meanPurity >= 0.95,
      f"mean same-cluster purity $meanPurity%.2f below 0.95 at 32x compression")
    // and exact-L2 recall stays non-degenerate (ties inside the cluster
    // break by id, bounding it near ~0.5-0.6 on this fixture)
    val recalls = want.map { case (q, ws) =>
      got.get(q).map(gs => (gs intersect ws).size.toDouble / ws.size).getOrElse(0.0) }
    assert(recalls.sum / recalls.size >= 0.4,
      f"exact-L2 recall ${recalls.sum / recalls.size}%.2f degenerate")
  }

  test("ivf-pq: cell pruning composes with ADC scoring, same cluster purity") {
    val df = planted()
    val queries = df.where(col("vec_id") < 16)
    val books = Pq.train(df, "vec_id", "embedding", m = 4, ksub = 16, sampleSize = 320)
    val got = Pq.ivfTopK(queries, df, "vec_id", "embedding", books, k = 10,
      nCells = 16, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert(got.size == 16 && got.values.forall(_.size == 10))
    val purity = got.map { case (q, ns) => ns.count(_ % 16 == q % 16).toDouble / ns.size }
    assert(purity.sum / purity.size >= 0.9,
      s"ivf-pq must keep cluster purity: ${purity.sum / purity.size}")
  }

  test("pqTopK equals a local ADC replica exactly (deterministic given fixed books)") {
    val rnd = new scala.util.Random(55L)
    val vecs = (0L until 120L).map(i => (i, Array.fill(8)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("vec_id", "embedding")
    val books = Pq.train(df, "vec_id", "embedding", m = 4, ksub = 8, sampleSize = 120)
    val got = Pq.topK(df.where(col("vec_id") < 8), df, "vec_id", "embedding", books, k = 6)
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1), r.getDouble(2))).toSet
    // local replica of encode + lut + adc + (adist, id) bottom-k
    def enc(v: Array[Float]): Array[Int] = books.zipWithIndex.map { case (sub, j) =>
      val s = v.slice(j * 2, j * 2 + 2)
      sub.zipWithIndex.minBy { case (c, ci) =>
        (s.zip(c).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum, ci) }._2
    }
    def lut(q: Array[Float]): Array[Double] = books.zipWithIndex.flatMap { case (sub, j) =>
      val s = q.slice(j * 2, j * 2 + 2)
      sub.map(c => s.zip(c).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum)
    }
    val codes = vecs.map { case (id, v) => id -> enc(v) }.toMap
    val want = vecs.filter(_._1 < 8).flatMap { case (qid, qv) =>
      val l = lut(qv)
      vecs.filter(_._1 != qid)
        .map { case (nid, _) =>
          (codes(nid).zipWithIndex.map { case (c, j) => l(j * 8 + c) }.sum, nid) }
        .sorted.take(6).zipWithIndex
        .map { case ((d, nid), r) => (qid, r + 1, nid, d) }
    }.toSet
    assert(got == want)
  }

  test("residual ivf-pq recovers within-cluster ordering that plain codes collapse") {
    val df = planted()
    val queries = df.where(col("vec_id") < 16)
    val cells = Similarity.kmeansCells(df, "vec_id", "embedding", nCells = 16, iters = 4)
    def exactRecall(got: Map[Long, Set[Long]]): Double = {
      val all = df.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      def l2(a: Array[Float], b: Array[Float]): Double =
        a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
      val want = all.filter(_._1 < 16).map { case (qid, qv) =>
        qid -> all.filter(_._1 != qid)
          .map { case (nid, nv) => (l2(qv, nv), nid) }
          .sortBy(identity).take(10).map(_._2).toSet
      }.toMap
      want.map { case (q, ws) =>
        got.get(q).map(gs => (gs intersect ws).size.toDouble / ws.size).getOrElse(0.0)
      }.sum / want.size
    }
    def run(residual: Boolean): Double = {
      val books =
        if (residual) Pq.trainResidual(df, "vec_id", "embedding", cells,
          m = 4, ksub = 16, sampleSize = 320)
        else Pq.train(df, "vec_id", "embedding", m = 4, ksub = 16, sampleSize = 320)
      exactRecall(Pq.ivfTopK(queries, df, "vec_id", "embedding", books, k = 10,
          nCells = 16, nProbe = 4, centroids = Some(cells), residual = residual)
        .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap)
    }
    val plain = run(residual = false)
    val resid = run(residual = true)
    // plain codes collapse a tight cluster to one code word (ties break by
    // id); residual codes spend their bits on the within-cluster jitter
    assert(resid > plain + 0.15,
      f"residual recall $resid%.2f must clearly beat plain $plain%.2f")
    assert(resid >= 0.8, f"residual exact-L2 recall $resid%.2f below 0.8")
  }

  test("residual imi-pq recovers within-cluster ordering that plain codes collapse") {
    // PRODUCT-structured clusters — IMI's design assumption: 16 centers on
    // a 4×4 grid of (halfA center, halfB center) pairs, so the trained
    // half-codebooks recover the grid axes and composite cells align 1:1
    // with clusters (residual = pure within-cluster jitter). On
    // non-product data the composite centroid misses the cluster center
    // and residual codes lose their edge — that regime is the flat
    // residual test's territory.
    val rnd = new scala.util.Random(13L)
    val gridA = Array.fill(4)(Array.fill(4)(rnd.nextFloat() * 10 - 5))
    val gridB = Array.fill(4)(Array.fill(4)(rnd.nextFloat() * 10 - 5))
    val df = (0 until 320).map { i =>
      val (a, b) = (i % 4, (i / 4) % 4)
      val c = gridA(a) ++ gridB(b)
      (i.toLong, c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.1f))
    }.toDF("vec_id", "embedding")
    val queries = df.where(col("vec_id") < 16)
    // trained HALF codebooks (4 per half = 16 composite cells)
    def halfBook(h: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      Similarity.kmeansCells(df.select(col("vec_id"), h(col("embedding")).as("__h")),
        "vec_id", "__h", nCells = 4, iters = 4)
    val (bookA, bookB) = (halfBook(Similarity.halfA), halfBook(Similarity.halfB))
    def exactRecall(got: Map[Long, Set[Long]]): Double = {
      val all = df.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      def l2(a: Array[Float], b: Array[Float]): Double =
        a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
      val want = all.filter(_._1 < 16).map { case (qid, qv) =>
        qid -> all.filter(_._1 != qid)
          .map { case (nid, nv) => (l2(qv, nv), nid) }
          .sortBy(identity).take(10).map(_._2).toSet
      }.toMap
      want.map { case (q, ws) =>
        got.get(q).map(gs => (gs intersect ws).size.toDouble / ws.size).getOrElse(0.0)
      }.sum / want.size
    }
    def run(residual: Boolean): Double = {
      val books =
        if (residual) Pq.trainResidualImi(df, "vec_id", "embedding", bookA, bookB,
          m = 4, ksub = 8, sampleSize = 320)
        else Pq.train(df, "vec_id", "embedding", m = 4, ksub = 8, sampleSize = 320)
      // probe ALL 16 composite cells: coarse recall is 1, so the measured
      // gap is pure code quality
      exactRecall(Pq.imiTopK(queries, df, "vec_id", "embedding", books, k = 10,
          nProbe = 16, codebooks = Some((bookA, bookB)), residual = residual)
        .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap)
    }
    val plain = run(residual = false)
    val resid = run(residual = true)
    assert(resid > plain + 0.15,
      f"imi residual recall $resid%.2f must clearly beat plain $plain%.2f")
    assert(resid >= 0.8, f"imi residual exact-ADC recall $resid%.2f below 0.8")
  }

  test("exact re-rank tail (ivfTopKRefined) beats or matches plain ivf-pq recall") {
    val df = planted()
    val queries = df.where(col("vec_id") < 16)
    val cells = Similarity.kmeansCells(df, "vec_id", "embedding", nCells = 16, iters = 4)
    val books = Pq.train(df, "vec_id", "embedding", m = 4, ksub = 16, sampleSize = 320)
    def exactRecall(got: Map[Long, Set[Long]]): Double = {
      val all = df.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      def l2(a: Array[Float], b: Array[Float]): Double =
        a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
      val want = all.filter(_._1 < 16).map { case (qid, qv) =>
        qid -> all.filter(_._1 != qid)
          .map { case (nid, nv) => (l2(qv, nv), nid) }
          .sortBy(identity).take(10).map(_._2).toSet
      }.toMap
      want.map { case (q, ws) =>
        got.get(q).map(gs => (gs intersect ws).size.toDouble / ws.size).getOrElse(0.0)
      }.sum / want.size
    }
    def toMapSet(r: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      r.collect().map(x => (x.getLong(0), x.getLong(1))).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
    val plain = exactRecall(toMapSet(
      Pq.ivfTopK(queries, df, "vec_id", "embedding", books, k = 10,
        nCells = 16, nProbe = 4, centroids = Some(cells))))
    val refined = exactRecall(toMapSet(
      Pq.ivfTopKRefined(queries, df, "vec_id", "embedding", books, k = 10,
        nCells = 16, nProbe = 4, refine = 3, centroids = Some(cells))))
    // refinement re-orders the shortlist by the TRUE metric: it can only
    // promote true neighbors ADC mis-ranked below the k cut, never demote
    // one it already had (same candidate pool, exact ordering)
    assert(refined >= plain,
      f"refined recall $refined%.2f must not lose to plain $plain%.2f")
    // planted clusters: plain codes collapse tight clusters (ties by id),
    // so the exact tail must recover a visible chunk of recall
    assert(refined > plain + 0.1,
      f"refined recall $refined%.2f should clearly beat plain $plain%.2f on clusters")
    assert(refined >= 0.8, f"refined exact-L2 recall $refined%.2f below 0.8")
  }

  test("low-diversity subspace pads to uniform ksub; lut/adc strides stay sound") {
    // first 4 dims constant across every vector → that subspace has ONE
    // distinct subvector; pre-padding this trained a 1-centroid book while
    // lut/adc indexed every subspace with books(0).length, silently
    // reading the wrong LUT region (or out of bounds)
    val rnd = new scala.util.Random(11L)
    val df = (0L until 64L).map { i =>
      (i, Array(1.0f, 2.0f, 3.0f, 4.0f) ++ Array.fill(4)(rnd.nextFloat()))
    }.toDF("vec_id", "embedding")
    val books = Pq.train(df, "vec_id", "embedding", m = 2, ksub = 8, sampleSize = 64)
    assert(books.forall(_.length == 8),
      s"ragged codebook survived training: ${books.map(_.length).mkString(",")}")
    // the padded subspace still encodes to the real (lowest-index) centroid
    val row = df.where(col("vec_id") === 0L).select(
      Pq.encodeCol(col("embedding"), books).as("c"),
      Pq.adcCol(Pq.lutCol(col("embedding"), books),
        Pq.encodeCol(col("embedding"), books), 8).as("d")).head()
    assert(row.getSeq[Int](0).head == 0)
    assert(row.getDouble(1) >= 0.0 && !row.getDouble(1).isNaN)
    // full topK over the degenerate corpus: no OOB, sane shape
    val top = Pq.topK(df.where(col("vec_id") < 2), df, "vec_id", "embedding", books, k = 5)
    assert(top.count() == 10)
    // hand-built ragged codebooks are rejected at construction
    val ragged = Array(Array.fill(4)(Array.fill(2)(0.5f)), Array.fill(2)(Array.fill(2)(0.5f)))
    intercept[IllegalArgumentException](Pq.lutCol(col("embedding"), ragged))
    intercept[IllegalArgumentException](Pq.encodeCol(col("embedding"), ragged))
  }

  test("pq expressions run inside codegen with fallback disabled") {
    // the CodegenNoFallbackSpec discipline: a session with codegen-only
    // confs SHARING the one test SparkContext. Never stop() it — stopping
    // any session kills the JVM-wide context for every later suite; just
    // restore the shared session as active afterwards.
    val shared = spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val s = org.apache.spark.sql.SparkSession.builder()
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      .getOrCreate()
    try {
      import s.implicits._
      val books = Array.fill(2)(Array.fill(4)(Array.fill(2)(0.5f)))
      val df = Seq((1L, Array(0.1f, 0.2f, 0.3f, 0.4f))).toDF("id", "v")
      val r = df.select(
        Pq.encodeCol(col("v"), books).as("c"),
        Pq.adcCol(Pq.lutCol(col("v"), books), Pq.encodeCol(col("v"), books), 4).as("d"))
        .head()
      assert(r.getSeq[Int](0).length == 2 && r.getDouble(1) >= 0.0)
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(shared)
      org.apache.spark.sql.SparkSession.setActiveSession(shared)
    }
  }
}
