package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // deterministic corpus: 200 vectors on a ring + 2 planted neighbors of v0
  private def corpus() = {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 200L).map { i =>
      val v = Array.fill(8)(rnd.nextFloat() * 2 - 1)
      (i, v)
    }
    rows.toDF("vec_id", "embedding")
  }

  private def localCosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    for (i <- a.indices) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("bruteForceTopK matches a local exact computation") {
    val df = corpus()
    val all = df.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toMap
    val queries = df.where($"vec_id" < 3)
    val got = Similarity.bruteForceTopK(queries, df, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    for (q <- 0L until 3L) {
      val expected = all.toSeq.filter(_._1 != q)
        .map { case (id, v) => (id, localCosine(all(q), v)) }
        .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1)
      val gotQ = (1 to 5).map(rk => got((q, rk)))
      assert(gotQ == expected, s"query $q")
    }
  }

  test("bruteForceTopK works with STRING id columns (no numeric negation of ids)") {
    import org.apache.spark.sql.functions.{col, concat, lit}
    val df = corpus().select(concat(lit("doc_"), col("vec_id")).as("vec_id"), col("embedding"))
    val queries = df.where(col("vec_id") === "doc_0")
    val rows = Similarity.bruteForceTopK(queries, df, "vec_id", "embedding", k = 3)
      .collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getString(1) != null && r.getString(1).startsWith("doc_"),
        "neighbor ids must survive as non-null strings")
    }
  }

  test("knnJoin with nProbe = nCells is EXACTLY the brute-force kNN graph") {
    // probing every cell makes the IVF self-join exhaustive: for each
    // query the candidate set is the whole corpus, so the result must
    // equal bruteForceTopK with the corpus as its own query set
    val df = corpus()
    val exact = Similarity.bruteForceTopK(df, df, "vec_id", "embedding", k = 4)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    val knn = Similarity.knnJoin(df, "vec_id", "embedding", k = 4,
        nCells = 8, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    assert(knn == exact)
  }

  test("knnJoin at nProbe < nCells keeps decent recall and never self-pairs") {
    val df = corpus()
    val exact = Similarity.bruteForceTopK(df, df, "vec_id", "embedding", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows = Similarity.knnJoin(df, "vec_id", "embedding", k = 4,
      nCells = 8, nProbe = 3).collect()
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)), "self-pair leaked")
    val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (got & exact).size.toDouble / exact.size
    assert(recall > 0.5, s"recall $recall too low for nProbe=3 of 8 cells")
  }

  test("knnJoin nCells=0 auto-dial: floors at 16 cells on a small corpus") {
    // the auto dial is max(16, ceil(sqrt(n*nProbe))) — the assignment/
    // in-cell-pairs balance point: any corpus with n*nProbe <= 256 gets
    // the same 16-cell quantizer as the oracle-pinned configuration, so
    // the outputs must be IDENTICAL row-for-row — the dial changes the
    // plan only when the corpus is large enough to need more cells
    assert(Similarity.autoCells(100, 2) == 16)     // floor
    assert(Similarity.autoCells(32000, 2) == 253)  // the ProbeKnn optimum
    assert(Similarity.autoCells(1L << 40, 2) > 0)  // no overflow at 10^12
    val df = corpus().where($"vec_id" < 100)
    val pinned = Similarity.knnJoin(df, "vec_id", "embedding", k = 4,
        nCells = 16, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val auto = Similarity.knnJoin(df, "vec_id", "embedding", k = 4,
        nCells = 0, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(auto == pinned)
    assertThrows[IllegalArgumentException] {
      Similarity.knnJoin(df, "vec_id", "embedding", k = 4, nCells = -1)
    }
  }

  test("knnJoin auto-dial + trained centroids (the q_knn_join_auto shape) keeps recall") {
    val df = corpus()
    val exact = Similarity.bruteForceTopK(df, df, "vec_id", "embedding", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // pinned small cell count: this spec gates trained-centroid RECALL,
    // not the dial (autoCells(200, 2) = 20 cells would thin per-probe
    // coverage below what a 200-vector recall assertion can tolerate)
    val trained = Similarity.kmeansCells(df, "vec_id", "embedding", nCells = 16, iters = 2)
    val rows = Similarity.knnJoin(df, "vec_id", "embedding", k = 4,
      nProbe = 2, centroids = Some(trained)).collect()
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)), "self-pair leaked")
    val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (got & exact).size.toDouble / exact.size
    assert(recall > 0.5, s"recall $recall too low for trained 16-cell nProbe=2")
  }

  test("lshTopK returns a subset of real neighbors with decent recall") {
    val df = corpus()
    val queries = df.where($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(queries, df, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(queries, df, "vec_id", "embedding", k = 5,
      bits = 8, probeHamming = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall > 0.3, s"recall=$recall") // multi-probe LSH on random data
    // hamming-2 probing strictly widens the candidate set → recall must
    // not drop, and generally rises
    val approx2 = Similarity.lshTopK(queries, df, "vec_id", "embedding", k = 5,
      bits = 8, probeHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall2 = exact.intersect(approx2).size.toDouble / exact.size
    assert(recall2 >= recall, s"recall2=$recall2 < recall=$recall")
    assert(approx.subsetOf(approx2) || recall2 >= recall)
  }

  // --- plan-shape guards: the whole ANN family must stay window-free ---
  // (top-k via the bounded-heap aggregate, IVF assignment via map-side
  // argmin; a rank window or a unique-key Exchange is a scale regression)

  private def executedPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // materialize so AQE settles on the final plan
    val full = df.queryExecution.executedPlan.toString
    // AQE plans print "Initial Plan" (pre-reoptimization) after the final
    // plan — assert only on the final section
    full.split("\\+- == Initial Plan ==")(0)
  }

  test("ANN plans: no rank windows, no dropDuplicates, bounded-heap top-k only") {
    val df = corpus()
    val queries = df.where($"vec_id" < 3)
    val plans = Map(
      "brute" -> executedPlan(Similarity.bruteForceTopK(queries, df, "vec_id", "embedding", k = 3)),
      "lsh" -> executedPlan(Similarity.lshTopK(queries, df, "vec_id", "embedding", k = 3, bits = 6, probeHamming = 1)),
      "ivf" -> executedPlan(Similarity.ivfTopK(queries, df, "vec_id", "embedding", k = 3, nCells = 4, nProbe = 2)))
    plans.foreach { case (name, p) =>
      assert(!p.contains("Window"), s"$name plan contains a Window:\n$p")
      assert(p.contains("graft_bottom_k"), s"$name plan lost the bounded-heap aggregate:\n$p")
    }
    // lshTopK previously carried a dropDuplicates (full candidate shuffle);
    // pairs now provably collide at most once, so no dedup aggregate keyed
    // on (query_id, neighbor_id) JOINTLY may appear (the top-k aggregate is
    // legitimately keyed on query_id alone)
    assert(!"keys=\\[query_id[^\\]]*neighbor_id".r.findFirstIn(plans("lsh")).isDefined,
      s"lsh plan re-grew a pair-dedup shuffle:\n${plans("lsh")}")
  }

  test("ivfTopK assignment is map-side: no Exchange keyed on the corpus id") {
    val df = corpus()
    val queries = df.where($"vec_id" < 3)
    val p = executedPlan(Similarity.ivfTopK(queries, df, "vec_id", "embedding",
      k = 3, nCells = 4, nProbe = 2))
    // the old plan shuffled |corpus|×nCells rows via
    // "Exchange hashpartitioning(neighbor_id ...)" for the argmin window;
    // the only corpus-lineage Exchange allowed now is the final top-k
    // aggregate keyed on query_id
    assert(!p.contains("hashpartitioning(neighbor_id"),
      s"IVF assignment shuffles on the corpus id:\n$p")
  }

  test("zero-norm vectors never rank: NULL cosines are filtered before the heap") {
    // a zero vector has no cosine direction; non-ANSI Divide scores it NULL.
    // Unfiltered, that NULL sorts FIRST in interpreted struct ordering and
    // would displace a real neighbor as rank 1 for EVERY query (ADVICE r3).
    val zero = (999L, Array.fill(8)(0.0f))
    val df = corpus().union(Seq(zero).toDF("vec_id", "embedding"))
    val queries = df.where($"vec_id" < 3)
    val rows = Similarity.bruteForceTopK(queries, df, "vec_id", "embedding", k = 5).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) != 999L, "zero-norm vector ranked as a neighbor")
      assert(!r.isNullAt(2) && !r.getDouble(2).isNaN, "degenerate cosine leaked through")
    }
    // a zero-norm QUERY yields no rows rather than arbitrary neighbors
    val zq = Similarity.bruteForceTopK(df.where($"vec_id" === 999L), df,
      "vec_id", "embedding", k = 5).collect()
    assert(zq.isEmpty, "zero-norm query must have no defined neighbors")
  }

  test("kmeansCells: trained centroids land one per planted cluster and lift IVF recall") {
    // 4 well-separated clusters of 25 vectors; seeds (lowest ids) all sit
    // in cluster 0, so the untrained quantizer collapses three clusters
    // into distant cells — Lloyd steps must spread the centroids out
    val rnd = new scala.util.Random(11)
    val centers = Seq(
      Array(10f, 0f, 0f, 0f), Array(0f, 10f, 0f, 0f),
      Array(0f, 0f, 10f, 0f), Array(0f, 0f, 0f, 10f))
    val rows = for {
      c <- centers.indices; j <- 0 until 25
    } yield ((c * 25 + j).toLong, centers(c).map(_ + rnd.nextFloat() * 0.5f))
    // cluster-0 ids first: ids 0..24 are all in cluster 0
    val df = rows.toDF("vec_id", "embedding")
    val trained = Similarity.kmeansCells(df, "vec_id", "embedding", nCells = 4, iters = 4)
    val cells = trained.collect()(0).getSeq[org.apache.spark.sql.Row](0)
    assert(cells.length == 4)
    // each trained centroid sits inside exactly one planted cluster
    val owners = cells.map { cr =>
      val cen = cr.getSeq[Double](1)
      centers.indices.minBy(ci => centers(ci).zip(cen).map { case (a, b) => (a - b) * (a - b) }.sum)
    }
    assert(owners.toSet.size == 4, s"centroids collapsed onto clusters $owners")
    // with one cell per cluster, single-probe IVF finds in-cluster
    // neighbors for every query — the untrained seed quantizer cannot
    val queries = df.where($"vec_id" % 25 === 3)
    val got = Similarity.ivfTopK(queries, df, "vec_id", "embedding", k = 3,
      nCells = 4, nProbe = 1, centroids = Some(trained)).collect()
    val byQ = got.groupBy(_.getLong(0))
    assert(byQ.size == 4, "every query found a populated cell")
    byQ.foreach { case (q, rs) =>
      assert(rs.length == 3)
      // neighbors come from the query's own planted cluster
      rs.foreach(r => assert(r.getLong(1) / 25 == q / 25,
        s"query $q matched out-of-cluster ${r.getLong(1)}"))
    }
  }

  test("imiTopK: full-coverage probing equals a cell-restricted local reference; contract holds") {
    val df = corpus()
    val queries = df.where($"vec_id" < 5)
    // local reference of the ENTIRE operator: per-half argmin over the
    // 4 lowest-id rows' halves, exact top-nProbe combos by dA+dB, cosine
    // rank within probed composite cells
    val all = df.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toMap
    val books = (0L until 4L).map(i => (i, all(i)))
    def dHalf(a: Array[Float], b: Array[Float], lo: Int, hi: Int): Double =
      math.sqrt((lo until hi).map(j => (a(j) - b(j)).toDouble * (a(j) - b(j))).sum)
    def assign(v: Array[Float], lo: Int, hi: Int): Long =
      books.minBy { case (cell, cv) => (dHalf(v, cv, lo, hi), cell) }._1
    val assigned = all.map { case (id, v) => id -> ((assign(v, 0, 4), assign(v, 4, 8))) }
    def probes(v: Array[Float], p: Int): Seq[(Long, Long)] = {
      val pa = books.map { case (c, cv) => (dHalf(v, cv, 0, 4), c) }.sorted.take(p)
      val pb = books.map { case (c, cv) => (dHalf(v, cv, 4, 8), c) }.sorted.take(p)
      (for { a <- pa; b <- pb } yield (a._1 + b._1, a._2, b._2))
        .sorted.take(p).map(t => (t._2, t._3))
    }
    val got = Similarity.imiTopK(queries, df, "vec_id", "embedding", k = 5,
      nPerHalf = 4, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    (0L until 5L).foreach { q =>
      val cells = probes(all(q), 3).toSet
      val expect = all.toSeq
        .filter { case (id, _) => id != q && cells(assigned(id)) }
        .map { case (id, v) => (-localCosine(all(q), v), id) }
        .sorted.take(5).map(_._2)
      val gotQ = expect.indices.map(rk => got((q, rk + 1)))
      assert(gotQ == expect, s"query $q: got $gotQ expected $expect")
    }
    // full coverage sanity: nProbe = nPerHalf² probes every composite cell
    // a query's halves can reach -> recall vs brute force within its cells
    val wide = Similarity.imiTopK(queries, df, "vec_id", "embedding", k = 5,
      nPerHalf = 4, nProbe = 16).collect()
    assert(wide.nonEmpty)
    wide.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.length <= 5)
      assert(rs.map(_.getInt(3)).sorted.toSeq == (1 to rs.length))
      assert(!rs.exists(_.getLong(1) == q))
    }
  }

  test("ivfTopK probes only nProbe cells but finds self-cell neighbors") {
    val df = corpus()
    val queries = df.where($"vec_id" < 5)
    val r = Similarity.ivfTopK(queries, df, "vec_id", "embedding", k = 5,
      nCells = 8, nProbe = 4)
    val rows = r.collect()
    assert(rows.nonEmpty)
    // contract: ≤ k per query, ranked 1..n, no self matches
    val byQ = rows.groupBy(_.getLong(0))
    byQ.foreach { case (q, rs) =>
      assert(rs.length <= 5)
      assert(rs.map(_.getInt(3)).sorted.toSeq == (1 to rs.length))
      assert(!rs.exists(_.getLong(1) == q))
    }
  }
}
