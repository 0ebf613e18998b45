package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Integer-arithmetic PageRank against a local reference with the same
  * truncating-division formula, plus structural rank properties.
  */
class GraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def localPageRank(nodes: Seq[Long], edges: Seq[(Long, Long)], iters: Int,
      dampN: Long = 85, dampD: Long = 100): Map[Long, Long] = {
    val n = nodes.size.toLong
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = nodes.map(_ -> Graph.Scale / n).toMap
    for (_ <- 1 to iters) {
      val contrib = edges.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => r(u) / deg(u) }.sum).toMap
      val dm = nodes.filterNot(deg.contains).map(r).sum
      val base = ((Graph.Scale / n) * (dampD - dampN)) / dampD
      r = nodes.map(v => v ->
        (base + (dampN * (contrib.getOrElse(v, 0L) + dm / n)) / dampD)).toMap
    }
    r
  }

  private def run(nodes: Seq[Long], edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graph.pageRank(nodes.toDF("v"), edges.toDF("src", "dst"), iters)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toMap

  test("matches the local integer reference on a graph with dangling nodes and a hub") {
    // hub 0 pointed at by everyone; 5 is dangling; 1-4 chain
    val nodes = (0L to 5L)
    val edges = Seq(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L,
      1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L, 0L -> 1L)
    for (iters <- Seq(0, 1, 3, 5))
      assert(run(nodes, edges, iters) == localPageRank(nodes, edges, iters),
        s"mismatch at iters=$iters")
  }

  test("structure: hub outranks leaves; symmetric cycle stays uniform; mass conserved to truncation") {
    val nodes = (0L to 4L)
    val star = Seq(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L, 0L -> 1L)
    val r = run(nodes, star, 5)
    assert(r(0L) > r(2L) && r(0L) > r(3L))
    val cycle = nodes.map(v => v -> ((v + 1) % 5))
    val rc = run(nodes, cycle, 4)
    assert(rc.values.toSet.size == 1, "symmetric cycle must stay exactly uniform")
    // truncating divisions lose at most a few units per node per iteration
    val total = rc.values.sum
    assert(total <= Graph.Scale && Graph.Scale - total < 1000L)
  }

  private def localPpr(nodes: Seq[Long], edges: Seq[(Long, Long)], seeds: Set[Long],
      iters: Int, dampN: Long = 85, dampD: Long = 100): Map[Long, Long] = {
    val s = seeds.size.toLong
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = nodes.map(v => v -> (if (seeds(v)) Graph.Scale / s else 0L)).toMap
    for (_ <- 1 to iters) {
      val contrib = edges.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => r(u) / deg(u) }.sum).toMap
      val dm = nodes.filterNot(deg.contains).map(r).sum
      r = nodes.map { v =>
        val base = if (seeds(v)) ((Graph.Scale / s) * (dampD - dampN)) / dampD else 0L
        val tele = if (seeds(v)) dm / s else 0L
        v -> (base + (dampN * (contrib.getOrElse(v, 0L) + tele)) / dampD)
      }.toMap
    }
    r
  }

  test("personalized PageRank: matches local reference; mass radiates from seeds only") {
    val nodes = (0L to 6L)
    // 0→1→2→3 chain; 5↔6 island; 4 dangling
    val edges = Seq(0L -> 1L, 1L -> 2L, 2L -> 3L, 3L -> 4L, 5L -> 6L, 6L -> 5L)
    val seeds = Set(0L)
    val got = Graph.pageRankPersonalized(nodes.toDF("v"),
      edges.toDF("src", "dst"), Seq(0L).toDF("v"), iters = 3)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(got == localPpr(nodes, edges, seeds, 3))
    // the island is unreachable from the seed: exactly zero mass
    assert(got(5L) == 0L && got(6L) == 0L)
    // mass decays along the chain from the seed
    assert(got(0L) > got(1L) && got(1L) > got(2L))
  }

  private def runLp(nodes: Seq[Long], edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graph.labelPropagate(nodes.toDF("v"), edges.toDF("src", "dst"), iters)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toMap

  test("labelPropagate: bounded rounds reach exactly the k-hop min; enough rounds = components") {
    // path 0-1-2-3-4 (undirected view), plus isolated 10, plus pair 20-21
    val nodes = Seq(0L, 1L, 2L, 3L, 4L, 10L, 20L, 21L)
    val edges = Seq(0L -> 1L, 1L -> 2L, 2L -> 3L, 3L -> 4L, 21L -> 20L)
    val one = runLp(nodes, edges, 1)
    assert(one(2L) == 1L && one(4L) == 3L, "1 round = 1-hop min")
    assert(one(10L) == 10L && one(20L) == 20L && one(21L) == 20L)
    val conv = runLp(nodes, edges, 4) // diameter of the path
    assert(conv == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L,
      10L -> 10L, 20L -> 20L, 21L -> 20L))
    // agreement with the exact component operator at convergence
    val cc = Dedup.connectedComponents(
      edges.toDF("idA", "idB"), "idA", "idB")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    nodes.filter(cc.contains).foreach { v =>
      assert(conv(v) == cc(v), s"node $v: lp ${conv(v)} vs cc ${cc(v)}")
    }
  }

  test("triangleCounts == brute force on planted structures incl. a star hub") {
    // K4 on {1,2,3,4} (every node in 3 triangles), a disjoint triangle
    // {10,11,12}, a path {20,21,22} (no triangles), and a star hub 30
    // with leaves 31..40 (no triangles despite degree 10) — the star is
    // exactly the shape a non-degree-ordered join would blow up on
    val k4 = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)
    val edges = k4 ++ Seq((10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L), (21L, 22L)) ++ (31L to 40L).map(l => (30L, l)) ++
      Seq((2L, 1L), (11L, 10L)) // reversed duplicates must canonicalize away
    val got = Graph.triangleCounts(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = {
      val es = edges.map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
      val vs = es.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
      val tris = for {
        a <- vs; b <- vs if a < b && es((a, b))
        c <- vs if b < c && es((b, c)) && es((a, c))
      } yield Seq(a, b, c)
      tris.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    }
    assert(got == brute, s"$got != $brute")
    assert(got(1L) == 3 && got(10L) == 1 && !got.contains(20L) && !got.contains(30L))
  }

  test("labelPropagate is monotone in rounds and layout-independent") {
    val rnd = new scala.util.Random(11)
    val nodes = (0L until 60L)
    val edges = Seq.fill(70)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter(e => e._1 != e._2)
    val l2 = runLp(nodes, edges, 2)
    val l3 = runLp(nodes, edges, 3)
    nodes.foreach(v => assert(l3(v) <= l2(v)))
    val l3b = Graph.labelPropagate(nodes.toDF("v").repartition(7),
      edges.toDF("src", "dst").repartition(5), 3)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(l3b == l3)
  }
}
