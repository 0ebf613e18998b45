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
}
