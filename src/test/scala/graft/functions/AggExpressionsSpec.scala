package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bounded-heap top_k aggregate: result parity with sort-based top-k,
  * partial/final correctness across partitions, struct ordering.
  */
class AggExpressionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("top_k equals orderBy.limit on scalars, across many partitions") {
    val rnd = new scala.util.Random(7)
    val df = spark.createDataset(Seq.fill(5000)(rnd.nextInt(100000)))
      .repartition(16).toDF("v")
    val viaAgg = df.agg(AggExpressions.topK(col("v"), 10).as("t"))
      .select(explode(col("t"))).collect().map(_.getInt(0)).toSeq
    val viaSort = df.orderBy(col("v").desc).limit(10).collect().map(_.getInt(0)).toSeq
    assert(viaAgg == viaSort)
  }

  test("grouped top_k with struct (score, tiebreak) ordering matches window ranking") {
    val data = Seq(
      ("g1", 1L, 5.0), ("g1", 2L, 5.0), ("g1", 3L, 7.0), ("g1", 4L, 1.0),
      ("g2", 5L, 2.0), ("g2", 6L, 2.0)).toDF("g", "id", "score").repartition(8)
    val got = data.groupBy("g")
      .agg(AggExpressions.topK(struct(col("score"), (-col("id")).as("negid")), 2).as("t"))
      .select(col("g"), posexplode(col("t")))
      .select(col("g"), (-col("col.negid")).as("id"), (col("pos") + 1).cast("long").as("rank"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // score desc, id asc on ties
    assert(got == Set(("g1", 3L, 1L), ("g1", 1L, 2L), ("g2", 5L, 1L), ("g2", 6L, 2L)))
  }

  test("top_k with strings and fewer rows than k") {
    val df = Seq("b", "a", "c").toDF("s").repartition(4)
    val got = df.agg(AggExpressions.topK(col("s"), 10).as("t"))
      .select(explode(col("t"))).collect().map(_.getString(0)).toSeq
    assert(got == Seq("c", "b", "a"))
  }

  test("struct values with STRING fields survive buffer reuse (deep copy)") {
    // regression: GenericInternalRow struct values hold UTF8Strings aliasing
    // scanner-reused buffers; without deep copy the top-k array corrupts
    val rnd = new scala.util.Random(11)
    val df = spark.createDataset(
      (0 until 4000).map(i => (rnd.nextInt(1000000), s"title_$i")))
      .repartition(8).toDF("score", "title")
    val got = df.agg(AggExpressions.topK(struct(col("score"), col("title")), 5).as("t"))
      .select(explode(col("t"))).select("col.score", "col.title")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    val want = df.orderBy(col("score").desc, col("title").desc).limit(5)
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(got.toSeq == want.toSeq)
    got.foreach { case (s, t) => assert(t == s"title_${t.stripPrefix("title_")}") }
  }

  test("bottomK returns the k smallest ascending") {
    val df = Seq(5, 1, 9, 3, 7).toDF("v").repartition(3)
    val got = df.agg(AggExpressions.bottomK(col("v"), 3).as("t"))
      .select(explode(col("t"))).collect().map(_.getInt(0)).toSeq
    assert(got == Seq(1, 3, 5))
  }

  test("nulls are skipped, empty input gives empty array") {
    val df = Seq(Some(3), None, Some(1)).toDF("v")
    val got = df.agg(AggExpressions.topK(col("v"), 5).as("t"))
      .select(explode(col("t"))).collect().map(_.getInt(0)).toSeq
    assert(got == Seq(3, 1))
    val empty = spark.emptyDataset[Int].toDF("v")
    assert(empty.agg(AggExpressions.topK(col("v"), 5).as("t"))
      .select(col("t")).collect().head.getSeq[Int](0).isEmpty)
  }
}
