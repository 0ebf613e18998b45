package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Model-based quality scoring: the literal-weight scoring pass matches a
  * local replica, and trainLogistic distills a separable labeling into
  * weights that reproduce it.
  */
class QualityModelSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val goodTexts = (0 until 40).map(i =>
    s"a clear and well formed sentence about topic number $i with varied " +
      s"words that flow naturally and carry meaning across clause $i")
  private val junkTexts = (0 until 40).map(i =>
    ("@@!! ##%% " + s"x$i ").repeat(5) + "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))")

  private def corpus() =
    (goodTexts.zipWithIndex.map { case (t, i) => (i.toLong, t, 1) } ++
      junkTexts.zipWithIndex.map { case (t, i) => (100L + i, t, 0) })
      .toDF("doc_id", "text", "label")

  test("scoreDocs under literal weights matches a local feature replica") {
    val df = corpus()
    val got = QualityModel.scoreDocs(df, "doc_id", "text",
      graft.queries.OracleFixtures.QmWeights)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    // local replica of featureVector + logit on one row
    val feats = df.select(col("doc_id"),
      QualityModel.featureVector(col("text")).as("x")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val w = graft.queries.OracleFixtures.QmWeights
    feats.foreach { case (id, x) =>
      val l = x.indices.map(i => x(i) * w(i)).reduceLeft(_ + _)
      assert(math.abs(got(id)._1 - math.rint(l * 1e6) / 1e6) < 1e-9, s"doc $id")
      assert(got(id)._2 == (l > 0), s"doc $id keep")
    }
    assert(feats.values.forall(_.length == QualityModel.Dim))
  }

  test("trainLogistic separates an obviously separable corpus") {
    val df = corpus()
    val w = QualityModel.trainLogistic(df, "text", "label", iters = 40, lr = 2.0)
    assert(w.length == QualityModel.Dim)
    val acc = df.select(
        (QualityModel.logit(QualityModel.featureVector(col("text")), w.toIndexedSeq) > 0)
          .cast("int").as("pred"), col("label"))
      .where(col("pred") === col("label")).count().toDouble / 80.0
    assert(acc >= 0.9, s"train accuracy $acc on a separable corpus")
    // the probability view is monotone in the logit: good docs score higher
    val avg = df.groupBy("label")
      .agg(org.apache.spark.sql.functions.avg(
        QualityModel.score(QualityModel.featureVector(col("text")), w.toIndexedSeq)).as("p"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(avg(1) > avg(0))
  }
}
