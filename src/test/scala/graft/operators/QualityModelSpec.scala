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

  test("scoreDocs stays fully codegen'd: staged projections survive the optimizer") {
    // the round-6 regression this gates: inlining qualityFeatures into
    // every consumer blew the projection codegen past a Janino scoping
    // bug ("isNull_N is not an rvalue") and Spark SILENTLY fell back to
    // interpreted projection — results identical, throughput not. The
    // fix stages the computation through non-cheap aliases referenced
    // more than once, which CollapseProject never re-inlines.
    // repartition blocks ConvertToLocalRelation from constant-folding the
    // whole plan away — the Projects must survive ABOVE a real exchange
    val scored = QualityModel.scoreDocs(corpus().repartition(2), "doc_id", "text",
      graft.queries.OracleFixtures.QmWeights)
    // structural gate: the staged Projects are still separate after
    // optimization (a revert collapses them back to one giant Project)
    val projects = scored.queryExecution.optimizedPlan.collect {
      case p: org.apache.spark.sql.catalyst.plans.logical.Project => p
    }
    assert(projects.size >= 3,
      s"staged scoring projections were collapsed (${projects.size} Project nodes):\n" +
        scored.queryExecution.optimizedPlan)
    // behavioral gate: the whole pass codegens with fallback DISABLED
    // (the PqSpec shared-context discipline: never stop this session)
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
      val df = (goodTexts.take(5).zipWithIndex.map { case (t, i) => (i.toLong, t) })
        .toDF("doc_id", "text")
      val n = QualityModel.scoreDocs(df, "doc_id", "text",
        graft.queries.OracleFixtures.QmWeights).collect().length
      assert(n == 5)
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(shared)
      org.apache.spark.sql.SparkSession.setActiveSession(shared)
    }
  }

  test("trainLogistic separates an obviously separable corpus") {
    val df = corpus()
    val w = QualityModel.trainLogistic(df, "text", "label", iters = 40, lr = 2.0)
    assert(w.length == QualityModel.Dim)
    // go through the STAGED scoring path (scoreDocs): inlining
    // logit(featureVector(...)) here is exactly the expression shape the
    // staging exists to avoid (it trips the Janino codegen fallback)
    val scored = QualityModel.scoreDocs(df, "doc_id", "text", w.toIndexedSeq)
    val joined = df.select(col("doc_id"), col("label")).join(scored, "doc_id")
    val acc = joined.where(col("keep").cast("int") === col("label"))
      .count().toDouble / 80.0
    assert(acc >= 0.9, s"train accuracy $acc on a separable corpus")
    // the probability view is monotone in the logit: good docs score higher
    val avg = joined.groupBy("label")
      .agg(org.apache.spark.sql.functions.avg(
        lit(1.0) / (lit(1.0) + org.apache.spark.sql.functions.exp(-col("logit")))).as("p"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(avg(1) > avg(0))
  }
}
