package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The extension-injected SQL functions work from plain `spark.sql` in a
  * session built with `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    // force a NEW session (sharing any existing SparkContext) so the
    // extensions actually inject — getOrCreate would return the shared
    // test session, which was built without them
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", "false")
      // withExtensions, not the spark.sql.extensions conf: that conf is
      // static and only read when the SparkContext is first created, so it
      // has no effect when an earlier suite already started the context
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    assert(s.sessionState.functionRegistry
      .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot")),
      "extensions failed to inject")
    s
  }

  test("vector + hash functions are SQL-callable") {
    val r = spark.sql(
      """SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
                graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c,
                graft_l2(array(0.0d, 3.0d), array(4.0d, 0.0d)) AS l,
                graft_quantized_dot(array(0.5d), array(2.0d), 1000) AS q,
                graft_simhash(array('a', 'b')) AS sh,
                size(graft_minhash(array('a', 'b'), 8)) AS mh
      """).head()
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 1.0)
    assert(r.getDouble(2) == 5.0)
    assert(r.getLong(3) == 500L * 2000L)
    assert(r.getLong(4) != 0L)
    assert(r.getInt(5) == 8)
  }

  test("graft_top_k aggregates in SQL with GROUP BY") {
    spark.sql("SELECT * FROM VALUES ('a', 3), ('a', 7), ('a', 5), ('b', 1) AS t(g, v)")
      .createOrReplaceTempView("tk")
    val rows = spark.sql(
      "SELECT g, graft_top_k(v, 2) AS top FROM tk GROUP BY g ORDER BY g")
      .collect().map(r => (r.getString(0), r.getSeq[Int](1)))
    assert(rows.toSeq == Seq(("a", Seq(7, 5)), ("b", Seq(1))))
  }
}
