package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
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
                size(graft_minhash(array('a', 'b'), 8)) AS mh,
                size(graft_ngram_hashes(array('a', 'b', 'a', 'b'), 2)) AS ng
      """).head()
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 1.0)
    assert(r.getDouble(2) == 5.0)
    assert(r.getLong(3) == 500L * 2000L)
    assert(r.getLong(4) != 0L)
    assert(r.getInt(5) == 8)
    assert(r.getInt(6) == 2, "4 tokens / 2-grams: (a b), (b a), (a b) → 2 distinct")
  }

  test("graft_bpe_apply is SQL-callable with a literal merge table") {
    val r = spark.sql(
      "SELECT graft_bpe_apply('lowest', 'e s,es t,l o,lo w') AS p").head()
    assert(r.getString(0) == "low est")
    val t = spark.sql(
      "SELECT graft_bpe_apply_text('lowest low', 'e s,es t,l o,lo w') AS p").head()
    assert(t.getString(0) == "low est low")
  }

  test("text toolkit functions are SQL-callable") {
    val r = spark.sql(
      """SELECT graft_token_count('a b  c') AS n,
                graft_bpe_token_count('hello, world') AS nb,
                graft_shingles('a b c', 2) AS sh,
                graft_chunks('a b c d e', 2, 2) AS ch""").head()
    assert(r.getInt(0) == 3)
    assert(r.getInt(1) == 3) // pre-tokenizer: "hello" | "," | " world"
    assert(r.getSeq[String](2) == Seq("a b", "b c"))
    assert(r.getSeq[String](3) == Seq("a b", "c d", "e"))
    val err = intercept[Exception](
      spark.sql("SELECT graft_bpe_apply('x', 'bad-rule') AS p").head())
    assert(err.getMessage.contains("left right"))
  }

  test("RangeJoinRewrite: BETWEEN join becomes a binned equi-join, same result, no nested loop") {
    import spark.implicits._
    val points = (0L to 500L by 7).map(i => (i, i)).toDF("pid", "pt")
    val intervals = Seq((1L, 10L, 60L), (2L, 50L, 55L), (3L, 400L, 520L))
      .toDF("iid", "lo", "hi")
    points.createOrReplaceTempView("pts")
    intervals.createOrReplaceTempView("ivs")
    val sql = "SELECT pid, iid FROM pts JOIN ivs ON pt >= lo AND pt <= hi"
    // baseline: rule off → nested-loop plan, reference result
    spark.conf.unset(RangeJoinRewrite.BinWidthKey)
    val naive = spark.sql(sql)
    assert(naive.queryExecution.executedPlan.toString.contains("NestedLoop"),
      "without the rule this condition has no equi-keys")
    val expected = naive.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // rule on → equi-join on bins, identical multiset
    spark.conf.set(RangeJoinRewrite.BinWidthKey, "64")
    try {
      val rewritten = spark.sql(sql)
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
        s"rewrite should remove the nested loop:\n$plan")
      val got = rewritten.collect().map(r => (r.getLong(0), r.getLong(1))).toList
      assert(got.distinct.size == got.size, "rewrite must not duplicate pairs")
      assert(got.toSet == expected)
      // intervals-first table order and flipped comparison spelling must
      // also rewrite — the rule mirrors sides and operand orientation
      for (variant <- Seq(
          "SELECT pid, iid FROM ivs JOIN pts ON pt >= lo AND pt <= hi",
          "SELECT pid, iid FROM pts JOIN ivs ON lo <= pt AND pt <= hi")) {
        val v = spark.sql(variant)
        val vplan = v.queryExecution.executedPlan.toString
        assert(!vplan.contains("NestedLoop") && !vplan.contains("Cartesian"),
          s"variant not rewritten: $variant\n$vplan")
        assert(v.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == expected)
      }
    } finally spark.conf.unset(RangeJoinRewrite.BinWidthKey)
  }

  test("RangeJoinStrategy: physical flag plans BroadcastRangeJoinExec, same result") {
    import spark.implicits._
    val points = (0L to 500L by 7).map(i => (i, i)).toDF("pid", "pt")
    val intervals = Seq((1L, 10L, 60L), (2L, 50L, 55L), (3L, 400L, 520L))
      .toDF("iid", "lo", "hi")
    points.createOrReplaceTempView("pts2")
    intervals.createOrReplaceTempView("ivs2")
    val sql = "SELECT pid, iid FROM pts2 JOIN ivs2 ON pt >= lo AND pt <= hi"
    val expected = spark.sql(sql).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.conf.set(RangeJoinRewrite.BinWidthKey, "64")
    spark.conf.set(RangeJoinRewrite.PhysicalKey, "true")
    try {
      for (variant <- Seq(
          sql, // intervals broadcast from the right
          "SELECT pid, iid FROM ivs2 JOIN pts2 ON pt >= lo AND pt <= hi", // …and from the left
          "SELECT pid, iid FROM pts2 JOIN ivs2 ON lo <= pt AND hi >= pt")) { // flipped spelling
        val df = spark.sql(variant)
        val plan = df.queryExecution.executedPlan.toString
        assert(plan.contains("BroadcastRangeJoin"),
          s"physical node missing for: $variant\n$plan")
        assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"), plan)
        val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toList
        assert(got.distinct.size == got.size, "physical join must not duplicate pairs")
        assert(got.toSet == expected, s"wrong rows for: $variant")
      }
    } finally {
      spark.conf.unset(RangeJoinRewrite.BinWidthKey)
      spark.conf.unset(RangeJoinRewrite.PhysicalKey)
    }
  }

  test("RangeJoinStrategy falls back to the binned equi-join when broadcasting is off — never BNLJ") {
    import spark.implicits._
    (0L to 50L).map(i => (i, i)).toDF("pid", "pt").createOrReplaceTempView("pts3")
    Seq((1L, 10L, 20L)).toDF("iid", "lo", "hi").createOrReplaceTempView("ivs3")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set(RangeJoinRewrite.BinWidthKey, "16")
    spark.conf.set(RangeJoinRewrite.PhysicalKey, "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = spark.sql("SELECT pid, iid FROM pts3 JOIN ivs3 ON pt >= lo AND pt <= hi")
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastRangeJoin"),
        s"physical node needs a broadcastable side:\n$plan")
      assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
        s"a matched pattern must never fall through to a nested loop:\n$plan")
      assert(df.count() == 11) // correctness through the fallback plan
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.unset(RangeJoinRewrite.BinWidthKey)
      spark.conf.unset(RangeJoinRewrite.PhysicalKey)
    }
  }

  test("BroadcastRangeJoinExec index cache disambiguates different bounds over one broadcast") {
    import spark.implicits._
    (0L to 50L).map(i => (i, i)).toDF("pid", "pt").createOrReplaceTempView("pts4")
    Seq((1L, 10L, 20L)).toDF("iid", "lo", "hi").createOrReplaceTempView("ivs4")
    spark.conf.set(RangeJoinRewrite.BinWidthKey, "16")
    spark.conf.set(RangeJoinRewrite.PhysicalKey, "true")
    try {
      // two range joins over the SAME interval scan with different bounds:
      // exchange reuse can hand both joins one broadcast value, so the
      // executor-side index must key on the bound expressions too
      val df = spark.sql(
        """SELECT a.pid AS p1, b.pid AS p2 FROM
             (SELECT pid FROM pts4 JOIN ivs4 ON pt >= lo AND pt <= hi) a
             FULL OUTER JOIN
             (SELECT pid FROM pts4 JOIN ivs4 ON pt >= lo AND pt <= hi + 10) b
           ON a.pid = b.pid""")
      val rows = df.collect()
      assert(rows.count(_.isNullAt(0) == false) == 11, "first join: [10,20]")
      assert(rows.count(_.isNullAt(1) == false) == 21, "second join: [10,30]")
    } finally {
      spark.conf.unset(RangeJoinRewrite.BinWidthKey)
      spark.conf.unset(RangeJoinRewrite.PhysicalKey)
    }
  }

  test("text-pipeline functions are SQL-callable and match the Column API") {
    import spark.implicits._
    val df = Seq(
      "The quick brown fox jumps over the lazy dog near the riverbank today",
      "spam spam spam spam spam").toDF("text")
    df.createOrReplaceTempView("txts")
    val viaSql = spark.sql(
      """SELECT graft_quality(text) AS q, graft_fingerprint(text) AS fp,
                graft_normalize(text) AS norm, graft_langid(text) AS lang,
                graft_redact(text) AS red, graft_dup_word_frac(text) AS dw
         FROM txts""").collect()
    val viaCols = df.select(
      graft.functions.TextFunctions.qualityScore(col("text")).as("q"),
      graft.functions.TextFunctions.fingerprint(col("text")).as("fp"),
      graft.functions.TextFunctions.normalizeText(col("text")).as("norm"),
      graft.functions.TextFunctions.langId(col("text")).as("lang"),
      graft.functions.TextFunctions.redactPii(col("text")).as("red"),
      graft.functions.TextFunctions.dupWordFraction(col("text")).as("dw")).collect()
    assert(viaSql.map(_.toSeq).toSeq == viaCols.map(_.toSeq).toSeq)
    assert(viaSql(1).getDouble(5) == 0.8, "spam x5 repeats 4/5 of its words")
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
