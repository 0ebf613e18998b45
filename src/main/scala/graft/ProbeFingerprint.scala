package graft

import org.apache.spark.sql.functions._

/** Dev probe: stage-by-stage cost of the exact-dedup fingerprint path on
  * the inflated corpus — separates parquet scan, whitespace-collapse
  * normalization, md5, and the dedup shuffle, so a rising x16
  * spark/duckdb ratio can be attributed to a stage instead of guessed.
  */
object ProbeFingerprint {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_x16/sf0.1")
    val spark = DevSpark.session()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val both = docs.unionByName(docs.withColumn("doc_id", col("doc_id") + 10000))

    def t(label: String)(f: => Long): Unit = {
      f // warm
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e3
      }
      println(f"[fp] $label%-28s ${runs.min / 1000}%8.1f ms")
    }

    val stats = docs.agg(count(lit(1)), sum(length(col("text"))) / 1048576.0).head()
    println(s"[fp] docs=${stats.getLong(0)} textMB=${"%.1f".format(stats.getDouble(1))}")

    t("scan text")(both.select(col("text")).agg(count(col("text"))).head().getLong(0))
    t("scan+length")(both.select(length(col("text")).as("l")).agg(sum(col("l"))).head().getLong(0))
    t("trim+lower")(both.select(length(lower(trim(col("text")))).as("l"))
      .agg(sum(col("l"))).head().getLong(0))
    t("regex collapse")(both.select(
      length(regexp_replace(lower(trim(col("text"))), "\\s+", " ")).as("l"))
      .agg(sum(col("l"))).head().getLong(0))
    t("md5 only")(both.select(length(md5(col("text"))).as("l"))
      .agg(sum(col("l"))).head().getLong(0))
    t("full fingerprint")(both.select(
      length(graft.functions.TextFunctions.fingerprint(col("text"))).as("l"))
      .agg(sum(col("l"))).head().getLong(0))
    t("dedup exact e2e")(
      graft.operators.Dedup.exact(both, "doc_id", "text").count())
    // floor attribution (r12): the same groupBy-min-count shuffle on a
    // CHEAP 8-byte hash — e2e minus this is the md5+normalize kernel;
    // this minus the scan is the shuffle+agg cost
    t("groupBy on cheap hash")(both
      .select(xxhash64(col("text")).as("__h"), col("doc_id"))
      .groupBy(col("__h"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("c")).count())
    // bare multi-stage scheduling constant at local[32]: a 32-task
    // shuffle job over 64 rows — no scan, no kernel, no real data
    t("32-task shuffle constant")(spark.range(64).repartition(32)
      .groupBy(org.apache.spark.sql.functions.pmod(col("id"), lit(4)))
      .count().count())
    spark.stop()
  }
}

/** Dev probe: q_substring_spans stage costs on the inflated corpus — is
  * the 2-pass gram explode (count pass + join pass) the x16 ratio gap?
  */
object ProbeSpansCost {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_x16/sf0.1")
    val spark = DevSpark.session()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def t(label: String)(f: => Long): Unit = {
      f
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e3
      }
      println(f"[spans] $label%-28s ${runs.min / 1000}%8.1f ms")
    }
    import org.apache.spark.sql.functions._
    val toks = docs.select(col("doc_id"), graft.functions.TextFunctions.tokens(col("text")).as("t"))
    t("tokenize only")(toks.select(size(col("t")).as("n")).agg(sum("n")).head().getLong(0))
    val gh = docs.select(col("doc_id"),
      graft.functions.HashExpressions.ngramHashesAll(graft.functions.TextFunctions.tokens(col("text")), 3).as("g"))
    t("tokenize+gramhash")(gh.select(size(col("g")).as("n")).agg(sum("n")).head().getLong(0))
    t("explode grams count")(gh.select(explode(col("g")).as("g")).count())
    t("groupBy gh (dup grams)")(gh.select(explode(col("g")).as("g"))
      .groupBy("g").agg(count(lit(1)).as("c")).where(col("c") >= 2).count())
    t("spans e2e")(graft.operators.Dedup.duplicateSpans(docs, "doc_id", "text", 3, 5).count())
    spark.stop()
  }
}

/** Dev probe: q_revenue_by_nation stage timings + executed plan on the
  * inflated corpus — the worst x16 spark/duckdb ratio (12×).
  */
object ProbeRevenue {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_x16/sf0.1")
    val spark = DevSpark.session()
    import org.apache.spark.sql.functions._
    def t(label: String)(f: => Long): Unit = {
      f
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e3
      }
      println(f"[rev] $label%-32s ${runs.min / 1000}%8.1f ms")
    }
    val q = graft.queries.Queries.all.find(_.name == "q_revenue_by_nation").get
    t("e2e")(q.fn(spark, dir).count())
    // stages
    val nation = spark.read.parquet(s"$dir/nation.parquet")
    val region = spark.read.parquet(s"$dir/region.parquet")
    val customer = spark.read.parquet(s"$dir/customer.parquet")
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
    val nations = broadcast(nation.join(broadcast(region),
        col("n_regionkey") === col("r_regionkey"))
      .where(col("r_name").isin("ASIA", "EUROPE"))
      .select("n_nationkey", "n_name"))
    val custF = customer.join(nations, col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey", "n_name")
    t("customer join (scan+bcast)")(custF.count())
    val ordF = orders.join(custF, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "n_name")
    t("orders join")(ordF.count())
    t("lineitem scan 2col")(lineitem.select("l_orderkey", "l_extendedprice").count())
    val joined = lineitem.join(ordF, col("l_orderkey") === col("o_orderkey"))
    t("lineitem join")(joined.select(col("l_orderkey")).count())
    q.fn(spark, dir).explain("formatted")
    spark.stop()
  }
}

/** Dev probe: SMJ vs shuffled-hash for the q_revenue_by_nation fact join. */
object ProbeRevenueJoin {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_x16/sf0.1")
    val spark = DevSpark.session()
    import org.apache.spark.sql.functions._
    def t(label: String)(f: => Long): Unit = {
      f
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e3
      }
      println(f"[revj] $label%-32s ${runs.min / 1000}%8.1f ms")
    }
    val customer = spark.read.parquet(s"$dir/customer.parquet")
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
    val nation = spark.read.parquet(s"$dir/nation.parquet")
    val region = spark.read.parquet(s"$dir/region.parquet")
    val rev = col("l_extendedprice").cast("decimal(18,2)") *
      (lit(1).cast("decimal(8,4)") - col("l_discount").cast("decimal(8,4)"))
    val nations = broadcast(nation.join(broadcast(region),
        col("n_regionkey") === col("r_regionkey"))
      .where(col("r_name").isin("ASIA", "EUROPE"))
      .select("n_nationkey", "n_name"))
    def ordF = orders.join(customer.join(nations,
        col("c_nationkey") === col("n_nationkey")).select("c_custkey", "n_name"),
      col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "n_name")
    def agg(j: org.apache.spark.sql.DataFrame) =
      j.groupBy(col("n_name")).agg(round(sum(rev), 2).cast("double").as("revenue"))
    t("fact join SMJ (default)")(
      agg(lineitem.join(ordF, col("l_orderkey") === col("o_orderkey"))).count())
    t("fact join shuffle_hash")(
      agg(lineitem.join(ordF.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))).count())
    t("fact join SMJ again")(
      agg(lineitem.join(ordF, col("l_orderkey") === col("o_orderkey"))).count())
    // r10 variants: when the region-filtered (o_orderkey, n_name)
    // projection fits an executor, broadcasting it deletes the fact-side
    // exchange entirely — and then the per-orderkey pre-aggregation (whose
    // only job is compressing that exchange) is pure overhead. Price both.
    def preagg = lineitem.groupBy(col("l_orderkey")).agg(sum(rev).as("__rev"))
    def aggR(j: org.apache.spark.sql.DataFrame) =
      j.groupBy(col("n_name")).agg(round(sum(col("__rev")), 2).cast("double").as("revenue"))
    t("preagg + shuffle_hash (reg.)")(
      aggR(preagg.join(ordF.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))).count())
    t("preagg + broadcast ordF")(
      aggR(preagg.join(broadcast(ordF), col("l_orderkey") === col("o_orderkey"))).count())
    t("direct + broadcast ordF")(
      agg(lineitem.join(broadcast(ordF), col("l_orderkey") === col("o_orderkey"))).count())
    spark.stop()
  }
}

/** Dev probe: q_dedup_minhash exactly as benched (docsWithDups corpus)
  * on the inflated dir — bench read 3.6 s at x16 vs SCALE.md's 1.7 s
  * standalone pipeline; attribute the difference.
  */
object ProbeMinhashBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_x16/sf0.1")
    val spark = DevSpark.session()
    import org.apache.spark.sql.functions._
    def t(label: String)(f: => Long): Unit = {
      f
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e3
      }
      println(f"[mhb] $label%-30s ${runs.min / 1000}%8.1f ms")
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val both = docs.unionByName(docs.withColumn("doc_id", col("doc_id") + 10000))
    t("signatures only")(both.select(col("doc_id"),
      graft.operators.Dedup.minhashSignature(col("text"), 3, 64).as("sig"))
      .select(count(col("sig"))).head().getLong(0))
    t("q_dedup_minhash e2e")(graft.operators.Dedup.minhashNearDuplicates(
      both, "doc_id", "text", shingle = 3, numHashes = 64, bands = 16,
      threshold = 0.7).count())
    spark.stop()
  }
}

/** Dev probe: first-agreeing-band (carry bh[] through the bucket join)
  * vs distinct-pairs (narrow join rows + pair dedup shuffle) for minhash
  * candidate generation, on the x16 bench corpus.
  */
object ProbeMinhashVariant {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_x16/sf0.1")
    val spark = DevSpark.session()
    import org.apache.spark.sql.functions._
    def t(label: String)(f: => Long): Unit = {
      f
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e3
      }
      println(f"[mhv] $label%-30s ${runs.min / 1000}%8.1f ms")
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val both = docs.unionByName(docs.withColumn("doc_id", col("doc_id") + 10000))

    def variant(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val sigs = df.select(col("doc_id").as("__id"),
        graft.operators.Dedup.minhashSignature(col("text"), 3, 64).as("__sig"))
        .localCheckpoint(true)
      val banded = sigs.select(col("__id"),
          posexplode(graft.functions.HashExpressions.bandHashes(col("__sig"), 16)))
        .withColumnsRenamed(Map("pos" -> "__band", "col" -> "__bucket"))
        .select(col("__band"), col("__bucket"), col("__id"))
      val pairs = banded.join(banded.withColumnRenamed("__id", "idB"), Seq("__band", "__bucket"))
        .where(col("__id") < col("idB"))
        .select(col("__id").as("idA"), col("idB"))
        .distinct()
      pairs
        .join(sigs.select(col("__id").as("idA"), col("__sig").as("__sigA")), "idA")
        .join(sigs.select(col("__id").as("idB"), col("__sig").as("__sigB")), "idB")
        .withColumn("est_jaccard",
          graft.functions.HashExpressions.signatureAgreement(col("__sigA"), col("__sigB")))
        .where(col("est_jaccard") >= 0.7)
        .select(col("idA"), col("idB"), col("est_jaccard"))
    }
    t("current (first-agree)")(graft.operators.Dedup.minhashNearDuplicates(
      both, "doc_id", "text", 3, 64, 16, 0.7).count())
    t("variant (distinct pairs)")(variant(both).count())
    // results must be identical pair sets
    val a = graft.operators.Dedup.minhashNearDuplicates(both, "doc_id", "text", 3, 64, 16, 0.7)
      .select("idA", "idB").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = variant(both).select("idA", "idB").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"[mhv] equal=${a == b} pairs=${a.size}")
    spark.stop()
  }
}
