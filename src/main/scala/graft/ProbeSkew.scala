package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: AQE skew-join effectiveness on the RELATIONAL fact joins.
  * The dedup/session/asof family has measured skew stories (ProbeScale,
  * SCALE.md); the TPC-H shapes relied on an asserted-but-unmeasured "AQE
  * handles it". This probe makes that claim a number: plant a hot
  * orderkey carrying ~20% of an inflated lineitem, run the
  * q_revenue_by_nation-shaped orders⋈lineitem join with AQE skew-join ON
  * vs OFF (broadcast disabled so the join actually shuffles, as it would
  * at cluster scale), and report wall time plus the skew-split evidence
  * from the executed plan. Results: SCALE.md §skew.
  */
object ProbeSkew {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = DevSpark.session()

    // hot key: replicate one order's lineitem rows until they are ~20% of
    // the fact table (distinct line numbers keep rows distinct), then
    // checkpoint so the timed runs probe the JOIN, not the inflation
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_extendedprice", "l_discount", "l_linenumber")
    val total = li.count()
    val hotKey = li.groupBy("l_orderkey").count()
      .orderBy(desc("count")).select("l_orderkey").head().getLong(0)
    val hotBase = li.where(col("l_orderkey") === hotKey)
    val hotRows = hotBase.count()
    val copies = math.max(1L, total / 4 / math.max(1L, hotRows))
    // inflate via ONE explode (a union of thousands of DataFrames would
    // explode the plan, not the data)
    // copies must be value-DISTINCT, not replicas: 150k identical rows
    // run-length-compress in the shuffle to a few KB, so AQE's byte
    // stats would never see the row-count skew a real hot key carries
    val hot = hotBase
      .withColumn("__i", explode(sequence(lit(1L), lit(copies))))
      .withColumn("l_linenumber", col("l_linenumber") + col("__i") * 100L)
      .withColumn("l_extendedprice",
        col("l_extendedprice") * (lit(1.0) + (col("__i") % 9973L) / lit(10007.0)))
      .drop("__i")
    val fact = li.unionByName(hot).localCheckpoint(true)
    val factN = fact.count()
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_custkey").localCheckpoint(true)
    println(s"[skew] fact=$factN rows, hot key $hotKey = ${hotRows * copies} (${100L * hotRows * copies / factN}%)")

    def run(label: String, skewJoin: Boolean): Unit = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewJoin)
      // force the shuffle join: at 100 TB orders does not broadcast
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // thresholds sized to the probe's sub-MB compressed shuffle blocks
      // (defaults aim at 256 MB cluster partitions): the hot partition is
      // ~1.5 MB compressed vs a ~200 KB median, the same 5-10x skew RATIO
      // a 100 TB hot key shows at its own magnitude
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "512k")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256k")
      val joined = fact.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)")
          * (lit(1).cast("decimal(8,4)") - col("l_discount").cast("decimal(8,4)")))
          .as("revenue"))
      // collect(), not count(): count() plans its OWN query execution, so
      // the final adaptive plan (the skew-split evidence) would never
      // land on the inspected DataFrame
      joined.collect() // warm-up
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        joined.collect()
        (System.nanoTime() - t0) / 1e6
      }
      val plan = joined.queryExecution.executedPlan.toString
      val skewMarks = "skewed".r.findAllIn(plan).size
      println(f"[skew] $label%-14s min=${times.min}%7.0f ms  skewed-reader-marks=$skewMarks")
      if (sys.env.contains("SPARK_GRAFT_SKEW_PLAN"))
        println(plan.split("\n").filter(l =>
          l.contains("Join") || l.contains("AQEShuffleRead") || l.contains("Exchange"))
          .mkString("[skew-plan] ", "\n[skew-plan] ", ""))
    }
    run("aqe-skew-OFF", skewJoin = false)
    run("aqe-skew-ON", skewJoin = true)

    // the MANUAL dial on the same data: salted join with AQE skew-join
    // off — the regime where AQE can't help (stream-static, cached
    // subplans); equivalence is SkewJoinSpec's + the shared oracle's job,
    // this measures the spread's effect
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", false)
    val salted = graft.operators.SkewJoin.saltedJoin(
        fact, orders.withColumnRenamed("o_orderkey", "l_orderkey"),
        keys = Seq("l_orderkey"), salts = 16, saltOn = Seq("l_linenumber"))
      .groupBy("o_custkey")
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)")
        * (lit(1).cast("decimal(8,4)") - col("l_discount").cast("decimal(8,4)")))
        .as("revenue"))
    salted.collect() // warm-up
    val saltedTimes = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      salted.collect()
      (System.nanoTime() - t0) / 1e6
    }
    println(f"[skew] salted-16     min=${saltedTimes.min}%7.0f ms  (AQE skew off)")
    spark.stop()
  }
}
