package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: A/B the three range-join execution paths on the events
  * table — (a) Spark's default plan for a BETWEEN join (broadcast nested
  * loop), (b) the logical binned rewrite (RangeJoinRewrite), (c) the
  * physical broadcast range join (RangeJoinStrategy). Prints min-of-2
  * timings plus the join node each plan used. Results recorded in
  * SCALE.md.
  */
object ProbeRange {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // localCheckpoint RETURNS the checkpointed dataset — registering the
    // returned plans means the timed runs probe the join paths, not the
    // parquet scan+projection
    val ev = graft.queries.Tables.eventsNs(spark, sfDir)
      .select(col("event_id"), expr("ts DIV 1000").as("tsu"))
      .localCheckpoint(true)
    val iv = ev.where(col("event_id") % 100 === 0)
      .select(col("event_id").as("interval_id"), col("tsu").as("lo"),
        (col("tsu") + 60000000L).as("hi"))
      .localCheckpoint(true)
    ev.createOrReplaceTempView("p")
    iv.createOrReplaceTempView("i")
    val sql = "SELECT p.event_id, i.interval_id FROM p JOIN i ON p.tsu BETWEEN i.lo AND i.hi"

    def run(label: String, confs: Map[String, String]): Long = {
      Seq(graft.plans.RangeJoinRewrite.BinWidthKey,
        graft.plans.RangeJoinRewrite.PhysicalKey).foreach(spark.conf.unset)
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val df = spark.sql(sql)
      val n = df.count() // warm-up
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        spark.sql(sql).count()
        (System.nanoTime() - t0) / 1e6
      }
      val plan = df.queryExecution.executedPlan.toString
      val node = Seq("BroadcastRangeJoin", "BroadcastNestedLoopJoin",
        "SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin", "CartesianProduct")
        .find(plan.contains).getOrElse("?")
      println(f"[range] $label%-9s ${times.min}%8.0f ms  rows=$n  join=$node")
      n
    }

    val w = graft.plans.RangeJoinRewrite.BinWidthKey -> "60000000"
    val a = run("naive", Map.empty)
    val b = run("rewrite", Map(w))
    val c = run("physical", Map(w, graft.plans.RangeJoinRewrite.PhysicalKey -> "true"))
    assert(a == b && b == c, s"row counts diverged: $a / $b / $c")
    spark.stop()
  }
}
