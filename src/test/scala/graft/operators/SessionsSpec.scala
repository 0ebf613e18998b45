package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** batchSkewSafe must be result-identical to batch — same schema, same
  * 0-based per-key session ids — while never sorting a whole key in one
  * task. Random fixtures force sessions that chain across bucket
  * boundaries plus a pathological hot key.
  */
class SessionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def sessionsOf(df: org.apache.spark.sql.DataFrame) =
    df.select("key", "session_id", "start_ts", "end_ts", "n_events")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(t => (t._1, t._2)).toSeq

  test("batchSkewSafe == batch on random data with boundary-spanning sessions and a hot key") {
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 3) {
      // gaps drawn around the session gap (50) and bucket width (300):
      // plenty of sessions continue straight across a bucket boundary
      val events = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      for (k <- 0L until 6L) {
        var t = rnd.nextInt(100).toLong
        val n = if (k == 0) 3000 else 100 // key 0 is the hot key
        for (_ <- 0 until n) {
          t += rnd.nextInt(120).toLong // 0..119: ~40% of steps break (gap 50)
          events += ((k, t))
        }
      }
      val df = events.toSeq.toDF("user", "ts")
      val plain = Sessions.batchSingleWindow(df, col("user"), col("ts"), col("ts"), gap = 50L)
      val safe = Sessions.batchSkewSafe(df, col("user"), col("ts"), col("ts"),
        gap = 50L, bucket = 300L)
      assert(sessionsOf(safe) == sessionsOf(plain), s"trial $trial diverged")
    }
  }

  test("batch DEFAULTS to the skew-safe execution and matches the single-window result") {
    val df = (0L until 200L).map(i => (i % 3, i * 30L)).toDF("user", "ts")
    val byDefault = Sessions.batch(df, col("user"), col("ts"), col("ts"), gap = 50L)
    val plan = byDefault.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert("windowspecdefinition\\(user#\\d+L?, __bkt#".r.findFirstIn(plan).isDefined,
      s"default batch must run the bucketed skew-safe window:\n$plan")
    val plain = Sessions.batchSingleWindow(df, col("user"), col("ts"), col("ts"), gap = 50L)
    assert(sessionsOf(byDefault) == sessionsOf(plain))
    // explicit bucket still honored (must exceed gap)
    intercept[IllegalArgumentException](
      Sessions.batch(df, col("user"), col("ts"), col("ts"), gap = 50L, bucket = 10L).collect())
  }

  test("batchSkewSafe heals a session spanning many buckets into one row") {
    // 10 events 20 apart: one session of length 180, crossing buckets of 60
    val df = (0L until 10L).map(i => (1L, i * 20L)).toDF("user", "ts")
    val safe = sessionsOf(Sessions.batchSkewSafe(df, col("user"), col("ts"), col("ts"),
      gap = 50L, bucket = 60L))
    assert(safe == Seq((1L, 0L, 0L, 180L, 10L)))
  }

  test("funnelStages: sequential-order constraint, monotone null suffix") {
    // user 1 completes 0→1→2 in order; user 2 has stage 1 BEFORE stage 0
    // (must not count) and again after (counts); user 3 stalls at stage 0;
    // user 4 never does stage 0 (absent from output)
    val ev = Seq(
      (1L, 10L, 0), (1L, 20L, 1), (1L, 15L, 1), (1L, 30L, 2), // min valid t1=15
      (2L, 50L, 1), (2L, 100L, 0), (2L, 120L, 1),
      (3L, 5L, 0), (3L, 1L, 2), // stage 2 before stage 1 exists: no t1, no t2
      (4L, 99L, 1)
    ).toDF("user", "ts", "st")
    val r = Sessions.funnelStages(ev, "user", "ts", "st", nStages = 3)
      .collect().map(x => x.getLong(0) ->
        (0 to 2).map(i => if (x.isNullAt(i + 1)) None else Some(x.getLong(i + 1)))).toMap
    assert(r.keySet == Set(1L, 2L, 3L))
    assert(r(1L) == Seq(Some(10L), Some(15L), Some(30L)))
    assert(r(2L) == Seq(Some(100L), Some(120L), None))
    assert(r(3L) == Seq(Some(5L), None, None))
  }

  test("cohortRetention: offsets from each user's first period; offset 0 is cohort size") {
    // bucket 10: user 1 first in period 0, active 0 and 2; user 2 first in
    // period 0, active 0 only; user 3 first in period 2, active 2 and 3
    val ev = Seq((1L, 3L), (1L, 25L), (1L, 29L), (2L, 8L),
      (3L, 21L), (3L, 34L)).toDF("user", "ts")
    val r = Sessions.cohortRetention(ev, "user", "ts", bucket = 10L)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
    assert(r == Map((0L, 0L) -> 2L, (0L, 2L) -> 1L, (2L, 0L) -> 1L, (2L, 1L) -> 1L))
  }

  test("cohortRetention: pre-epoch (negative) timestamps bucket by FLOOR division") {
    // ts = -3 with bucket 10 is period -1 under floor semantics (DuckDB `//`);
    // truncate-toward-zero would put it in period 0 and shift the cohort
    val ev = Seq((1L, -3L), (1L, 7L), (2L, -20L), (2L, -11L)).toDF("user", "ts")
    val r = Sessions.cohortRetention(ev, "user", "ts", bucket = 10L)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
    // user 1: periods {-1, 0} -> cohort -1, offsets 0 and 1
    // user 2: periods {-2}    -> cohort -2, offset 0 (both events same period)
    assert(r == Map((-1L, 0L) -> 1L, (-1L, 1L) -> 1L, (-2L, 0L) -> 1L))
  }
}
