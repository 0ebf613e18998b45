package graft

import graft.queries.{Queries, QueryDef}
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries (QueryDef.bench) on
  * SPARK_GRAFT_SF_DIR and prints one JSON line. One warm-up pass primes
  * the JVM/codegen caches, then each query is timed SPARK_GRAFT_BENCH_N
  * times (default 3) and the MIN is reported — shuffle-bound sub-second
  * queries vary ±20-50% run-to-run from GC/JIT/host noise (measured:
  * ProbeMinhash, SCALE.md), and the minimum is the steadiest estimator of
  * the achievable time. A query that throws is reported as value -1 with
  * its message in an "errors" field, and the headline total becomes -1 as
  * well — a failure can never read as a fast success at either level.
  *
  * Two lanes since r9:
  *  - the PRIMARY lane on the driver's sf dir (unchanged contract);
  *  - an INFLATED lane (`*_x16` fields) on the deterministic 16× twin
  *    (InflatedCorpus) with its own DuckDB anchor at the same scale —
  *    sf0.1 keeps most headliners inside Spark's fixed ~0.1-0.3 s
  *    scheduling overhead, so only the inflated ratios measure WORK.
  *    The lane materializes the twin once per machine (marker-gated) and
  *    can be disabled with SPARK_GRAFT_X16=0.
  *
  * Drift sentinel (both lanes): the same calibration query timed before
  * and after the suite (median-of-3 per read — sensitive to sustained
  * contention, immune to a lone GC/JIT spike); drift_pct > 25 means host
  * contention contaminated the run, and since r9 the JSON self-labels it
  * ("valid": false) instead of relying on the reader to apply SCALE.md's
  * discard rule.
  */
object Bench {
  private val DriftValidPct = 25.0

  private def jstr(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  /** One timed pass; Left(message) on failure, message flattened so it
    * can never break the single-JSON-line contract. */
  private def timed(spark: SparkSession, qd: QueryDef, dir: String): Either[String, Double] = {
    val t0 = System.nanoTime()
    try { qd.fn(spark, dir).count(); Right((System.nanoTime() - t0) / 1e9) }
    catch {
      case e: Throwable =>
        Left(e.getClass.getSimpleName + ": " +
          Option(e.getMessage).getOrElse("")
            .replaceAll("[\\x00-\\x1f]+", " ").take(200))
    }
  }

  private final case class Lane(
      results: Seq[(String, Either[String, Double])],
      calibration: Option[(String, Either[String, Double], Either[String, Double])])

  /** Warm-up + min-of-N over the bench set on one data dir, with the
    * first/last calibration reads for the drift sentinel. */
  private def runLane(spark: SparkSession, benchSet: Seq[QueryDef], dir: String,
      passes: Int): Lane = {
    benchSet.foreach { qd =>
      try qd.fn(spark, dir).count()
      catch { case _: Throwable => () }
    }
    // drift sentinel: the SAME fixed calibration query timed before and
    // after the whole suite. On an idle box the two reads agree to a few
    // percent; host contention mid-run (the r6 artifact's failure mode,
    // SCALE.md drift envelope) shows up as a large spread. Each read is
    // the MEDIAN of 3 runs: sustained contention raises all three (so
    // the sentinel still fires), while a single GC/JIT spike — which on
    // the x16 lane swings a lone q_q1 run 0.27-0.57 s and was tripping
    // the sentinel on an IDLE box (drift_pct 30-48 across three runs,
    // always first>last) — cannot fake a drift reading by itself.
    // min-of-3 would go too far: it hides the very contention this
    // measures.
    def calRead(qd: QueryDef): Either[String, Double] = {
      val runs = Seq.fill(3)(timed(spark, qd, dir))
      runs.collectFirst { case l @ Left(_) => l }
        .getOrElse(Right(runs.collect { case Right(t) => t }.sorted.apply(1)))
    }
    val calibration = benchSet.find(_.name == "q_q1").orElse(benchSet.headOption)
    // prime the calibration query specifically (beyond the one suite
    // warm-up pass) so the first read compares a C2-warm JVM against a
    // C2-warm JVM — without this, a fresh-JVM first lane reads its own
    // JIT warm-in as 25-30% "drift" on an idle box
    calibration.foreach(qd => (1 to 3).foreach(_ => timed(spark, qd, dir)))
    val calFirst = calibration.map(calRead)
    val results = benchSet.map { qd =>
      val runs = Seq.fill(passes)(timed(spark, qd, dir))
      // min over the good passes; any failed pass poisons the query
      val r = runs.collectFirst { case l @ Left(_) => l }
        .getOrElse(Right(runs.collect { case Right(t) => t }.min))
      qd.name -> r
    }
    val calLast = calibration.map(calRead)
    Lane(results, (calibration, calFirst, calLast) match {
      case (Some(qd), Some(f), Some(l)) => Some((qd.name, f, l))
      case _ => None
    })
  }

  /** DuckDB anchor: min-of-N wall-times for the SAME oracle SQL on the
    * SAME parquet (scripts/duckdb_bench.py, provenance in BASELINE.md).
    * Missing/unreadable anchor file ⇒ empty map ⇒ fields omitted — a
    * corrupt anchor must never take down the PRIMARY bench output.
    */
  private def duckRef(envVar: String, fileName: String): Map[String, Double] = {
    val candidates = Seq(sys.env.getOrElse(envVar, ""),
      fileName, s"/root/repo/$fileName")
    candidates.filter(_.nonEmpty).map(new java.io.File(_)).find(_.isFile).flatMap { f =>
      scala.util.Try {
        import scala.jdk.CollectionConverters._
        val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(f)
        Option(root.get("queries")).map(_.fields().asScala
          .map(e => e.getKey -> e.getValue.asDouble).toMap)
      }.toOption.flatten
    }.getOrElse(Map.empty)
  }

  /** Render one lane's JSON fields; `sfx` is "" (primary) or "_x16".
    * Returns (fields, laneTotal) — the primary lane's total is also the
    * artifact's top-level "value". */
  private def laneFields(lane: Lane, duck: Map[String, Double], sfx: String): (String, Double) = {
    val qs = lane.results.map { case (k, v) =>
      jstr(k) + ":" + v.fold(_ => "-1", _.toString)
    }.mkString("{", ",", "}")
    val errs = lane.results.collect { case (k, Left(e)) => jstr(k) + ":" + jstr(e) }
    val errField = if (errs.isEmpty) "" else errs.mkString(s""","errors$sfx":{""", ",", "}")
    val anchorFields = if (duck.isEmpty) "" else {
      val refs = lane.results.collect { case (k, _) if duck.contains(k) =>
        jstr(k) + ":" + duck(k) }
      // locale-independent rounding (an f"%.3f" would emit a comma decimal
      // separator — invalid JSON — under e.g. de_DE default locale)
      val ratios = lane.results.collect {
        case (k, Right(t)) if duck.contains(k) && duck(k) > 0 =>
          jstr(k) + ":" + (math.rint(t / duck(k) * 1000) / 1000).toString
      }
      refs.mkString(s""","duckdb_ref$sfx":{""", ",", "}") +
        ratios.mkString(s""","spark_over_duckdb$sfx":{""", ",", "}")
    }
    val driftFields = lane.calibration match {
      case Some((name, Right(t0), Right(t1))) if math.min(t0, t1) > 0 =>
        val pct = math.rint(math.abs(t1 - t0) / math.min(t0, t1) * 1000) / 10
        // the artifact self-labels against SCALE.md's discard threshold —
        // a contaminated run must say so in-band, not in prose
        s""","calibration$sfx":{"query":${jstr(name)},"first":$t0,"last":$t1}""" +
          s""","drift_pct$sfx":$pct,"valid$sfx":${pct <= DriftValidPct}"""
      case _ => "" // calibration crash already surfaces via the query's own error entry
    }
    // any failure poisons the headline number: a crashed query must never
    // make the total LOOK faster (0-contribution would)
    val total =
      if (errs.nonEmpty) -1.0 else lane.results.map(_._2.getOrElse(0.0)).sum
    (s""","total$sfx":$total,"queries$sfx":$qs$errField$anchorFields$driftFields""", total)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val benchSet = Queries.all.filter(_.bench)
    val passes = math.max(sys.env.getOrElse("SPARK_GRAFT_BENCH_N", "3").toInt, 1)
    val primary = runLane(spark, benchSet, sfDir, passes)
    val (primaryFields, primaryTotal) =
      laneFields(primary, duckRef("SPARK_GRAFT_DUCKDB_BASELINE", "duckdb_baseline.json"), "")

    // inflated lane — materialize-or-reuse the twin, then the same loop.
    // Any failure here (disk full, corrupt twin, …) degrades to an
    // "x16_error" field; it can never take down the primary artifact.
    val x16Fields =
      if (sys.env.getOrElse("SPARK_GRAFT_X16", "1") != "1") ""
      else try {
        val factor = sys.env.getOrElse("SPARK_GRAFT_X16_FACTOR", "16").toInt
        val dir = sys.env.getOrElse("SPARK_GRAFT_X16_DIR",
          InflatedCorpus.defaultDir(sfDir, factor))
        val build = InflatedCorpus.ensure(spark, sfDir, factor, dir)
        val x16Passes = math.max(sys.env.getOrElse("SPARK_GRAFT_X16_N", "2").toInt, 1)
        val lane = runLane(spark, benchSet, dir, x16Passes)
        val buildSec = math.rint(build.buildSec * 1000) / 1000
        s""","x16":{"dir":${jstr(dir)},"factor":$factor,"built":${build.built},""" +
          s""""build_sec":$buildSec,"passes":$x16Passes}""" +
          laneFields(lane,
            duckRef("SPARK_GRAFT_DUCKDB_BASELINE_X16", "duckdb_baseline_x16.json"), "_x16")._1
      } catch {
        case e: Throwable =>
          s""","x16_error":${jstr(e.getClass.getSimpleName + ": " +
            Option(e.getMessage).getOrElse("").replaceAll("[\\x00-\\x1f]+", " ").take(200))}"""
      }

    // "metric"/"value" lead fields = the PRIMARY total (driver contract)
    println(s"""{"metric":"total","value":$primaryTotal,"unit":"sec"""" +
      primaryFields + x16Fields + s""","sf":"$sfDir"}""")
    spark.stop()
  }
}
