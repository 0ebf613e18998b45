package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: pair each point with every interval containing
  * it — `pt BETWEEN lo AND hi` — another join Spark only plans as
  * BroadcastNestedLoop or a cartesian filter.
  *
  * Distributed via BINNING: each interval is exploded into the fixed-width
  * bins it covers, points map to their single bin, and the pairing becomes
  * an equi-join on bin + an exact containment filter. A (point, interval)
  * pair meets in exactly one bin (the point's), so no dedup pass is
  * needed. Shuffle volume is |points| + Σ(interval width / binWidth) —
  * pick `binWidth` near the typical interval width so most intervals land
  * in O(1) bins; a handful of giant intervals explode into many bins but
  * never into a cross product.
  */
object RangeJoin {

  /** @param binWidth bin size in the same units as `ptCol`/`loCol`/`hiCol`
    *                 (must be positive; pt/lo/hi must be non-negative so
    *                 integer division floors consistently).
    */
  def pointInInterval(points: DataFrame, ptCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val shared = points.columns.intersect(intervals.columns)
    require(shared.isEmpty, s"points and intervals share column names " +
      s"${shared.mkString(",")} — rename one side (the result carries both sides' columns)")
    // backquoted so non-identifier column names can't mis-parse
    def bin(name: String): Column = expr(s"CAST(`$name` AS BIGINT) DIV $binWidth")
    val binned = intervals.withColumn("__bin",
      explode(sequence(bin(loCol), bin(hiCol))))
    points
      .withColumn("__bin", bin(ptCol))
      .join(binned, "__bin")
      .where(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("__bin")
  }

  /** Interval × interval OVERLAP join: pair every (a, b) with
    * `a.lo <= b.hi AND b.lo <= a.hi` (closed-interval overlap) — the
    * span-conflict join (annotation collisions, session overlap,
    * reservation clashes) that Spark likewise only plans as a nested
    * loop.
    *
    * Same binning discipline as [[pointInInterval]], with the classic
    * exactly-once trick for two exploded sides: both sides explode into
    * the bins they cover, overlap is checked as the join residual, and a
    * surviving pair is EMITTED only in the bin that contains
    * `max(a.lo, b.lo)` — the first bin the two intervals share — so no
    * pair is duplicated and no dedup shuffle exists. Shuffle volume is
    * Σ(width/binWidth) per side; a pair of giant co-binned intervals
    * costs bins-in-common candidate checks but emits once.
    */
  def intervalOverlap(left: DataFrame, loL: String, hiL: String,
      right: DataFrame, loR: String, hiR: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val shared = left.columns.intersect(right.columns)
    require(shared.isEmpty, s"left and right share column names " +
      s"${shared.mkString(",")} — rename one side (the result carries both sides' columns)")
    def bin(name: String): Column = expr(s"CAST(`$name` AS BIGINT) DIV $binWidth")
    val lb = left.withColumn("__bin", explode(sequence(bin(loL), bin(hiL))))
    val rb = right.withColumn("__bin", explode(sequence(bin(loR), bin(hiR))))
    lb.join(rb, "__bin")
      .where(col(loL) <= col(hiR) && col(loR) <= col(hiL))
      .where(col("__bin") ===
        expr(s"CAST(greatest(`$loL`, `$loR`) AS BIGINT) DIV $binWidth"))
      .drop("__bin")
  }
}
