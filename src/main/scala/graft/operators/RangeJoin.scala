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

  // backquoted so non-identifier column names can't mis-parse
  private def bin(name: String, binWidth: Long): Column =
    expr(s"CAST(`$name` AS BIGINT) DIV $binWidth")

  /** Both sides' columns ride into the result un-renamed, and `__bin` is
    * the internal join key — so neither a cross-side collision nor a
    * pre-existing `__bin` (which withColumn would silently overwrite and
    * drop) is representable.
    */
  private def requireDisjoint(a: DataFrame, b: DataFrame,
      aName: String, bName: String): Unit = {
    val shared = a.columns.intersect(b.columns)
    require(shared.isEmpty, s"$aName and $bName share column names " +
      s"${shared.mkString(",")} — rename one side (the result carries both sides' columns)")
    (a.columns ++ b.columns).find(_ == "__bin").foreach(_ =>
      throw new IllegalArgumentException(
        "__bin is reserved by the binned join — rename that input column"))
  }

  /** @param binWidth bin size in the same units as `ptCol`/`loCol`/`hiCol`
    *                 (must be positive; pt/lo/hi must be non-negative so
    *                 integer division floors consistently).
    */
  def pointInInterval(points: DataFrame, ptCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    requireDisjoint(points, intervals, "points", "intervals")
    val binned = intervals.withColumn("__bin",
      explode(sequence(bin(loCol, binWidth), bin(hiCol, binWidth))))
    points
      .withColumn("__bin", bin(ptCol, binWidth))
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
    requireDisjoint(left, right, "left", "right")
    val lb = left.withColumn("__bin",
      explode(sequence(bin(loL, binWidth), bin(hiL, binWidth))))
    val rb = right.withColumn("__bin",
      explode(sequence(bin(loR, binWidth), bin(hiR, binWidth))))
    lb.join(rb, "__bin")
      .where(col(loL) <= col(hiR) && col(loR) <= col(hiL))
      .where(col("__bin") ===
        expr(s"CAST(greatest(`$loL`, `$loR`) AS BIGINT) DIV $binWidth"))
      .drop("__bin")
  }
}
