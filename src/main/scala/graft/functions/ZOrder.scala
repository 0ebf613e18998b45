package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-column data skipping — the
  * Delta/Iceberg `OPTIMIZE ZORDER BY` layout tool vanilla Spark lacks.
  *
  * Why it matters at 100 TB: parquet row-group pruning works off per-file
  * min/max statistics, and a single-column sort gives narrow ranges on
  * ONE column while every other column's per-file range stays global. A
  * range-partition + sort on the bit-interleaved z-value gives EVERY
  * participating column locality: each file covers a small hyper-rectangle
  * of the key space, so predicates on any of the z-ordered columns prune
  * files/row groups. The write is one range shuffle + local sort — the
  * same cost as a plain sorted write.
  *
  * The z-value is plain integer bit arithmetic (mask → interleave), so it
  * is codegen'd in Spark AND replayable in ANSI SQL — [[zSqlExpr]] emits
  * the identical expression for the DuckDB oracle (q_zorder), the
  * fixture-oracle discipline applied to a LAYOUT primitive.
  */
object ZOrder {

  private def checkDims(n: Int, bits: Int): Unit = {
    require(n >= 2, s"z-order needs at least 2 columns, got $n")
    require(bits >= 1 && n * bits <= 63,
      s"n*bits must fit a signed BIGINT: $n cols x $bits bits = ${n * bits} > 63")
  }

  /** Bit-interleaved z-value of N non-negative columns, each truncated to
    * `bits` low bits (columns are masked, so callers hash or bucket wider
    * domains first). Bit `i` of column `j` lands at position `i*n + j` —
    * the round-robin Morton layout — so every column contributes equally
    * at every octave. Real corpus layouts cluster on 3-4 keys (source,
    * lang, time bucket, quality bucket); `n*bits ≤ 63` keeps the value a
    * BIGINT (e.g. 4 cols x 15 bits, 3 x 21, 2 x 31).
    */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    checkDims(n, bits)
    val mask = (1L << bits) - 1
    val masked = cols.map(_.cast("bigint").bitwiseAND(lit(mask)))
    (for {
      i <- 0 until bits
      (c, j) <- masked.zipWithIndex
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n + j))
      .reduce(_ bitwiseOR _)
  }

  /** 2-column convenience (the original API; layout-identical to
    * `zValue(Seq(a, b), bits)`).
    */
  def zValue(a: Column, b: Column, bits: Int = 16): Column =
    zValue(Seq(a, b), bits)

  /** The same interleave as [[zValue]], as an ANSI-SQL string over column
    * (or expression) names — ONE generator for both engines so the Spark
    * path and its oracle cannot drift.
    */
  def zSqlExpr(cols: Seq[String], bits: Int): String = {
    val n = cols.size
    checkDims(n, bits)
    val mask = (1L << bits) - 1
    val masked = cols.map(c => s"(CAST($c AS BIGINT) & $mask)")
    (for {
      i <- 0 until bits
      (c, j) <- masked.zipWithIndex
    } yield s"((($c >> $i) & 1) << ${i * n + j})")
      .mkString("(", " | ", ")")
  }

  def zSqlExpr(a: String, b: String, bits: Int = 16): String =
    zSqlExpr(Seq(a, b), bits)

  /** Write `df` z-ordered on `zCols`: range-partition by z-value into
    * `numFiles` partitions, sort within each, drop the helper column,
    * write parquet. Each output file then covers a compact
    * hyper-rectangle of the key space — min/max footers prune on EVERY
    * participating column.
    */
  def writeZOrdered(df: DataFrame, path: String, zCols: Seq[String],
      numFiles: Int, bits: Int): Unit =
    df.withColumn("__z", zValue(zCols.map(col), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
      numFiles: Int, bits: Int = 16): Unit =
    writeZOrdered(df, path, Seq(colA, colB), numFiles, bits)
}
