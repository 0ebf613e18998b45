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

  /** Bit-interleaved z-value of two non-negative columns, each truncated
    * to `bits` low bits (columns are masked, so callers hash or bucket
    * wider domains first). Output fits a BIGINT for bits ≤ 31.
    */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val mask = (1L << bits) - 1
    val x = a.cast("bigint").bitwiseAND(lit(mask))
    val y = b.cast("bigint").bitwiseAND(lit(mask))
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** The same interleave as [[zValue]], as an ANSI-SQL string over column
    * (or expression) names — ONE generator for both engines so the Spark
    * path and its oracle cannot drift.
    */
  def zSqlExpr(a: String, b: String, bits: Int = 16): String = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val mask = (1L << bits) - 1
    val x = s"(CAST($a AS BIGINT) & $mask)"
    val y = s"(CAST($b AS BIGINT) & $mask)"
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) | ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " | ", ")")
  }

  /** Write `df` z-ordered on (`colA`, `colB`): range-partition by z-value
    * into `numFiles` partitions, sort within each, drop the helper column,
    * write parquet. Each output file then covers a compact hyper-rectangle
    * of the (colA, colB) space — min/max footers prune on BOTH columns.
    */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
      numFiles: Int, bits: Int = 16): Unit =
    df.withColumn("__z", zValue(col(colA), col(colB), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
