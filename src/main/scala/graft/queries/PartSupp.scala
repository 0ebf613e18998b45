package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic partsupp fixture derived from the part and supplier
  * tables — the synthetic dataset carries no partsupp, which blocked the
  * last two TPC-H shapes (Q2's correlated min-cost-supplier subquery and
  * Q11's scalar-threshold group filter). ONE set of constants and one
  * arithmetic scheme drive BOTH the Spark DataFrame and the DuckDB CTE
  * (the OracleFixtures discipline), so the two engines derive the
  * identical relation and the hash-compare gate applies.
  *
  * Layout follows TPC-H's partsupp generator shape
  * (reference has no partsupp either; scheme is public TPC-H dbgen):
  * [[SuppsPerPart]] suppliers per part, supplier keys rotated by the
  * constant stride max(1, S/4) — i·stride is distinct mod S for
  * i ∈ 0..3 whenever S ≥ 4, so the (partkey, suppkey) pairs form a
  * proper key. Quantities and costs come from the shared
  * [[graft.core.Flow.lcg31]] chain and are kept in integer CENTS so
  * every downstream aggregate is exact 64-bit arithmetic — the
  * double-summation-order trap cannot apply.
  *
  * Scale: the fixture is a narrow projection of part × 4 with a 1-row
  * broadcast (the supplier count) — no shuffle, no skew, O(|part|)
  * rows; at 100 TB a real partsupp would be a table, and every query
  * below consumes it through the same column contract.
  */
object PartSupp {
  val SuppsPerPart = 4
  val QtyMod = 9999L     // ps_availqty in 1..9999
  val CostCentsMod = 100000L // ps_costcents in 0..99999 (≤ $999.99)

  /** Column replay of [[graft.core.Flow.lcg31]] (same constants as
    * [[OracleSql.lcg31]] — the three definitions are pinned together by
    * FlowSpec's cross-check).
    */
  private def lcg31Col(k: Column): Column =
    ((k.bitwiseXOR(shiftright(k, 31)).bitwiseAND(lit(2147483647L)))
      * lit(1103515245L) + lit(12345L))
      .bitwiseAND(lit(2147483647L))

  /** partsupp as a DataFrame: (ps_partkey, ps_suppkey, ps_availqty,
    * ps_costcents). Cost carried in cents (BIGINT); divide by 100.0 at
    * the edge when a query wants dollars.
    */
  def df(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.df(spark, dir, "part").select(col("p_partkey"))
    val scount = Tables.df(spark, dir, "supplier")
      .agg(count(lit(1)).cast("long").as("__s"))
    val k = col("p_partkey") * lit(SuppsPerPart.toLong) + col("__i")
    part.crossJoin(broadcast(scount))
      .select(col("p_partkey"), col("__s"),
        explode(array((0 until SuppsPerPart).map(i => lit(i.toLong)): _*)).as("__i"))
      .select(
        col("p_partkey").as("ps_partkey"),
        ((col("p_partkey") + col("__i") * greatest(lit(1L), expr("__s DIV 4")))
          % col("__s")).as("ps_suppkey"),
        (lcg31Col(k * 2L) % QtyMod + 1L).as("ps_availqty"),
        (lcg31Col(k * 2L + 1L) % CostCentsMod).as("ps_costcents"))
  }

  /** The same relation as [[df]] as a DuckDB CTE body named `partsupp`,
    * generated from the SAME constants. Prepend inside a WITH list.
    */
  def sqlCte: String = {
    val k = s"(p_partkey * $SuppsPerPart + i)"
    s"""partsupp AS (
       SELECT p_partkey AS ps_partkey,
              CAST((p_partkey + i * greatest(1, s.cnt // 4)) % s.cnt AS BIGINT) AS ps_suppkey,
              CAST(${OracleSql.lcg31(s"(2 * $k)")} % $QtyMod + 1 AS BIGINT) AS ps_availqty,
              CAST(${OracleSql.lcg31(s"(2 * $k + 1)")} % $CostCentsMod AS BIGINT) AS ps_costcents
       FROM part
       CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS cnt FROM supplier) s
       CROSS JOIN UNNEST([0, 1, 2, 3]) AS u(i))"""
  }
}
