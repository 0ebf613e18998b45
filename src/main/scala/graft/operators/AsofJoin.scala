package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (point-in-time) join: for each left row, the LATEST right row with
  * `rightTs <= leftTs` for the same key (direction "backward", the
  * default), or the EARLIEST right row with `rightTs >= leftTs`
  * ("forward") — the time-series join Spark has no built-in for
  * (price-at-trade-time, feature-at-event-time, config-at-request-time
  * lookups). An optional tolerance bounds how far the match may sit from
  * the left timestamp (pandas merge_asof parity).
  *
  * Composed from existing operators per the Spark-first preference order
  * (no custom plan needed): tag both sides, union, and take a running
  * `last(right-payload, ignoreNulls)` over (key, ts) ordering. ONE shuffle
  * on the key, each row carried once — never the per-row range-join
  * explosion of `left JOIN right ON rts <= lts` + windowed dedup, whose
  * intermediate is |left|·|matching right| at 100 TB. Right rows sort
  * before left rows at equal timestamps, giving the standard inclusive
  * (`<=`) as-of semantics.
  *
  * `right` must be unique per (key, ts) — pre-aggregate it otherwise (ties
  * would make "the" match nondeterministic in any engine).
  */
object AsofJoin {

  private val Reserved = Seq("__ts", "__tag", "__rv", "__m")

  /** @param payload right-side columns to surface (null when no right row
    *                matches); all other right columns drop.
    * @param direction "backward" (latest right at or before the left ts)
    *                  or "forward" (earliest right at or after)
    * @param tolerance max allowed |leftTs - rightTs| for a match to
    *                  count (same units as the ts columns, which must be
    *                  numeric when set); beyond it the payload is null
    *
    * Null semantics match SQL: right rows with a null key or null
    * timestamp never match anything (the join condition can't be true for
    * NULL), and left rows with a null key or timestamp surface null
    * payload.
    */
  def asof(left: DataFrame, right: DataFrame,
      keyCol: String, leftTs: String, rightTs: String,
      payload: Seq[String], direction: String = "backward",
      tolerance: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward or forward, got $direction")
    require(!payload.contains("__mts"), "__mts is reserved for the matched ts")
    val clash = left.columns.intersect(Reserved)
    require(clash.isEmpty, s"left columns ${clash.mkString(",")} collide with " +
      s"internal names ${Reserved.mkString(",")} — rename them first")
    val backward = direction == "backward"
    // the matched right ts rides first in the struct so tolerance can
    // compare it after the window picks the match
    val rvType = StructType(right.schema(rightTs).copy(name = "__mts", nullable = true) +:
      payload.map(p => right.schema(p).copy(nullable = true)))
    val r = right
      // SQL join semantics: a null key or null ts can never satisfy
      // `r.key = l.key AND r.ts <= l.ts`; unfiltered, a null-ts right row
      // would sort first (asc = NULLS FIRST) and become a universal
      // fallback match
      .where(col(keyCol).isNotNull && col(rightTs).isNotNull)
      .select(col(keyCol), col(rightTs).as("__ts"),
        struct((col(rightTs).as("__mts") +: payload.map(col)): _*).as("__rv"))
      // backward: right sorts BEFORE left at equal ts so the inclusive
      // match lands in [unboundedPreceding, current]; forward: right
      // sorts AFTER left so it lands in [current, unboundedFollowing]
      .withColumn("__tag", lit(if (backward) 0 else 2))
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__tag", lit(1))
      .withColumn("__rv", lit(null).cast(rvType))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val base = Window.partitionBy(col(keyCol)).orderBy(col("__ts").asc, col("__tag").asc)
    val (w, pick) =
      if (backward)
        (base.rowsBetween(Window.unboundedPreceding, Window.currentRow),
          last(col("__rv"), ignoreNulls = true))
      else
        (base.rowsBetween(Window.currentRow, Window.unboundedFollowing),
          first(col("__rv"), ignoreNulls = true))
    val tolOk = tolerance.fold(lit(true)) { t =>
      if (backward) col("__ts") - col("__m.__mts") <= t
      else col("__m.__mts") - col("__ts") <= t
    }
    unioned
      .withColumn("__m", pick.over(w))
      .where(col("__tag") === 1)
      .select(left.columns.toIndexedSeq.map(col) ++
        payload.map(p => when(tolOk, col(s"__m.$p")).as(p)): _*)
  }
}
