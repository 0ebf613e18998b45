package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join — the manual skew escape hatch for the joins AQE
  * cannot fix. AQE's skew-join splits oversized SHUFFLE partitions, which
  * covers sort-merge joins between materialized stages; it does not help
  * when the skewed side feeds a streaming-static join, when the join is
  * inside a cached/reused subplan, or when a single key is so hot that
  * even a split partition re-skews downstream. The classic remedy:
  * scatter the big side's rows across `salts` sub-keys and replicate the
  * small side once per salt, so the hot key's probe work spreads over
  * `salts` reducers.
  *
  * Semantics: identical to `big.join(small, keys, joinType)` for `inner`
  * and `left` — every big row carries exactly ONE salt, so row
  * multiplicity is untouched (the replicated side only ever matches one
  * replica per big row). Right/full would need dedup of the replicated
  * side's unmatched rows — use the plain join (the skewed side is by
  * definition the probe side).
  *
  * Cost model (the honest trade): shuffle volume of the small side grows
  * by `salts`x. Worth it when |small| * salts << |big partition skew|;
  * at 100 TB that is "dimension joined to a hot-key fact", exactly where
  * the hot key otherwise serializes one reducer.
  *
  * The salt is DETERMINISTIC (xxhash64 of the big row's join-key-plus-id
  * columns mod salts) — reruns and retries place every row identically,
  * so results are replayable and the oracle for a salted query is the
  * plain join's oracle.
  */
object SkewJoin {

  /** `big ⋈ small` on equal-named key columns, salted. `saltOn` names the
    * big-side columns whose hash spreads the hot key (default: all big
    * columns — maximal spread); pass a stable unique id column for
    * layout-independent placement.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      salts: Int, joinType: String = "inner",
      saltOn: Seq[String] = Seq.empty): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    require(joinType == "inner" || joinType == "left",
      s"salted join supports inner/left, got $joinType (use a plain join)")
    val spread: Seq[Column] =
      (if (saltOn.nonEmpty) saltOn else big.columns.toSeq).map(big.col)
    val bigS = big.withColumn("__salt", pmod(xxhash64(spread: _*), lit(salts)).cast("int"))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    bigS.join(smallS, keys :+ "__salt", joinType).drop("__salt")
  }
}
