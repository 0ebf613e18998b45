package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

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
  * Semantics: identical to `big.join(small, keys, joinType)` (using-column
  * form, so key columns appear once) for all four shapes:
  *
  *  - `inner` / `left`: every big row carries exactly ONE salt, so row
  *    multiplicity is untouched — the replicated side only ever matches
  *    one replica per big row.
  *  - `right` / `full`: the replicated small side would emit each
  *    unmatched small row once per salt, so these shapes are decomposed
  *    into a union of skew-safe arms instead of a single outer join:
  *    salted-inner matches, plus small rows with no big key (anti-join
  *    against the big side's DISTINCT keys — the partial aggregate
  *    collapses the hot key map-side, so no reducer sees the skew), plus
  *    (full only) big rows with no small key (salted anti-join against the
  *    replicated small keys — each replica holds every small key, so the
  *    per-salt probe is exact). Each arm emits a row exactly once, which
  *    is the "replica 0 owns the miss" dedup done structurally rather
  *    than with a post-join filter.
  *
  * Cost model (the honest trade): shuffle volume of the small side grows
  * by `salts`x (right/full add one pass over big for distinct keys, which
  * is map-side-combined and therefore skew-immune). Worth it when
  * |small| * salts << |big partition skew|; at 100 TB that is "dimension
  * joined to a hot-key fact", exactly where the hot key otherwise
  * serializes one reducer.
  *
  * The salt is DETERMINISTIC (xxhash64 of `saltOn` mod salts) — reruns
  * and retries place every row identically, so results are replayable and
  * the oracle for a salted query is the plain join's oracle.
  */
object SkewJoin {

  /** `big ⋈ small` on equal-named key columns, salted. `saltOn` names the
    * big-side columns whose hash spreads the hot key.
    *
    * PASS A STABLE UNIQUE ID (or an id-containing subset) in `saltOn`:
    * the default (all big columns) hashes the whole row, so fully
    * duplicate hot-key rows — e.g. repeated identical events, exactly the
    * workload that produces hot keys — all land on ONE salt and nothing
    * spreads. A unique id also makes placement independent of layout.
    * `saltOn` columns must be xxhash64-able (no MapType).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      salts: Int, joinType: String = "inner",
      saltOn: Seq[String] = Seq.empty): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    require(!big.columns.contains(SaltCol) && !small.columns.contains(SaltCol),
      s"input already has a $SaltCol column; rename it before salting")
    val bigRest = big.columns.toSeq.filterNot(keys.contains)
    val smallRest = small.columns.toSeq.filterNot(keys.contains)
    def inner = salted(big, small, keys, salts, "inner", saltOn)
    joinType match {
      case "inner" | "left" | "left_outer" =>
        salted(big, small, keys, salts, joinType, saltOn)
      case "right" | "right_outer" =>
        inner.union(smallMisses(big, small, keys, bigRest))
      case "full" | "full_outer" | "outer" =>
        inner
          .union(bigMisses(big, small, keys, salts, saltOn, smallRest))
          .union(smallMisses(big, small, keys, bigRest))
      case other => throw new IllegalArgumentException(
        s"salted join supports inner/left/right/full, got $other")
    }
  }

  private val SaltCol = "__salt"

  private def saltExpr(big: DataFrame, keys: Seq[String], salts: Int,
      saltOn: Seq[String]): Column = {
    val spread: Seq[Column] =
      (if (saltOn.nonEmpty) saltOn else big.columns.toSeq).map(big.col)
    pmod(xxhash64(spread: _*), lit(salts)).cast("int")
  }

  /** The one-salt-per-big-row core: exact for inner/left. */
  private def salted(big: DataFrame, small: DataFrame, keys: Seq[String],
      salts: Int, joinType: String, saltOn: Seq[String]): DataFrame = {
    val bigS = big.withColumn(SaltCol, saltExpr(big, keys, salts, saltOn))
    val smallS = small.withColumn(SaltCol,
      explode(sequence(lit(0), lit(salts - 1))))
    bigS.join(smallS, keys :+ SaltCol, joinType).drop(SaltCol)
  }

  private def nullPad(schema: StructType, names: Seq[String]): Seq[Column] = {
    val byName = schema.fields.map(f => f.name -> f).toMap
    names.map(n => lit(null).cast(byName(n).dataType).as(n))
  }

  /** Small rows whose key never appears in big, null-padded on the big
    * side. Skew-safe: big collapses to DISTINCT keys first (map-side
    * partial agg absorbs the hot key), so the anti-join's build side is
    * at most |distinct big keys| and usually broadcastable under AQE.
    */
  private def smallMisses(big: DataFrame, small: DataFrame,
      keys: Seq[String], bigRest: Seq[String]): DataFrame =
    small.join(big.select(keys.map(big.col): _*).distinct(), keys, "left_anti")
      .select(keys.map(col) ++ nullPad(big.schema, bigRest) ++
        small.columns.toSeq.filterNot(keys.contains).map(col): _*)

  /** Big rows whose key never appears in small, null-padded on the small
    * side. Skew-safe: the big side is salted exactly like the inner arm
    * and probed against the replicated DISTINCT small keys — every
    * replica holds every small key, so per-salt existence == global
    * existence.
    */
  private def bigMisses(big: DataFrame, small: DataFrame, keys: Seq[String],
      salts: Int, saltOn: Seq[String], smallRest: Seq[String]): DataFrame = {
    val bigS = big.withColumn(SaltCol, saltExpr(big, keys, salts, saltOn))
    val smallKeysS = small.select(keys.map(small.col): _*).distinct()
      .withColumn(SaltCol, explode(sequence(lit(0), lit(salts - 1))))
    bigS.join(smallKeysS, keys :+ SaltCol, "left_anti").drop(SaltCol)
      .select(keys.map(col) ++ big.columns.toSeq.filterNot(keys.contains).map(col) ++
        nullPad(small.schema, smallRest): _*)
  }
}
