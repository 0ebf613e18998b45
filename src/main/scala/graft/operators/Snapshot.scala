package graft.operators

import graft.functions.TextFunctions.fingerprint
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diffing and incremental recomputation.
  *
  * At 100 TB a corpus refresh touches a few percent of documents; the
  * reference's model is always whole-relation (`load` over the full input,
  * pigpen-core/src/main/clojure/pigpen/io.clj), so every derived artifact
  * is recomputed from scratch. These operators make the delta first-class:
  * [[diff]] classifies every id across two snapshots from content
  * fingerprints, and [[incremental]] re-runs an expensive per-document
  * computation ONLY on added/changed rows, carrying forward prior results
  * for unchanged ids — with results provably identical to the full
  * recompute (gated by the q_incremental oracle, which IS the full
  * recompute in DuckDB).
  *
  * Scale shape: one full-outer shuffle join on the id for [[diff]] (both
  * sides reduced to (id, fingerprint) first, so only ~24 bytes/row cross
  * the wire — never document payloads); [[incremental]] adds one id join
  * of old results against the unchanged id set. If both snapshots are
  * written bucketed by id ([[graft.sources.GraftIO]] bucketed parquet),
  * the diff join is shuffle-free.
  */
object Snapshot {

  /** (id, status) for every id present in either snapshot; status ∈
    * added | removed | changed | unchanged, decided by the canonical text
    * fingerprint (same normalization as [[Dedup.exact]]).
    */
  def diff(oldDf: DataFrame, newDf: DataFrame, idCol: String, textCol: String): DataFrame = {
    val o = oldDf.select(col(idCol), fingerprint(col(textCol)).as("__fp_old"))
    val n = newDf.select(col(idCol), fingerprint(col(textCol)).as("__fp_new"))
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__fp_old").isNull, lit("added"))
          .when(col("__fp_new").isNull, lit("removed"))
          .when(col("__fp_old") === col("__fp_new"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** Incremental recompute of a per-document derivation `fn` over the new
    * snapshot: `fn` runs only on added/changed documents; unchanged ids
    * reuse `oldResults` (the prior run's `fn(old)` output, keyed by
    * `idCol`); removed ids drop out. Requires `fn` to be row-local per id
    * (each output row determined by its input row alone) — exactly the
    * map-family contract — so the union equals `fn(newDf)`.
    */
  def incremental(
      oldDf: DataFrame, newDf: DataFrame, oldResults: DataFrame,
      idCol: String, textCol: String)(fn: DataFrame => DataFrame): DataFrame = {
    val d = Materialize.once(diff(oldDf, newDf, idCol, textCol))
    val dirtyIds = d.where(col("status").isin("added", "changed")).select(idCol)
    val fresh = fn(newDf.join(dirtyIds, Seq(idCol), "left_semi"))
    val carried = oldResults.join(
      d.where(col("status") === "unchanged").select(idCol), Seq(idCol), "left_semi")
    fresh.unionByName(carried.select(fresh.columns.map(col).toIndexedSeq: _*))
  }
}
