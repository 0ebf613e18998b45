package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding pooling: collapse member vectors to one vector per group —
  * chunk embeddings to a document embedding, document embeddings to a
  * cluster centroid, passage embeddings to a query context. Mean-pooling is
  * the standard reduction (retrieval, SemDeDup-style clustering, centroid
  * classifiers all consume it).
  *
  * Two shapes, two gates:
  *  - [[meanPoolExact]] — posexplode to (group, dim, value) rows and hash-
  *    aggregate DECIMAL sums. Order-independent exact arithmetic, so the
  *    DuckDB oracle hash-gates it (float->double widening is exact, and a
  *    binary double can never land on a decimal rounding midpoint, so the
  *    DECIMAL(28,8) casts agree across engines digit-for-digit). Shuffles
  *    dim x rows — the right gate, not the right hot path.
  *  - [[meanPool]] — array-native: collect the group's vectors and reduce
  *    elementwise inside one aggregate expression, no explode, shuffle
  *    volume = one array per group. Float summation order inside a group
  *    follows collect order, so it is gated by PoolingSpec against the
  *    exact twin under tolerance instead of the hash oracle. Per-group
  *    state is the member list — use for BOUNDED groups (chunks of a doc:
  *    tens); for unbounded groups use [[meanPoolExact]]'s explode shape,
  *    whose state is one decimal per (group, dim).
  *
  * Scale: both are single-shuffle aggregates keyed by group. meanPoolExact
  * multiplies shuffle rows by the dimension (64x here) but each row is 24
  * bytes; meanPool ships one array per input row. At 100 TB the choice is
  * the usual sketch-vs-exact dial; both partition cleanly.
  */
object Pooling {

  /** Exact mean-pool: one row per (group, dim). Output:
    * (groupCol, dim, n, avg) — dim 0-based, avg at full double precision
    * (the decimal sum cast to double then divided; deliberately NOT
    * rounded — see the inline note).
    */
  def meanPoolExact(df: DataFrame, groupCol: String, vecCol: String): DataFrame =
    df.select(col(groupCol).as("__grp"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("dim", "__x")))
      .groupBy("__grp", "dim")
      .agg(count(lit(1)).as("n"),
        sum(col("__x").cast("decimal(28,8)")).as("__sum"))
      .select(col("__grp").as(groupCol), col("dim").cast("long").as("dim"),
        col("n"),
        // full-precision double, NOT rounded: decimal->double is
        // round-to-nearest and the division is IEEE — bit-identical in any
        // engine — while a 6-dp round would sit one ulp from a midpoint
        // and flip between engines
        (col("__sum").cast("double") / col("n")).as("avg"))

  /** Array-native mean-pool: one row per group with the pooled vector.
    * Output: (groupCol, n, vec). Bounded-group shape (see scaladoc).
    */
  def meanPool(df: DataFrame, groupCol: String, vecCol: String): DataFrame = {
    val pooled = df
      .select(col(groupCol).as("__grp"), col(vecCol).cast("array<double>").as("__v"))
      .groupBy("__grp")
      .agg(count(lit(1)).as("n"), collect_list(col("__v")).as("__vs"))
    pooled.select(col("__grp").as(groupCol), col("n"),
      transform(sequence(lit(1), size(element_at(col("__vs"), 1))), i =>
        aggregate(col("__vs"), lit(0.0d), (acc, v) => acc + element_at(v, i)) /
          col("n").cast("double")).as("vec"))
  }
}
