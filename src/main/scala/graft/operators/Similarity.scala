package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k (broadcast the query side — correct
  * and exact; cost is |Q|·|corpus| dot products, fine when |Q| is small).
  * Scale path: LSH-bucketed search (probe only hash-neighboring buckets)
  * and an IVF-style coarse quantizer — both shrink the candidate set per
  * query by orders of magnitude at 100 TB.
  */
object Similarity {

  /** Exact brute-force top-k by cosine. `queries` is broadcast; ranking is
    * tie-broken by neighbor id so results are deterministic.
    *
    * Top-k selection is a bounded-heap aggregate
    * ([[graft.functions.AggExpressions.topK]]), NOT a rank window: each map
    * task ships at most k candidates per query to the shuffle. A window
    * would shuffle and sort every scored (query × corpus) row — the
    * difference between O(|Q|·k) and O(|Q|·|corpus|) shuffle volume.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val scored = c.crossJoin(q)
      .where(if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
      .withColumn("cosine", cosineSimilarity(col("__qv"), col("__cv")))
    // compound ordering (cosine desc, neighbor_id asc) via bottomK on
    // (-cosine, neighbor_id): negate the SCORE (always numeric), never the
    // id, so string/arbitrary id columns keep working
    scored
      .groupBy(col("query_id"))
      .agg(graft.functions.AggExpressions.bottomK(
        struct((-col("cosine")).as("negcos"), col("neighbor_id")), k).as("__top"))
      .select(col("query_id"), posexplode(col("__top")))
      .select(col("query_id"),
        col("col.neighbor_id").as("neighbor_id"),
        (-col("col.negcos")).as("cosine"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** LSH-bucketed ANN: random-hyperplane signatures; a query probes every
    * bucket within `probeHamming` bits of its own signature (multi-probe),
    * then candidates are re-ranked exactly. Recall/cost dial: bits up →
    * smaller buckets (and finer shuffle keys — raise with corpus size);
    * probeHamming up → higher recall at Σ C(bits,i) probes per query.
    *
    * Recall is data-dependent: hyperplane collision probability is
    * (1-θ/π) per bit, so it is high exactly when true neighbors are
    * cosine-close. On UNSTRUCTURED random vectors (neighbors ≈0.35) the
    * measured dial at 500 docs: bits=8/probe=3 → 0.56 recall probing 36%
    * of buckets; bits=6/probe=3 → 0.81 at 66%. Clustered real embedding
    * corpora (neighbors ≥0.8) sit far up the curve at the same cost.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      bits: Int = 12, probeHamming: Int = 1): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
      .withColumn("__bucket", hyperplaneSignature(col("__cv"), bits))
    // multi-probe: replicate each query into every bucket within hamming
    // `probeHamming` of its own signature — all XOR masks with popcount ≤ r
    // (Σ C(bits, i) masks; query-side only, so the corpus index is untouched)
    def masks(r: Int): Seq[Long] =
      if (r == 0) Seq(0L)
      else masks(r - 1) ++ masks(r - 1).flatMap { m =>
        val highest = if (m == 0L) -1 else 63 - java.lang.Long.numberOfLeadingZeros(m)
        ((highest + 1) until bits).map(b => m | (1L << b))
      }.distinct
    val probes: Seq[Long] = masks(math.min(probeHamming, bits)).distinct
    val q = broadcast(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
        .withColumn("__qsig", hyperplaneSignature(col("__qv"), bits))
        .withColumn("__bucket", explode(array(probes.map(p => col("__qsig").bitwiseXOR(lit(p))): _*))))
    val scored = c.join(q, "__bucket")
      .where(col("query_id") =!= col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cosine", cosineSimilarity(col("__qv"), col("__cv")))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** IVF-style coarse index: pick `nCells` corpus rows as centroids
    * (deterministic: lowest ids), assign every vector to its nearest
    * centroid (one broadcast join), and search only the `nProbe` cells
    * nearest each query. The partition-pruning pattern of a 100 TB ANN
    * store: cell id becomes the physical partition key.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val centroids = broadcast(
      c.orderBy("neighbor_id").limit(nCells)
        .select(col("neighbor_id").as("__cell"), col("__cv").as("__centroid")))
    val assigned = c.crossJoin(centroids)
      .withColumn("__d", l2Distance(col("__cv"), col("__centroid")))
      .withColumn("__r", row_number().over(
        Window.partitionBy("neighbor_id").orderBy(col("__d").asc, col("__cell").asc)))
      .where(col("__r") === 1)
      .select(col("neighbor_id"), col("__cv"), col("__cell"))
    val qAssigned = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .crossJoin(centroids)
      .withColumn("__d", l2Distance(col("__qv"), col("__centroid")))
      .withColumn("__r", row_number().over(
        Window.partitionBy("query_id").orderBy(col("__d").asc, col("__cell").asc)))
      .where(col("__r") <= nProbe)
      .select(col("query_id"), col("__qv"), col("__cell"))
    val scored = assigned.join(broadcast(qAssigned), "__cell")
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosineSimilarity(col("__qv"), col("__cv")))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }
}
