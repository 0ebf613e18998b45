package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deterministic train/val/test splitting for corpus curation.
  *
  * The reference has no split operator (its `sample` is bernoulli,
  * pigpen-core/src/main/clojure/pigpen/filter.clj:88-100 — non-deterministic
  * by design); a training-data pipeline needs the opposite: assignments that
  * are (a) stable across runs and cluster layouts, (b) replayable by any
  * engine from the id alone, and (c) leakage-safe under deduplication —
  * near-duplicate documents must land in the SAME split or held-out eval
  * contaminates training.
  *
  * All three variants hash through [[graft.core.Flow.lcg31]] (the same
  * 31-bit mix the sampling family uses, SQL mirror in
  * [[graft.queries.OracleSql.lcg31]]) and decide with exact integer
  * arithmetic only — no doubles anywhere, so DuckDB replays every
  * assignment bit-for-bit and the driver's hash gate covers the operator.
  *
  * Scale notes (100 TB):
  *  - [[byHash]] is a pure narrow map — no shuffle, no state; proportions
  *    are approximate (binomial around the weights), which is what every
  *    production split uses at corpus scale.
  *  - [[stratifiedExact]] hits the weights exactly per stratum but needs a
  *    per-stratum total order (window partitioned by the stratum): one
  *    shuffle, and a stratum's rows sort within single tasks. Use it when
  *    strata are balanced-ish (language, source); for open-ended strata
  *    prefer [[byHash]] on (stratum, id).
  *  - [[groupAware]] hashes the GROUP representative, so it adds exactly
  *    the aggregation+join the group key itself costs (one shuffle on the
  *    group key; the join back is on the same key, so AQE plans it without
  *    a second exchange of the big side when the group table is small).
  */
object Split {

  /** Column replay of Flow.lcg31: xor-fold then one LCG step, masked to
    * 31 bits. `>>` matches Scala `>>>` on the nonnegative ids this is
    * documented for (same caveat as the sampling family). The pre-multiply
    * 31-bit mask keeps the product inside a long for arbitrary 64-bit ids
    * (see Flow.lcg31 — ANSI mode made the unmasked form an ERROR, not a
    * wrap, for ids ≥ ~2^33).
    */
  def lcg31(id: Column): Column =
    ((id.bitwiseXOR(shiftrightunsigned(id, 31)).bitwiseAND(lit(2147483647L)))
      * lit(1103515245L) + lit(12345L))
      .bitwiseAND(lit(2147483647L))

  /** Cumulative integer thresholds over the 2^31 hash space for integer
    * part weights, e.g. Seq(("train",90),("val",5),("test",5)). Exact:
    * threshold_i = round-down of cum_i * 2^31 / total in Long arithmetic.
    */
  private[graft] def thresholds(parts: Seq[(String, Long)]): Seq[(String, Long)] = {
    val total = parts.map(_._2).sum
    require(total > 0, "split weights must sum > 0")
    var cum = 0L
    parts.map { case (name, w) =>
      cum += w
      name -> (cum * 2147483648L) / total
    }
  }

  /** CASE expression assigning a split name from a 31-bit bucket value. */
  private def assignExpr(bucket: Column, parts: Seq[(String, Long)]): Column = {
    val ts = thresholds(parts)
    // last threshold == 2^31 covers the whole space; fold the rest as WHENs
    ts.init.foldRight(lit(ts.last._1): Column) { case ((name, t), rest) =>
      when(bucket < lit(t), lit(name)).otherwise(rest)
    }
  }

  /** Hash split: adds `split` from the id alone. Narrow, stateless,
    * proportions approximate.
    */
  def byHash(df: DataFrame, idCol: String, parts: Seq[(String, Long)]): DataFrame =
    df.withColumn("split", assignExpr(lcg31(col(idCol)), parts))

  /** Exact stratified split: within each stratum, rows ordered by
    * (lcg31(id), id) are cut at exact integer proportions —
    * rn * total <= n * cum_i picks split i. The (hash, id) order makes the
    * cut pseudorandom but fully deterministic; the id tiebreak makes it
    * total. One shuffle on the stratum column.
    */
  def stratifiedExact(
      df: DataFrame, idCol: String, strataCol: String,
      parts: Seq[(String, Long)]): DataFrame = {
    val total = parts.map(_._2).sum
    val w = Window.partitionBy(col(strataCol))
    val rn = row_number().over(w.orderBy(lcg31(col(idCol)), col(idCol)))
    val n = count(lit(1)).over(w)
    val cums = parts.scanLeft(0L)(_ + _._2).tail
    val scaled = col("__rn") * lit(total)
    val assign = parts.init.zip(cums.init).foldRight(lit(parts.last._1): Column) {
      case (((name, _), cum), rest) =>
        when(scaled <= col("__n") * lit(cum), lit(name)).otherwise(rest)
    }
    df.withColumn("__rn", rn.cast("long")).withColumn("__n", n)
      .withColumn("split", assign)
      .drop("__rn", "__n")
  }

  // ---- oracle-SQL twins: generated from the SAME thresholds/cut
  // arithmetic the Column path uses (the OracleFixtures discipline — one
  // definition, two engines, zero drift).

  /** DuckDB CASE over a 31-bit bucket SQL fragment, same thresholds as
    * [[byHash]]/[[groupAware]].
    */
  def assignSql(bucketSql: String, parts: Seq[(String, Long)]): String = {
    val ts = thresholds(parts)
    val whens = ts.init
      .map { case (name, t) => s"WHEN ($bucketSql) < $t THEN '$name'" }
      .mkString(" ")
    s"CASE $whens ELSE '${ts.last._1}' END"
  }

  /** DuckDB CASE over per-stratum (rn, n) columns, same integer cuts as
    * [[stratifiedExact]].
    */
  def stratifiedCaseSql(rnSql: String, nSql: String, parts: Seq[(String, Long)]): String = {
    val total = parts.map(_._2).sum
    val cums = parts.scanLeft(0L)(_ + _._2).tail
    val whens = parts.init.zip(cums.init)
      .map { case ((name, _), cum) => s"WHEN ($rnSql) * $total <= ($nSql) * $cum THEN '$name'" }
      .mkString(" ")
    s"CASE $whens ELSE '${parts.last._1}' END"
  }

  /** Leakage-safe split: every row of a group follows the group
    * representative's hash, so duplicate clusters can never straddle a
    * split boundary. `groupCol` is any long-valued cluster/group key (e.g.
    * the min-id representative from [[Dedup]] clustering); rows with the
    * same value always co-assign.
    */
  def groupAware(df: DataFrame, groupCol: String, parts: Seq[(String, Long)]): DataFrame =
    df.withColumn("split", assignExpr(lcg31(col(groupCol)), parts))

  /** Equi-depth quantile binning: rows ordered by (scoreCol, idCol) are cut
    * into nBins near-equal bins — bin = floor(rank * nBins / n), rank
    * 0-based. The curation use is quality-bucket assignment (decile gates,
    * stratified-by-quality layouts, curriculum schedules) where the bucket
    * must be a POPULATION quantile, not a fixed threshold.
    *
    * Scale design: no global-window single reducer. The total order comes
    * from a range-partitioned sort (Spark samples split points), the global
    * index from zipWithIndex (per-partition counts to the driver — one long
    * per partition), and the bin from exact integer arithmetic, so DuckDB
    * replays every assignment from `row_number()` alone. Costs one count
    * job + one sort shuffle. At corpus scale use [[byQuantileApprox]] —
    * sketch edges, no sort at all; the exact form is for the oracle gate
    * and rank-exact (tie-splitting) bucket layouts.
    */
  /** Range-sort `df` by (scoreCol, idCol) and append a 0-based global
    * index `posName`; returns the indexed frame plus the total count. One
    * pass computes the per-partition counts (one long per partition to
    * the driver — the zipWithIndex discipline, but the total rides along
    * instead of costing a separate full-upstream count() job); the second
    * pass re-reads the SORT SHUFFLE output (map stages skip), never the
    * raw upstream.
    */
  private def withGlobalIndex(df: DataFrame, scoreCol: String, idCol: String,
      posName: String): (DataFrame, Long) = {
    val spark = df.sparkSession
    // NULLS LAST pinned explicitly: Spark's default is NULLS FIRST but the
    // row_number() oracle twins replay in DuckDB whose default is NULLS
    // LAST — a nullable score column would silently diverge otherwise.
    // Oracle-side ORDER BY fragments need no annotation (LAST is DuckDB's
    // default); Spark-side it must be spelled.
    val sorted = df.orderBy(asc_nulls_last(scoreCol), asc_nulls_last(idCol))
    val rdd = sorted.rdd
    val partCounts = rdd
      .mapPartitionsWithIndex((i, it) => Iterator((i, it.size.toLong)))
      .collect().sortBy(_._1).map(_._2)
    val n = partCounts.sum
    val offsets = partCounts.scanLeft(0L)(_ + _).init
    val indexed = rdd.mapPartitionsWithIndex { (i, it) =>
      var idx = offsets(i)
      it.map { r => val out = Row.fromSeq(r.toSeq :+ idx); idx += 1; out }
    }
    (spark.createDataFrame(indexed,
      sorted.schema.add(posName, LongType, nullable = false)), n)
  }

  def byQuantile(df: DataFrame, scoreCol: String, idCol: String, nBins: Int): DataFrame = {
    require(nBins > 0, s"nBins must be positive, got $nBins")
    val (indexed, n) = withGlobalIndex(df, scoreCol, idCol, "__rn")
    if (n == 0) return df.withColumn("bin", lit(0))
    indexed
      .withColumn("bin", expr(s"CAST((__rn * $nBins) div ${n}L AS INT)"))
      .drop("__rn")
  }

  /** The oracle twin of [[byQuantile]]'s cut arithmetic over a 1-based
    * `row_number()` SQL fragment.
    */
  def quantileBinSql(rnSql: String, nSql: String, nBins: Int): String =
    s"CAST((($rnSql - 1) * $nBins) // ($nSql) AS INT)"

  /** The distilled half of [[byQuantileApprox]]: the nBins−1 cut values
    * from ONE streaming sketch aggregate over `df`, collected (bounded
    * driver state — nBins−1 scalars). Empty/all-null input distills to
    * an empty cut list (every non-null score then bins 0; null scores
    * still take the top bin, as in the non-empty path). Exposed so the
    * streaming
    * lane can distill cuts once from a static profile and assign
    * statelessly at ingest ([[graft.streaming.GraftStreaming]]).
    */
  def quantileCuts(df: DataFrame, scoreCol: String, nBins: Int,
      accuracy: Int = 10000): Seq[Any] = {
    require(nBins > 0, s"nBins must be positive, got $nBins")
    if (nBins == 1) return Seq.empty
    val ps = (1 until nBins).map(_.toDouble / nBins)
    val row = df
      .agg(approx_percentile(col(scoreCol), typedlit(ps), lit(accuracy)).as("__cs"))
      .head()
    if (row.isNullAt(0)) Seq.empty else row.getSeq[Any](0)
  }

  /** The assignment half of [[byQuantileApprox]]: pure map-side
    * comparison chain against already-distilled `cuts` — stateless,
    * append-safe, usable on a stream. Null scores take the top bin.
    */
  def assignBins(df: DataFrame, scoreCol: String, cuts: Seq[Any],
      nBins: Int): DataFrame = {
    if (cuts.isEmpty) return df.withColumn("bin",
      when(col(scoreCol).isNotNull, lit(0)).otherwise(lit(nBins - 1))
        .cast("int"))
    val binned = cuts.foldLeft(lit(0)) { (acc, c) =>
      acc + when(col(scoreCol) > lit(c), 1).otherwise(0)
    }
    df.withColumn("bin",
      when(col(scoreCol).isNotNull, binned).otherwise(lit(nBins - 1)).cast("int"))
  }

  /** The 100 TB quantile binning: bin edges from the Greenwald-Khanna
    * sketch (`approx_percentile`, ONE streaming aggregate — partial
    * sketches merge map-side), assignment a pure map-side comparison
    * chain against the nBins−1 collected cut values (driver state =
    * nBins−1 scalars). No global sort anywhere — the scale path
    * [[byQuantile]]'s scaladoc promises.
    *
    * Semantics differ from [[byQuantile]] in exactly one way: bins are
    * VALUE-based (`bin = #{cuts strictly below score}`), so tied scores
    * always share a bin instead of being rank-split by id — the better
    * behavior for curriculum/bucketing, and the only one a sketch can
    * give. Bin populations are therefore approximately (not exactly)
    * n/nBins, with rank error ≤ n/accuracy per cut.
    *
    * Oracle discipline (the q_profile_numeric_approx pattern): with
    * `accuracy ≥ n` the GK sketch keeps every sample and `query(p)`
    * returns exactly the element at 1-based ascending rank ⌈p·n⌉ over
    * the non-null scores — deterministic, so the whole operator
    * hash-replays in SQL via [[approxCutRanksSql]]. Null scores take the
    * top bin, mirroring byQuantile's NULLS LAST.
    *
    * Split into [[quantileCuts]] (distill) + [[assignBins]] (stateless
    * apply) so the streaming lane can run the same assignment at ingest.
    */
  def byQuantileApprox(df: DataFrame, scoreCol: String, nBins: Int,
      accuracy: Int = 10000): DataFrame =
    assignBins(df, scoreCol, quantileCuts(df, scoreCol, nBins, accuracy), nBins)

  /** Per-GROUP sketch quantile binning: [[byQuantileApprox]] with
    * independent cut edges per `groupCol` value — per-source length
    * buckets, per-language quality deciles, the batch-prep shape where a
    * global quantile would let one verbose source claim every top bin.
    * ONE streaming grouped sketch aggregate (partials merge map-side),
    * then a broadcast join of the ≤|groups|·(nBins−1) cut arrays and a
    * map-side comparison; no sort, no window, nothing corpus-sized
    * leaves the executors. Group cardinality must be broadcast-sized
    * (sources/languages — the [[graft.operators.Mixture]] contract).
    * Same exact-discrete-at-accuracy ≥ n oracle discipline; score nulls
    * take the group's top bin, rows of an all-null group bin 0.
    */
  def byQuantileApproxBy(df: DataFrame, groupCol: String, scoreCol: String,
      nBins: Int, accuracy: Int = 10000): DataFrame = {
    require(nBins > 0, s"nBins must be positive, got $nBins")
    if (nBins == 1) return df.withColumn("bin", lit(0))
    assignBinsBy(df, groupCol, scoreCol,
      quantileCutsBy(df, groupCol, scoreCol, nBins, accuracy), nBins)
  }

  /** The distilled half of [[byQuantileApproxBy]]: the per-group cut-array
    * relation (groupCol, __cs) from ONE grouped streaming sketch
    * aggregate. A plain DataFrame (not collected) so the streaming lane
    * can broadcast it as static-side state.
    */
  def quantileCutsBy(df: DataFrame, groupCol: String, scoreCol: String,
      nBins: Int, accuracy: Int = 10000): DataFrame = {
    require(nBins > 1, s"nBins must be > 1 for grouped cuts, got $nBins")
    val ps = (1 until nBins).map(_.toDouble / nBins)
    df.where(col(scoreCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(approx_percentile(col(scoreCol), typedlit(ps), lit(accuracy)).as("__cs"))
  }

  /** The assignment half of [[byQuantileApproxBy]]: broadcast join of the
    * (groupCol, __cs) cut relation + the in-row comparison fold —
    * stateless, append-safe, usable on a stream (stream-static join).
    * Groups absent from `cuts` (or all-null) bin 0; null scores take the
    * group's top bin.
    */
  def assignBinsBy(df: DataFrame, groupCol: String, scoreCol: String,
      cuts: DataFrame, nBins: Int): DataFrame = {
    val binExpr = aggregate(col("__cs"), lit(0),
      (acc, c) => acc + when(col(scoreCol) > c, 1).otherwise(0))
    df.join(broadcast(cuts), Seq(groupCol), "left")
      .withColumn("bin",
        when(col(scoreCol).isNotNull && col("__cs").isNotNull, binExpr)
          .when(col("__cs").isNotNull, lit(nBins - 1))
          .otherwise(lit(0)).cast("int"))
      .select(df.columns.map(col) :+ col("bin"): _*)
  }

  /** DuckDB list literal of [[byQuantileApprox]]'s exact-mode cut RANKS:
    * 1-based ⌈p_b·n⌉ for p_b = b/nBins. The percentile doubles are
    * printed from the SAME Scala values the Spark side passes (Double
    * round-trip), so both engines run the identical IEEE multiply+ceil.
    */
  def approxCutRanksSql(nSql: String, nBins: Int): String =
    (1 until nBins).map { b =>
      s"CAST(ceil(${b.toDouble / nBins} * ($nSql)) AS BIGINT)"
    }.mkString("[", ", ", "]")

  /** Per-bin 31-bit LCG acceptance thresholds for exact rational rates
    * `num/den` — threshold_b = num_b * 2^31 / den_b in Long arithmetic
    * (the sampling family's scheme).
    */
  private[graft] def rateThresholds(rates: Seq[(Long, Long)]): Seq[Long] =
    rates.map { case (num, den) =>
      require(den > 0 && num >= 0 && num <= den, s"rate must be in [0,1]: $num/$den")
      (num * 2147483648L) / den
    }

  /** Curriculum sampling: [[byQuantile]] by score, then keep each row iff
    * lcg31(id) < threshold(bin) — e.g. rates rising with the quality
    * decile keep most of the best material and thin the tail, the
    * standard quality-curriculum corpus shape. Deterministic and
    * engine-replayable end to end; output keeps the `bin` column.
    */
  def curriculumSample(df: DataFrame, scoreCol: String, idCol: String,
      rates: Seq[(Long, Long)]): DataFrame = {
    val thr = rateThresholds(rates)
    val binned = byQuantile(df, scoreCol, idCol, rates.length)
    binned.where(lcg31(col(idCol)) <
      element_at(typedlit(thr), col("bin") + 1))
  }

  /** DuckDB list-literal lookup of the SAME thresholds: `[t..][bin+1]`. */
  def rateThresholdSql(binSql: String, rates: Seq[(Long, Long)]): String =
    s"(${rateThresholds(rates).mkString("[", ", ", "]")})[($binSql) + 1]"

  /** The corpus-scale curriculum: [[byQuantileApprox]] bins (sketch
    * edges, no global sort) + the same per-bin LCG keep thresholds as
    * [[curriculumSample]]. With accuracy ≥ n the bins are exact-discrete
    * and the whole selection hash-replays; at scale the only cost above
    * a plain filter is one streaming percentile aggregate.
    */
  def curriculumSampleApprox(df: DataFrame, scoreCol: String, idCol: String,
      rates: Seq[(Long, Long)], accuracy: Int = 10000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val binned = byQuantileApprox(df, scoreCol, rates.length, accuracy)
    // threshold lookup through a TINY broadcast join, not an element_at
    // on the bin expression: a filter predicate referencing `bin` gets
    // predicate-pushdown-INLINED through the projection, and FilterExec
    // has no subexpression elimination — the score expression (often a
    // heavy kernel like qualityScore) would re-evaluate once per cut per
    // predicate term (measured 0.25 s → 4.9 s on the x16 corpus,
    // ProbeQap). The join is a barrier: `bin` stays a materialized
    // column, the score evaluates once, and ≤ rates.length rows
    // broadcast.
    val thrDf = broadcast(rateThresholds(rates).zipWithIndex
      .map { case (t, b) => (b, t) }.toDF("bin", "__thr"))
    binned.join(thrDf, "bin")
      .where(lcg31(col(idCol)) < col("__thr"))
      .select(df.columns.map(col) :+ col("bin"): _*) // original layout + bin
  }

  /** Deterministic corpus shuffle: a total pretraining order from the id
    * alone — `pos` = rank under (lcg31(id), id). Replayable by any engine
    * and stable across runs/layouts, which is what makes a training run
    * reproducible; feed `pos` to [[Packing.packByBudget]] as the order
    * column. Same distributed machinery as [[byQuantile]] (range sort +
    * zipWithIndex), no global window.
    */
  def shufflePositions(df: DataFrame, idCol: String): DataFrame =
    withGlobalIndex(df.withColumn("__h", lcg31(col(idCol))), "__h", idCol, "pos")
      ._1.drop("__h")
}
