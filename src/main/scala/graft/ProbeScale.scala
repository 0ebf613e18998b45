package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: scaling behavior of the heavy operators when the input
  * grows 1× → 4× → 16× (sf0.1 tables unioned with shifted ids). A
  * scale-clean operator's time should grow near-linearly (ratio ≈ the
  * data ratio); super-linear growth flags a quadratic candidate set or a
  * single-task bottleneck. Results recorded in SCALE.md.
  */
object ProbeScale {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = DevSpark.session()

    // copies must be DISTINCT data, not replicas: a per-copy character
    // rotation makes every copy's text dissimilar to every other's (so
    // dedup work scales with input instead of exploding quadratic dup
    // pairs), and a per-copy time shift gives sessions new epochs
    val alpha = "etaoinshrdlcumwf"
    def rot(i: Int): String = { val k = i % alpha.length; alpha.drop(k) + alpha.take(k) }
    def scaledDocs(df: DataFrame, factor: Int): DataFrame =
      (0 until factor).map(i =>
        df.withColumn("doc_id", col("doc_id") + lit(i * 1000000L))
          .withColumn("text", translate(col("text"), alpha, rot(i))))
        .reduce(_ unionByName _).localCheckpoint(true)
    def scaledEvents(df: DataFrame, factor: Int): DataFrame =
      (0 until factor).map(i =>
        df.withColumn("event_id", col("event_id") + lit(i * 10000000L))
          .withColumn("ts", col("ts") + lit(i * 100000000000000L)))
        .reduce(_ unionByName _).localCheckpoint(true)

    def time2(f: => Long): (Double, Long) = {
      f // warm-up
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e6, n)
      }
      (runs.map(_._1).min, runs.head._2)
    }

    val docs = spark.read.parquet(sfDir + "/documents.parquet")
    val events = graft.queries.Tables.eventsNs(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
    val embeddings = spark.read.parquet(sfDir + "/embeddings.parquet")

    // distinct copies: rotating the FULL vector preserves the norm but
    // moves the direction; a step coprime with the dimension makes all 16
    // rotations distinct, so copies are new points, not duplicates
    val embDim = embeddings.selectExpr("size(embedding)").head().getInt(0)
    def scaledEmb(factor: Int): DataFrame =
      (0 until factor).map { i =>
        val k = (i * 7) % embDim
        embeddings.withColumn("vec_id", col("vec_id") + lit(i * 1000000L))
          .withColumn("embedding",
            if (k == 0) col("embedding")
            else concat(slice(col("embedding"), k + 1, embDim - k),
              slice(col("embedding"), 1, k)))
      }.reduce(_ unionByName _).localCheckpoint(true)

    for (factor <- Seq(1, 4, 16)) {
      val d = scaledDocs(docs, factor)
      val e = scaledEvents(events, factor)
      val (tDedup, nDedup) = time2(
        graft.operators.Dedup.exact(d, "doc_id", "text").count())
      val (tMinhash, nMinhash) = time2(
        graft.operators.Dedup.minhashNearDuplicates(d, "doc_id", "text").count())
      val (tSess, nSess) = time2(
        graft.operators.Sessions.batch(e, col("user_id"), col("ts"), col("event_id"),
          gap = 1800000000000L).count())
      val (tSessSafe, _) = time2(
        graft.operators.Sessions.batchSkewSafe(e, col("user_id"), col("ts"), col("event_id"),
          gap = 1800000000000L, bucket = 21600000000000L).count())
      val (tCont, nCont) = time2(
        graft.operators.Dedup.ngramContamination(
          d.where(col("doc_id") % 50 =!= 0), d.where(col("doc_id") % 50 === 0),
          "doc_id", "text", 3).count())
      val (tSpans, nSpans) = time2(
        graft.operators.Dedup.duplicateSpans(d, "doc_id", "text",
          k = 3, minSpan = 5).count())
      val emb = scaledEmb(factor)
      val queries = emb.where(col("vec_id") < 50)
      val (tBrute, nBrute) = time2(
        graft.operators.Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", 10).count())
      val (tIvf, nIvf) = time2(
        graft.operators.Similarity.ivfTopK(queries, emb, "vec_id", "embedding", 10,
          nCells = 16, nProbe = 4).count())
      val pqBooks = graft.functions.Pq.train(emb, "vec_id", "embedding",
        m = 8, ksub = 16, sampleSize = 2048)
      val (tPq, nPq) = time2(
        graft.functions.Pq.topK(queries, emb, "vec_id", "embedding", pqBooks, 10).count())

      // persistent-index paths: the corpus grows 16×, the PROBE set stays
      // fixed — a scale-clean index probe should grow with the probed
      // slice (nProbe/nCells of the corpus; a constant-size delta for
      // spans), never with the corpus-wide pass the build already paid
      import graft.operators.AnnIndex
      val idxBase = s"target/probe_idx/x$factor"
      def time1(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }
      val tBuildIvfPq = time1(AnnIndex.buildIvfPq(
        emb, "vec_id", "embedding", s"$idxBase/ivfpq", pqBooks, nCells = 16))
      val (tProbeIvfPq, nProbeIvfPq) = time2(AnnIndex.probeIvfPq(
        spark, s"$idxBase/ivfpq", queries, "vec_id", "embedding", 10, nProbe = 4).count())
      // refined tail: adds ONE raw-corpus scan with a broadcast semi-join
      // over the |Q|·k·refine shortlist — growth should track the corpus
      // scan (linear), never the pair count
      val (tProbeRefined, nProbeRefined) = time2(AnnIndex.probeIvfPqRefined(
        spark, s"$idxBase/ivfpq", queries, emb, "vec_id", "embedding", 10,
        nProbe = 4, refine = 3).count())
      val tBuildGram = time1(AnnIndex.buildGramIndex(
        d, "doc_id", "text", s"probe_grams_x$factor", k = 3))
      // constant-size probe delta: the FIRST copy's tail slice at every factor
      val delta = docs.where(col("doc_id") % 16 === 0)
      val (tProbeSpans, nProbeSpans) = time2(AnnIndex.probeSpans(
        spark, s"probe_grams_x$factor", delta, "doc_id", "text", k = 3, minSpan = 5).count())

      println(f"[scale] x$factor%-3d dedup_exact=$tDedup%7.0f ms ($nDedup rows)  " +
        f"minhash=$tMinhash%7.0f ms ($nMinhash rows)  " +
        f"sessionize=$tSess%7.0f ms ($nSess rows)  sessionize_skewsafe=$tSessSafe%7.0f ms  " +
        f"ann_brute=$tBrute%7.0f ms ($nBrute)  ann_ivf=$tIvf%7.0f ms ($nIvf)  " +
        f"ann_pq=$tPq%7.0f ms ($nPq)  " +
        f"contamination=$tCont%7.0f ms ($nCont rows)  " +
        f"substring_spans=$tSpans%7.0f ms ($nSpans rows)")
      // round-8 signal operators: bloom scoring must track the narrow
      // corpus scan (compare against the exact contamination column above
      // — same cut, same factor); oov is the two canonical passes;
      // resample is one agg + per-key densify
      val (tBloom, nBloom) = time2(
        graft.operators.Bloom.ngramContaminationBloom(
          d.where(col("doc_id") % 50 =!= 0), d.where(col("doc_id") % 50 === 0),
          "doc_id", "text", 3).count())
      val (tOov, nOov) = time2(
        graft.operators.Vocabulary.oovRate(d, "doc_id", "text", 20).count())
      val (tRes, nRes) = time2(
        graft.operators.Resample.resample(e, "user_id", "ts", "value",
          21600000000000L).count())
      println(f"[scale-sig] x$factor%-3d bloom_contamination=$tBloom%7.0f ms ($nBloom rows)  " +
        f"oov_rate=$tOov%7.0f ms ($nOov rows)  resample=$tRes%7.0f ms ($nRes rows)")
      // round-9 signal operators: LM train+score is the two-agg train +
      // one-join-pass score; entropy is a shuffle-free projection;
      // paragraph dedup explodes the synthesized two-paragraph corpus
      val (tLm, nLm) = time2(
        graft.operators.LanguageModel.scoreAgainstSlice(d, "doc_id", "text",
          d.where(col("doc_id") % 3 === 0), minCount = 2).count())
      val (tEnt, nEnt) = time2(
        d.where(length(col("text")) > 0).select(col("doc_id"),
          graft.functions.HashExpressions.byteEntropyBits(
            encode(col("text"), "UTF-8")).as("num"))
          .agg(count(col("num"))).head().getLong(0))
      val paraCorpus = d.select(col("doc_id"),
        concat(col("text"), lit("\n\n"), reverse(col("text"))).as("text"))
      val (tPara, nPara) = time2(
        graft.operators.Dedup.paragraphDedup(paraCorpus, "doc_id", "text").count())
      println(f"[scale-sig9] x$factor%-3d lm_score=$tLm%7.0f ms ($nLm rows)  " +
        f"entropy=$tEnt%7.0f ms ($nEnt rows)  paragraph_dedup=$tPara%7.0f ms ($nPara rows)")
      // round-9 session-3 operators: DSIR is one transition stream with
      // six bounded count-table joins (two-model train + weigh); knnJoin
      // scales nCells with the corpus so per-cell cost stays flat (the
      // IVF dial ProbeKnn measures at fixed cells)
      val (tDsir, nDsir) = time2(
        graft.operators.LanguageModel.dsirAgainstSlices(d, "doc_id", "text",
          d.where(col("doc_id") % 3 === 0), d.where(col("doc_id") % 3 === 1),
          minCount = 2).count())
      val (tKnn, nKnn) = time2(
        graft.operators.Similarity.knnJoin(emb, "vec_id", "embedding",
          k = 5, nCells = 16 * factor, nProbe = 2).count())
      println(f"[scale-sig9b] x$factor%-3d dsir=$tDsir%7.0f ms ($nDsir rows)  " +
        f"knn_join=$tKnn%7.0f ms ($nKnn rows, nCells=${16 * factor})")
      println(f"[scale-idx] x$factor%-3d ivfpq_build=$tBuildIvfPq%7.0f ms  " +
        f"ivfpq_probe=$tProbeIvfPq%7.0f ms ($nProbeIvfPq)  " +
        f"ivfpq_refined=$tProbeRefined%7.0f ms ($nProbeRefined)  " +
        f"gram_build=$tBuildGram%7.0f ms  " +
        f"spans_probe=$tProbeSpans%7.0f ms ($nProbeSpans rows, fixed-size delta)")
      // factor hygiene: the index builds/tables of THIS factor must not
      // bleed memory pressure into the NEXT factor's measurements (first
      // observed as a 5× minhash-x16 inflation vs the standalone sweep)
      spark.sql(s"DROP TABLE IF EXISTS probe_grams_x$factor")
      spark.catalog.clearCache()
      d.unpersist(); e.unpersist(); emb.unpersist()
    }
    spark.stop()
  }
}
