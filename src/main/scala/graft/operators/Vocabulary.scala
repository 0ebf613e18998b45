package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Vocabulary coverage signals — the n-gram-LM quality proxy a curation
  * pipeline runs when a real perplexity model is too expensive for a first
  * pass: a document whose tokens are mostly OUTSIDE the corpus vocabulary
  * (boilerplate hashes, base64 runs, OCR noise, wrong-language text) is a
  * low-quality candidate regardless of its surface statistics. OOV rate
  * against a frequency-thresholded vocabulary is the standard cheap stand-in
  * (the unigram special case of "fraction of n-grams unseen in the LM"),
  * and unlike perplexity it is exact integer/ratio arithmetic — so the
  * driver's DuckDB oracle hash-gates it end to end.
  *
  * Scale shape (100 TB): two corpus passes, both canonical — pass 1 builds
  * the vocabulary as a hash aggregate keyed by word (map-side combine
  * collapses each task to its distinct words before the shuffle; the
  * thresholded output is orders of magnitude smaller than the token stream
  * — Heaps' law puts a minCount=20 web-corpus vocab around 10^7 rows);
  * pass 2 probes it with a token-keyed join. AQE broadcasts the vocab when
  * it fits and degrades to a shuffled hash join when it does not; no
  * driver-side state either way. The token stream itself is never
  * materialized. The per-doc aggregate is keyed by doc id, same as every
  * other per-doc signal.
  */
object Vocabulary {

  /** Lowercased whitespace tokens, empties dropped: (`__id`, `__w`). */
  private def tokenized(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("__id"),
        explode(graft.functions.TextFunctions.tokens(lower(col(textCol)))).as("__w"))
      .where(col("__w") =!= "")

  /** The corpus vocabulary: words with global count >= minCount.
    * Output: (word, n).
    */
  def vocabulary(df: DataFrame, idCol: String, textCol: String,
      minCount: Long): DataFrame =
    tokenized(df, idCol, textCol)
      .groupBy(col("__w").as("word"))
      .agg(count(lit(1)).as("n"))
      .where(col("n") >= minCount)

  /** Per-document out-of-vocabulary rate against [[vocabulary]] built from
    * the SAME corpus (self-coverage — the usual first-pass configuration;
    * use [[oovRateAgainst]] to score against a reference corpus instead).
    * Output: (idCol, n_tokens, n_oov, oov_rate).
    */
  def oovRate(df: DataFrame, idCol: String, textCol: String,
      minCount: Long): DataFrame =
    oovRateAgainst(df, idCol, textCol, vocabulary(df, idCol, textCol, minCount))

  def oovRateAgainst(df: DataFrame, idCol: String, textCol: String,
      vocabDf: DataFrame): DataFrame = {
    val vocab = vocabDf.select(col("word").as("__w"), lit(1).as("__known"))
    tokenized(df, idCol, textCol)
      .join(vocab, Seq("__w"), "left")
      .groupBy("__id")
      .agg(count(lit(1)).as("n_tokens"),
        (count(lit(1)) - count(col("__known"))).as("n_oov"))
      .select(col("__id").as(idCol),
        col("n_tokens"), col("n_oov"),
        round(col("n_oov").cast("double") / col("n_tokens"), 6).as("oov_rate"))
  }
}
