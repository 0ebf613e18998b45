package graft.plans

import graft.functions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for the engine's native expressions, injected via
  * `SparkSessionExtensions` — the idiomatic Spark extension point
  * (`spark.sql.extensions=graft.plans.GraftExtensions`, or
  * `.withExtensions(new GraftExtensions)`), so `spark.sql("... graft_cosine
  * (a, b) ...")` works anywhere the library is on the classpath, including
  * pure-SQL pipelines and thrift/connect clients.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  /** Require a foldable integral literal argument; clear analysis-time
    * error instead of a ClassCastException/NPE from `eval(null)`.
    */
  private def intArg(e: Expression, fn: String, arg: String): Int = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got non-foldable ${e.sql}")
    e.eval(null) match {
      case i: Int => i
      case l: Long if l.isValidInt => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be an integer literal, got $other")
    }
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // opt-in range-join rewrite (spark.graft.rangeJoin.binWidth > 0)
    ext.injectOptimizerRule(_ => RangeJoinRewrite)
    // opt-in physical range join (additionally spark.graft.rangeJoin.physical)
    ext.injectPlannerStrategy(_ => RangeJoinStrategy)
    ext.injectFunction((FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - dot product of two float/double arrays"),
      (es: Seq[Expression]) => DotProduct(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("graft_cosine"),
      info("graft_cosine", "graft_cosine(a, b) - cosine similarity of two float/double arrays"),
      (es: Seq[Expression]) => CosineSimilarity(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("graft_l2"),
      info("graft_l2", "graft_l2(a, b) - euclidean distance of two float/double arrays"),
      (es: Seq[Expression]) => L2Distance(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("graft_quantized_dot"),
      info("graft_quantized_dot", "graft_quantized_dot(a, b, scale) - exact integer quantized dot"),
      (es: Seq[Expression]) => QuantizedDot(es(0), es(1),
        intArg(es(2), "graft_quantized_dot", "scale"))))
    ext.injectFunction((FunctionIdentifier("graft_minhash"),
      info("graft_minhash", "graft_minhash(shingles, k) - k-hash MinHash signature of array<string>"),
      (es: Seq[Expression]) => MinHashSignatures(es(0),
        intArg(es(1), "graft_minhash", "k"))))
    ext.injectFunction((FunctionIdentifier("graft_simhash"),
      info("graft_simhash", "graft_simhash(shingles) - 64-bit SimHash of array<string>"),
      (es: Seq[Expression]) => SimHash64(es(0))))
    ext.injectFunction((FunctionIdentifier("graft_band_hashes"),
      info("graft_band_hashes", "graft_band_hashes(sig, bands) - LSH band bucket keys"),
      (es: Seq[Expression]) => BandHashes(es(0), intArg(es(1), "graft_band_hashes", "bands"))))
    ext.injectFunction((FunctionIdentifier("graft_ngram_hashes"),
      info("graft_ngram_hashes",
        "graft_ngram_hashes(tokens, n) - distinct hashed n-gram identities of array<string>"),
      (es: Seq[Expression]) => NgramHashes(es(0),
        intArg(es(1), "graft_ngram_hashes", "n"))))
    ext.injectFunction((FunctionIdentifier("graft_sig_agreement"),
      info("graft_sig_agreement", "graft_sig_agreement(a, b) - fraction of agreeing signature positions"),
      (es: Seq[Expression]) => SignatureAgreement(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("graft_hyperplane_sig"),
      info("graft_hyperplane_sig", "graft_hyperplane_sig(v, bits, seed) - random-hyperplane LSH signature"),
      (es: Seq[Expression]) => HyperplaneSignature(es(0),
        intArg(es(1), "graft_hyperplane_sig", "bits"),
        intArg(es(2), "graft_hyperplane_sig", "seed"))))
    ext.injectFunction((FunctionIdentifier("graft_minhash_tokens"),
      info("graft_minhash_tokens", "graft_minhash_tokens(tokens, n, k) - string-free n-gram MinHash"),
      (es: Seq[Expression]) => MinHashTokens(es(0),
        intArg(es(1), "graft_minhash_tokens", "n"),
        intArg(es(2), "graft_minhash_tokens", "k"))))
    ext.injectFunction((FunctionIdentifier("graft_simhash_tokens"),
      info("graft_simhash_tokens", "graft_simhash_tokens(tokens, n) - string-free n-gram SimHash"),
      (es: Seq[Expression]) => SimHashTokens(es(0), intArg(es(1), "graft_simhash_tokens", "n"))))
    ext.injectFunction((FunctionIdentifier("graft_nfc"),
      info("graft_nfc", "graft_nfc(s) - Unicode NFC normalization"),
      (es: Seq[Expression]) => NfcNormalize(es(0))))
    ext.injectFunction((FunctionIdentifier("graft_top_k"),
      info("graft_top_k", "graft_top_k(expr, k) - aggregate: array of the k largest values"),
      (es: Seq[Expression]) => TopK(es(0), intArg(es(1), "graft_top_k", "k"))
        .toAggregateExpression()))
    // text-pipeline columns (Column compositions — registered through
    // their expression trees so pure-SQL pipelines get the same toolkit)
    def colFn(e: Expression, f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Expression =
      org.apache.spark.sql.GraftBridge.expressionDeep(f(org.apache.spark.sql.GraftBridge.column(e)))
    ext.injectFunction((FunctionIdentifier("graft_quality"),
      info("graft_quality", "graft_quality(text) - heuristic [0,1] quality score"),
      (es: Seq[Expression]) => colFn(es(0), TextFunctions.qualityScore)))
    ext.injectFunction((FunctionIdentifier("graft_fingerprint"),
      info("graft_fingerprint", "graft_fingerprint(text) - 64-bit canonical-text fingerprint"),
      (es: Seq[Expression]) => colFn(es(0), TextFunctions.fingerprint)))
    ext.injectFunction((FunctionIdentifier("graft_normalize"),
      info("graft_normalize", "graft_normalize(text) - NFC + control-strip + whitespace-collapse"),
      (es: Seq[Expression]) => colFn(es(0), TextFunctions.normalizeText)))
    ext.injectFunction((FunctionIdentifier("graft_langid"),
      info("graft_langid", "graft_langid(text) - n-gram/stopword language guess"),
      (es: Seq[Expression]) => colFn(es(0), TextFunctions.langId)))
    ext.injectFunction((FunctionIdentifier("graft_redact"),
      info("graft_redact", "graft_redact(text) - mask emails/phones/ssn-like PII"),
      (es: Seq[Expression]) => colFn(es(0), TextFunctions.redactPii)))
    ext.injectFunction((FunctionIdentifier("graft_dup_word_frac"),
      info("graft_dup_word_frac", "graft_dup_word_frac(text) - repeated-word fraction (repetition signal)"),
      (es: Seq[Expression]) => colFn(es(0), TextFunctions.dupWordFraction)))
    ext.injectFunction((FunctionIdentifier("graft_token_count"),
      info("graft_token_count", "graft_token_count(text) - whitespace token count"),
      (es: Seq[Expression]) => colFn(es(0), TextFunctions.tokenCount)))
    ext.injectFunction((FunctionIdentifier("graft_bpe_token_count"),
      info("graft_bpe_token_count",
        "graft_bpe_token_count(text) - GPT-2-style pre-tokenizer token count"),
      (es: Seq[Expression]) => colFn(es(0), TextFunctions.bpeTokenCount)))
    ext.injectFunction((FunctionIdentifier("graft_shingles"),
      info("graft_shingles", "graft_shingles(text, n) - word n-gram shingle array"),
      (es: Seq[Expression]) => colFn(es(0),
        TextFunctions.wordShingles(_, intArg(es(1), "graft_shingles", "n")))))
    ext.injectFunction((FunctionIdentifier("graft_chunks"),
      info("graft_chunks",
        "graft_chunks(text, size, stride) - sliding token-window chunks"),
      (es: Seq[Expression]) => colFn(es(0), TextFunctions.tokenChunks(_,
        intArg(es(1), "graft_chunks", "size"),
        intArg(es(2), "graft_chunks", "stride")))))
    ext.injectFunction((FunctionIdentifier("graft_bpe_apply"),
      info("graft_bpe_apply",
        "graft_bpe_apply(word, merges) - space-joined BPE pieces of one word; " +
          "merges is an ordered literal like 'e s,es t,l o' (comma-separated " +
          "rules, space-separated halves)"),
      (es: Seq[Expression]) => BpeApplyWord(es(0),
        parseMerges(strArg(es(1), "graft_bpe_apply", "merges")))))
    ext.injectFunction((FunctionIdentifier("graft_bpe_apply_text"),
      info("graft_bpe_apply_text",
        "graft_bpe_apply_text(text, merges) - BPE pieces of every whitespace " +
          "word of a document, space-joined; merges as in graft_bpe_apply"),
      (es: Seq[Expression]) => BpeApplyText(es(0),
        parseMerges(strArg(es(1), "graft_bpe_apply_text", "merges")))))
  }

  /** Require a foldable string literal argument (plan-time constant). */
  private def strArg(e: Expression, fn: String, arg: String): String = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"$fn: $arg must be a string literal, got non-foldable ${e.sql}")
    e.eval(null) match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be a string literal, got $other")
    }
  }

  /** Parse the 'a b,es t'-style ordered merge-rule list. */
  private def parseMerges(spec: String): Seq[(String, String)] =
    spec.split(",").toSeq.map(_.trim).filter(_.nonEmpty).map { rule =>
      rule.split(" ") match {
        case Array(a, b) if a.nonEmpty && b.nonEmpty => (a, b)
        case _ => throw new IllegalArgumentException(
          s"graft_bpe_apply: each merge rule must be 'left right', got '$rule'")
      }
    }
}
