package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter benchmark decontamination — the 100 TB variant of
  * [[Dedup.ngramContamination]].
  *
  * The exact operator broadcasts the benchmark's distinct n-gram set; at
  * corpus scale that pool can reach hundreds of millions of grams (every
  * eval suite, every contest problem, every held-out shard), and an exact
  * broadcast set stops fitting the executor heap. A Bloom filter holds the
  * SAME membership signal in `mBits` bits — ~10 bits per gram for a 1%
  * false-positive rate — at the cost of a deterministic, quantifiable
  * overcount: false positives only ever INFLATE a doc's contamination
  * fraction, never hide a hit, which is the safe direction for a
  * decontamination gate (you drop slightly more than you must, never less).
  *
  * Scale shape: building the filter is one distinct-aggregate over the
  * benchmark grams (shuffled by position, bounded output ≤ mBits rows)
  * followed by a driver-side bitset of mBits/8 bytes — the WHOLE point is
  * that this is small. Scoring is then a PURE PROJECTION: the doc's gram
  * array is probed by the native `BloomHits` Catalyst expression (the
  * bitmap rides the plan as an `addReferenceObj` long-array, the per-gram
  * O(1) bit tests are emitted by `doGenCode` inside whole-stage codegen —
  * the array-`filter`-HOF form was rejected because HOFs are
  * CodegenFallback; see `score()` below), so the corpus pass has NO
  * explode, NO join and NO shuffle — which also
  * makes the operator stateless-streamable
  * ([[graft.streaming.GraftStreaming]] `decontaminateStream`). The exact
  * operator needs the relational explode+join shape because its pool is a
  * broadcast TABLE; the bloom probe needs nothing relational at all. For
  * filters past ~10^8 bits, embed-in-plan stops being the right vehicle —
  * keep the exact semi-join path for that regime instead of a broadcast
  * variable + UDF, which would leave codegen.
  *
  * Two lanes, the established dedup discipline:
  *  - [[ngramContaminationBloom]]: production xxhash64 gram identities
  *    ([[graft.functions.HashExpressions.ngramHashes]]) — rows-only gate.
  *  - [[ngramContaminationBloomFixture]]: the SQL-replayable fixture gram
  *    hashes (Dedup.fixtureWindowHashes, all sub-2^31 modular integer
  *    arithmetic), position mixes `((2j+3)·g + (5j+7)) mod P mod m` shared
  *    with the DuckDB oracle via [[positionSqls]] — fully oracle-green,
  *    INCLUDING the false positives, which both engines reproduce
  *    bit-identically.
  */
object Bloom {

  private val P = Dedup.FixtureP

  /** k filter positions of a nonnegative sub-2^31 gram hash: small-literal
    * LCG finalizers mod P, folded to m bits. Products stay < 2^36 — exact
    * in 64-bit arithmetic on both engines.
    */
  def positionExprs(g: Column, mBits: Int, k: Int): Seq[Column] =
    (0 until k).map(j => ((lit(2L * j + 3) * g + lit(5L * j + 7)) % P) % mBits)

  /** The same k position mixes as DuckDB SQL fragments — ONE arithmetic
    * definition rendered for both engines (the OracleFixtures discipline).
    */
  def positionSqls(g: String, mBits: Int, k: Int): Seq[String] =
    (0 until k).map(j => s"(((${2 * j + 3}*$g + ${5 * j + 7}) % $P) % $mBits)")

  /** Positions for FULL-RANGE (possibly negative) 64-bit gram hashes —
    * the production lane. The hash is xor-folded to 31 nonnegative bits
    * first so the LCG products stay far under 2^63 (ANSI mode overflow-
    * checks multiplication — no wrap-around tricks); the fold costs a
    * vanishing extra collision rate next to the filter's own fp rate.
    */
  private[graft] def positionExprsWide(g: Column, mBits: Int, k: Int): Seq[Column] = {
    val folded = g.bitwiseXOR(shiftrightunsigned(g, 33)).bitwiseAND(lit(0x7FFFFFFFL))
    (0 until k).map(j => ((lit(2L * j + 3) * folded + lit(5L * j + 7)) % P) % mBits)
  }

  /** Distinct per-doc gram-hash arrays for each lane. */
  private def gramsWide(text: Column, shingle: Int): Column =
    graft.functions.HashExpressions.ngramHashes(
      graft.functions.TextFunctions.tokens(text), shingle)

  private def gramsFixture(text: Column, shingle: Int): Column =
    array_distinct(Dedup.fixtureWindowHashes(text, shingle))

  /** Build the bitmap from a benchmark table: the distinct filter
    * positions of its gram hashes, collected to a driver bitset. Driver
    * state is bounded by mBits/64 longs REGARDLESS of pool size — that
    * bound is the operator's reason to exist.
    */
  private def buildBits(benchmark: DataFrame, textCol: String,
      gramArr: Column => Column, posOf: Column => Seq[Column],
      mBits: Int): Array[Long] =
    buildBitsFromHashes(benchmark, gramArr(col(textCol)), posOf, mBits)

  /** [[buildBits]] from a caller-supplied integer hash-array column —
    * the winnow lanes build the filter from winnowed FINGERPRINTS (an
    * expected 2/(w+1) of the grams), not raw gram hashes; same driver
    * bound (mBits/64 longs regardless of pool size), same position
    * arithmetic.
    */
  private[graft] def buildBitsFromHashes(benchmark: DataFrame, hashArr: Column,
      posOf: Column => Seq[Column], mBits: Int): Array[Long] = {
    require(mBits > 0 && mBits % 64 == 0, s"mBits must be a positive multiple of 64, got $mBits")
    val words = new Array[Long](mBits / 64)
    benchmark
      .select(explode(hashArr).as("__g"))
      .select(explode(array(posOf(col("__g")): _*)).as("__pos"))
      .distinct()
      .collect()
      .foreach { r =>
        val p = r.getLong(0).toInt
        words(p >> 6) |= 1L << (p & 63)
      }
    words
  }

  /** (idCol, contamination_bloom) in TWO chained projections: the gram
    * array materializes under a name first, then the fraction reads that
    * column. CollapseProject keeps the split (the array is non-cheap and
    * referenced multiple times), so the tokenize+hash work runs once per
    * row instead of once per reference. The probe itself is the native
    * [[graft.functions.BloomHits]] expression — one codegen'd loop with
    * O(1) bit tests, the bitmap riding the generated class as a
    * referenced object. A `filter` HOF computes the same thing through
    * interpreted lambda eval; measured equivalent at corpus scale
    * (ProbeBloom — gram hashing dominates either way), the native form
    * is kept for the library-wide no-codegen-fallback discipline.
    */
  private def score(corpus: DataFrame, idCol: String, gramArr: Column,
      words: Array[Long], mBits: Int, k: Int, foldWide: Boolean): DataFrame =
    corpus.select(col(idCol), gramArr.as("__grams"))
      .select(col(idCol),
        round(
          graft.functions.HashExpressions
            .bloomHits(col("__grams"), words, mBits, k, foldWide)
            .cast("double") / size(col("__grams")), 6)
          .as("contamination_bloom"))

  /** Production lane: xxhash64 gram identities, wide-mix positions.
    * Output: (idCol, contamination_bloom) — one projection over the
    * corpus, zero shuffles.
    */
  def ngramContaminationBloom(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, shingle: Int = 3,
      mBits: Int = 1 << 20, k: Int = 3): DataFrame = {
    val pos = positionExprsWide(_: Column, mBits, k)
    val bits = buildBits(benchmark, textCol, gramsWide(_, shingle), pos, mBits)
    score(corpus, idCol, gramsWide(col(textCol), shingle), bits, mBits, k, foldWide = true)
  }

  /** Oracle lane: fixture gram hashes + literal position mixes; DuckDB
    * replays the filter — false positives included — bit-for-bit.
    */
  def ngramContaminationBloomFixture(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, shingle: Int = 3,
      mBits: Int = 1 << 16, k: Int = 3): DataFrame = {
    val pos = positionExprs(_: Column, mBits, k)
    val bits = buildBits(benchmark, textCol, gramsFixture(_, shingle), pos, mBits)
    score(corpus, idCol, gramsFixture(col(textCol), shingle), bits, mBits, k, foldWide = false)
  }

  /** The production-lane scoring expression against a pre-built filter —
    * the streaming entry point: build once from the static benchmark,
    * then score rows statelessly. Single-reference form (the gram array
    * is evaluated inline); for a batch table prefer
    * [[ngramContaminationBloom]], whose two-step projection shares it.
    */
  def contaminationColumn(text: Column, bits: Array[Long], shingle: Int,
      mBits: Int, k: Int): Column = {
    val grams = gramsWide(text, shingle)
    round(
      graft.functions.HashExpressions.bloomHits(grams, bits, mBits, k, foldWide = true)
        .cast("double") / size(grams), 6)
  }

  /** Build the production-lane filter from a static benchmark table. */
  def buildFilter(benchmark: DataFrame, textCol: String, shingle: Int = 3,
      mBits: Int = 1 << 20, k: Int = 3): Array[Long] =
    buildBits(benchmark, textCol, gramsWide(_, shingle),
      positionExprsWide(_: Column, mBits, k), mBits)
}
