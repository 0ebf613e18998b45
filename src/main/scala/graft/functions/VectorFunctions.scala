package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column functions over `array<float|double>` embeddings.
  *
  * Native `zip_with`/`aggregate` expression compositions — codegen'd, no
  * UDF boxing, no driver involvement; a cosine over 100 TB of embeddings is
  * one narrow stage.
  */
object VectorFunctions {

  /** Elementwise-double view of a float/double array column. */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Native codegen'd dot product (see [[VectorExpressions]]); the HOF
    * formulation is kept as `dotHof` for differential testing.
    */
  def dot(a: Column, b: Column): Column = VectorExpressions.dot(a, b)

  private[graft] def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  def cosineSimilarity(a: Column, b: Column): Column =
    VectorExpressions.cosine(a, b)

  private[graft] def cosineSimilarityHof(a: Column, b: Column): Column =
    dotHof(a, b) / (sqrt(dotHof(a, a)) * sqrt(dotHof(b, b)))

  def l2Distance(a: Column, b: Column): Column = VectorExpressions.l2(a, b)

  private[graft] def l2DistanceHof(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))), lit(0.0), (acc, x) => acc + x))

  /** Unit-normalize: pre-normalizing the corpus once turns every cosine
    * into a plain dot product — the standard trick that halves ANN cost.
    */
  def normalize(v: Column): Column = {
    val n = l2Norm(v)
    transform(v, x => x / n)
  }

  /** Symmetric int8 quantization for embedding STORAGE: 4 bytes/dim →
    * 1 byte/dim, the difference between a 100 TB and a 25 TB vector
    * store. Returns `struct(scale double, q array<int>)` with
    * `x ≈ q * scale / 127`; values TRUNCATE toward zero (not round)
    * because double→int truncation is bit-identical across engines
    * while round-at-.5 is not — quantization error stays < scale/127
    * either way. A zero vector quantizes to zeros with scale 0.
    * Native fused expression (see [[VectorExpressions.QuantizeInt8]]):
    * one O(d) pass, codegen'd.
    */
  def quantizeInt8(v: Column): Column = VectorExpressions.quantizeInt8(v)

  /** Reconstruct doubles from [[quantizeInt8]] output. */
  def dequantizeInt8(qv: Column): Column =
    transform(qv("q"), x => x.cast("double") * qv("scale") / 127.0)

  /** Quantized integer dot product: `round(x*scale)` per element, exact
    * 64-bit integer arithmetic. Deterministic across engines and summation
    * orders — used where a bit-exact similarity key is needed (dedup keys,
    * oracle-checked rankings). Native codegen'd expression.
    */
  def quantizedDot(a: Column, b: Column, scale: Int = 1000): Column =
    VectorExpressions.quantizedDot(a, b, scale)

  private[graft] def quantizedDotHof(a: Column, b: Column, scale: Int = 1000): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        round(x.cast("double") * scale).cast("long") * round(y.cast("double") * scale).cast("long")),
      lit(0L), (acc, x) => acc + x)

  /** Signed random-hyperplane signature (SimHash for embeddings): `bits`
    * pseudo-random hyperplanes derived deterministically from (plane, dim)
    * via xxhash64; returns a long bitmask. Hamming-close signatures ⇒
    * cosine-close vectors — the LSH primitive for embedding dedup/ANN.
    * Native one-pass expression (see [[HyperplaneSignature]]); the HOF
    * formulation would re-hash every element once per bit.
    */
  def hyperplaneSignature(v: Column, bits: Int = 32, seed: Int = 42): Column =
    VectorExpressions.hyperplaneSig(v, bits, seed)

  /** Hamming distance between two long signatures. */
  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
