package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media travels as opaque `binary` columns plus a typed metadata struct —
  * the columnar layout that keeps 100 TB of media scannable: metadata
  * predicates push down to parquet and prune row groups without touching
  * payload bytes; payloads stream through `mapPartitions` in bounded
  * batches so executor memory stays flat.
  *
  * The actual codec step is STUBBED (no image/audio libraries in this
  * container): `decodeStub` derives a deterministic fake feature vector
  * from the payload bytes. The Spark-side contract — schema, batching,
  * partitioning, null passthrough — is real and tested; swap
  * `decodeStub`'s body for a JNI/ffmpeg/ImageIO call in production.
  */
object Multimodal {

  /** Typed metadata carried beside every media payload. */
  case class MediaMeta(
      mediaType: String, // "image" | "audio" | "video"
      format: String,    // "jpeg", "wav", ...
      width: Int,
      height: Int,
      durationMs: Long)

  case class MediaRow(id: Long, meta: MediaMeta, payload: Array[Byte])

  case class MediaFeatures(id: Long, featureDim: Int, features: Array[Float])

  val mediaSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.Encoders.product[MediaRow].schema

  /** Synthesize a deterministic media table from any keyed source (test
    * fixture: payload bytes derived from the id).
    */
  def synthetic(spark: SparkSession, n: Int, payloadBytes: Int = 256): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { r =>
      val id = r
      val rnd = new java.util.Random(id) // deterministic per id
      val payload = new Array[Byte](payloadBytes)
      rnd.nextBytes(payload)
      MediaRow(id,
        MediaMeta(if (id % 3 == 0) "image" else if (id % 3 == 1) "audio" else "video",
          if (id % 3 == 0) "jpeg" else if (id % 3 == 1) "wav" else "mp4",
          width = 64 + (id % 8).toInt * 32, height = 64 + (id % 5).toInt * 32,
          durationMs = if (id % 3 == 0) 0L else 1000L + id % 60000),
        payload)
    }
  }

  /** ??? in spirit — STUB decode: deterministic fake "embedding" from
    * payload bytes (xxhash-seeded). Replace with a real codec in prod.
    */
  private[operators] def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    val rnd = new java.util.Random(h)
    var j = 0
    while (j < dim) { out(j) = rnd.nextFloat() * 2f - 1f; j += 1 }
    out
  }

  /** Decode/feature-extract: partition-streaming over binary payloads in
    * bounded batches (the `mapInPandas` batch shape, Scala-side). Null or
    * empty payloads pass through as empty feature arrays rather than
    * failing the task.
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 64,
      batchSize: Int = 128): Dataset[MediaFeatures] = {
    implicit val enc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // batch boundary = where a real codec would init/reuse native ctx
        batch.iterator.map { m =>
          if (m.payload == null || m.payload.isEmpty)
            MediaFeatures(m.id, 0, Array.empty)
          else MediaFeatures(m.id, dim, decodeStub(m.payload, dim))
        }
      }
    }
  }

  /** Resize stub: maps payloads to new dimensions, updating the metadata
    * struct and deriving a deterministic resized payload (scaled length).
    * The real implementation swaps the payload transform for an image
    * library; the Spark contract — metadata stays queryable/pushdown-able,
    * payload transforms stream per partition — is what's tested.
    */
  def resize(media: Dataset[MediaRow], width: Int, height: Int): Dataset[MediaRow] = {
    implicit val enc: Encoder[MediaRow] = Encoders.product[MediaRow]
    media.mapPartitions { it =>
      it.map { m =>
        if (m.meta.mediaType != "image") m
        else {
          val scale = (width.toLong * height) /
            math.max(m.meta.width.toLong * m.meta.height, 1L).toDouble
          val newLen = math.max(1, (m.payload.length * scale).toInt)
          val resized = java.util.Arrays.copyOf(m.payload, newLen)
          m.copy(meta = m.meta.copy(width = width, height = height), payload = resized)
        }
      }
    }
  }

  /** Build a media table from any (id, text) source with engine-portable
    * column arithmetic: media type/format/dims derived from the id,
    * payload = the text's UTF-8 bytes. Gives the binary-column plumbing a
    * deterministic, SQL-checkable surface (a real corpus loads real bytes
    * through the same schema); pure Column ops, so it scales as one
    * narrow stage.
    */
  def fromKeyedText(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val id = col(idCol)
    df.select(id.as("id"),
      struct(
        when(pmod(id, lit(3)) === 0, "image")
          .when(pmod(id, lit(3)) === 1, "audio").otherwise("video").as("mediaType"),
        when(pmod(id, lit(3)) === 0, "jpeg")
          .when(pmod(id, lit(3)) === 1, "wav").otherwise("mp4").as("format"),
        (lit(64) + pmod(id, lit(8)) * 32).cast("int").as("width"),
        (lit(64) + pmod(id, lit(5)) * 32).cast("int").as("height"),
        when(pmod(id, lit(3)) === 0, lit(0L))
          .otherwise(lit(1000L) + pmod(id, lit(60000))).as("durationMs")).as("meta"),
      encode(col(textCol), "UTF-8").as("payload"))
  }

  /** Integer average-hash perceptual signature of the payload bytes —
    * [[graft.functions.PhashBytes]]: cells over the byte stream, bit =
    * cell mean vs payload mean by exact integer cross-multiply, so the
    * signature is engine-replayable (for an ASCII-text-derived fixture
    * payload a DuckDB oracle recomputes it character-by-character — the
    * q_io_binary_files ASCII-corpus assumption). This closes the DEDUP
    * half of the multimodal boundary without a codec: a real deployment
    * swaps the byte stream for decoded luma pixels and keeps everything
    * downstream (banding, verify, clustering) unchanged.
    */
  def phash(payload: org.apache.spark.sql.Column, bits: Int = 60): org.apache.spark.sql.Column =
    graft.functions.HashExpressions.phashBytes(payload, bits)

  /** Perceptual near-duplicate payload pairs within `maxHamming` bits,
    * through the SAME chunk-LSH spine as simhash text dedup
    * ([[Dedup.simhashPairsFromSigs]]): pigeonhole chunking → bucket join →
    * first-agreeing-chunk exact-once filter → exact Hamming verify. One
    * narrow signature pass over payloads (never shuffled), then all
    * quadratic work confined inside chunk buckets — the 100 TB shape.
    */
  def payloadNearDuplicates(df: DataFrame, idCol: String, payloadCol: String,
      maxHamming: Int = 3, bits: Int = 60): DataFrame = {
    val sigs = Materialize.once(df.select(col(idCol).as("__id"),
      phash(col(payloadCol), bits).as("__sig")))
    Dedup.simhashPairsFromSigs(sigs, maxHamming)
  }

  /** Metadata-only filter that never touches payload bytes — verifies (via
    * .explain) that payload columns are pruned from the scan when only
    * meta predicates/projections are used.
    */
  def filterByMeta(media: DataFrame, mediaType: String, minWidth: Int): DataFrame =
    media.where(col("meta.mediaType") === mediaType && col("meta.width") >= minWidth)
      .select(col("id"), col("meta"))

  /** Frame-sample stub for video: emit every `stride`-th synthetic frame
    * reference (real impl would demux; the Spark shape — one row per
    * sampled frame, bounded memory — is the point).
    */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 10): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter((m: MediaRow) => m.meta.mediaType == "video")
      .flatMap { m =>
        val frames = (m.meta.durationMs / 1000L * 30L).toInt // 30fps fake
        (0 until frames by stride).map(f => (m.id, f))
      }.toDF("id", "frame_index")
  }
}
