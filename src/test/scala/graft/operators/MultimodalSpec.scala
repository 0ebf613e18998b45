package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("synthetic media table has the declared schema") {
    val m = Multimodal.synthetic(spark, 30)
    assert(m.schema.fieldNames.toSeq == Seq("id", "meta", "payload"))
    assert(m.count() == 30)
  }

  test("extractFeatures is deterministic and preserves ids") {
    val m = Multimodal.synthetic(spark, 50)
    val f1 = Multimodal.extractFeatures(m, dim = 8).collect().sortBy(_.id)
    val f2 = Multimodal.extractFeatures(m, dim = 8).collect().sortBy(_.id)
    assert(f1.map(_.id).toSeq == (0L until 50L))
    assert(f1.zip(f2).forall { case (a, b) => a.features.sameElements(b.features) })
    assert(f1.forall(_.featureDim == 8))
  }

  test("null/empty payloads pass through as empty features, not task failure") {
    val rows = Seq(
      Multimodal.MediaRow(0L, Multimodal.MediaMeta("image", "jpeg", 64, 64, 0), Array[Byte](1, 2)),
      Multimodal.MediaRow(1L, Multimodal.MediaMeta("image", "jpeg", 64, 64, 0), Array.empty[Byte]))
    val ds = spark.createDataset(rows)
    val f = Multimodal.extractFeatures(ds, dim = 4).collect().sortBy(_.id)
    assert(f(0).featureDim == 4 && f(1).featureDim == 0)
  }

  test("metadata filter prunes payload from the parquet scan (columnar contract)") {
    val path = "/root/repo/target/test_media_parquet"
    Multimodal.synthetic(spark, 30).write.mode("overwrite").parquet(path)
    val m = spark.read.parquet(path)
    val plan = Multimodal.filterByMeta(m, "image", 64).queryExecution
      .executedPlan.toString
    assert(!plan.contains("payload"), s"payload must be pruned from the scan:\n$plan")
    assert(plan.contains("PushedFilters: ["), "meta predicates should reach the scan")
  }

  test("fromKeyedText derives media schema + UTF-8 payload from any keyed text source") {
    import spark.implicits._
    val src = Seq((0L, "héllo"), (1L, "ab"), (2L, "xyz")).toDF("doc_id", "text")
    val m = Multimodal.fromKeyedText(src, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(m(0L).getStruct(1).getString(0) == "image")
    assert(m(1L).getStruct(1).getString(0) == "audio")
    assert(m(2L).getStruct(1).getString(0) == "video")
    // payload is the text's UTF-8 bytes (é = 2 bytes)
    assert(m(0L).getAs[Array[Byte]](2).length == 6)
    assert(m(0L).getStruct(1).getInt(2) == 64 && m(1L).getStruct(1).getInt(2) == 96)
  }

  test("sampleFrames emits bounded rows per video") {
    val m = Multimodal.synthetic(spark, 30)
    val frames = Multimodal.sampleFrames(m, stride = 100).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.getInt(1) % 100 == 0))
  }

  // deterministic structured payload: a "gradient" byte pattern per seed,
  // so small perturbations move few cell means (the planted-feature
  // discipline: near-dups must pair, random payloads must not)
  private def gradientPayload(seed: Int, len: Int = 4096): Array[Byte] =
    Array.tabulate(len)(i => (((i * 255L) / len + seed * 17) % 256).toByte)

  private def perturb(p: Array[Byte], at: Int, n: Int): Array[Byte] = {
    val out = p.clone()
    for (j <- at until math.min(at + n, out.length)) out(j) = (out(j) ^ 0x7f).toByte
    out
  }

  test("phash expression: locality, empty payload, eval==codegen") {
    import org.apache.spark.sql.functions._
    val base = gradientPayload(1)
    val near = perturb(base, 100, 40)       // flips <1 cell of 60
    val far = gradientPayload(9)            // different phase entirely
    val df = Seq((0L, base), (1L, near), (2L, far), (3L, Array.empty[Byte]))
      .toDF("id", "payload")
    val got = df.select(col("id"), Multimodal.phash(col("payload")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(got(0L), got(1L)) <= 3,
      s"near-identical payloads must be within 3 bits, got ${hamming(got(0L), got(1L))}")
    assert(got(3L) == 0L, "empty payload hashes to 0")
    // interpreted eval agrees with the codegen'd column path
    for ((id, h) <- got) {
      val payload = Seq(base, near, far, Array.empty[Byte])(id.toInt)
      assert(graft.functions.PhashBytes.hash(payload, 60) == h)
    }
  }

  // ---- real-codec (javax.imageio) planted-image fixtures ----
  // 64×48 block image: 8×8 grid of 8×6-px blocks, each solid black or
  // white by a seed pattern — every phash grid cell sits at 0 or 255,
  // far from the global mean, so bits are robust and one inverted block
  // flips (about) one bit: the average-hash locality contract.
  private def blockImage(seed: Int, invertBlock: Option[(Int, Int)] = None) = {
    val img = new java.awt.image.BufferedImage(64, 48,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 48; x <- 0 until 64) {
      val (gx, gy) = (x / 8, y / 6)
      val on0 = (gx * 3 + gy * 5 + seed) % 4 < 2
      val on = if (invertBlock.contains((gx, gy))) !on0 else on0
      img.setRGB(x, y, if (on) 0xffffff else 0x000000)
    }
    img
  }

  private def encodeImage(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, out), s"JDK must ship a $fmt writer")
    out.toByteArray
  }

  private def mediaRows(rows: Seq[(Long, Array[Byte])]) =
    spark.createDataset(rows.map { case (id, p) =>
      Multimodal.MediaRow(id, Multimodal.MediaMeta("image", "png", 64, 48, 0), p)
    })

  test("phashDecoded: PNG and BMP encodings of the same pixels hash EQUAL; bytes don't") {
    import org.apache.spark.sql.functions._
    val png = encodeImage(blockImage(1), "png")
    val bmp = encodeImage(blockImage(1), "bmp")
    assert(!java.util.Arrays.equals(png, bmp), "the two containers differ at byte level")
    val got = Multimodal.phashDecoded(mediaRows(Seq((0L, png), (1L, bmp))))
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getLong(2))).toMap
    assert(got(0L)._1 && got(1L)._1, "both payloads must decode")
    assert(got(0L)._2 == got(1L)._2,
      s"same pixels must hash equal across containers, got $got")
    // the byte-level phash cannot have this property — different containers
    val byteHashes = mediaRows(Seq((0L, png), (1L, bmp))).toDF()
      .select(Multimodal.phash(col("payload"))).collect().map(_.getLong(0))
    assert(byteHashes(0) != byteHashes(1),
      "byte-level hashes of different containers differ (why decode matters)")
  }

  test("phashDecoded: locality on decoded pixels; undecodable rows flagged null") {
    val base = encodeImage(blockImage(1), "png")
    val near = encodeImage(blockImage(1, invertBlock = Some((2, 3))), "png")
    val far = encodeImage(blockImage(2), "png")
    val junk = gradientPayload(5, 512) // not an image
    val got = Multimodal.phashDecoded(
        mediaRows(Seq((0L, base), (1L, near), (2L, far), (3L, junk))))
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(got(0L)._2, got(1L)._2) <= 3,
      s"one inverted block must stay within 3 bits, got ${hamming(got(0L)._2, got(1L)._2)}")
    assert(hamming(got(0L)._2, got(2L)._2) > 10,
      s"a different pattern must be far, got ${hamming(got(0L)._2, got(2L)._2)}")
    assert(!got(3L)._1 && got(3L)._2 == -1L,
      "undecodable payload is flagged (decoded=false, null hash), not a failure")
  }

  test("extractFeaturesDecoded: real pixels for decodable images, stub fallback flagged") {
    import org.apache.spark.sql.functions._
    val png = encodeImage(blockImage(1), "png")
    val bmp = encodeImage(blockImage(1), "bmp")
    val junk = gradientPayload(5, 512)
    val got = Multimodal.extractFeaturesDecoded(
        mediaRows(Seq((0L, png), (1L, bmp), (2L, junk))))
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getInt(2), r.getSeq[Float](3).toArray)).toMap
    assert(got.values.forall(_._2 == 64), "every row gets the same dim")
    assert(got(0L)._1 && got(1L)._1 && !got(2L)._1)
    // same pixels, different containers -> identical real features
    assert(got(0L)._3.sameElements(got(1L)._3))
    // mean-centered: brightness term cancels
    assert(math.abs(got(0L)._3.sum) < 1e-4)
    // ANN-composable: cosine of the cross-container twin pair is 1.0
    val df = Multimodal.extractFeaturesDecoded(mediaRows(Seq((0L, png), (1L, bmp))))
      .select(col("id").as("vec_id"), col("features").as("embedding"))
    val top = Similarity.bruteForceTopK(df, df, "vec_id", "embedding", k = 1)
      .collect()
    assert(top.forall(r => math.abs(r.getDouble(2) - 1.0) < 1e-6),
      s"cross-container twins must be exact ANN matches, got ${top.mkString(",")}")
  }

  test("decodedNearDuplicates: cross-container twins pair; undecodable rows excluded") {
    val rows = (0 until 6).map(i => (i.toLong, encodeImage(blockImage(i + 10), "png"))) ++
      Seq((100L, encodeImage(blockImage(10), "bmp")),       // same pixels as 0, other container
          (101L, encodeImage(blockImage(13, invertBlock = Some((4, 4))), "png")), // near dup of 3
          (102L, gradientPayload(3, 512)))                  // undecodable
    val pairs = Multimodal.decodedNearDuplicates(mediaRows(rows), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 100L)), "cross-container identical pixels must pair")
    assert(pairs.contains((3L, 101L)), "planted near-duplicate image must pair")
    assert(pairs.forall { case (a, b) => a != 102L && b != 102L },
      "undecodable rows have no signature and never pair")
  }

  // ---- real-codec (javax.sound.sampled) planted-waveform fixtures ----
  // 61 frames × 100 samples of seeded noise under a per-frame amplitude
  // envelope: the delta-energy fingerprint bits follow the envelope, so
  // perturbing one frame moves at most its two boundary bits and a
  // different seed reshuffles the whole contour.
  private def waveform(seed: Int, framesN: Int = 61, perFrame: Int = 100): Array[Int] = {
    val rnd = new java.util.Random(seed)
    val out = new Array[Int](framesN * perFrame)
    var f = 0
    var i = 0
    while (f < framesN) {
      val amp = 200 + rnd.nextInt(4000)
      var j = 0
      while (j < perFrame) {
        out(i) = rnd.nextInt(2 * amp + 1) - amp
        i += 1; j += 1
      }
      f += 1
    }
    out
  }

  private def audioRows(rows: Seq[(Long, Array[Byte])]) =
    spark.createDataset(rows.map { case (id, p) =>
      Multimodal.MediaRow(id, Multimodal.MediaMeta("audio", "wav", 0, 0, 1000), p)
    })

  test("audio fingerprint: amplitude invariance, locality, empty, eval==codegen") {
    import org.apache.spark.sql.functions._
    import graft.functions.AudioFingerprint
    val base = waveform(1)
    // ×2 amplitude: every frame energy scales by 4, every strict
    // comparison is unchanged — the contour hash's defining property
    assert(AudioFingerprint.hashSamples(base, 60) ==
      AudioFingerprint.hashSamples(base.map(_ * 2), 60))
    // zero 5 of 100 samples in one mid frame: only that frame's two
    // boundary bits can move
    val near = base.clone()
    for (j <- 3000 until 3005) near(j) = 0
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(AudioFingerprint.hashSamples(base, 60),
      AudioFingerprint.hashSamples(near, 60)) <= 2)
    // an independent envelope is far
    assert(hamming(AudioFingerprint.hashSamples(base, 60),
      AudioFingerprint.hashSamples(waveform(9), 60)) > 10)
    assert(AudioFingerprint.hashSamples(Array.empty[Int], 60) == 0L)
    // byte lane: codegen'd column path == shared static arithmetic
    val payloads = Seq(gradientPayload(1), gradientPayload(5), Array.empty[Byte])
    val got = payloads.zipWithIndex.map { case (p, i) => (i.toLong, p) }
      .toDF("id", "payload")
      .select(col("id"), Multimodal.audioFingerprint(col("payload")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((p, i) <- payloads.zipWithIndex)
      assert(AudioFingerprint.hashBytes(p, 60) == got(i.toLong))
    assert(got(2L) == 0L, "empty payload fingerprints to 0")
  }

  test("decodeAudioSamples: WAV and AU round-trip through the REAL javax.sound parsers") {
    val s = waveform(3)
    assert(Multimodal.decodeAudioSamples(Multimodal.wavBytes(s)).get.sameElements(s),
      "RIFF/WAVE little-endian PCM16 must decode to the exact samples")
    assert(Multimodal.decodeAudioSamples(Multimodal.auBytes(s)).get.sameElements(s),
      "Sun AU big-endian PCM16 must decode to the exact samples")
    assert(Multimodal.decodeAudioSamples(gradientPayload(5, 512)).isEmpty,
      "non-audio bytes are None, not a task failure")
    assert(Multimodal.decodeAudioSamples(Array.empty[Byte]).isEmpty)
    assert(Multimodal.decodeAudioSamples(null).isEmpty)
  }

  test("audioFingerprintDecoded: WAV and AU of the same waveform hash EQUAL; bytes don't") {
    import org.apache.spark.sql.functions._
    val s = waveform(4)
    val wav = Multimodal.wavBytes(s)
    val au = Multimodal.auBytes(s)
    assert(!java.util.Arrays.equals(wav, au), "the two containers differ at byte level")
    val got = Multimodal.audioFingerprintDecoded(audioRows(Seq((0L, wav), (1L, au))))
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getLong(2))).toMap
    assert(got(0L)._1 && got(1L)._1, "both containers must decode")
    assert(got(0L)._2 == got(1L)._2,
      s"same waveform must fingerprint equal across containers, got $got")
    // byte-level fingerprints of different containers differ — why decode matters
    val byteHashes = audioRows(Seq((0L, wav), (1L, au))).toDF()
      .select(Multimodal.audioFingerprint(col("payload"))).collect().map(_.getLong(0))
    assert(byteHashes(0) != byteHashes(1))
  }

  test("audioFeaturesDecoded: real RMS contour, amplitude cancels, stub fallback flagged") {
    import org.apache.spark.sql.functions._
    val s = waveform(6)
    val wav = Multimodal.wavBytes(s)
    val au = Multimodal.auBytes(s)
    val loud = Multimodal.wavBytes(s.map(_ * 2))
    val junk = gradientPayload(5, 512)
    val got = Multimodal.audioFeaturesDecoded(
        audioRows(Seq((0L, wav), (1L, au), (2L, loud), (3L, junk))))
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getInt(2), r.getSeq[Float](3).toArray)).toMap
    assert(got.values.forall(_._2 == 32), "every row gets the same dim")
    assert(got(0L)._1 && got(1L)._1 && got(2L)._1 && !got(3L)._1)
    assert(got(0L)._3.sameElements(got(1L)._3),
      "same waveform, different containers -> identical real features")
    assert(got(0L)._3.zip(got(2L)._3).forall { case (a, b) => math.abs(a - b) < 1e-4 },
      "peak-normalized RMS contour: amplitude scaling cancels")
    // ANN-composable: the cross-container twin is an exact cosine match
    val df = Multimodal.audioFeaturesDecoded(audioRows(Seq((0L, wav), (1L, au))))
      .select(col("id").as("vec_id"), col("features").as("embedding"))
    val top = Similarity.bruteForceTopK(df, df, "vec_id", "embedding", k = 1)
      .collect()
    assert(top.forall(r => math.abs(r.getDouble(2) - 1.0) < 1e-6))
  }

  test("decodedAudioNearDuplicates: cross-container + rescaled twins pair; junk excluded") {
    val rows = (0 until 6).map(i =>
      (i.toLong, Multimodal.wavBytes(waveform(i + 10)))) ++
      Seq((100L, Multimodal.auBytes(waveform(10))),            // same waveform as 0, other container
          (101L, Multimodal.wavBytes(waveform(13).map(_ * 2))), // amplitude-scaled twin of 3
          (102L, gradientPayload(3, 512)))                      // not audio
    val pairs = Multimodal.decodedAudioNearDuplicates(audioRows(rows), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 100L)), "cross-container identical waveform must pair")
    assert(pairs.contains((3L, 101L)), "amplitude-rescaled waveform must pair at hamming 0")
    assert(pairs.forall { case (a, b) => a != 102L && b != 102L },
      "unparseable rows have no signature and never pair")
  }

  test("keyframes: scene cuts detected, steady shots suppressed, partial tail frame kept") {
    // raw-container "video": 64-byte frames; three shots of identical
    // frames (A×4, B×3, C×2) plus a 20-byte partial tail of C's pattern
    def frame(seed: Int) = gradientPayload(seed, 64)
    val payload = (Seq.fill(4)(frame(1)) ++ Seq.fill(3)(frame(9)) ++
      Seq.fill(2)(frame(5))).flatten.toArray ++ frame(5).take(20)
    val df = Seq((7L, payload), (8L, Array.empty[Byte])).toDF("id", "payload")
    val got = Multimodal.keyframes(df, "id", "payload", frameBytes = 64, changeBits = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getInt(3), r.getInt(4))).toMap
    assert(got.keys.map(_._1).forall(_ == 7L), "empty payload emits no frames")
    assert(got.keys.size == 10, "9 full frames + 1 partial tail")
    val keyframeIdx = got.collect { case ((_, f), (_, 1)) => f }.toSet
    // shot boundaries at 0, 4, 7; the partial tail re-slices C's gradient
    // so its hash moves too — it is a (spurious but deterministic) cut
    assert(keyframeIdx.contains(0) && keyframeIdx.contains(4) && keyframeIdx.contains(7),
      s"shot boundaries must be keyframes, got $keyframeIdx")
    assert(!keyframeIdx.contains(1) && !keyframeIdx.contains(2) &&
      !keyframeIdx.contains(5) && !keyframeIdx.contains(8),
      s"identical consecutive frames are not keyframes, got $keyframeIdx")
    assert(got((7L, 1))._1 == 0 && got((7L, 5))._1 == 0,
      "identical frames sit at Hamming 0")
    assert(got((7L, 0))._1 == -1, "frame 0 has no predecessor")
  }

  test("payloadNearDuplicates: planted near-dup payloads pair, random payloads don't") {
    // 8 bases: offsets stay under 256 (seed*17 <= 119), so no two bases
    // are cyclic-rotation near-collisions of each other
    val rows =
      (0 until 8).map(i => (i.toLong, gradientPayload(i))) ++
      Seq((100L, gradientPayload(3)),                   // exact dup of 3
          (101L, perturb(gradientPayload(7), 500, 30))) // near dup of 7
    val df = rows.toDF("id", "payload")
    val pairs = Multimodal.payloadNearDuplicates(df, "id", "payload", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((3L, 100L)), "exact duplicate payload must pair at hamming 0")
    assert(pairs.contains((7L, 101L)), "planted near-duplicate payload must pair")
    // no pair between distinct gradient phases (different seeds shift all
    // cell votes): everything found involves the planted twins
    val planted = Set(3L, 100L, 7L, 101L)
    assert(pairs.forall { case (a, b) => planted.contains(a) && planted.contains(b) },
      s"unexpected pairs: ${pairs.filterNot { case (a, b) => planted.contains(a) && planted.contains(b) }}")
  }
}
