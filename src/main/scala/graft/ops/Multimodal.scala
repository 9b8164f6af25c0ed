package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * BINARY columns with a typed metadata struct; decode / feature-extract /
  * resize / frame-sample run per-partition over batches.
  *
  * IMAGE decode is REAL: [[decodeImageBytes]] hands the payload to the
  * JDK's ImageIO (PNG/JPEG/GIF/BMP ship with the JRE — no external
  * dependency) and emits the decoded pixels' BT.601 luminance plane;
  * [[decode]] builds the 16-bin histogram feature vector from those
  * pixels. Payloads no installed reader understands (and the synthetic
  * text-byte assets the oracle queries use) fall back to the SAME
  * histogram arithmetic over the raw payload bytes — [[fakeDecode]], kept
  * as the deterministic test double the DuckDB oracle can replay.
  *
  * AUDIO decode is REAL too: [[decodeAudio]] hands the payload to the
  * JDK's javax.sound.sampled (WAV/AIFF/AU ship with the JRE) and emits
  * stream properties + decoded-waveform sample statistics, with the same
  * deterministic fallback contract ([[fakeAudioStats]]). Video codecs are
  * not in the JRE (animated-GIF "video" decodes via the ImageIO frame
  * path), so true video containers take the fallback; swapping in an FFI
  * decoder changes one function.
  */
object Multimodal {

  /** Typed metadata carried alongside every payload. */
  val metaSchema: StructType = StructType(Seq(
    StructField("modality", StringType), // image | audio | video
    StructField("format", StringType), // png, wav, mp4, ...
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("durationMs", LongType),
    StructField("sizeBytes", LongType)))

  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("payload", BinaryType),
    StructField("meta", metaSchema)))

  /** Deterministic fake assets from the documents table — payload = utf-8
    * text bytes, metadata derived from sizes. Stands in for a real
    * binary-file/parquet-blob source. */
  def fakeAssets(documents: DataFrame): DataFrame = {
    val modality = element_at(array(lit("image"), lit("audio"), lit("video")),
      (pmod(col("doc_id"), lit(3)) + 1).cast("int"))
    documents.select(
      col("doc_id").as("asset_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        modality.as("modality"),
        element_at(array(lit("png"), lit("wav"), lit("mp4")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("format"),
        (pmod(col("doc_id"), lit(64)) + 16).cast("int").as("width"),
        (pmod(col("doc_id"), lit(48)) + 16).cast("int").as("height"),
        (length(col("text")) * 40L).as("durationMs"),
        length(encode(col("text"), "UTF-8")).cast("long").as("sizeBytes")).as("meta"))
  }

  /** 16-bin normalized histogram over byte values — the shared feature
    * arithmetic for both the real decode (over luminance pixels) and the
    * raw-byte fallback. */
  private def hist16(bytes: Array[Byte]): Array[Float] = {
    val bins = new Array[Float](16)
    if (bytes == null || bytes.isEmpty) return bins
    bytes.foreach(b => bins((b & 0xFF) >> 4) += 1f)
    val n = bytes.length.toFloat
    bins.map(_ / n)
  }

  /** Deterministic fallback decoder (and the oracle's test double): the
    * 16-bin histogram over the RAW payload bytes. */
  private[ops] def fakeDecode(payload: Array[Byte]): Array[Float] = hist16(payload)

  /** REAL image decode via JDK ImageIO: returns the decoded image's pixels
    * as one BT.601 integer-luma byte per pixel (row-major), or None when no
    * installed reader recognizes the payload (truncated file, non-image
    * bytes, audio/video container). Pure JRE — PNG/JPEG/GIF/BMP readers
    * ship with the JDK. Integer luma ((299r+587g+114b)/1000, the BT.601
    * weights) keeps the whole pipeline float-free until normalization, so
    * results are bit-deterministic across JVMs. */
  // ImageIO defaults to spooling input streams through a temp-FILE cache —
  // a disk write per decoded row on every executor. Memory-backed cache is
  // correct for bounded payload batches; set once per JVM.
  private lazy val imageIoNoDiskCache: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  private def lumaOf(img: java.awt.image.BufferedImage): Array[Byte] = {
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Byte](w * h)
    var i = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xFF
        val g = (rgb >> 8) & 0xFF
        val b = rgb & 0xFF
        out(i) = ((r * 299 + g * 587 + b * 114) / 1000).toByte
        i += 1
        x += 1
      }
      y += 1
    }
    out
  }

  private[ops] def decodeImageBytes(payload: Array[Byte]): Option[Array[Byte]] = {
    if (payload == null || payload.length < 8) return None
    imageIoNoDiskCache
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None else Some(lumaOf(img))
    } catch { case _: Throwable => None }
  }

  /** REAL multi-frame decode: when the installed ImageIO reader for the
    * payload exposes an image sequence (animated GIF in the stock JRE),
    * returns every frame's integer-luma plane in order. None when no
    * reader claims the payload — the caller falls back to the synthetic
    * slice arithmetic, so the operator runs real decode where it can and
    * stays total where it can't. */
  private[ops] def decodeFrames(payload: Array[Byte]): Option[IndexedSeq[Array[Byte]]] = {
    if (payload == null || payload.length < 8) return None
    imageIoNoDiskCache
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) { iis.close(); return None }
      val reader = readers.next()
      try {
        reader.setInput(iis, false, true) // random access, skip metadata
        val n = reader.getNumImages(true)
        if (n <= 0) None
        else Some((0 until n).map(i => lumaOf(reader.read(i))))
      } finally { reader.dispose(); iis.close() }
    } catch { case _: Throwable => None }
  }

  /** Decoded-audio summary: stream properties plus integer sample
    * statistics. `meanSq`/`peak` are computed over 16-bit signed samples on
    * the real path and over unsigned payload bytes on the fallback — both
    * integer-exact (one double division at the end), so the fallback is
    * engine-replayable with no float-accumulation divergence. */
  case class AudioStatsRow(sampleRate: Int, channels: Int, bitDepth: Int,
      durationMs: Long, meanSq: Double, peak: Int, decoded: Boolean)

  /** REAL audio decode via the JDK's javax.sound.sampled (WAV/AIFF/AU
    * readers ship with the JRE — the audio analogue of the ImageIO path):
    * the payload's stream properties and its decoded waveform's integer
    * mean-square and peak (mean-square stays an exact-integer quotient —
    * one double division, bit-identical in any engine — where an RMS sqrt
    * would not be), after converting to 16-bit signed PCM so sample
    * arithmetic is uniform across source encodings. None when no installed
    * reader claims the bytes (synthetic assets, truncated files) — the
    * caller falls back to the deterministic byte arithmetic the oracle
    * replays. */
  private[ops] def decodeAudio(payload: Array[Byte]): Option[AudioStatsRow] = {
    if (payload == null || payload.length < 12) return None
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    try {
      val in = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        val channels = math.max(1, fmt.getChannels)
        val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
          fmt.getSampleRate, 16, channels, channels * 2, fmt.getSampleRate,
          false) // little-endian
        val pcm = AudioSystem.getAudioInputStream(target, in)
        val bytes = pcm.readAllBytes()
        val n = bytes.length / 2
        var sumSq = 0L
        var peak = 0
        var i = 0
        while (i + 1 < bytes.length) {
          val s = (((bytes(i + 1) & 0xFF) << 8) | (bytes(i) & 0xFF)).toShort.toInt
          val a = math.abs(s)
          if (a > peak) peak = a
          sumSq += s.toLong * s
          i += 2
        }
        val frames = n / channels
        val rate = fmt.getSampleRate
        val durMs = if (rate > 0f) (frames * 1000L) / rate.toLong else 0L
        Some(AudioStatsRow(rate.toInt, channels, fmt.getSampleSizeInBits,
          durMs, if (n == 0) 0.0 else sumSq.toDouble / n,
          peak, decoded = true))
      } finally in.close()
    } catch { case _: Throwable => None }
  }

  /** Deterministic audio fallback (the oracle's test double): stream
    * properties derived from the payload size, sample stats over the raw
    * unsigned bytes. */
  private[ops] def fakeAudioStats(payload: Array[Byte], durationMs: Long): AudioStatsRow = {
    val n = if (payload == null) 0 else payload.length
    var sumSq = 0L
    var peak = 0
    var i = 0
    while (i < n) {
      val b = payload(i) & 0xFF
      if (b > peak) peak = b
      sumSq += b.toLong * b
      i += 1
    }
    AudioStatsRow(8000 + (n % 8) * 1000, 1 + (n % 2), 16, durationMs,
      if (n == 0) 0.0 else sumSq.toDouble / n, peak, decoded = false)
  }

  private val audioStatsSchema = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("bit_depth", IntegerType),
    StructField("duration_ms", LongType),
    StructField("mean_sq", DoubleType),
    StructField("peak", IntegerType),
    StructField("decoded", BooleanType)))

  /** Per-asset audio statistics: real javax.sound decode when a reader
    * claims the payload, the deterministic size/byte fallback otherwise.
    * Same batched mapPartitions shape as extractFeatures — per-batch
    * decoder setup amortizes, and the operator stays a narrow map (no
    * shuffle): at 100 TB audio stats are a scan-side projection. */
  def audioStats(assets: DataFrame, batchSize: Int = 64): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(audioStatsSchema)
    assets.select(col("asset_id"), col("payload"),
        col("meta.durationMs").as("_dur"))
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { r =>
            val payload = r.getAs[Array[Byte]]("payload")
            // durationMs is null for a null-text asset (fakeAssets derives
            // it from length(text)); decodeAudio/fakeAudioStats already
            // guard a null payload, so mirror that here instead of letting
            // getLong NPE on the null field
            val dur = if (r.isNullAt(2)) 0L else r.getLong(2)
            val st = decodeAudio(payload)
              .getOrElse(fakeAudioStats(payload, dur))
            Row(r.getLong(0), st.sampleRate, st.channels, st.bitDepth,
              st.durationMs, st.meanSq, st.peak, st.decoded)
          }
        }
      }(enc)
  }

  /** The decoder behind extractFeatures: real ImageIO decode when a reader
    * claims the payload (features = luminance histogram of the actual
    * pixels), the raw-byte histogram otherwise — same output shape, same
    * arithmetic, so the oracle replays the fallback exactly on the
    * synthetic text-byte assets while a real PNG/JPEG takes the real path. */
  private[ops] def decode(payload: Array[Byte]): Array[Float] =
    decodeImageBytes(payload) match {
      case Some(pixels) => hist16(pixels)
      case None => fakeDecode(payload)
    }

  private val featureSchema = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("modality", StringType),
    StructField("features", ArrayType(FloatType)),
    StructField("batch_size", IntegerType)))

  /** Feature extraction over payload batches: mapPartitions with bounded
    * batches (the decoder amortizes setup per batch, exactly the shape a
    * vectorized/FFI decoder needs). Output records the batch size each row
    * was processed in, so tests pin the batching contract. */
  def extractFeatures(assets: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = assets.sparkSession
    val enc = org.apache.spark.sql.Encoders.row(featureSchema)
    assets.select(col("asset_id"), col("meta.modality").as("modality"), col("payload"))
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // per-batch decoder setup would go here (e.g. codec context)
          batch.iterator.map { r =>
            Row(r.getLong(0), r.getString(1),
              decode(r.getAs[Array[Byte]]("payload")).toSeq, batch.size)
          }
        }
      }(enc)
  }

  /** Frame sampling for "video" payloads: deterministic every-nth-slice of
    * the payload as fake frames — real plumbing: one input row explodes to
    * `frames` rows keyed (asset_id, frame_no), which is the storage/shuffle
    * shape of real frame extraction.
    *
    * `frames` is a compile-time literal, so the slice array is UNROLLED into
    * an explicit `array(substr…)` rather than `transform(sequence…)`: Spark's
    * higher-order functions are interpreted (no whole-stage codegen), and the
    * lambda version measured 0.8–3.3 s at sf0.1 where the unrolled form is
    * codegen'd end-to-end. Same arithmetic, same output. */
  def sampleFrames(assets: DataFrame, frames: Int = 4): DataFrame = {
    val sliceLen = greatest(floor(length(col("payload")) / frames), lit(1)).cast("int")
    val slices = array((0 until frames).map(i =>
      col("payload").substr(lit(i) * sliceLen + 1, lit(16))): _*)
    assets
      .where(col("meta.modality") === "video")
      .select(col("asset_id"), posexplode(slices))
      .withColumnRenamed("pos", "frame_no")
      .withColumnRenamed("col", "frame_bytes")
      .where(length(col("frame_bytes")) > 0)
  }

  private val decodedFrameSchema = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("frame_no", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("features", ArrayType(FloatType)),
    StructField("decoded", BooleanType)))

  /** Frame sampling with REAL decode where a reader claims the payload:
    * an animated container (GIF in the stock JRE) yields up to `maxFrames`
    * evenly-spaced ACTUAL frames, each featurized as the luminance
    * histogram of its decoded pixels (`decoded` = true, `n_frames` = the
    * container's real frame count). Unrecognized payloads take the
    * deterministic slice fallback ([[sampleFrames]]'s arithmetic: every
    * (len/maxFrames)-th 16-byte slice, byte-histogram features,
    * `decoded` = false) — same output shape either way, so downstream
    * stages never branch. Same mapPartitions batch shape as
    * [[extractFeatures]]; frame selection is integer arithmetic
    * (i·(n−1)/(maxFrames−1)), deterministic on any executor. */
  def sampleFramesDecoded(assets: DataFrame, maxFrames: Int = 4,
      batchSize: Int = 64): DataFrame = {
    require(maxFrames >= 2, s"maxFrames=$maxFrames must be >= 2")
    val enc = org.apache.spark.sql.Encoders.row(decodedFrameSchema)
    assets.select(col("asset_id"), col("payload"))
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.iterator.flatMap { r =>
            val id = r.getLong(0)
            val payload = r.getAs[Array[Byte]]("payload")
            decodeFrames(payload) match {
              case Some(frames) =>
                val n = frames.length
                val picks =
                  if (n <= maxFrames) 0 until n
                  else (0 until maxFrames).map(i => (i.toLong * (n - 1) / (maxFrames - 1)).toInt)
                picks.zipWithIndex.map { case (fi, out) =>
                  Row(id, out, n, hist16(frames(fi)).toSeq, true)
                }
              case None =>
                val len = if (payload == null) 0 else payload.length
                if (len == 0) Iterator.empty
                else {
                  val sliceLen = math.max(len / maxFrames, 1)
                  (0 until maxFrames).iterator.map { i =>
                    val start = i * sliceLen
                    val slice = payload.slice(start, math.min(start + 16, len))
                    (i, slice)
                  }.filter(_._2.nonEmpty).map { case (i, slice) =>
                    Row(id, i, maxFrames, hist16(slice).toSeq, false)
                  }
                }
            }
          }
        }
      }(enc)
  }

  /** "Resize": byte-level downsample of payloads to maxBytes — the bounded-
    * payload contract for the synthetic (non-image) assets; metadata is
    * updated consistently. For REAL images use [[resizeImage]]. */
  def resizePayload(assets: DataFrame, maxBytes: Int = 256): DataFrame =
    assets.withColumn("payload", substring(col("payload"), 1, maxBytes))
      .withColumn("meta", col("meta").withField("sizeBytes",
        least(col("meta.sizeBytes"), lit(maxBytes.toLong))))

  /** REAL image resize: decode via ImageIO, scale to fit (maxW, maxH)
    * preserving aspect ratio (never upscales), re-encode as PNG. Returns
    * None when no reader recognizes the payload — callers keep the original
    * (the [[resizeImageAssets]] contract). Pure JRE: Graphics2D bilinear
    * draw + the PNG writer that ships with the JDK. */
  private[ops] def resizeImage(payload: Array[Byte], maxW: Int, maxH: Int): Option[Array[Byte]] = {
    if (payload == null || payload.length < 8) return None
    imageIoNoDiskCache
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) return None
      val scale = math.min(1.0,
        math.min(maxW.toDouble / img.getWidth, maxH.toDouble / img.getHeight))
      val (w, h) = (math.max(1, (img.getWidth * scale).toInt),
        math.max(1, (img.getHeight * scale).toInt))
      val out = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
      } finally g.dispose()
      val bytes = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bytes)
      Some(bytes.toByteArray)
    } catch { case _: Throwable => None }
  }

  private val resizedSchema = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("payload", BinaryType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("resized", BooleanType)))

  /** Real resize over an asset frame: decodable images are scaled to fit
    * and re-encoded (width/height report the DECODED output dimensions,
    * `resized` = true); unrecognized payloads pass through untouched with
    * their metadata dimensions. Same mapPartitions batch shape as
    * [[extractFeatures]] — the decoder amortizes per batch. */
  def resizeImageAssets(assets: DataFrame, maxW: Int = 64, maxH: Int = 64,
      batchSize: Int = 64): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(resizedSchema)
    assets.select(col("asset_id"), col("payload"),
        col("meta.width").as("w"), col("meta.height").as("h"))
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { r =>
            val payload = r.getAs[Array[Byte]]("payload")
            resizeImage(payload, maxW, maxH) match {
              case Some(scaled) =>
                val img = javax.imageio.ImageIO.read(
                  new java.io.ByteArrayInputStream(scaled))
                Row(r.getLong(0), scaled, img.getWidth, img.getHeight, true)
              case None =>
                Row(r.getLong(0), payload,
                  if (r.isNullAt(2)) 0 else r.getInt(2),
                  if (r.isNullAt(3)) 0 else r.getInt(3), false)
            }
          }
        }
      }(enc)
  }

  /** The decoded-or-fallback perceptual hash — lives as a codegen'd
    * expression ([[graft.expr.PHashAny.phash64Any]] behind
    * `graft_phash64any`) so the scan stays inside whole-stage codegen
    * (a Scala-UDF draft of this cost q122 a 35% regression on the
    * serialization boundary alone). Delegated here for the specs and the
    * column form the asset operators share. Callers coalesce null
    * payloads first (the 0L-for-null rule). */
  private[ops] def phash64Any(payload: Array[Byte]): Long =
    graft.expr.PHashAny.phash64Any(payload)

  def phashCol(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.expr.GraftFunctions.phash64Any(payload)

  /** Perceptual-hash near-duplicate report (q122): the payload-level dedup
    * the text family (q24/q63) cannot see — byte-identical reposts aside,
    * re-encoded or lightly-edited media only collide on a PERCEPTUAL hash.
    * Per asset, a 64-bit average-hash ([[phash64Any]]: decoded 8×8
    * cell-mean aHash for real images, the codegen'd
    * [[graft.expr.PHash64]] byte kernel for everything else — the
    * synthetic corpus and its oracle ride the fallback); candidate pairs
    * via banded LSH — `bands`
    * bands of `64/bands` bits, so every pair within Hamming distance
    * `bands - 1` shares at least one full band (pigeonhole) and the
    * recall floor is structural, not probabilistic; verification is an
    * exact `bit_count(xor)` on the two 8-byte hashes. Buckets are keyed
    * (modality, band, bits) — cross-modality collisions never pair — and
    * go through [[Dedup.cappedPairs]]' hot-bucket star cap, so a
    * degenerate constant-payload corpus at 100 TB costs O(bucket) not
    * O(bucket^2). Shuffled relations carry only (id, modality, 8-byte
    * hash) — the payload never leaves the scan stage.
    *
    * Returns one row per modality: asset/distinct-hash counts, candidate
    * and verified-near pair counts (Hamming <= maxHamming), and how many
    * assets sit in at least one near pair — all integers, no float
    * boundary. */
  /** Shared q122/q127 relations: the persisted (id, modality, 8-byte hash)
    * sketch frame and the persisted candidate-pair relation with exact
    * Hamming distances. Cache ownership is the house rule: Verify/Bench
    * clear after each query's action. */
  private[ops] def phashRelations(assets: DataFrame, bands: Int,
      maxHamming: Int, maxBucket: Int): (DataFrame, DataFrame) = {
    require(64 % bands == 0, s"bands=$bands must divide 64")
    require(maxHamming < bands, // keep the pigeonhole recall guarantee
      s"maxHamming=$maxHamming needs bands > maxHamming for complete recall")
    val width = 64 / bands
    graft.expr.GraftFunctions.ensureRegistered(assets.sparkSession)
    // null payloads hash like empty ones (0L) instead of null-propagating:
    // the SQL oracle's bit rule yields all-zero bits for null documents, and
    // a null hash would silently drop the asset from every bucket join —
    // degenerate rows must stay VISIBLE in the report (n_assets counts them,
    // and null/empty payloads pair as exact dups, star-capped like any
    // other hot bucket)
    val hashed = Partitioning.spread(assets)
      .select(col("asset_id").as("_id"), col("meta.modality").as("modality"),
        phashCol(coalesce(col("payload"), lit(Array.emptyByteArray))).as("_h"))
      .persist() // 3-column sketch frame, read by banding + both verify sides
    val banded = hashed.select(col("_id"), explode(array((0 until bands).map { j =>
      struct(col("modality"),
        lit(j).as("band"),
        shiftrightunsigned(col("_h"), 64 - width * (j + 1))
          .bitwiseAND(lit((1L << width) - 1)).as("bits"))
    }: _*)).as("_b"))
    val pairs = Dedup.cappedPairs(banded, maxBucket)
      .join(hashed.select(col("_id").as("idA"), col("modality"),
        col("_h").as("_hA")), "idA")
      .join(hashed.select(col("_id").as("idB"), col("_h").as("_hB")), "idB")
      .withColumn("_hd", bit_count(col("_hA").bitwiseXOR(col("_hB"))))
      .withColumn("_near", col("_hd") <= maxHamming)
      .persist() // candidate relation: read for pair counts AND near-asset ids
    (hashed, pairs)
  }

  /** Verified near-dup pairs — the relation q127's clustering consumes. */
  def phashNearPairs(assets: DataFrame, bands: Int = 4,
      maxHamming: Int = 3, maxBucket: Int = 1024): DataFrame =
    phashRelations(assets, bands, maxHamming, maxBucket)._2
      .where(col("_near"))
      .select(col("idA"), col("idB"), col("modality"), col("_hd").as("hamming"))

  def phashNearDupReport(assets: DataFrame, bands: Int = 4,
      maxHamming: Int = 3, maxBucket: Int = 1024): DataFrame = {
    val (hashed, pairs) = phashRelations(assets, bands, maxHamming, maxBucket)
    val pairStats = pairs.groupBy("modality").agg(
      count(lit(1)).as("cand_pairs"),
      sum(col("_near").cast("long")).as("near_pairs"))
    val nearAssets = pairs.where(col("_near"))
      .select(col("modality"), explode(array(col("idA"), col("idB"))).as("_id"))
      .groupBy("modality").agg(count_distinct(col("_id")).as("near_assets"))
    hashed.groupBy("modality")
      .agg(count(lit(1)).as("n_assets"), count_distinct(col("_h")).as("n_hash"))
      .join(pairStats, Seq("modality"), "left_outer")
      .join(nearAssets, Seq("modality"), "left_outer")
      .select(col("modality"), col("n_assets"), col("n_hash"),
        coalesce(col("cand_pairs"), lit(0L)).as("cand_pairs"),
        coalesce(col("near_pairs"), lit(0L)).as("near_pairs"),
        coalesce(col("near_assets"), lit(0L)).as("near_assets"))
      .orderBy("modality")
  }

  /** Incremental perceptual admission (q123) — the asset-side analogue of
    * `PortableSketch.incrementalAdmit` (q76): only the new batch is
    * screened against the standing corpus, so corpus×corpus pairs are
    * NEVER formed and the steady-state ingest cost is ∝ batch, not corpus
    * — the shape that keeps a daily admission run viable when the corpus
    * is 100 TB and the batch is a shard. A batch asset is rejected when a
    * same-modality prior — a corpus asset, or an earlier (smaller-id)
    * batch asset — shares one of its LSH bands within `maxHamming`.
    *
    * Leaner than the minhash version: the whole sketch is ONE long, so the
    * banded relation carries it (~30 bytes/row) and the verify needs no
    * signature re-join — candidate and Hamming check happen in the same
    * join. Hot-bucket cap on the prior side only, corpus rows ranked
    * first (a batch id displacing corpus witnesses could wrongly admit a
    * probe — same argument as the minhash cap), smallest ids kept
    * (deterministic; at hot-bucket scale members are interchangeable
    * witnesses). Returns the admitted rows of `batch`, schema unchanged. */
  def phashAdmit(corpus: DataFrame, batch: DataFrame, bands: Int = 4,
      maxHamming: Int = 3, maxBucket: Int = 1024): DataFrame = {
    require(64 % bands == 0, s"bands=$bands must divide 64")
    require(maxHamming < bands,
      s"maxHamming=$maxHamming needs bands > maxHamming for complete recall")
    val width = 64 / bands
    graft.expr.GraftFunctions.ensureRegistered(corpus.sparkSession)
    def banded(df: DataFrame): DataFrame = Partitioning.spread(df)
      .select(col("asset_id").as("_id"), col("meta.modality").as("modality"),
        phashCol(coalesce(col("payload"), lit(Array.emptyByteArray))).as("_h"))
      .select(col("_id"), col("modality"), col("_h"),
        explode(array((0 until bands).map { j =>
          struct(lit(j).as("band"),
            shiftrightunsigned(col("_h"), 64 - width * (j + 1))
              .bitwiseAND(lit((1L << width) - 1)).as("bits"))
        }: _*)).as("_b"))
      .select(col("_id"), col("modality"), col("_h"),
        col("_b.band").as("_band"), col("_b.bits").as("_bits"))
    val newBands = banded(batch).persist() // read by prior union + probe side
    val priorBands = banded(corpus).withColumn("_isCorpus", lit(true))
      .unionByName(newBands.withColumn("_isCorpus", lit(false)))
    // hot-key inventory is map-side-combined and tiny → broadcasts back;
    // cold buckets (all but pathologies) pass through without a sort
    val hotKeys = priorBands
      .groupBy(col("modality"), col("_band"), col("_bits"))
      .agg(count(lit(1)).as("_n")).where(col("_n") > maxBucket)
      .select(col("modality").as("_hmod"), col("_band").as("_hband"),
        col("_bits").as("_hbits"))
    val flagged = priorBands.join(broadcast(hotKeys),
      col("modality") === col("_hmod") && col("_band") === col("_hband") &&
        col("_bits") === col("_hbits"), "left_outer")
    val byBucket = org.apache.spark.sql.expressions.Window
      .partitionBy(col("modality"), col("_band"), col("_bits"))
      .orderBy(col("_isCorpus").desc, col("_id"))
    val cappedHot = flagged.where(col("_hband").isNotNull)
      .drop("_hmod", "_hband", "_hbits")
      .withColumn("_rk", row_number().over(byBucket))
      .where(col("_rk") <= maxBucket).drop("_rk")
    val capped = flagged.where(col("_hband").isNull)
      .drop("_hmod", "_hband", "_hbits")
      .unionByName(cappedHot)
    val rejected = newBands.as("nw")
      .join(capped.as("pr"),
        col("nw.modality") === col("pr.modality") &&
          col("nw._band") === col("pr._band") &&
          col("nw._bits") === col("pr._bits") &&
          (col("pr._isCorpus") || col("pr._id") < col("nw._id")))
      .where(bit_count(col("nw._h").bitwiseXOR(col("pr._h"))) <= maxHamming)
      .select(col("nw._id").as("_rejId")).distinct()
    batch.join(rejected, col("asset_id") === col("_rejId"), "left_anti")
  }
}
