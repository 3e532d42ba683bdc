package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus batched decode /
  * feature-extraction operators.
  *
  * IMAGE, VIDEO, and AUDIO decode are all REAL, pure JDK:
  * [[ImageCodec]] round-trips 8-bit grayscale PNGs through
  * `javax.imageio`; [[MediaCodecs.AviCodec]] parses RIFF/AVI
  * containers (uncompressed DIB frames losslessly, MJPEG via the
  * ImageIO JPEG reader) behind [[decodeVideoFrameFeatures]]; and
  * [[MediaCodecs.WavCodec]] runs 16-bit PCM WAV through
  * `javax.sound.sampled` behind [[decodeAudioFeatures]]. The
  * embedding featurizer ([[Featurizer]]) is a seeded ±1
  * random-projection over the DECODED content — no learned model can
  * run in the sandbox, but sign projections are the classic
  * model-free embedding (Achlioptas 2001) and, unlike a stub, their
  * output is a real vector the ANN stack can index. The Spark-side
  * contract is uniform — binary column + metadata struct schema,
  * batch iteration via mapPartitions (one codec init per task,
  * amortized over the partition like an Arrow/pandas batch UDF),
  * partition sizing by payload bytes.
  */
object Multimodal {

  // Same guard as MediaCodecs: ImageIO's default FILE-backed stream
  // cache costs a temp file per encode/decode. Set here too so a JVM
  // that only touches ImageCodec (never the AVI/WAV codecs) still
  // runs cache-free.
  javax.imageio.ImageIO.setUseCache(false)

  /** Typed metadata carried alongside every payload. */
  final case class MediaMeta(
      mediaType: String, // "image" | "audio" | "video"
      nBytes: Long,
      sha: String,
      width: Int,   // declared dims (real callers pass decoded dims;
      height: Int)  // withMediaColumns derives hash placeholders)

  final case class MediaRow(
      media_id: Long,
      payload: Array[Byte],
      meta: MediaMeta)

  final case class MediaFeatures(
      media_id: Long,
      features: Array[Float])

  final case class ImageFeatures(
      media_id: Long,
      width: Int,
      height: Int,
      px_sum: Long,
      px_min: Int,
      px_max: Int,
      px_hash: Long)

  final case class FrameFeatures(
      media_id: Long,
      frame_idx: Int,
      width: Int,
      height: Int,
      px_sum: Long,
      px_min: Int,
      px_max: Int,
      px_hash: Long)

  final case class AudioFeatures(
      media_id: Long,
      sample_rate: Int,
      n_samples: Int,
      amp_min: Int,
      amp_max: Int,
      amp_sum: Long,
      amp_hash: Long)

  /** Real image codec over `javax.imageio` (JDK built-in): 8-bit
    * grayscale PNG encode/decode. PNG is lossless, so decoded samples
    * are bit-identical to the encoded raster — which is what lets the
    * correctness gate compare decoded pixel statistics against an
    * oracle that knows the source pixels. */
  object ImageCodec {
    def encodePng(width: Int, height: Int,
        pixels: Array[Byte]): Array[Byte] = {
      require(pixels.length == width * height,
        s"expected ${width * height} samples, got ${pixels.length}")
      val img = new java.awt.image.BufferedImage(width, height,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      img.getRaster.setDataElements(0, 0, width, height, pixels)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Decode any ImageIO-supported payload (PNG/JPEG/BMP/GIF) to
      * (width, height, row-major band-0 samples). The feature contract
      * downstream is 8-bit samples (the oracle recomputes stats over
      * byte-range pixels), so deeper rasters — e.g. 16-bit PNGs, which
      * ImageIO happily decodes — are rejected here rather than
      * silently mis-scaled. */
    def decode(payload: Array[Byte]): (Int, Int, Array[Int]) = {
      val img = javax.imageio.ImageIO
        .read(new java.io.ByteArrayInputStream(payload))
      require(img != null, "payload is not a decodable image")
      val bits = img.getRaster.getSampleModel.getSampleSize(0)
      require(bits <= 8,
        s"decode: expected <=8-bit samples, got $bits-bit (band 0); " +
          "re-encode to an 8-bit raster before feature extraction")
      val w = img.getWidth
      val h = img.getHeight
      val samples =
        img.getRaster.getSamples(0, 0, w, h, 0, null: Array[Int])
      (w, h, samples)
    }
  }

  /** Batched REAL image decode: mapPartitions so ImageIO's reader
    * machinery warms once per task and payloads stream through in
    * partition-sized batches. Emits per-image statistics over the
    * decoded raster (sum/min/max and a base-31 mod-1e9+7 rolling hash
    * of the row-major samples — an exact-content witness the oracle
    * can recompute without a decoder). */
  def decodeImageFeatures(media: Dataset[MediaRow])
      : Dataset[ImageFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, px) = ImageCodec.decode(r.payload)
        var sum = 0L
        // Seed extrema from the sample domain's identity elements, not
        // an assumed 8-bit ceiling — decode enforces the 8-bit contract
        // but the stats stay correct for any sample depth.
        var min = Int.MaxValue
        var max = Int.MinValue
        var hash = 0L
        var i = 0
        while (i < px.length) {
          val p = px(i)
          sum += p
          if (p < min) min = p
          if (p > max) max = p
          hash = (hash * 31 + p) % 1000000007L
          i += 1
        }
        ImageFeatures(r.media_id, w, h, sum, min, max, hash)
      }
    }
  }

  /** Batched REAL video decode: parse the AVI container
    * ([[MediaCodecs.AviCodec]] — uncompressed 8-bit DIB and MJPEG,
    * pure JDK), stride-sample frames, and emit per-sampled-frame
    * pixel statistics (same sum/min/max/rolling-hash witness as
    * [[decodeImageFeatures]], recomputable by an oracle that knows
    * the source raster). flatMap shape: one video row → N frame
    * rows. `stride` keeps the output volume bounded — a 100 TB crawl
    * samples every k-th frame, it does not explode every frame. */
  def decodeVideoFrameFeatures(media: Dataset[MediaRow],
      stride: Int = 2): Dataset[FrameFeatures] = {
    require(stride > 0, "stride must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        // Parse once, decode ONLY the sampled frames — at stride k,
        // decode-everything-then-sample does k times the codec work.
        val v = MediaCodecs.AviCodec.parse(r.payload)
        (0 until v.frameCount by stride).iterator.map { f =>
          val px = v.frame(f)
          var sum = 0L
          var min = Int.MaxValue
          var max = Int.MinValue
          var hash = 0L
          var i = 0
          while (i < px.length) {
            val p = px(i)
            sum += p
            if (p < min) min = p
            if (p > max) max = p
            hash = (hash * 31 + p) % 1000000007L
            i += 1
          }
          FrameFeatures(r.media_id, f, v.width, v.height, sum, min,
            max, hash)
        }
      }
    }
  }

  /** Batched REAL audio decode: 16-bit PCM through the JDK audio
    * stack ([[MediaCodecs.WavCodec]]); emits per-clip amplitude
    * statistics. The rolling hash shifts samples by +32768 so the
    * fold stays over non-negative values — truncated `%` then agrees
    * between JVM and SQL engines regardless of sign conventions. */
  def decodeAudioFeatures(media: Dataset[MediaRow])
      : Dataset[AudioFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (rate, ss) = MediaCodecs.WavCodec.decodePcm16(r.payload)
        var sum = 0L
        var min = Int.MaxValue
        var max = Int.MinValue
        var hash = 0L
        var i = 0
        while (i < ss.length) {
          val s = ss(i)
          sum += s
          if (s < min) min = s
          if (s > max) max = s
          hash = (hash * 31 + (s + 32768)) % 1000000007L
          i += 1
        }
        AudioFeatures(r.media_id, rate, ss.length, min, max, sum,
          hash)
      }
    }
  }

  /** Batched REAL image resize: decode ([[ImageCodec]]), nearest-
    * neighbor downsample to `dstW` x `dstH` (dst(x,y) = src at
    * (floor(y*srcH/dstH), floor(x*srcW/dstW)) — integer index math,
    * so an oracle can recompute every resized pixel from the source
    * raster without an image library), and emit the same pixel-stat
    * witness as [[decodeImageFeatures]] over the RESIZED raster.
    * Nearest-neighbor is the deterministic baseline of the usual
    * thumbnail/embedding-prep step; a box-filter variant changes only
    * the per-pixel kernel, not the dataflow. */
  def resizeImageFeatures(media: Dataset[MediaRow], dstW: Int,
      dstH: Int): Dataset[ImageFeatures] = {
    require(dstW > 0 && dstH > 0, "bad target dims")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, px) = ImageCodec.decode(r.payload)
        var sum = 0L
        var min = Int.MaxValue
        var max = Int.MinValue
        var hash = 0L
        var y = 0
        while (y < dstH) {
          val sy = y.toLong * h / dstH
          var x = 0
          while (x < dstW) {
            val sx = x.toLong * w / dstW
            val p = px((sy * w + sx).toInt)
            sum += p
            if (p < min) min = p
            if (p > max) max = p
            hash = (hash * 31 + p) % 1000000007L
            x += 1
          }
          y += 1
        }
        ImageFeatures(r.media_id, dstW, dstH, sum, min, max, hash)
      }
    }
  }

  final case class ImageHash(
      media_id: Long,
      dhash: Long)

  /** dHash of a raw raster: nearest-neighbor resize to `size` x
    * `size` (same integer index mapping as [[resizeImageFeatures]]),
    * then one bit per horizontally-adjacent pixel pair — bit
    * (y*(size-1)+x) set iff px(x,y) > px(x+1,y). Shared by
    * [[imageDHash]] and [[videoSignature]]. */
  private def dhashOf(px: Array[Int], w: Int, h: Int,
      size: Int): Long = {
    var hash = 0L
    var y = 0
    while (y < size) {
      val sy = y.toLong * h / size
      var x = 0
      while (x < size - 1) {
        val a = px((sy * w + x.toLong * w / size).toInt)
        val b = px((sy * w + (x + 1).toLong * w / size).toInt)
        if (a > b) hash |= 1L << (y * (size - 1) + x)
        x += 1
      }
      y += 1
    }
    hash
  }

  /** Perceptual image hash (dHash, the public difference-hash
    * algorithm): decode then [[dhashOf]]. `size`=8 gives 56 bits,
    * safely inside a signed 64-bit value for any SQL engine an
    * oracle runs on. Identical-content images collide exactly;
    * re-encoded or slightly-resized copies collide with high
    * probability — the standard cheap multimodal dedup key, here as
    * the composition decode -> resize -> hash in one batched pass. */
  def imageDHash(media: Dataset[MediaRow], size: Int = 8)
      : Dataset[ImageHash] = {
    require(size >= 2 && (size - 1).toLong * size <= 63,
      "size must give at most 63 hash bits")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, px) = ImageCodec.decode(r.payload)
        ImageHash(r.media_id, dhashOf(px, w, h, size))
      }
    }
  }

  final case class AudioWindow(
      media_id: Long,
      win_idx: Int,
      energy: Long,
      peak: Int,
      win_hash: Long)

  /** Batched REAL audio feature extraction: decode
    * ([[MediaCodecs.WavCodec]]) and emit per-window features over
    * non-overlapping `window`-sample frames — energy (sum of squared
    * amplitudes), peak (max |amplitude|), and the +32768-shifted
    * rolling hash as the exact-content witness. The trailing partial
    * window is dropped (fixed-shape frames, as a spectrogram/feature
    * model consumes them). flatMap shape: one clip → N window rows. */
  def audioWindowFeatures(media: Dataset[MediaRow],
      window: Int = 256): Dataset[AudioWindow] = {
    require(window > 0, "window must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val (_, ss) = MediaCodecs.WavCodec.decodePcm16(r.payload)
        (0 until ss.length / window).iterator.map { wi =>
          var energy = 0L
          var peak = 0
          var hash = 0L
          var i = wi * window
          val end = i + window
          while (i < end) {
            val s = ss(i)
            energy += s.toLong * s
            val a = math.abs(s)
            if (a > peak) peak = a
            hash = (hash * 31 + (s + 32768)) % 1000000007L
            i += 1
          }
          AudioWindow(r.media_id, wi, energy, peak, hash)
        }
      }
    }
  }

  final case class VideoSignature(
      media_id: Long,
      n_frames: Int,
      n_sampled: Int,
      sig: Long)

  /** Perceptual video signature: parse the AVI container, decode only
    * every `stride`-th frame, dHash each ([[imageDHash]] mapping on
    * the raw frame raster), and fold the per-frame hashes into one
    * order-sensitive base-31 rolling value (each 56-bit dHash reduced
    * mod 1e9+7 first so the fold stays portable int64). Identical
    * videos collide exactly; re-encoded or lightly-edited copies
    * collide per-frame with high probability — frame order matters,
    * so a shuffled cut does NOT collide (unlike a bag-of-frames
    * signature). The video analogue of [[imageDHash]]/
    * [[audioFingerprint]] for hash-keyed near-dup grouping. */
  def videoSignature(media: Dataset[MediaRow], stride: Int = 2,
      size: Int = 8): Dataset[VideoSignature] = {
    require(stride > 0, "stride must be positive")
    require(size >= 2 && (size - 1).toLong * size <= 63,
      "size must give at most 63 hash bits")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val v = MediaCodecs.AviCodec.parse(r.payload)
        var sig = 0L
        var sampled = 0
        var f = 0
        while (f < v.frameCount) {
          val hash = dhashOf(v.frame(f), v.width, v.height, size)
          sig = (sig * 31 + hash % 1000000007L) % 1000000007L
          sampled += 1
          f += stride
        }
        VideoSignature(r.media_id, v.frameCount, sampled, sig)
      }
    }
  }

  final case class AudioFingerprint(
      media_id: Long,
      fp: Long,
      n_windows: Int)

  /** Perceptual audio fingerprint (the energy-delta-sign scheme of
    * Haitsma & Kalker's classic audio fingerprinting, reduced to one
    * band): decode, window the samples ([[audioWindowFeatures]]
    * geometry), then one bit per consecutive window pair — bit i-1
    * set iff energy(window i) > energy(window i-1). Capped at 63
    * bits so the key stays in signed-64 range for SQL oracles.
    * Identical clips collide exactly; volume-scaled or re-encoded
    * copies collide with high probability — the audio analogue of
    * [[imageDHash]], feeding the same hash-keyed exact-dup grouping. */
  def audioFingerprint(media: Dataset[MediaRow], window: Int = 16)
      : Dataset[AudioFingerprint] = {
    require(window > 0, "window must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (_, ss) = MediaCodecs.WavCodec.decodePcm16(r.payload)
        val n = ss.length / window
        var fp = 0L
        var prev = -1L
        var wi = 0
        while (wi < n) {
          var energy = 0L
          var i = wi * window
          val end = i + window
          while (i < end) {
            energy += ss(i).toLong * ss(i)
            i += 1
          }
          if (wi > 0 && wi <= 63 && energy > prev)
            fp |= 1L << (wi - 1)
          prev = energy
          wi += 1
        }
        AudioFingerprint(r.media_id, fp, n)
      }
    }
  }

  /** Seeded random-projection featurizer: a fixed ±1 sign-projection
    * matrix (Achlioptas, "Database-friendly random projections", PODS
    * 2001 — sign projections preserve inner products in expectation)
    * applied to DECODED media content — pixels for images and video
    * frames, PCM samples for audio — never raw container bytes. The
    * matrix entries derive deterministically from `byteswap64`, the
    * same plan-time derivation as the LSH hyperplane signs
    * ([[Dedup.planeSign]]): no RNG state, identical on every run and
    * restatable literal-for-literal in an external SQL oracle. Each
    * output dimension is an integer dot product, carried as Float in
    * [[MediaFeatures]] — exact ONLY while |dot| <= 2^24 (Float's
    * contiguous-integer range). Random ±1 signs keep typical sums
    * near sqrt(n)·E|v| (a megapixel raster lands ~1e5), but the bound
    * is not guaranteed: [[decodeFeatures]] verifies exact
    * representability per component and fails loudly on overflow
    * rather than silently rounding the bit-exact-oracle contract
    * away. */
  object Featurizer {
    /** Component (j, i) of the fixed projection matrix: ±1 from a
      * byteswap64 hash of the (dimension, index) pair. */
    def weight(j: Int, i: Int): Int =
      if (scala.util.hashing.byteswap64(
        j.toLong * 7368787L + i) % 2 == 0) 1 else -1

    /** Project integer-valued content onto `d` signed sums. */
    def project(values: Array[Int], d: Int): Array[Long] = {
      val out = new Array[Long](d)
      var j = 0
      while (j < d) {
        var acc = 0L
        var i = 0
        while (i < values.length) {
          acc += values(i) * weight(j, i)
          i += 1
        }
        out(j) = acc
        j += 1
      }
      out
    }
  }

  /** Attach payload + metadata columns to rows that carry raw bytes.
    * Metadata derivation (size, digest) is pure column work; the fake
    * width/height come from a deterministic hash of the digest so the
    * whole row stays expression-only (no decode on the hot path). */
  def withMediaColumns(df: DataFrame, bytesCol: String,
      mediaType: String): DataFrame =
    df
      .withColumn("payload", col(bytesCol))
      .withColumn("meta", struct(
        lit(mediaType).as("mediaType"),
        octet_length(col("payload")).cast("long").as("nBytes"),
        sha1(col("payload")).as("sha"),
        (pmod(xxhash64(col("payload")), lit(1920L)) + 64)
          .cast("int").as("width"),
        (pmod(xxhash64(lit(7), col("payload")), lit(1080L)) + 64)
          .cast("int").as("height")))

  /** Batched decode+featurize: decode the payload by its declared
    * media type (PNG pixels, PCM samples, AVI frame pixels — the same
    * REAL codecs as the per-type feature operators) and project the
    * decoded content through the fixed ±1 matrix ([[Featurizer]]) to
    * a `d`-dim vector. mapPartitions so codec initialization happens
    * once per task and payloads stream through in partition-sized
    * batches — the Scala analogue of the mapInPandas batch shape.
    * Repartition upstream by expected payload bytes (see
    * [[repartitionByBytes]]) so a batch fits executor memory.
    *
    * Unknown media types project the raw payload bytes — the
    * documented fallback for container formats with no sandbox
    * decoder; everything the engine can decode is featurized over
    * CONTENT, which is what makes the output vectors meaningful keys
    * for the ANN stack ([[Similarity]]). */
  def decodeFeatures(media: Dataset[MediaRow], d: Int = 8,
      videoStride: Int = 2): Dataset[MediaFeatures] = {
    require(d > 0, "feature dimension must be positive")
    require(videoStride > 0, "videoStride must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val content: Array[Int] = r.meta.mediaType match {
          case "image" => ImageCodec.decode(r.payload)._3
          case "audio" => MediaCodecs.WavCodec.decodePcm16(r.payload)._2
          case "video" =>
            // Stride-sampled frames, as everywhere on the video path:
            // featurize cost stays bounded per payload instead of
            // scaling with raw frame count.
            val v = MediaCodecs.AviCodec.parse(r.payload)
            (0 until v.frameCount by videoStride).toArray
              .flatMap(v.frame)
          case _ => r.payload.map(_ & 0xFF)
        }
        MediaFeatures(r.media_id,
          Featurizer.project(content, d).map { l =>
            val f = l.toFloat
            // |dot| beyond 2^24 silently rounds in Float; refuse —
            // downstream oracles assume bit-exact integer features.
            if (f.toLong != l) throw new IllegalArgumentException(
              s"media ${r.media_id}: feature dot $l exceeds Float's " +
                "exact-integer range (2^24) — raster too large for " +
                "the Float feature contract")
            f
          })
      }
    }
  }

  /** Frame sampling over video payloads: parse the AVI container
    * ([[MediaCodecs.AviCodec.parse]] — header walk only, no pixel
    * decode) and emit every `stride`-th frame's RAW chunk bytes at
    * the parse-exposed offsets. flatMap shape — one input row to N
    * frame rows. The sampler's contract is frame EXTRACTION (feeding
    * downstream per-frame decode/featurize stages); decode stays with
    * [[decodeVideoFrameFeatures]].
    *
    * Payloads that are not AVI containers at all (no RIFF/AVI magic)
    * fall back to a documented byte-slice path — every `stride`-th
    * 1 KiB slice becomes a "frame" — preserving the 1→N contract for
    * formats the sandbox cannot parse. A payload that CLAIMS to be
    * an AVI but fails mid-parse is corrupt, not foreign: it
    * propagates the codec's descriptive error instead of silently
    * degrading to byte slices. */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 4)
      : DataFrame = {
    require(stride > 0, "stride must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { r =>
      val parsed =
        if (MediaCodecs.AviCodec.hasAviMagic(r.payload))
          Some(MediaCodecs.AviCodec.parse(r.payload))
        else None
      parsed match {
        case Some(v) =>
          (0 until v.frameCount by stride).map { f =>
            val (pos, len, _) = v.frameChunks(f)
            (r.media_id, f,
              java.util.Arrays.copyOfRange(r.payload, pos, pos + len))
          }
        case None => // byte-slice fallback for unparseable payloads
          val frameSize = 1024
          val nFrames = math.max(1, r.payload.length / frameSize)
          (0 until nFrames by stride).map { i =>
            val from = i * frameSize
            val until = math.min(from + frameSize, r.payload.length)
            (r.media_id, i,
              java.util.Arrays.copyOfRange(r.payload, from, until))
          }
      }
    }.toDF("media_id", "frame_idx", "frame_bytes")
  }

  /** Size partitions by payload volume, not row count: media rows are
    * wildly skewed (a 4 KiB icon vs a 2 GiB video), so partition count
    * derives from total bytes / target bytes per partition. */
  def repartitionByBytes(df: DataFrame, targetBytesPerPartition: Long =
      128L * 1024 * 1024): DataFrame = {
    val totalBytes = df.agg(sum(octet_length(col("payload"))))
      .head().getLong(0)
    val parts = math.max(1,
      (totalBytes / targetBytesPerPartition).toInt)
    df.repartition(parts, col("media_id"))
  }
}
