package graft.llm

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

/** REAL pure-JVM media codecs for the multimodal operators — no
  * external media libraries, only JDK built-ins.
  *
  *  - [[AviCodec]]: a standard RIFF/AVI container codec. Encodes and
  *    decodes uncompressed 8-bit palettized DIB video (`00db` frame
  *    chunks, `BI_RGB`, bottom-up rows, 4-byte row stride — the
  *    classic "uncompressed AVI") and decodes MJPEG (`00dc` chunks,
  *    `MJPG` fourcc) by handing each frame to `javax.imageio`'s JPEG
  *    reader. DIB is lossless, so decoded pixel statistics can be
  *    gated bit-exactly against an oracle that knows the source
  *    raster (same strategy as the PNG image gate, mm02).
  *  - [[WavCodec]]: 16-bit PCM mono WAV. Encoding writes the RIFF
  *    `WAVE` layout directly; decoding goes through
  *    `javax.sound.sampled.AudioSystem` — the real JDK audio stack —
  *    so the gate exercises an actual third-party-grade parser, not
  *    our own inverse. PCM is lossless: sample stats gate exactly.
  *
  * Reference behavior being re-expressed: the reference treats media
  * payloads as opaque blobs and shells out to codecs at the edge
  * (Parquet Export/README.md:1 describes the export pipeline; no
  * in-engine decode exists there). Here decode is a first-class
  * batched operator (see [[Multimodal.decodeVideoFrameFeatures]] /
  * [[Multimodal.decodeAudioFeatures]]) with the per-task-init
  * `mapPartitions` shape a 100 TB media crawl needs.
  */
object MediaCodecs {

  // ImageIO defaults to a FILE-backed stream cache: every read/write
  // creates a temp file — disk I/O per row and /tmp contention across
  // 32 decode threads. Memory cache is strictly better for our
  // payload sizes (whole payloads are already in memory).
  javax.imageio.ImageIO.setUseCache(false)

  private def fourcc(s: String): Int = {
    require(s.length == 4, s"fourcc must be 4 chars: '$s'")
    (s(0) & 0xFF) | ((s(1) & 0xFF) << 8) | ((s(2) & 0xFF) << 16) |
      ((s(3) & 0xFF) << 24)
  }

  /** RIFF/AVI video codec. Public container spec (Microsoft "AVI RIFF
    * File Reference"); layout written here:
    * {{{
    * RIFF('AVI '
    *   LIST('hdrl' avih(56) LIST('strl' strh(56) strf(40[+palette])))
    *   LIST('movi' 00db|00dc ...)
    *   idx1)
    * }}}
    */
  object AviCodec {
    val FccRiff = fourcc("RIFF")
    val FccAvi = fourcc("AVI ")
    val FccList = fourcc("LIST")
    val FccHdrl = fourcc("hdrl")
    val FccAvih = fourcc("avih")
    val FccStrl = fourcc("strl")
    val FccStrh = fourcc("strh")
    val FccStrf = fourcc("strf")
    val FccMovi = fourcc("movi")
    val FccVids = fourcc("vids")
    val FccDib = fourcc("DIB ")
    val FccMjpg = fourcc("MJPG")
    val FccIdx1 = fourcc("idx1")
    val Fcc00db = fourcc("00db")
    val Fcc00dc = fourcc("00dc")

    /** Decoded video: dims + per-frame row-major 8-bit samples. */
    final case class Video(width: Int, height: Int,
        microSecPerFrame: Int, frames: Vector[Array[Int]])

    /** Parsed container with frames still encoded: dims + the
      * (offset, length, isCompressed) of every frame chunk. Lets a
      * stride-sampling consumer decode ONLY the frames it keeps —
      * at stride k, decoding everything first would do k times the
      * work for the same output. `topDown` records a negative
      * BITMAPINFOHEADER height (legal per the DIB spec): rows are
      * already in natural order and must NOT be flipped. */
    final case class Parsed(payload: Array[Byte], width: Int,
        height: Int, bitCount: Int, compression: Int,
        microSecPerFrame: Int, frameChunks: Vector[(Int, Int, Boolean)],
        topDown: Boolean = false) {
      def frameCount: Int = frameChunks.length
      /** Decode frame `i` to row-major 8-bit samples. */
      def frame(i: Int): Array[Int] = {
        val (pos, len, compressed) = frameChunks(i)
        if (compressed || compression == FccMjpg)
          decodeJpegFrame(payload, pos, len, width, height)
        else decodeDibFrame(payload, pos, len, width, height, bitCount,
          topDown)
      }
    }

    private def dibStride(width: Int): Int = (width + 3) & ~3

    /** Encode 8-bit grayscale frames as an uncompressed palettized
      * DIB AVI. `frames` are top-down row-major samples (the natural
      * raster order); rows are flipped to DIB's bottom-up layout and
      * padded to the 4-byte stride on the way in. Lossless. */
    def encodeDib(width: Int, height: Int, fps: Int,
        frames: Seq[Array[Byte]]): Array[Byte] = {
      require(width > 0 && height > 0 && fps > 0, "bad dims/fps")
      require(frames.nonEmpty, "need at least one frame")
      frames.foreach(f => require(f.length == width * height,
        s"frame must carry ${width * height} samples, got ${f.length}"))
      val stride = dibStride(width)
      val frameBytes = stride * height

      def chunk(fcc: Int, body: Array[Byte]): Array[Byte] = {
        val pad = body.length & 1 // RIFF chunks are word-aligned
        val bb = ByteBuffer.allocate(8 + body.length + pad)
          .order(ByteOrder.LITTLE_ENDIAN)
        bb.putInt(fcc).putInt(body.length).put(body)
        bb.array()
      }
      def list(listType: Int, body: Array[Byte]): Array[Byte] = {
        val bb = ByteBuffer.allocate(12 + body.length)
          .order(ByteOrder.LITTLE_ENDIAN)
        bb.putInt(FccList).putInt(4 + body.length).putInt(listType)
          .put(body)
        bb.array()
      }

      val avih = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      avih.putInt(1000000 / fps) // dwMicroSecPerFrame
        .putInt(frameBytes * fps) // dwMaxBytesPerSec
        .putInt(0) // dwPaddingGranularity
        .putInt(0x10) // dwFlags: AVIF_HASINDEX
        .putInt(frames.length) // dwTotalFrames
        .putInt(0) // dwInitialFrames
        .putInt(1) // dwStreams
        .putInt(frameBytes) // dwSuggestedBufferSize
        .putInt(width).putInt(height)
      // dwReserved[4] left zero

      val strh = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      strh.putInt(FccVids).putInt(FccDib)
        .putInt(0) // dwFlags
        .putInt(0) // wPriority + wLanguage
        .putInt(0) // dwInitialFrames
        .putInt(1) // dwScale
        .putInt(fps) // dwRate
        .putInt(0) // dwStart
        .putInt(frames.length) // dwLength
        .putInt(frameBytes) // dwSuggestedBufferSize
        .putInt(-1) // dwQuality
        .putInt(0) // dwSampleSize
        .putShort(0.toShort).putShort(0.toShort)
        .putShort(width.toShort).putShort(height.toShort) // rcFrame

      // BITMAPINFOHEADER + 256-entry grayscale palette (8-bit DIB).
      val strf = ByteBuffer.allocate(40 + 256 * 4)
        .order(ByteOrder.LITTLE_ENDIAN)
      strf.putInt(40).putInt(width).putInt(height)
        .putShort(1).putShort(8) // planes, bitcount
        .putInt(0) // biCompression = BI_RGB
        .putInt(frameBytes) // biSizeImage
        .putInt(0).putInt(0) // pels/meter
        .putInt(256).putInt(0) // clrUsed, clrImportant
      var c = 0
      while (c < 256) { // palette entry i = gray level i (BGRA order)
        strf.put(c.toByte).put(c.toByte).put(c.toByte).put(0.toByte)
        c += 1
      }

      val hdrl = list(FccHdrl,
        chunk(FccAvih, avih.array()) ++
          list(FccStrl,
            chunk(FccStrh, strh.array()) ++
              chunk(FccStrf, strf.array())))

      val moviBody = new ByteArrayOutputStream()
      val idxBody = ByteBuffer.allocate(16 * frames.length)
        .order(ByteOrder.LITTLE_ENDIAN)
      var moviOffset = 4 // offsets in idx1 count from 'movi' fourcc
      frames.foreach { f =>
        val dib = new Array[Byte](frameBytes)
        var y = 0
        while (y < height) { // flip to bottom-up rows
          System.arraycopy(f, y * width, dib,
            (height - 1 - y) * stride, width)
          y += 1
        }
        moviBody.write(chunk(Fcc00db, dib))
        idxBody.putInt(Fcc00db).putInt(0x10) // AVIIF_KEYFRAME
          .putInt(moviOffset).putInt(frameBytes)
        moviOffset += 8 + frameBytes + (frameBytes & 1)
      }
      val movi = list(FccMovi, moviBody.toByteArray)
      val idx1 = chunk(FccIdx1, idxBody.array())

      val body = hdrl ++ movi ++ idx1
      val out = ByteBuffer.allocate(12 + body.length)
        .order(ByteOrder.LITTLE_ENDIAN)
      out.putInt(FccRiff).putInt(4 + body.length).putInt(FccAvi)
        .put(body)
      out.array()
    }

    private def decodeDibFrame(payload: Array[Byte], pos: Int,
        len: Int, width: Int, height: Int, bitCount: Int,
        topDown: Boolean): Array[Int] = {
      require(bitCount == 8,
        s"only 8-bit DIB frames supported, got $bitCount-bit")
      val stride = dibStride(width)
      require(len >= stride * height,
        s"DIB frame truncated: $len < ${stride * height}")
      val px = new Array[Int](width * height)
      var y = 0
      while (y < height) {
        // Bottom-up rows (positive biHeight, the common case) flip to
        // top-down sample order; top-down DIBs (negative biHeight,
        // legal per the spec) are already in natural order.
        val row = pos + (if (topDown) y else height - 1 - y) * stride
        var x = 0
        while (x < width) {
          px(y * width + x) = payload(row + x) & 0xFF
          x += 1
        }
        y += 1
      }
      px
    }

    private def decodeJpegFrame(payload: Array[Byte], pos: Int,
        len: Int, width: Int, height: Int): Array[Int] = {
      val decoded = javax.imageio.ImageIO.read(
        new ByteArrayInputStream(payload, pos, len))
      require(decoded != null, "MJPG frame is not a decodable JPEG")
      require(decoded.getWidth == width && decoded.getHeight == height,
        s"frame dims ${decoded.getWidth}x${decoded.getHeight} disagree " +
          s"with stream header ${width}x$height")
      // Color MJPEG decodes to a 3-band RGB raster whose band 0 is the
      // RED channel, not luma — convert to grayscale first so pixel
      // stats and dHashes are over luma for color and grayscale frames
      // alike (drawImage routes through ColorConvertOp's colorimetric
      // RGB->gray, deterministic on one JVM).
      val img =
        if (decoded.getRaster.getNumBands == 1) decoded
        else {
          val g = new java.awt.image.BufferedImage(width, height,
            java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val gg = g.createGraphics()
          try gg.drawImage(decoded, 0, 0, null) finally gg.dispose()
          g
        }
      img.getRaster.getSamples(0, 0, width, height, 0,
        null: Array[Int])
    }

    /** Whether the payload carries the RIFF/AVI container magic — the
      * single definition of "claims to be an AVI", shared by [[parse]]
      * and the dispatch in `Multimodal.sampleFrames` so the two can
      * never drift (a payload passing here but failing [[parse]] is
      * corrupt, not foreign). */
    def hasAviMagic(payload: Array[Byte]): Boolean = {
      val bb = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
      payload.length >= 12 && bb.getInt(0) == FccRiff &&
        bb.getInt(8) == FccAvi
    }

    /** Parse the container WITHOUT decoding frames: header fields +
      * frame chunk locations. Unknown chunks (idx1, strn, JUNK,
      * vendor chunks) are skipped, per the RIFF contract. Fails fast
      * with a descriptive error on anything that is not a
      * video-bearing AVI. */
    def parse(payload: Array[Byte]): Parsed = {
      val bb = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
      require(hasAviMagic(payload), "payload is not a RIFF AVI")
      val riffEnd = math.min(payload.length.toLong, 8L + bb.getInt(4))

      var width = -1
      var height = -1
      var bitCount = -1
      var compression = -1
      var microSecPerFrame = 0
      var topDown = false
      // fccType of the most recent strh: an AVI interleaves multiple
      // strl lists (video + audio); each strl's strf must be
      // interpreted against ITS strh — taking the first strf blindly
      // would misparse an audio-first AVI's WAVEFORMATEX as a
      // BITMAPINFOHEADER (width = sample rate).
      var curStreamType = 0
      val chunks = Vector.newBuilder[(Int, Int, Boolean)]

      // Walk a chunk range [pos, end); RIFF chunks are word-aligned.
      def walk(pos0: Long, end: Long, inMovi: Boolean): Unit = {
        var pos = pos0
        while (pos + 8 <= end) {
          val fcc = bb.getInt(pos.toInt)
          val size = bb.getInt(pos.toInt + 4).toLong & 0xFFFFFFFFL
          val dataPos = pos + 8
          require(dataPos + size <= end,
            s"chunk overruns container at offset $pos")
          if (fcc == FccList) {
            require(size >= 4,
              s"LIST chunk too small for a list type at offset $pos")
            val listType = bb.getInt(dataPos.toInt)
            walk(dataPos + 4, dataPos + size,
              inMovi || listType == FccMovi)
          } else if (fcc == FccAvih) {
            require(size >= 4, s"avih chunk truncated at offset $pos")
            microSecPerFrame = bb.getInt(dataPos.toInt)
          } else if (fcc == FccStrh) {
            require(size >= 4, s"strh chunk truncated at offset $pos")
            curStreamType = bb.getInt(dataPos.toInt)
          } else if (fcc == FccStrf && curStreamType == FccVids &&
              width < 0) {
            // BITMAPINFOHEADER of the video stream (only — an audio
            // strl's strf is a WAVEFORMATEX and is skipped).
            require(size >= 18, s"strf chunk truncated at offset $pos")
            width = bb.getInt(dataPos.toInt + 4)
            val rawHeight = bb.getInt(dataPos.toInt + 8)
            topDown = rawHeight < 0 // negative = top-down DIB rows
            height = math.abs(rawHeight)
            bitCount = bb.getShort(dataPos.toInt + 14).toInt
            compression = bb.getInt(dataPos.toInt + 16)
          } else if (inMovi &&
              (fcc == Fcc00db || fcc == Fcc00dc)) {
            require(width > 0 && height > 0,
              "frame chunk before any vids stream format header")
            chunks += ((dataPos.toInt, size.toInt, fcc == Fcc00dc))
          } // else: skip (idx1, audio strf, strn, JUNK, ...)
          pos = dataPos + size + (size & 1)
        }
      }

      walk(12, riffEnd, inMovi = false)
      require(width > 0 && height > 0,
        "no vids stream format found (payload has no video stream)")
      Parsed(payload, width, height, bitCount, compression,
        microSecPerFrame, chunks.result(), topDown)
    }

    /** Parse an AVI payload and decode EVERY frame to row-major
      * 8-bit samples. Stride-sampling consumers should use
      * [[parse]] + [[Parsed.frame]] instead and decode only the
      * frames they keep. */
    def decode(payload: Array[Byte]): Video = {
      val p = parse(payload)
      Video(p.width, p.height, p.microSecPerFrame,
        Vector.tabulate(p.frameCount)(p.frame))
    }
  }

  /** 16-bit PCM mono WAV codec. Encode writes the RIFF `WAVE` layout
    * directly; [[WavCodec.decodePcm16]] parses the container with the
    * same RIFF machinery as [[AviCodec]] — `AudioSystem` is NOT on
    * the row path because `getAudioInputStream` goes through a
    * synchronized provider lookup per call, which serializes a
    * 32-thread decode stage (measured: 3.6x slower than one thread).
    * [[WavCodec.decodePcm16ViaAudioSystem]] keeps the JDK audio stack
    * available as the cross-validation anchor (the spec asserts both
    * decoders agree bit-for-bit on encoder output). */
  object WavCodec {

    /** Encode signed 16-bit mono samples at `sampleRate` Hz. */
    def encodePcm16(sampleRate: Int,
        samples: Array[Short]): Array[Byte] = {
      require(sampleRate > 0, "bad sample rate")
      val dataLen = samples.length * 2
      val bb = ByteBuffer.allocate(44 + dataLen)
        .order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(fourcc("RIFF")).putInt(36 + dataLen)
        .putInt(fourcc("WAVE"))
        .putInt(fourcc("fmt ")).putInt(16)
        .putShort(1) // PCM
        .putShort(1) // mono
        .putInt(sampleRate)
        .putInt(sampleRate * 2) // byte rate
        .putShort(2) // block align
        .putShort(16) // bits per sample
        .putInt(fourcc("data")).putInt(dataLen)
      samples.foreach(bb.putShort)
      bb.array()
    }

    /** Decode a RIFF/WAVE payload → (sampleRate, samples). Walks the
      * container chunks (word-aligned, same rules as AVI), reads the
      * `fmt ` header, and enforces the 16-bit signed PCM mono
      * contract the feature gate assumes. Contention-free: pure
      * buffer math, no registry lookups, safe at full executor
      * parallelism. */
    def decodePcm16(payload: Array[Byte]): (Int, Array[Int]) = {
      val bb = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
      require(payload.length >= 12 &&
        bb.getInt(0) == fourcc("RIFF") &&
        bb.getInt(8) == fourcc("WAVE"), "payload is not a RIFF WAVE")
      val riffEnd = math.min(payload.length.toLong, 8L + bb.getInt(4))
      var sampleRate = -1
      var dataPos = -1
      var dataLen = -1
      var pos = 12L
      while (pos + 8 <= riffEnd && dataPos < 0) {
        val fcc = bb.getInt(pos.toInt)
        val size = bb.getInt(pos.toInt + 4).toLong & 0xFFFFFFFFL
        val p = pos + 8
        require(p + size <= riffEnd,
          s"chunk overruns container at offset $pos")
        if (fcc == fourcc("fmt ")) {
          require(size >= 16, "fmt chunk truncated")
          val audioFormat = bb.getShort(p.toInt).toInt
          val channels = bb.getShort(p.toInt + 2).toInt
          sampleRate = bb.getInt(p.toInt + 4)
          val bits = bb.getShort(p.toInt + 14).toInt
          require(audioFormat == 1 && channels == 1 && bits == 16,
            s"expected 16-bit signed PCM mono, got format=" +
              s"$audioFormat channels=$channels bits=$bits")
        } else if (fcc == fourcc("data")) {
          require(sampleRate > 0, "data chunk before fmt header")
          dataPos = p.toInt
          dataLen = size.toInt
        }
        pos = p + size + (size & 1)
      }
      require(dataPos >= 0, "no data chunk found")
      require(dataLen % 2 == 0, "odd PCM byte count")
      val n = dataLen / 2
      val out = new Array[Int](n)
      var i = 0
      while (i < n) {
        out(i) = bb.getShort(dataPos + 2 * i).toInt
        i += 1
      }
      (sampleRate, out)
    }

    /** JDK-audio-stack decode (validation path, NOT the row loop —
      * see the object doc). */
    def decodePcm16ViaAudioSystem(
        payload: Array[Byte]): (Int, Array[Int]) = {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        require(fmt.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
          s"expected 16-bit signed PCM mono, got $fmt")
        val bytes = ais.readAllBytes()
        require(bytes.length % 2 == 0, "odd PCM byte count")
        val n = bytes.length / 2
        val out = new Array[Int](n)
        var i = 0
        if (fmt.isBigEndian) {
          while (i < n) {
            out(i) = ((bytes(2 * i) << 8) |
              (bytes(2 * i + 1) & 0xFF)).toShort.toInt
            i += 1
          }
        } else {
          while (i < n) {
            out(i) = ((bytes(2 * i + 1) << 8) |
              (bytes(2 * i) & 0xFF)).toShort.toInt
            i += 1
          }
        }
        (fmt.getSampleRate.toInt, out)
      } finally ais.close()
    }
  }
}
