package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.MediaCodecs.{AviCodec, WavCodec}

/** Pure-JVM media codec contracts: the AVI container round trip must
  * be bit-exact for uncompressed DIB frames (that exactness is what
  * the mm04 oracle gate leans on), MJPEG frames must decode through
  * the ImageIO JPEG reader with exact dims, and the PCM WAV round
  * trip through `javax.sound.sampled` must be bit-exact. */
class MediaCodecsSpec extends AnyFunSuite {

  private def gray(w: Int, h: Int, seed: Int): Array[Byte] =
    Array.tabulate(w * h)(i => ((seed * 31 + i * 7) % 256).toByte)

  test("DIB AVI round trip is bit-exact (width % 4 == 0)") {
    val (w, h) = (16, 9)
    val frames = Seq.tabulate(5)(f => gray(w, h, f + 1))
    val avi = AviCodec.encodeDib(w, h, fps = 25, frames)
    val v = AviCodec.decode(avi)
    assert(v.width == w && v.height == h)
    assert(v.microSecPerFrame == 1000000 / 25)
    assert(v.frames.length == 5)
    frames.zip(v.frames).foreach { case (src, dec) =>
      assert(dec.toSeq == src.map(_ & 0xFF).toSeq)
    }
  }

  test("DIB AVI round trip is bit-exact with row padding " +
      "(width % 4 != 0 exercises the 4-byte stride)") {
    val (w, h) = (10, 7) // stride 12: 2 pad bytes per row
    val frames = Seq.tabulate(3)(f => gray(w, h, 100 + f))
    val v = AviCodec.decode(AviCodec.encodeDib(w, h, 10, frames))
    assert(v.width == w && v.height == h && v.frames.length == 3)
    frames.zip(v.frames).foreach { case (src, dec) =>
      assert(dec.toSeq == src.map(_ & 0xFF).toSeq)
    }
  }

  test("single-frame, 1x1 and odd-size frames survive " +
      "(odd DIB body exercises RIFF word alignment)") {
    for ((w, h) <- Seq((1, 1), (3, 3), (5, 2))) {
      val frames = Seq(gray(w, h, w * 17 + h))
      val v = AviCodec.decode(AviCodec.encodeDib(w, h, 1, frames))
      assert(v.width == w && v.height == h && v.frames.length == 1)
      assert(v.frames.head.toSeq == frames.head.map(_ & 0xFF).toSeq)
    }
  }

  test("MJPEG AVI decodes through the ImageIO JPEG reader") {
    val (w, h) = (32, 24)
    // Build JPEG frames with ImageIO, then hand-wrap them in a
    // minimal MJPG AVI: reuse the DIB encoder's container and swap
    // the movi payloads for 00dc JPEG chunks via direct bytes.
    val srcs = Seq.tabulate(3)(f => gray(w, h, 7 * (f + 1)))
    val jpegs = srcs.map { px =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      img.getRaster.setDataElements(0, 0, w, h, px)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val avi = encodeMjpg(w, h, jpegs)
    val v = AviCodec.decode(avi)
    assert(v.width == w && v.height == h && v.frames.length == 3)
    // JPEG is lossy: assert dims + bounded per-pixel error, not bits.
    srcs.zip(v.frames).foreach { case (src, dec) =>
      assert(dec.length == w * h)
      val maxErr = src.map(_ & 0xFF).zip(dec)
        .map { case (a, b) => math.abs(a - b) }.max
      assert(maxErr <= 48, s"JPEG round-trip error too large: $maxErr")
    }
  }

  /** Minimal MJPG AVI writer for the spec: same RIFF layout as
    * encodeDib but 00dc chunks carrying JPEG payloads. */
  private def encodeMjpg(w: Int, h: Int,
      jpegs: Seq[Array[Byte]]): Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    def fcc(s: String): Int = (s(0) & 0xFF) | ((s(1) & 0xFF) << 8) |
      ((s(2) & 0xFF) << 16) | ((s(3) & 0xFF) << 24)
    def chunk(f: Int, body: Array[Byte]): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 + body.length + (body.length & 1))
        .order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(f).putInt(body.length).put(body); bb.array()
    }
    def list(t: Int, body: Array[Byte]): Array[Byte] = {
      val bb = ByteBuffer.allocate(12 + body.length)
        .order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(fcc("LIST")).putInt(4 + body.length).putInt(t)
        .put(body); bb.array()
    }
    val avih = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
    avih.putInt(100000).putInt(0).putInt(0).putInt(0)
      .putInt(jpegs.length).putInt(0).putInt(1).putInt(0)
      .putInt(w).putInt(h)
    val strh = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
    strh.putInt(fcc("vids")).putInt(fcc("MJPG")).putInt(0).putInt(0)
      .putInt(0).putInt(1).putInt(10).putInt(0).putInt(jpegs.length)
      .putInt(0).putInt(-1).putInt(0)
      .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort)
    val strf = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
    strf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(fcc("MJPG")).putInt(0).putInt(0).putInt(0)
      .putInt(0).putInt(0)
    val hdrl = list(fcc("hdrl"), chunk(fcc("avih"), avih.array()) ++
      list(fcc("strl"), chunk(fcc("strh"), strh.array()) ++
        chunk(fcc("strf"), strf.array())))
    val movi = list(fcc("movi"),
      jpegs.flatMap(j => chunk(fcc("00dc"), j)).toArray)
    val body = hdrl ++ movi
    val out = ByteBuffer.allocate(12 + body.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.putInt(fcc("RIFF")).putInt(4 + body.length).putInt(fcc("AVI "))
      .put(body)
    out.array()
  }

  test("parse + per-frame decode samples without decoding the rest") {
    val (w, h) = (6, 4)
    val frames = Seq.tabulate(6)(f => gray(w, h, 9 * (f + 1)))
    val p = AviCodec.parse(AviCodec.encodeDib(w, h, 10, frames))
    assert(p.frameCount == 6)
    // decode only frames 0, 3 — values must match the full decode
    assert(p.frame(3).toSeq == frames(3).map(_ & 0xFF).toSeq)
    assert(p.frame(0).toSeq == frames(0).map(_ & 0xFF).toSeq)
  }

  test("real-world container quirks: JUNK chunk in AVI, LIST INFO " +
      "chunk in WAV are skipped per the RIFF contract") {
    import java.nio.{ByteBuffer, ByteOrder}
    def fcc(s: String): Int = (s(0) & 0xFF) | ((s(1) & 0xFF) << 8) |
      ((s(2) & 0xFF) << 16) | ((s(3) & 0xFF) << 24)
    // Splice a JUNK chunk right after the hdrl list of a good AVI.
    val (w, h) = (5, 4)
    val src = gray(w, h, 3)
    val avi = AviCodec.encodeDib(w, h, 10, Seq(src))
    val bbIn = ByteBuffer.wrap(avi).order(ByteOrder.LITTLE_ENDIAN)
    // hdrl list spans [12, 12+8+listSize); insert after it
    val hdrlSize = bbIn.getInt(16)
    val insertAt = 12 + 8 + hdrlSize
    val junk = ByteBuffer.allocate(8 + 16)
      .order(ByteOrder.LITTLE_ENDIAN)
    junk.putInt(fcc("JUNK")).putInt(16).put(Array.fill[Byte](16)(7))
    val spliced = avi.take(insertAt) ++ junk.array() ++
      avi.drop(insertAt)
    // patch the RIFF size field
    val out = ByteBuffer.wrap(spliced).order(ByteOrder.LITTLE_ENDIAN)
    out.putInt(4, spliced.length - 8)
    val v = AviCodec.decode(spliced)
    assert(v.width == w && v.height == h && v.frames.length == 1)
    assert(v.frames.head.toSeq == src.map(_ & 0xFF).toSeq)

    // WAV with a LIST INFO chunk between fmt and data (very common).
    val samples = Array.tabulate[Short](40)(k => (k * 5 - 100).toShort)
    val wav = WavCodec.encodePcm16(16000, samples)
    // encodePcm16 layout: [0,12) RIFF/WAVE, [12,36) fmt, [36,...) data
    val info = ByteBuffer.allocate(8 + 12)
      .order(ByteOrder.LITTLE_ENDIAN)
    info.putInt(fcc("LIST")).putInt(12).putInt(fcc("INFO"))
      .putInt(fcc("ISFT")).putInt(0)
    val wavSpliced = wav.take(36) ++ info.array() ++ wav.drop(36)
    val wout = ByteBuffer.wrap(wavSpliced)
      .order(ByteOrder.LITTLE_ENDIAN)
    wout.putInt(4, wavSpliced.length - 8)
    val (rate, decoded) = WavCodec.decodePcm16(wavSpliced)
    assert(rate == 16000)
    assert(decoded.toSeq == samples.map(_.toInt).toSeq)
  }

  test("non-AVI and truncated payloads fail fast with a message") {
    val e1 = intercept[IllegalArgumentException] {
      AviCodec.decode("not a video at all".getBytes)
    }
    assert(e1.getMessage.contains("RIFF AVI"))
    val good = AviCodec.encodeDib(4, 4, 10, Seq(gray(4, 4, 1)))
    val e2 = intercept[IllegalArgumentException] {
      AviCodec.decode(good.take(40)) // cut mid-header
    }
    assert(e2.getMessage != null)
  }

  test("PCM16 WAV round trip is bit-exact, and the buffer parser " +
      "agrees with javax.sound.sampled on the same payload") {
    val samples = Array[Short](0, 1, -1, 127, -128, 32767, -32768,
      12345, -23456) ++ Array.tabulate[Short](500)(k =>
      ((k * 31) % 4096 - 2048).toShort)
    val wav = WavCodec.encodePcm16(8000, samples)
    val (rate, decoded) = WavCodec.decodePcm16(wav)
    assert(rate == 8000)
    assert(decoded.toSeq == samples.map(_.toInt).toSeq)
    // Cross-validation anchor: the JDK audio stack must read the
    // exact same samples from the same bytes.
    val (rate2, viaJdk) = WavCodec.decodePcm16ViaAudioSystem(wav)
    assert(rate2 == 8000)
    assert(viaJdk.toSeq == decoded.toSeq)
  }

  test("WAV decode rejects non-audio payloads") {
    intercept[Exception] {
      WavCodec.decodePcm16(Array.fill[Byte](64)(3))
    }
  }

  // --- parser robustness: stream-type tracking, top-down DIBs,
  // --- malformed headers, color MJPEG ---

  /** Splice an audio strl (strh fccType 'auds' + 18-byte
    * WAVEFORMATEX strf) into a good AVI's hdrl BEFORE the video strl
    * — the legal audio-first layout whose strf must NOT be read as a
    * BITMAPINFOHEADER. */
  private def withLeadingAudioStream(avi: Array[Byte]): Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    def fcc(s: String): Int = (s(0) & 0xFF) | ((s(1) & 0xFF) << 8) |
      ((s(2) & 0xFF) << 16) | ((s(3) & 0xFF) << 24)
    val strh = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
    strh.putInt(fcc("auds")).putInt(0).putInt(0).putInt(0).putInt(0)
      .putInt(1).putInt(8000).putInt(0).putInt(100).putInt(0)
      .putInt(-1).putInt(2)
    // WAVEFORMATEX: PCM, mono, 8000 Hz — if misparsed as a
    // BITMAPINFOHEADER, "width" would read 8000.
    val strf = ByteBuffer.allocate(18).order(ByteOrder.LITTLE_ENDIAN)
    strf.putShort(1).putShort(1).putInt(8000).putInt(16000)
      .putShort(2).putShort(16).putShort(0)
    def chunk(f: Int, body: Array[Byte]): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 + body.length + (body.length & 1))
        .order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(f).putInt(body.length).put(body); bb.array()
    }
    val strlBody = chunk(fcc("strh"), strh.array()) ++
      chunk(fcc("strf"), strf.array())
    val strl = ByteBuffer.allocate(12 + strlBody.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    strl.putInt(fcc("LIST")).putInt(4 + strlBody.length)
      .putInt(fcc("strl")).put(strlBody)
    // hdrl layout from encodeDib: avih chunk at 24 (len 56), video
    // strl at 88 — insert the audio strl there.
    val insertAt = 88
    val spliced = avi.take(insertAt) ++ strl.array() ++
      avi.drop(insertAt)
    val out = ByteBuffer.wrap(spliced).order(ByteOrder.LITTLE_ENDIAN)
    out.putInt(4, spliced.length - 8) // RIFF size
    out.putInt(16, out.getInt(16) + strl.array().length) // hdrl size
    spliced
  }

  test("audio-first AVI: the audio strl's strf is not misparsed as " +
      "video; frames still decode bit-exactly") {
    val (w, h) = (7, 5)
    val frames = Seq.tabulate(3)(f => gray(w, h, 11 * (f + 1)))
    val avi = withLeadingAudioStream(
      AviCodec.encodeDib(w, h, 10, frames))
    val v = AviCodec.decode(avi)
    assert(v.width == w && v.height == h && v.frames.length == 3)
    frames.zip(v.frames).foreach { case (src, dec) =>
      assert(dec.toSeq == src.map(_ & 0xFF).toSeq)
    }
  }

  test("audio-only AVI (no vids stream) fails fast with a " +
      "descriptive error instead of silently emitting zero frames") {
    // Take a good AVI, splice the audio strl in, then cut the video
    // strl out of hdrl: only the auds stream remains.
    import java.nio.{ByteBuffer, ByteOrder}
    val (w, h) = (6, 4)
    val avi = AviCodec.encodeDib(w, h, 10, Seq(gray(w, h, 5)))
    val bbIn = ByteBuffer.wrap(avi).order(ByteOrder.LITTLE_ENDIAN)
    // video strl spans [88, 88+8+strlSize)
    val vidStrlSize = bbIn.getInt(92)
    val vidStrlLen = 8 + vidStrlSize
    val noVid = avi.take(88) ++ avi.drop(88 + vidStrlLen)
    val out = ByteBuffer.wrap(noVid).order(ByteOrder.LITTLE_ENDIAN)
    out.putInt(4, noVid.length - 8)
    out.putInt(16, out.getInt(16) - vidStrlLen)
    val e = intercept[IllegalArgumentException] {
      AviCodec.parse(withLeadingAudioStream(noVid))
    }
    assert(e.getMessage.contains("vids"))
  }

  test("top-down DIB (negative biHeight) decodes in natural row " +
      "order — no bottom-up flip") {
    import java.nio.{ByteBuffer, ByteOrder}
    val (w, h) = (8, 4)
    val src = gray(w, h, 21)
    val avi = AviCodec.encodeDib(w, h, 10, Seq(src))
    // encodeDib stores rows bottom-up; patching biHeight negative
    // declares the stored order top-down, so the decode must return
    // the vertical mirror of src. strf body starts at 96 + 8 = 104;
    // biHeight at +8.
    val bb = ByteBuffer.wrap(avi).order(ByteOrder.LITTLE_ENDIAN)
    val strfData = 88 + 12 + 8 + 56 + 8 // hdrl->strl->strh->strf body
    assert(bb.getInt(strfData) == 40, "strf offset math drifted")
    bb.putInt(strfData + 8, -h)
    val p = AviCodec.parse(avi)
    assert(p.topDown)
    val mirrored = (0 until h).flatMap(y =>
      (0 until w).map(x => src((h - 1 - y) * w + x) & 0xFF))
    assert(p.frame(0).toSeq == mirrored)
  }

  test("malformed containers with tiny LIST/strf/avih sizes fail " +
      "fast instead of reading neighboring bytes") {
    import java.nio.{ByteBuffer, ByteOrder}
    def fcc(s: String): Int = (s(0) & 0xFF) | ((s(1) & 0xFF) << 8) |
      ((s(2) & 0xFF) << 16) | ((s(3) & 0xFF) << 24)
    // RIFF('AVI ' LIST(size=2)) — declared size cannot hold a type.
    val bb = ByteBuffer.allocate(22).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(fcc("RIFF")).putInt(14).putInt(fcc("AVI "))
      .putInt(fcc("LIST")).putInt(2).putShort(0)
    val e = intercept[IllegalArgumentException] {
      AviCodec.parse(bb.array())
    }
    assert(e.getMessage.contains("LIST chunk too small"))

    // Truncated strf inside a vids strl.
    val strh = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
    strh.putInt(fcc("vids")).putInt(fcc("DIB "))
    def chunk(f: Int, body: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + body.length + (body.length & 1))
        .order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(f).putInt(body.length).put(body); b.array()
    }
    def list(t: Int, body: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(12 + body.length)
        .order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(fcc("LIST")).putInt(4 + body.length).putInt(t)
        .put(body); b.array()
    }
    val body = list(fcc("hdrl"), list(fcc("strl"),
      chunk(fcc("strh"), strh.array()) ++
        chunk(fcc("strf"), Array.fill[Byte](10)(0)))) // 10 < 18
    val out = ByteBuffer.allocate(12 + body.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.putInt(fcc("RIFF")).putInt(4 + body.length)
      .putInt(fcc("AVI ")).put(body)
    val e2 = intercept[IllegalArgumentException] {
      AviCodec.parse(out.array())
    }
    assert(e2.getMessage.contains("strf chunk truncated"))
  }

  test("color MJPEG frames decode as luma, not the red channel") {
    val (w, h) = (16, 16)
    // Uniform strong-red frame: red-channel-only decode would read
    // ~200; colorimetric luma is ~0.3*200 + 0.59*50 + 0.11*50 ~ 95.
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(200, 50, 50))
    g.fillRect(0, 0, w, h)
    g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val avi = encodeMjpg(w, h, Seq(bos.toByteArray))
    val v = AviCodec.decode(avi)
    val mean = v.frames.head.sum.toDouble / (w * h)
    assert(mean > 60 && mean < 160,
      s"expected luma-ish mean (~95), got $mean — red-channel decode?")
  }

  test("video frame feature stats match a scalar recomputation " +
      "(the exact witness the mm04 oracle recomputes)") {
    val (w, h) = (9, 5)
    val frames = Seq.tabulate(4)(f => gray(w, h, 50 + f))
    val avi = AviCodec.encodeDib(w, h, 10, frames)
    val v = AviCodec.decode(avi)
    // stride-2 sampling picks frames 0 and 2
    val picked = (0 until v.frames.length by 2).map(v.frames)
    assert(picked.length == 2)
    picked.zipWithIndex.foreach { case (px, k) =>
      val src = frames(2 * k).map(_ & 0xFF)
      assert(px.sum.toLong == src.map(_.toLong).sum)
      assert(px.min == src.min && px.max == src.max)
      val hash = src.foldLeft(0L)((a, c) => (a * 31 + c) % 1000000007L)
      assert(px.foldLeft(0L)((a, c) =>
        (a * 31 + c) % 1000000007L) == hash)
    }
  }
}
