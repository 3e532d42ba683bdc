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
