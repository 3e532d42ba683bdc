package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  private def media = {
    val df = Seq(
      (1L, "tiny payload"),
      (2L, "a considerably longer payload with more bytes " * 50))
      .toDF("media_id", "txt")
      .withColumn("bytes", encode(col("txt"), "UTF-8"))
    Multimodal.withMediaColumns(df, "bytes", "image")
  }

  test("metadata struct: sizes, digest, deterministic fake dims") {
    val rows = media.select(col("media_id"), col("meta.nBytes"),
      col("meta.sha"), col("meta.width"), col("meta.height"))
      .collect()
    val m = rows.map(r => r.getLong(0) ->
      (r.getLong(1), r.getString(2), r.getInt(3), r.getInt(4))).toMap
    assert(m(1L)._1 == "tiny payload".getBytes("UTF-8").length)
    assert(m(1L)._2.matches("[0-9a-f]{40}"))
    assert(m(1L)._3 >= 64 && m(1L)._4 >= 64)
    // determinism across evaluations
    val again = media.select(col("meta.width")).collect().map(_.getInt(0))
    assert(again.toSeq == rows.map(_.getInt(3)).toSeq)
  }

  test("featurize projects DECODED pixels through the fixed ±1 " +
      "matrix — matches a hand computation over the source raster") {
    val w = 5
    val h = 4
    val px = Array.tabulate(w * h)(i => ((i * 37 + 11) % 256).toByte)
    val media = spark.createDataset(Seq(7L)).mapPartitions { it =>
      it.map { id =>
        Multimodal.MediaRow(id,
          Multimodal.ImageCodec.encodePng(w, h, px),
          Multimodal.MediaMeta("image", 0L, "", w, h))
      }
    }
    val feats = Multimodal.decodeFeatures(media, d = 6).collect().head
    assert(feats.features.length == 6)
    val expected =
      Multimodal.Featurizer.project(px.map(_ & 0xFF), 6)
    assert(feats.features.toSeq == expected.map(_.toFloat).toSeq)
    // The matrix is genuinely mixed sign per dimension (not all +1).
    assert((0 until 6).exists(j =>
      (0 until w * h).exists(i => Multimodal.Featurizer.weight(j, i)
        != Multimodal.Featurizer.weight(j, (i + 1) % (w * h)))))
  }

  test("featurize over video projects stride-sampled decoded " +
      "frames (bounded decode work per payload)") {
    val (w, h) = (4, 3)
    def frame(seed: Int) =
      Array.tabulate[Byte](w * h)(i => ((seed * 31 + i * 7) % 256).toByte)
    val frames = Seq.tabulate(5)(f => frame(f + 1))
    val avi = MediaCodecs.AviCodec.encodeDib(w, h, 10, frames)
    val media = spark.createDataset(Seq(3L)).map { id =>
      Multimodal.MediaRow(id, avi,
        Multimodal.MediaMeta("video", avi.length.toLong, "", w, h))
    }
    val feats = Multimodal
      .decodeFeatures(media, d = 4, videoStride = 2)
      .collect().head
    // stride 2 over 5 frames -> frames 0, 2, 4 concatenated
    val content = Seq(0, 2, 4).toArray
      .flatMap(f => frames(f).map(_ & 0xFF))
    assert(feats.features.toSeq == Multimodal.Featurizer
      .project(content, 4).map(_.toFloat).toSeq)
  }

  test("featurize decodes per media type: audio projects PCM " +
      "samples; unknown types fall back to raw bytes") {
    val ss = Array[Short](100, -200, 300, -400, 50, 0, 7, -7)
    val wav = MediaCodecs.WavCodec.encodePcm16(8000, ss)
    val media = spark.createDataset(Seq(
      ("audio", 1L, wav),
      ("blob", 2L, Array[Byte](1, 2, 3, 250.toByte))))
      .map { case (t, id, p) =>
        Multimodal.MediaRow(id, p, Multimodal.MediaMeta(t, 0L, "", 0, 0))
      }
    val feats = Multimodal.decodeFeatures(media, d = 4).collect()
      .map(f => f.media_id -> f.features).toMap
    assert(feats(1L).toSeq == Multimodal.Featurizer
      .project(ss.map(_.toInt), 4).map(_.toFloat).toSeq)
    assert(feats(2L).toSeq == Multimodal.Featurizer
      .project(Array(1, 2, 3, 250), 4).map(_.toFloat).toSeq)
  }

  test("real PNG codec round-trips every pixel exactly") {
    val w = 13
    val h = 7
    val px = Array.tabulate(w * h)(i => ((i * 37 + 11) % 256).toByte)
    val payload = Multimodal.ImageCodec.encodePng(w, h, px)
    // a real PNG container, not a fake: magic bytes \x89PNG
    assert((payload(0) & 0xFF) == 0x89)
    assert(payload(1) == 'P'.toByte && payload(2) == 'N'.toByte)
    val (dw, dh, samples) = Multimodal.ImageCodec.decode(payload)
    assert(dw == w && dh == h)
    assert(samples.toSeq == px.toSeq.map(_ & 0xFF))
  }

  test("decode rejects rasters deeper than 8 bits") {
    // ImageIO decodes 16-bit grayscale PNGs happily; the feature
    // contract is 8-bit samples (the stats oracle reasons over the
    // byte range), so decode must reject rather than mis-scale.
    val img = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    for (y <- 0 until 4; x <- 0 until 4)
      img.getRaster.setSample(x, y, 0, 40000 + x * 1000 + y)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val e = intercept[IllegalArgumentException] {
      Multimodal.ImageCodec.decode(bos.toByteArray)
    }
    assert(e.getMessage.contains("16-bit"), e.getMessage)
  }

  test("JPEG payloads decode through the same path (lossy-tolerant)") {
    // The decode path is format-agnostic (ImageIO sniffs the
    // container); JPEG is lossy, so assert dims exactly and pixel
    // stats within a tolerance instead of bit-exactness.
    val w = 16
    val h = 12
    val px = Array.tabulate(w * h)(i => (((i * 31) % 128) + 64).toByte)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, w, h, px)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val (dw, dh, samples) = Multimodal.ImageCodec.decode(bos.toByteArray)
    assert(dw == w && dh == h)
    val srcMean = px.map(_ & 0xFF).sum.toDouble / px.length
    val decMean = samples.sum.toDouble / samples.length
    assert(math.abs(srcMean - decMean) < 8.0,
      s"JPEG mean drifted: src $srcMean vs decoded $decMean")
  }

  test("distributed image decode recovers source raster stats") {
    val media = spark.createDataset(Seq(1L, 2L)).mapPartitions { it =>
      it.map { id =>
        val px = Array.tabulate(16)(i => (id * 10 + i).toByte)
        Multimodal.MediaRow(id,
          Multimodal.ImageCodec.encodePng(4, 4, px),
          Multimodal.MediaMeta("image", 0L, "", 4, 4))
      }
    }
    val feats = Multimodal.decodeImageFeatures(media).collect()
      .map(f => f.media_id -> f).toMap
    assert(feats(1L).width == 4 && feats(1L).height == 4)
    assert(feats(1L).px_min == 10 && feats(1L).px_max == 25)
    assert(feats(1L).px_sum == (10 to 25).sum.toLong)
    assert(feats(2L).px_min == 20 && feats(2L).px_max == 35)
  }

  test("frame sampling over real AVI payloads emits the raw chunk " +
      "bytes at the parse-exposed offsets") {
    val (w, h) = (6, 3) // stride 8: 2 pad bytes per row
    def frame(seed: Int) =
      Array.tabulate[Byte](w * h)(i => ((seed * 31 + i * 7) % 256).toByte)
    val frames = Seq.tabulate(5)(f => frame(f + 1))
    val avi = MediaCodecs.AviCodec.encodeDib(w, h, 10, frames)
    val media = spark.createDataset(Seq(1L)).map { id =>
      Multimodal.MediaRow(id, avi,
        Multimodal.MediaMeta("video", avi.length.toLong, "", w, h))
    }
    val out = Multimodal.sampleFrames(media, stride = 2)
      .as[(Long, Int, Array[Byte])].collect().sortBy(_._2)
    assert(out.map(_._2).toSeq == Seq(0, 2, 4))
    // Each sampled chunk is the DIB body: bottom-up rows padded to
    // the 4-byte stride — recompute frame 2's bytes by hand.
    val dibStride = (w + 3) & ~3
    val expect = (0 until h).flatMap { r =>
      val y = h - 1 - r
      (0 until w).map(x => frames(2)(y * w + x)) ++
        Seq.fill(dibStride - w)(0.toByte)
    }
    assert(out(1)._3.toSeq == expect)
    assert(out.forall(_._3.length == dibStride * h))
  }

  test("frame sampling propagates corruption: a payload with " +
      "RIFF/AVI magic that fails mid-parse throws, no silent " +
      "byte-slice downgrade") {
    val good = MediaCodecs.AviCodec.encodeDib(4, 4, 10,
      Seq(Array.tabulate[Byte](16)(_.toByte)))
    val corrupt = good.take(40).toArray // magic intact, body cut
    val media = spark.createDataset(Seq(1L)).map { id =>
      Multimodal.MediaRow(id, corrupt,
        Multimodal.MediaMeta("video", corrupt.length.toLong, "", 4, 4))
    }
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.sampleFrames(media, stride = 2).collect()
    }
    assert(e.getCause != null || e.getMessage != null)
  }

  test("frame sampling falls back to stride-spaced byte slices for " +
      "unparseable payloads") {
    val rows = media.select(col("media_id"), col("bytes").as("payload"),
      col("meta")).as[Multimodal.MediaRow]
    val frames = Multimodal.sampleFrames(rows, stride = 2)
      .select("media_id", "frame_idx").as[(Long, Int)].collect()
    val big = frames.filter(_._1 == 2L).map(_._2).sorted
    assert(big.head == 0)
    assert(big.forall(_ % 2 == 0))
    assert(frames.filter(_._1 == 1L).map(_._2).toSeq == Seq(0))
  }

  test("nearest-neighbor resize picks the exact mapped source " +
      "pixels (identity when dims match)") {
    val media = spark.createDataset(Seq(1L)).mapPartitions { it =>
      it.map { id =>
        // 4x2 raster 0..7 row-major
        val px = Array.tabulate(8)(_.toByte)
        Multimodal.MediaRow(id,
          Multimodal.ImageCodec.encodePng(4, 2, px),
          Multimodal.MediaMeta("image", 0L, "", 4, 2))
      }
    }
    // Downsample to 2x2: dst(x,y) -> src(y*2/2*?): sy = y*2/2 = y,
    // sx = x*4/2 = 2x -> pixels (0,0)=0, (0,2)=2, (1,0)=4, (1,2)=6.
    val down = Multimodal.resizeImageFeatures(media, 2, 2)
      .collect().head
    assert(down.width == 2 && down.height == 2)
    assert(down.px_sum == 0L + 2 + 4 + 6)
    assert(down.px_min == 0 && down.px_max == 6)
    // Identity resize reproduces the full-raster stats.
    val same = Multimodal.resizeImageFeatures(media, 4, 2)
      .collect().head
    assert(same.px_sum == (0 to 7).sum.toLong)
    assert(same.px_min == 0 && same.px_max == 7)
  }

  test("dHash: identical content collides, gradient flip flips " +
      "exactly the expected bits") {
    def png(seed: Int) = {
      // 8x8 so the resize mapping is the identity: hash bits are
      // directly the adjacent-pixel comparisons of this raster.
      val px = Array.tabulate(64)(i => ((seed + i) % 256).toByte)
      Multimodal.ImageCodec.encodePng(8, 8, px)
    }
    val media = spark.createDataset(Seq(1L, 2L, 3L)).mapPartitions {
      it => it.map { id =>
        val payload = if (id == 3L) png(50) else png(10)
        Multimodal.MediaRow(id, payload,
          Multimodal.MediaMeta("image", 0L, "", 8, 8))
      }
    }
    val out = Multimodal.imageDHash(media).collect()
      .map(h => h.media_id -> h.dhash).toMap
    assert(out(1L) == out(2L), "identical content must collide")
    // Monotonic-within-rows rasters (no 255->0 wrap inside a row of
    // px(i)=(seed+i)%256 for these seeds): every adjacent pair is
    // increasing, so no bit is set... unless a wrap lands mid-row.
    // seed 10: values 10..73, no wrap -> dhash 0. seed 50: 50..113,
    // no wrap -> dhash 0 too; distinguish via a wrapped raster.
    assert(out(1L) == 0L)
    val wrapped = spark.createDataset(Seq(9L)).mapPartitions { it =>
      it.map { _ =>
        val px = Array.tabulate(64)(i => ((200 + i * 3) % 256).toByte)
        Multimodal.MediaRow(9L,
          Multimodal.ImageCodec.encodePng(8, 8, px),
          Multimodal.MediaMeta("image", 0L, "", 8, 8))
      }
    }
    val wh = Multimodal.imageDHash(wrapped).collect().head.dhash
    // px wraps 255->2 between i=18 and i=19 (200+18*3=254,
    // 200+19*3=257%256=1): that adjacent pair is decreasing ->
    // exactly one set bit. i=18 is row y=2, x=2 -> bit 2*7+2=16.
    assert(wh == (1L << 16), s"expected bit 16 only, got $wh")
  }

  test("video signature: identical videos collide, frame order " +
      "matters, stride decodes only sampled frames") {
    def avi(frames: Seq[Array[Byte]]) =
      MediaCodecs.AviCodec.encodeDib(8, 8, 10, frames)
    // wrapped rasters give nonzero per-frame dhashes (cf. dHash spec)
    def frame(seed: Int) =
      Array.tabulate[Byte](64)(i => ((seed + i * 3) % 256).toByte)
    val f0 = frame(200)
    val f1 = frame(90)
    val f2 = frame(140)
    val media = spark.createDataset(Seq(
      (1L, avi(Seq(f0, f1, f2))),
      (2L, avi(Seq(f0, f1, f2))),   // identical
      (3L, avi(Seq(f2, f1, f0))))) // same frames, reversed
      .map { case (id, p) =>
        Multimodal.MediaRow(id, p,
          Multimodal.MediaMeta("video", 0L, "", 8, 8))
      }
    val sigs = Multimodal.videoSignature(media, stride = 2)
      .collect().map(s => s.media_id -> s).toMap
    assert(sigs(1L).n_frames == 3 && sigs(1L).n_sampled == 2)
    assert(sigs(1L).sig == sigs(2L).sig, "identical must collide")
    // stride 2 samples frames 0 and 2: reversed order swaps them
    assert(sigs(1L).sig != sigs(3L).sig, "order must matter")
  }

  test("audio fingerprint: delta-sign bits match hand computation; " +
      "identical clips collide") {
    // window=2: energies per pair of samples; craft a known pattern
    val ss = Array[Short](10, 0, 20, 0, 5, 0, 30, 0) // e = 100,400,25,900
    val media = spark.createDataset(Seq(1L, 2L)).mapPartitions { it =>
      it.map { id =>
        Multimodal.MediaRow(id,
          MediaCodecs.WavCodec.encodePcm16(8000, ss),
          Multimodal.MediaMeta("audio", 0L, "", 0, 0))
      }
    }
    val fps = Multimodal.audioFingerprint(media, window = 2)
      .collect().map(f => f.media_id -> f).toMap
    // deltas: 400>100 (bit0), 25<400 (no bit1), 900>25 (bit2)
    assert(fps(1L).n_windows == 4)
    assert(fps(1L).fp == ((1L << 0) | (1L << 2)))
    assert(fps(1L).fp == fps(2L).fp, "identical clips must collide")
  }

  test("audio window features: energy/peak per full window, " +
      "partial tail dropped") {
    val media = spark.createDataset(Seq(1L)).mapPartitions { it =>
      it.map { id =>
        // 10 samples, window 4 -> windows [0..3], [4..7]; 8,9 dropped
        val ss = Array[Short](1, -2, 3, -4, 10, -10, 0, 5, 99, 99)
        Multimodal.MediaRow(id,
          MediaCodecs.WavCodec.encodePcm16(8000, ss),
          Multimodal.MediaMeta("audio", 0L, "", 0, 0))
      }
    }
    val wins = Multimodal.audioWindowFeatures(media, window = 4)
      .collect().sortBy(_.win_idx)
    assert(wins.length == 2)
    assert(wins(0).energy == 1L + 4 + 9 + 16 && wins(0).peak == 4)
    assert(wins(1).energy == 100L + 100 + 0 + 25 && wins(1).peak == 10)
  }
}
