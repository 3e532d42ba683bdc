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

  test("batched decode produces normalized 8-bucket histograms") {
    val rows = media.select(col("media_id"), col("bytes").as("payload"),
      col("meta")).as[Multimodal.MediaRow]
    val feats = Multimodal.decodeFeatures(rows).collect()
      .map(f => f.media_id -> f.features).toMap
    assert(feats(1L).length == 8)
    assert(math.abs(feats(1L).sum - 1.0f) < 1e-5)
    assert(feats(2L).sum > 0.99f)
  }

  test("frame sampling emits stride-spaced frames") {
    val rows = media.select(col("media_id"), col("bytes").as("payload"),
      col("meta")).as[Multimodal.MediaRow]
    val frames = Multimodal.sampleFrames(rows, stride = 2)
      .select("media_id", "frame_idx").as[(Long, Int)].collect()
    val big = frames.filter(_._1 == 2L).map(_._2).sorted
    assert(big.head == 0)
    assert(big.forall(_ % 2 == 0))
    assert(frames.filter(_._1 == 1L).map(_._2).toSeq == Seq(0))
  }
}
