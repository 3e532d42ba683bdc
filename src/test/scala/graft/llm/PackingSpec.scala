package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PackingSpec extends SparkSpec {

  import spark.implicits._

  test("contiguous fill: bins bounded, order respected, shards isolated") {
    val chunks = Seq(
      // shard A: 60+60+60 -> bin0 (180<=? budget 100: 60 | 60 splits)
      ("A", 1L, 0, 60), ("A", 1L, 1, 60), ("A", 2L, 0, 60),
      // shard B: single big chunk
      ("B", 3L, 0, 90))
      .toDF("source", "doc_id", "chunk_idx", "chunk_tokens")
    val out = Chunking.pack(chunks, "source",
      Seq("doc_id", "chunk_idx"), budget = 100)
      .select("source", "doc_id", "chunk_idx", "bin_id")
      .as[(String, Long, Int, Long)].collect().toSet
    // prefix sums in A: 60,120,180 -> exclusive 0,60,120 -> bins 0,0,1
    assert(out == Set(
      ("A", 1L, 0, 0L), ("A", 1L, 1, 0L), ("A", 2L, 0, 1L),
      ("B", 3L, 0, 0L)))
  }

  test("bins overflow by at most one chunk") {
    val rnd = new scala.util.Random(5)
    val chunks = (0 until 500).map(i =>
      ("s" + i % 3, i.toLong, 0, rnd.nextInt(64) + 1))
      .toDF("source", "doc_id", "chunk_idx", "chunk_tokens")
    val bins = Chunking.pack(chunks, "source",
      Seq("doc_id", "chunk_idx"), budget = 256)
      .groupBy("source", "bin_id")
      .agg(sum($"chunk_tokens").as("t"), max($"chunk_tokens").as("m"))
      .as[(String, Long, Long, Int)].collect()
    bins.foreach { case (_, _, total, maxChunk) =>
      assert(total < 256 + maxChunk)
    }
  }
}
