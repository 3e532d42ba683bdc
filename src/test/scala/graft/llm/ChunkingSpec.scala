package graft.llm

import graft.SparkSpec

class ChunkingSpec extends SparkSpec {

  import spark.implicits._

  test("windows stride with overlap and clamp at the tail") {
    val doc = (1 to 10).map(i => s"w$i").mkString(" ") // 10 tokens
    val out = Chunking.chunk(
      Seq((1L, doc)).toDF("doc_id", "text"),
      chunkTokens = 4, overlapTokens = 1)
      .select("chunk_idx", "chunk_tokens", "chunk_text")
      .as[(Int, Int, String)].collect().sortBy(_._1)
    // stride 3: starts 0,3,6,9
    assert(out.map(_._1).toSeq == Seq(0, 1, 2, 3))
    assert(out.map(_._2).toSeq == Seq(4, 4, 4, 1))
    assert(out(0)._3 == "w1 w2 w3 w4")
    assert(out(1)._3 == "w4 w5 w6 w7") // 1-token overlap
    assert(out(3)._3 == "w10")
  }

  test("short and empty docs") {
    val out = Chunking.chunk(
      Seq((1L, "only three tokens"), (2L, "")).toDF("doc_id", "text"),
      chunkTokens = 64, overlapTokens = 8)
      .select("id", "chunk_tokens", "chunk_text")
      .as[(Long, Int, String)].collect()
    val byId = out.groupBy(_._1)
    assert(byId(1L).toSeq == Seq((1L, 3, "only three tokens")))
    // empty text -> split yields one empty token -> one empty chunk
    assert(byId(2L).map(_._3).toSeq == Seq(""))
  }
}
