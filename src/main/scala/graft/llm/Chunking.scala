package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import TextFunctions.tokens

/** Document chunking for training-data pipelines: fixed token windows
  * with overlap (the standard pre-tokenization split before packing).
  *
  * Pure expression work per document — the token array is built once,
  * window starts come from a stride `sequence`, and each chunk is a
  * `slice` + join; one `explode` fans out to chunk rows. No shuffle at
  * all until a downstream operator needs one, so this maps over a
  * 100 TB corpus at scan speed.
  */
object Chunking {

  /** @param chunkTokens   window size in whitespace tokens
    * @param overlapTokens tokens shared between consecutive chunks
    * @return one row per chunk: (id, chunk_idx, chunk_tokens, chunk_text)
    */
  def chunk(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", chunkTokens: Int = 64,
      overlapTokens: Int = 8): DataFrame = {
    require(overlapTokens < chunkTokens,
      "overlap must be smaller than the window")
    val stride = chunkTokens - overlapTokens
    val tk = tokens(col(textCol))
    val n = size(tk)
    // window starts: 0, stride, 2*stride, ... while start < n
    val starts = when(n <= 0, array().cast("array<int>"))
      .otherwise(sequence(lit(0), n - 1, lit(stride)))
    docs
      .select(col(idCol).as("id"), tk.as("tk"), starts.as("starts"))
      .select(col("id"), col("tk"),
        posexplode(col("starts")))
      .withColumnRenamed("pos", "chunk_idx")
      .withColumnRenamed("col", "start")
      .select(
        col("id"),
        col("chunk_idx"),
        least(size(col("tk")) - col("start"), lit(chunkTokens))
          .as("chunk_tokens"),
        array_join(slice(col("tk"), col("start") + 1,
          lit(chunkTokens)), " ").as("chunk_text"))
  }
}
