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
    // Build the per-doc chunk structs BEFORE the explode: exploding
    // (id, tk, start) first duplicates the full token array into
    // every chunk row's unsafe buffer (~chunks x tokens bytes of
    // copy); this form materializes the token array once per doc,
    // renders each chunk's text, and the explode fans out only the
    // finished (len, text) structs.
    docs
      .select(col(idCol).as("id"), tk.as("tk"), starts.as("starts"))
      .select(col("id"), posexplode(transform(col("starts"),
        s => struct(
          least(size(col("tk")) - s, lit(chunkTokens)).as("len"),
          array_join(slice(col("tk"), s + 1, lit(chunkTokens)), " ")
            .as("text")))))
      .select(
        col("id"),
        col("pos").as("chunk_idx"),
        col("col.len").as("chunk_tokens"),
        col("col.text").as("chunk_text"))
  }

  /** Sequence packing: assign chunks to fixed token-budget bins by
    * contiguous fill — bin = floor(exclusive-prefix-sum / budget) in a
    * deterministic order within each shard. Sharding (e.g. by source)
    * keeps the prefix sum a per-partition window instead of a global
    * sort, which is what makes packing parallel at corpus scale; bins
    * may overflow by at most one chunk (the standard streaming
    * packing approximation — exact bin packing is NP-hard and
    * sequential).
    *
    * @param chunks  rows with `tokensCol` counts and the ordering keys
    * @param shardCol partition key (bins never span shards)
    * @param orderCols deterministic fill order within a shard
    * @param budget  bin capacity in tokens
    */
  def pack(chunks: DataFrame, shardCol: String, orderCols: Seq[String],
      tokensCol: String = "chunk_tokens", budget: Int = 1024)
      : DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(shardCol))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    chunks
      .withColumn("_cum", sum(col(tokensCol)).over(w))
      .withColumn("bin_id",
        ((col("_cum") - col(tokensCol)) / budget).cast("long"))
      .drop("_cum")
  }
}
