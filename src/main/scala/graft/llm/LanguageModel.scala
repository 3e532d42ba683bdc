package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import TextFunctions._

/** Language-model-based corpus filtering, in the sandbox-honest form:
  * a unigram model estimated FROM the corpus itself, scoring each
  * document by mean token surprisal `-ln p(token)`. This is the shape
  * of CCNet-style perplexity filtering (Wenzek et al., "CCNet:
  * Extracting high quality monolingual datasets from web crawl data",
  * LREC 2020) with the KenLM n-gram model replaced by the unigram MLE —
  * the dataflow (estimate token statistics, broadcast-score every
  * document, threshold the tail) is the production pipeline; swapping
  * in a real LM changes only the per-token log-probability source.
  */
object LanguageModel {

  /** Per-document mean unigram surprisal over the corpus MLE.
    *
    * Scale posture: the tokenize+explode subtree feeds two different
    * shuffles (the vocabulary-sized frequency aggregation and the
    * scoring join), whose plans diverge above the scan — so the
    * normalize/split/explode pass runs TWICE per query. At 100 TB the
    * caller amortizes it by persisting the exploded (doc_id, term)
    * frame (or materializing the frequency table once per corpus
    * snapshot and reusing it across scoring runs — the production
    * shape, since the LM changes far less often than the batch). The
    * per-token `-ln p` terms sum in DECIMAL(38,18) per document so
    * the mean is partition-order independent and restatable
    * bit-identically by an external engine. Nothing wider than
    * (doc_id, term) crosses a shuffle.
    *
    * At 100 TB the frequency table is still vocabulary-sized (tens of
    * millions of rows at web scale — a shuffle aggregation, then a
    * plain hash join that AQE will broadcast when it fits).
    *
    * @return (doc_id, n_tokens, mean_surprisal, is_outlier) — one row
    *         per document with at least one non-empty token
    */
  def unigramSurprisal(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", outlierAbove: Double = 3.45)
      : DataFrame = {
    val tok = docs
      .select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("term"))
      .where(length(col("term")) > 0)
    val freq = tok.groupBy("term").agg(count(lit(1)).as("cnt"))
    // One row: the exact corpus token total (sum of longs).
    val total = freq.agg(sum(col("cnt")).as("total"))
    val scored = tok
      .join(freq, "term")
      .crossJoin(broadcast(total))
      .withColumn("surprisal",
        -log(col("cnt").cast("double") / col("total").cast("double")))
    scored.groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        (sum(col("surprisal").cast("decimal(38,18)")).cast("double")
          / count(lit(1))).as("ms"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("ms"), 6).as("mean_surprisal"),
        (col("ms") > outlierAbove).as("is_outlier"))
  }
}
