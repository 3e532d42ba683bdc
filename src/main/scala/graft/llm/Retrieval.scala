package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import TextFunctions._

/** Corpus retrieval scoring — the ranked-lookup half of a training-data
  * pipeline (benchmark decontamination sweeps, targeted corpus audits,
  * "which documents match this probe query" diagnostics all reduce to
  * scored term lookup over the lake).
  *
  * BM25 per Robertson & Zaragoza, "The probabilistic relevance
  * framework: BM25 and beyond" (Foundations and Trends in IR, 2009),
  * with the Lucene-style idf `ln(1 + (N - df + 0.5) / (df + 0.5))`
  * which keeps idf positive for terms in more than half the corpus.
  */
object Retrieval {

  /** BM25 top-k retrieval for a fixed bag of query terms.
    *
    * Scale posture: one narrow tokenize pass feeds two hash
    * aggregations — per-(doc, term) frequencies for the probe terms
    * (the `isInCollection` filter prunes the exploded stream to probe
    * hits before any shuffle) and the O(|terms|) document-frequency
    * table — plus a single corpus-stats row; both small sides
    * broadcast. Per-term partial scores sum in DECIMAL(38,18), so the
    * total is independent of partition order, and the final top-k is
    * sort+limit (TakeOrderedAndProject — per-partition heaps, no
    * global sort materialization). No all-pairs joins, no windows.
    *
    * Determinism contract: `avgdl` is the double quotient of two exact
    * integers, and the default `k1`/`b` (1.5, 0.75) make every formula
    * constant (2.5, 0.25, 0.75) exactly representable — an external
    * engine restating the expression tree gets bit-identical scores.
    * Non-default parameters keep the algorithm but may round-trip
    * differently through SQL text.
    *
    * @return (doc_id, score, terms_hit) — top `k` by (score desc, id)
    */
  def bm25TopK(docs: DataFrame, terms: Seq[String],
      idCol: String = "doc_id", textCol: String = "text",
      k1: Double = 1.5, b: Double = 0.75, k: Int = 20): DataFrame = {
    require(terms.nonEmpty, "bm25TopK: empty term set")
    // Length-filtered tokens: split("") yields [""], so an unfiltered
    // size() would hand empty/whitespace-only documents dl=1; and a
    // tokenless document is excluded from the corpus stats entirely —
    // it can never match, and letting dl=0 rows into n_docs/avgdl
    // skews idf and length normalization for every real document
    // (same convention as unigramSurprisal: only non-empty tokens).
    val base = docs.select(col(idCol).as("doc_id"),
      filter(tokens(col(textCol)), t => length(t) > 0).as("tk"))
      .withColumn("dl", size(col("tk")).cast("long"))
      .where(col("dl") > 0)
    // One row: corpus size and mean document length. sum(long) is
    // exact, so avgdl is a single double division of two integers.
    val stats = base.agg(
      count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1)).cast("double"))
        .as("avgdl"))
    val tf = base
      .select(col("doc_id"), col("dl"), explode(col("tk")).as("term"))
      .where(col("term").isInCollection(terms))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dft = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val idf = log(
      (col("n_docs").cast("double") - col("df").cast("double")
        + lit(0.5d)) / (col("df").cast("double") + lit(0.5d))
        + lit(1.0d))
    val part = idf * (col("tf").cast("double") * lit(k1 + 1d)) /
      (col("tf").cast("double") + lit(k1) *
        (lit(1d - b) + (lit(b) * col("dl").cast("double"))
          / col("avgdl")))
    tf.join(broadcast(dft), "term")
      .crossJoin(broadcast(stats))
      .withColumn("part", part)
      .groupBy("doc_id")
      .agg(sum(col("part").cast("decimal(38,18)")).cast("double")
        .as("score_raw"),
        count(lit(1)).as("terms_hit"))
      .orderBy(col("score_raw").desc, col("doc_id").asc)
      .limit(k)
      .select(col("doc_id"), round(col("score_raw"), 6).as("score"),
        col("terms_hit"))
  }
}
