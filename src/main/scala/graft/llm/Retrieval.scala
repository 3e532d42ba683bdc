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
  /** Length-filtered token bag per document: split("") yields [""],
    * so an unfiltered size() would hand empty/whitespace-only
    * documents dl=1; and a tokenless document is excluded from the
    * corpus entirely — it can never match, and letting dl=0 rows into
    * n_docs/avgdl skews idf and length normalization for every real
    * document (same convention as unigramSurprisal). */
  private def tokenized(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      filter(tokens(col(textCol)), t => length(t) > 0).as("tk"))
      .withColumn("dl", size(col("tk")).cast("long"))
      .where(col("dl") > 0)

  /** The BM25 per-term partial score as a column expression over
    * (tf, dl, df, n_docs, avgdl) columns — the single definition both
    * the one-shot and persisted-stats paths evaluate, so their scores
    * are bit-identical by construction. */
  private def partScore(k1: Double, b: Double)
      : org.apache.spark.sql.Column = {
    val idf = log(
      (col("n_docs").cast("double") - col("df").cast("double")
        + lit(0.5d)) / (col("df").cast("double") + lit(0.5d))
        + lit(1.0d))
    idf * (col("tf").cast("double") * lit(k1 + 1d)) /
      (col("tf").cast("double") + lit(k1) *
        (lit(1d - b) + (lit(b) * col("dl").cast("double"))
          / col("avgdl")))
  }

  /** Shared scoring tail: per-(doc, term) tf rows joined with a
    * (term, df, n_docs, avgdl) stats side, summed per doc in
    * DECIMAL(38,18), top-k by (score desc, id). */
  private def scoreTail(tf: DataFrame, dft: DataFrame, k1: Double,
      b: Double, k: Int): DataFrame =
    tf.join(broadcast(dft), "term")
      .withColumn("part", partScore(k1, b))
      .groupBy("doc_id")
      .agg(sum(col("part").cast("decimal(38,18)")).cast("double")
        .as("score_raw"),
        count(lit(1)).as("terms_hit"))
      .orderBy(col("score_raw").desc, col("doc_id").asc)
      .limit(k)
      .select(col("doc_id"), round(col("score_raw"), 6).as("score"),
        col("terms_hit"))

  def bm25TopK(docs: DataFrame, terms: Seq[String],
      idCol: String = "doc_id", textCol: String = "text",
      k1: Double = 1.5, b: Double = 0.75, k: Int = 20): DataFrame = {
    require(terms.nonEmpty, "bm25TopK: empty term set")
    val base = tokenized(docs, idCol, textCol)
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
      .crossJoin(broadcast(stats))
    scoreTail(tf, dft, k1, b, k)
  }

  /** Corpus-snapshot BM25 statistics: one row per distinct term —
    * (term, df, n_docs, avgdl) — the vocabulary-sized table a
    * production deployment computes ONCE per corpus snapshot, writes
    * to the lake, and serves to every subsequent probe set (the d08
    * corpus-bands pattern applied to retrieval; at 100 TB the
    * tokenize + df pass over the corpus dwarfs any single probe
    * query, so amortizing it across probe sets is the operative
    * shape). n_docs/avgdl ride along as repeated columns so the
    * snapshot is ONE self-contained frame.
    *
    * df here counts each document once per term however often the
    * term repeats (array_distinct before the explode) — identical to
    * the per-probe df [[bm25TopK]] derives, for any probe set. */
  def bm25BuildStats(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val base = tokenized(docs, idCol, textCol)
    val stats = base.agg(
      count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1)).cast("double"))
        .as("avgdl"))
    base
      .select(explode(array_distinct(col("tk"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(stats))
  }

  /** BM25 top-k against a persisted [[bm25BuildStats]] snapshot: only
    * the probe-term tf pass touches the corpus; df/avgdl come from
    * the stats table. Bit-identical to [[bm25TopK]] on the same
    * corpus — same tf derivation, same [[partScore]] expression tree,
    * same DECIMAL rollup (`t21` gates the equality). */
  def bm25TopKWithStats(docs: DataFrame, stats: DataFrame,
      terms: Seq[String], idCol: String = "doc_id",
      textCol: String = "text", k1: Double = 1.5, b: Double = 0.75,
      k: Int = 20): DataFrame = {
    require(terms.nonEmpty, "bm25TopKWithStats: empty term set")
    val tf = tokenized(docs, idCol, textCol)
      .select(col("doc_id"), col("dl"), explode(col("tk")).as("term"))
      .where(col("term").isInCollection(terms))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dft = stats.where(col("term").isInCollection(terms))
    scoreTail(tf, dft, k1, b, k)
  }
}
