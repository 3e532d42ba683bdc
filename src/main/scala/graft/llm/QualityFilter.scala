package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextFunctions._

/** Linear quality classifier over hashed n-gram bag features — the
  * fastText shape (Joulin et al., "Bag of Tricks for Efficient Text
  * Classification", EACL 2017: a bag of hashed uni+bigram features
  * feeding one linear layer) with the weights trained in closed form
  * as multinomial Naive-Bayes log-count ratios (Wang & Manning,
  * "Baselines and Bigrams: Simple, Good Sentiment and Topic
  * Classification", ACL 2012 — the NB weight vector their NBSVM
  * builds on). This is the most-used LLM curation filter after
  * dedup: CCNet (Wenzek et al., LREC 2020) and the GPT-3 pipeline
  * (Brown et al., NeurIPS 2020, Appendix A) both score web documents
  * with a linear classifier trained "curated reference vs random
  * crawl" and keep the high-scoring side.
  *
  * Closed-form training is the deliberate choice over iterative
  * logistic descent: the weights are pure count ratios, so the model
  * restates exactly in external SQL (the repo's oracle discipline)
  * and trains in two corpus-bounded aggregations instead of N
  * gradient passes — at 100 TB the difference between "one groupBy
  * per corpus release" and "a multi-pass optimizer".
  */
object QualityFilter {

  /** Per-document quality score under a multinomial-NB linear model
    * trained on POSITIVE = the `positive` predicate (a curated,
    * known-good slice — e.g. a reference `source` set) and NEGATIVE =
    * the deterministic raw sample `id % negMod == negRem` EXCLUDING
    * positives (disjoint labels — the classifier contrast is curated
    * vs ordinary crawl, so a curated doc must not sit on both sides
    * the way DSIR's overlapping slices legitimately can).
    *
    * Features: the [[Importance]] machinery verbatim — every word
    * unigram and adjacent word bigram of the normalized token stream,
    * hashed by the portable base-31 polynomial mod 1e9+7 into
    * `buckets` counting buckets (bit-restatable in external SQL;
    * collisions are part of the estimator, identical on both sides).
    *
    * Model (add-one smoothed, every term finite):
    *   - per-bucket weight
    *     `w[b] = ln((cp[b]+1)/(Np+B)) − ln((cn[b]+1)/(Nn+B))`
    *     from the two slices' bucket counts and feature masses;
    *   - class prior `ln((docs_pos+1)/(docs_neg+1))` over the slices'
    *     DOCUMENT counts (add-one so an empty slice degrades to a
    *     finite prior instead of ±Inf).
    *   - `score(d) = prior + Σ_b c_d[b] · w[b]`, the per-(doc,bucket)
    *     term one IEEE product cast to DECIMAL(38,18) and summed
    *     exactly — partition-order independent, bit-restatable, the
    *     surprisal family's discipline. `keep = score > 0` (the
    *     classifier's decision boundary; thresholded variants
    *     compose downstream exactly like the surprisal quantile
    *     gate).
    *
    * Scale posture: identical to [[Importance.dsirLogWeights]] —
    * every gram instance hashes to its bucket IN-ROW, so the one
    * corpus exchange carries map-side-combined (doc_id, bucket, k)
    * longs, never gram strings; both stats tables are bucket-bounded
    * (≤ `buckets` rows — broadcast material); scoring is one
    * map-side-joinable pass over per-(doc,bucket) rows. At 100 TB the
    * weight vector (one `buckets`-row table) is trained once per
    * labeled-slice release and every scoring run is a single pass —
    * the same cheapest-filter-family shape as DSIR.
    *
    * @param positive curated-slice predicate, evaluated against the
    *                 original `docs` columns
    *                 (e.g. `col("source").isin("src0", "src1")`)
    * @return (doc_id, n_grams, score, keep) — one row per document
    *         with at least one non-empty token; `score` rounded to 6
    *         for a stable public surface, `keep` derived from the
    *         rounded score so the verdict is as portable as the score
    */
  def nbQualityScores(docs: DataFrame, positive: Column,
      idCol: String = "doc_id", textCol: String = "text",
      buckets: Int = 8192, negMod: Int = 3, negRem: Int = 1)
      : DataFrame = {
    require(buckets > 0,
      s"nbQualityScores: buckets must be positive, got $buckets")
    val tk = docs
      .select(col(idCol).as("doc_id"), positive.as("is_pos"),
        filter(tokens(col(textCol)), t => length(t) > 0).as("tk"))
      .where(size(col("tk")) > 0)
    val isNeg = !col("is_pos") &&
      col("doc_id") % negMod === negRem
    val bigramsOf = when(size(col("tk")) >= 2,
      transform(sequence(lit(1), size(col("tk")) - 1),
        i => concat(element_at(col("tk"), i), lit(" "),
          element_at(col("tk"), i + 1))))
      .otherwise(array().cast("array<string>"))
    // Hash each gram instance to its bucket IN-ROW and aggregate
    // straight to per-(doc, bucket) counts — the Importance
    // discipline (see [[Importance.dsirLogWeights]]'s note: the one
    // corpus exchange carries (doc_id, b, k) longs instead of
    // distinct (doc, gram) pairs with their gram strings, and the
    // former three post-shuffle re-aggregations collapse; grouped
    // sums are identical by associativity, so outputs and oracles
    // are unchanged). `is_pos` is constant per doc, so keying the
    // groupBy by it too still yields one row per (doc, bucket).
    val db = tk
      .select(col("doc_id"), col("is_pos"),
        explode(concat(col("tk"), bigramsOf)).as("g"))
      .select(col("doc_id"), col("is_pos"),
        (graft.functions.GraftFunctions.polyHash(col("g"))
          % buckets.toLong).as("b"))
      .groupBy("doc_id", "is_pos", "b")
      .agg(count(lit(1)).as("k"))
    val pos = db.where(col("is_pos"))
      .groupBy("b").agg(sum(col("k")).as("cp"))
    val neg = db.where(isNeg)
      .groupBy("b").agg(sum(col("k")).as("cn"))
    // One row: gram masses of the two slices plus their DOCUMENT
    // counts (for the prior) — all coalesced so an empty slice
    // yields finite smoothed estimates, not NULL/Inf.
    val tots = pos.agg(coalesce(sum(col("cp")), lit(0L)).as("np"))
      .crossJoin(neg.agg(coalesce(sum(col("cn")), lit(0L)).as("nn")))
      .crossJoin(tk.agg(
        sum(when(col("is_pos"), 1L).otherwise(0L)).as("dp"),
        sum(when(isNeg, 1L).otherwise(0L)).as("dn")))
    def lnP(c: Column, n: Column): Column =
      log((coalesce(c, lit(0L)) + lit(1L)).cast("double")
        / (n + lit(buckets.toLong)).cast("double"))
    val prior = log((col("dp") + lit(1L)).cast("double")
      / (col("dn") + lit(1L)).cast("double"))
    db
      .join(pos, Seq("b"), "left")
      .join(neg, Seq("b"), "left")
      .crossJoin(broadcast(tots))
      .groupBy("doc_id")
      .agg(sum(col("k")).as("n_grams"),
        round(first(prior)
          + sum((col("k").cast("double")
              * (lnP(col("cp"), col("np")) - lnP(col("cn"), col("nn"))))
            .cast("decimal(38,18)")).cast("double"), 6).as("score"))
      .select(col("doc_id"), col("n_grams"), col("score"),
        (col("score") > 0.0).as("keep"))
  }
}
