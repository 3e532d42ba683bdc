package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextFunctions._

/** Data Selection via Importance Resampling (Xie et al., "Data
  * Selection for Language Models via Importance Resampling",
  * NeurIPS 2023 — DSIR): estimate hashed-n-gram bag-of-words
  * distributions for a TARGET corpus (the curated domain you want
  * more of) and for the RAW pool, then weight every raw document by
  * its log importance ratio under the two multinomials. Documents
  * whose feature mass concentrates where the target distribution
  * exceeds the raw one score high; the published pipeline then
  * resamples by these weights (Gumbel top-k). The weights themselves
  * are the operator here — deterministic, restatable, and the
  * expensive distributed part; the resample is a top-k/threshold over
  * one double per document (see the gate's quantile composition).
  */
object Importance {

  /** Per-document DSIR log importance weight over hashed unigram +
    * bigram features.
    *
    * Features (the paper's §3 instantiation): every word unigram and
    * every adjacent word bigram of the normalized token stream,
    * hashed into `buckets` counting buckets. The hash must restate in
    * external SQL bit-identically, so it is the repo's portable
    * base-31 polynomial over code points mod 1e9+7 (the d04/d11 gram
    * key family), reduced mod `buckets` — NOT a JVM-internal hash.
    *
    * Distributions: add-one-smoothed bucket multinomials
    * `p[b] = (cnt_target[b]+1) / (N_target+B)` from the target slice
    * (an arbitrary predicate over the document attributes — here a
    * curated `source` set) and `q[b]` likewise from the deterministic
    * raw sample `id % rawMod == rawRem`. Smoothing makes every bucket
    * ratio finite, so unseen features contribute a fixed negative
    * (or positive) prior term instead of poisoning the sum.
    *
    * Per-document weight:
    *   `log w(d) = Σ_b c_d[b] · (ln p[b] − ln q[b])`
    * with the per-(doc,bucket) term computed as one IEEE product cast
    * to DECIMAL(38,18) and summed exactly — partition-order
    * independent, bit-restatable, same discipline as the surprisal
    * family.
    *
    * Scale posture: every gram instance hashes to its bucket id
    * IN-ROW (a fused codegen kernel), so the one corpus exchange
    * carries map-side-combined (doc_id, bucket, k) longs — never
    * gram strings, never token instances; both stats tables are
    * bucket-bounded (≤ `buckets` rows — broadcast material by
    * construction, far smaller than a vocabulary); the scoring join
    * is a per-(doc,bucket) equi-join against those fixed-size
    * tables. At 100 TB the two stats tables are computed once per
    * target/pool release (tiny: `buckets` longs each) and every
    * scoring run is a single map-side-joinable pass — the cheapest
    * filter family in the repo.
    *
    * @param target target-domain predicate, evaluated against the
    *               original `docs` columns
    *               (e.g. `col("source").isin("src0", "src1")`)
    * @param buckets feature-hash bucket count B (the paper uses 10k;
    *               any fixed B works — collisions are part of the
    *               estimator, identical on both sides)
    * @return (doc_id, n_grams, logw) — one row per document with at
    *         least one non-empty token; `logw` rounded to 6 for a
    *         stable public surface
    */
  def dsirLogWeights(docs: DataFrame, target: Column,
      idCol: String = "doc_id", textCol: String = "text",
      buckets: Int = 8192, rawMod: Int = 3, rawRem: Int = 1)
      : DataFrame = {
    require(buckets > 0, s"dsirLogWeights: buckets must be positive," +
      s" got $buckets")
    val tk = docs
      .select(col(idCol).as("doc_id"), target.as("is_target"),
        filter(tokens(col(textCol)), t => length(t) > 0).as("tk"))
      .where(size(col("tk")) > 0)
    // Adjacent word bigrams as "w1 w2" strings (the space cannot
    // occur inside a token — tokens() split on it), same narrow
    // sequence-transform shape as the LM pair extraction; a one-token
    // doc yields an EMPTY bigram array (sequence(1, 0) descends — the
    // standing guard).
    val bigramsOf = when(size(col("tk")) >= 2,
      transform(sequence(lit(1), size(col("tk")) - 1),
        i => concat(element_at(col("tk"), i), lit(" "),
          element_at(col("tk"), i + 1))))
      .otherwise(array().cast("array<string>"))
    // Hash each gram instance to its bucket id BEFORE the shuffle and
    // aggregate straight to per-(doc, bucket) counts: the one corpus
    // exchange then carries (doc_id, b, k) longs instead of distinct
    // (doc, gram)-pair rows with their gram STRINGS (~6x narrower
    // rows and fewer of them — b < `buckets`), and the former
    // per-(doc, gram) intermediate's three post-shuffle
    // re-aggregations (per-doc-bucket, target, raw) collapse to one
    // map-side-combined groupBy plus two bucket-bounded rollups.
    // Hashing per INSTANCE instead of per distinct (doc, gram) pair
    // costs ~2.3x more scalar hash evaluations — a fused codegen
    // kernel over short strings, far cheaper than shipping the
    // strings. Event-log at sf0.1: per-query shuffle bytes 16.2 ->
    // 7.4 MB (t33), 16.1 -> 7.3 (t35), 15.7 -> 7.1 (t37) and execCPU
    // -37..-45%; wall a wash at this fixture size (two paired
    // best-of-5 runs, both directions, within the box's noise band) —
    // the halved exchange is the 100 TB lever. The grouped sums are
    // identical by associativity, so every output (and oracle) is
    // unchanged.
    // Portable bucket id: base-31 polynomial over code points mod
    // 1e9+7 (non-negative — [[graft.functions.PolyHashString]], the
    // codegen'd scalar form of the d04/d11 gram-key family), reduced
    // mod B. Collisions inside a bucket are part of the DSIR
    // estimator, identical on both engines.
    // `is_target` is constant per doc, so keying the groupBy by it
    // too still yields one row per (doc, bucket).
    val db = tk
      .select(col("doc_id"), col("is_target"),
        explode(concat(col("tk"), bigramsOf)).as("g"))
      .select(col("doc_id"), col("is_target"),
        (graft.functions.GraftFunctions.polyHash(col("g"))
          % buckets.toLong).as("b"))
      .groupBy("doc_id", "is_target", "b")
      .agg(count(lit(1)).as("k"))
    val tgt = db.where(col("is_target"))
      .groupBy("b").agg(sum(col("k")).as("ct"))
    val raw = db.where(col("doc_id") % rawMod === rawRem)
      .groupBy("b").agg(sum(col("k")).as("cq"))
    // One row each: exact feature totals of the two slices.
    val tots = tgt.agg(sum(col("ct")).as("nt"))
      .crossJoin(raw.agg(sum(col("cq")).as("nq")))
    def lnP(c: Column, n: Column): Column =
      log((coalesce(c, lit(0L)) + lit(1L)).cast("double")
        / (n + lit(buckets.toLong)).cast("double"))
    db
      .join(tgt, Seq("b"), "left")
      .join(raw, Seq("b"), "left")
      .crossJoin(broadcast(tots))
      .groupBy("doc_id")
      .agg(sum(col("k")).as("n_grams"),
        sum((col("k").cast("double")
            * (lnP(col("ct"), col("nt")) - lnP(col("cq"), col("nq"))))
          .cast("decimal(38,18)")).cast("double").as("w"))
      .select(col("doc_id"), col("n_grams"),
        round(col("w"), 6).as("logw"))
  }

  /** The RESAMPLE step of DSIR: draw `k` documents without
    * replacement with probability proportional to their importance
    * weights, via the Gumbel-top-k identity (Xie et al. §3 run
    * exactly this): adding an independent standard Gumbel
    * `g = −ln(−ln u)` to each log weight and taking the k largest
    * keys IS a proportional-without-replacement sample. The
    * "randomness" is the repo's deterministic portable LCG over the
    * doc id ([[Mixing.keepPortable]]'s step, mod 2^31), shifted to
    * the open unit interval as `u = (lcg + 0.5) / 2^31` — never 0 or
    * 1, so both logs are finite — which makes the sample a pure
    * function of (corpus, target, k): rerunnable, auditable, and
    * restatable bit-for-bit in external SQL.
    *
    * APPROXIMATION NOTE: one affine LCG step of the doc id is a
    * LATTICE over the unit interval, not an i.i.d. uniform draw — so
    * the Gumbel-top-k identity's proportional-without-replacement
    * guarantee holds only approximately, and id-residue structure
    * can in principle bias which BOUNDARY documents (those whose
    * log-weight gap is within the noise scale) are selected. This is
    * the deliberate trade for a deterministic, external-SQL-restatable
    * contract; callers needing stronger noise can pre-hash the id
    * through the repo's wide polynomial family before the unit-
    * interval shift (still deterministic and restatable) at the cost
    * of re-baselining every recorded sample.
    *
    * Ordering contract: both engines rank by the ROUNDED key (6 dp,
    * the same public rounding as `logw`) with doc_id as tie-break, so
    * the boundary of the sample cannot depend on sub-rounding FP
    * noise.
    *
    * Scale posture: one map pass over [[dsirLogWeights]]'s output
    * adds the key; the global top-k collapses to per-partition
    * bounded heaps + a driver merge of k rows
    * (`TakeOrderedAndProject`) — no corpus-sized sort, no extra
    * shuffle at any corpus size.
    *
    * @return the k sampled rows: (doc_id, n_grams, logw, gkey),
    *         gkey = round(logw + gumbel(doc_id), 6)
    */
  def dsirResample(docs: DataFrame, target: Column, k: Int,
      idCol: String = "doc_id", textCol: String = "text",
      buckets: Int = 8192, rawMod: Int = 3, rawRem: Int = 1)
      : DataFrame = {
    require(k > 0, s"dsirResample: k must be positive, got $k")
    val m = 2147483648L
    val w = dsirLogWeights(docs, target, idCol, textCol, buckets,
      rawMod, rawRem)
    val lcg = pmod(pmod(col("doc_id"), lit(m)) * 1103515245L
      + 12345L, lit(m))
    val u = (lcg.cast("double") + lit(0.5)) / lit(m.toDouble)
    val gumbel = -log(-log(u))
    w.withColumn("gkey", round(col("logw") + gumbel, 6))
      .orderBy(col("gkey").desc, col("doc_id"))
      .limit(k)
  }
}
