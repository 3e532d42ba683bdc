package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
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
    * shuffles (the map-side-combined (doc, term, k) pair aggregation,
    * off which the vocabulary frequency table hangs, and the scoring
    * join), whose plans diverge above the scan — so the
    * normalize/split/explode pass runs TWICE per query. At 100 TB the
    * caller amortizes it by persisting the (doc_id, term, k) pair
    * frame (or materializing the frequency table once per corpus
    * snapshot and reusing it across scoring runs — the production
    * shape, since the LM changes far less often than the batch). Both
    * shuffles carry DISTINCT (doc, term) pairs, never raw token
    * instances. The per-pair `k * -ln p` terms sum in DECIMAL(38,18)
    * per document so the mean is partition-order independent and
    * restatable bit-identically by an external engine. Nothing wider
    * than (doc_id, term, k) crosses a shuffle.
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
    // Collapse to distinct (doc, term) pairs with in-doc multiplicity
    // k BEFORE the vocabulary join: the join and the per-doc
    // aggregation then shuffle |distinct pairs| rows instead of
    // |token instances| (~2.3x fewer on the fixtures; Zipfian text
    // repeats common terms within a document far more, so the gap
    // widens with corpus realism). The pair aggregation itself is
    // map-side combinable on the narrow (doc_id, term) key.
    val dt = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("k"))
    val freq = dt.groupBy("term").agg(sum(col("k")).as("cnt"))
    // One row: the exact corpus token total (sum of longs).
    val total = freq.agg(sum(col("cnt")).as("total"))
    // Exactness discipline: the per-pair contribution k * (-ln p) is
    // one IEEE product cast to DECIMAL(38,18), and the per-doc sum is
    // exact decimal addition — partition-order independent and
    // restated term-for-term by the DuckDB oracles (multiplying the
    // CAST decimal by k instead would round at Spark's adjusted
    // product scale and break bit-parity).
    val scored = dt
      .join(freq, "term")
      .crossJoin(broadcast(total))
      .withColumn("surprisal",
        -log(col("cnt").cast("double") / col("total").cast("double")))
    scored.groupBy("doc_id")
      .agg(sum(col("k")).as("n_tokens"),
        (sum((col("k").cast("double") * col("surprisal"))
            .cast("decimal(38,18)")).cast("double")
          / sum(col("k"))).as("ms"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("ms"), 6).as("mean_surprisal"),
        (col("ms") > outlierAbove).as("is_outlier"))
  }

  /** Per-document mean BIGRAM surprisal under Stupid Backoff (Brants
    * et al., "Large Language Models in Machine Translation",
    * EMNLP 2007 — the backoff score designed FOR distributed n-gram
    * training, which is why it is the right higher-order form here:
    * no discount normalization pass, every statistic a plain count).
    *
    * Model estimation is split from scoring the way the published
    * pipelines do it (CCNet trains the LM on a reference corpus and
    * scores the crawl): statistics come from the deterministic
    * TRAINING SLICE `id % trainMod == trainRem`, and every document
    * is scored against them — so the backoff path is REAL (unseen
    * bigrams/terms genuinely occur) instead of dead weight that
    * self-scoring can never reach.
    *
    * Per-token score, in backoff order:
    *   - token 1 of a doc (no context), or an unseen context/bigram:
    *     the add-one unigram base `p1(w) = (cnt(w)+1)/(N+V)` (add-one
    *     makes OOV exact instead of -ln 0), times `alpha` on the
    *     backoff path per Stupid Backoff;
    *   - seen bigram: `S(w|prev) = cnt2(prev,w)/cnt(prev)`.
    *   surprisal = -ln of the score; the per-doc mean sums the
    *   per-instance terms in DECIMAL(38,18) exactly like
    *   [[unigramSurprisal]], so the result is partition-order
    *   independent and restates bit-identically in external SQL.
    *
    * Scale posture: both stats tables are corpus-bounded aggregations
    * (unigrams vocabulary-sized; bigrams bounded by distinct adjacent
    * pairs, sharded by hash like any groupBy — never a cross
    * product), and scoring collapses to DISTINCT (doc, prev, cur)
    * triples with multiplicity before the stats joins, so the join
    * shuffles pair-distinct rows, not token instances. The stats
    * joins are plain equi-joins AQE broadcasts when the tables fit.
    * Nothing driver-side; the model "snapshot" (uni/bigram frames)
    * is exactly what a production pipeline would persist once per
    * reference-corpus release and reuse across scoring runs.
    *
    * @return (doc_id, n_tokens, mean_surprisal) — one row per
    *         document with at least one non-empty token
    */
  def bigramSurprisal(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", alpha: Double = 0.4,
      trainMod: Int = 3, trainRem: Int = 1): DataFrame =
    bigramSurprisal(docs,
      col(idCol) % trainMod === trainRem, idCol, textCol, alpha)

  /** Bounded-persist slot for the tokenized corpus frame (the
    * [[graft.llm.Dedup.swapCached]] discipline: at most ONE live
    * cached occupant, identical plans reuse it). See the A/B note at
    * the persist site below. */
  private val tkSlot =
    new java.util.concurrent.atomic.AtomicReference[DataFrame]()

  /** [[bigramSurprisal]] with an arbitrary training-slice predicate,
    * evaluated against the ORIGINAL `docs` columns (so a slice can be
    * keyed by `source`, `lang`, or any other document attribute, not
    * just the id) — the form [[crossEntropyDiff]] needs, where the
    * in-domain model trains on a curated source set. Same model, same
    * scoring, same exactness discipline as the modulus form, which
    * delegates here. */
  def bigramSurprisal(docs: DataFrame, trainFilter: Column,
      idCol: String, textCol: String, alpha: Double): DataFrame = {
    val tk0 = docs
      .select(col(idCol).as("doc_id"), trainFilter.as("is_train"),
        filter(tokens(col(textCol)), t => length(t) > 0).as("tk"))
      .where(size(col("tk")) > 0)
    // The four consumers in scoreBigram (unigram stats, bigram stats,
    // first tokens, pair instances) would each re-tokenize the
    // corpus. Unlike d25's exact-survivor frame (where recompute won —
    // the subtree fused into each consumer's codegen), the tokenize
    // subtree here is regex-filter + split work whose output is small
    // relative to its cost, and the round-14 A/B says persist WINS:
    // 10x recompute 6.64/8.19 s (best/median-of-3) vs persist
    // 5.84/7.66 s; 100x recompute 13.85/15.29 s vs persist
    // 10.92/11.84 s (0.79x at best). Adopted through the swapCached
    // slot so however many LM queries run in one session, at most one
    // corpus-sized tokenized frame is ever live (identical plans
    // share the one materialization; a differing plan swaps it). At
    // 100 TB the production analogue is a tokenized corpus table
    // materialized once per release and read by every model build.
    scoreBigram(Dedup.swapCached(tkSlot, tk0), col("is_train"), alpha)
  }

  /** Stupid Backoff bigram model-build + scoring over an ALREADY
    * TOKENIZED frame `(doc_id, tk: array<string>, …flags)` — split
    * out of [[bigramSurprisal]] so [[crossEntropyDiff]] can tokenize
    * the corpus ONCE with both train flags as columns and feed the
    * same (cached) frame to both model builds. `trainCol` names the
    * boolean column selecting the training slice; extra columns ride
    * along unreferenced. Same stats tables, same backoff arms, same
    * DECIMAL exactness discipline as before the split. */
  private def scoreBigram(tk: DataFrame, trainCol: Column,
      alpha: Double): DataFrame = {
    // Adjacent-pair extraction as one narrow expression (no
    // self-join): i-th struct pairs tk[i] with tk[i+1]. A one-token
    // doc must yield an EMPTY pair array — sequence(1, 0) would emit
    // a DESCENDING range (the Bpe guard, same trap).
    val pairsOf = when(size(col("tk")) >= 2,
      transform(sequence(lit(1), size(col("tk")) - 1),
        i => struct(element_at(col("tk"), i).as("prev"),
          element_at(col("tk"), i + 1).as("cur"))))
      .otherwise(array().cast("array<struct<prev:string,cur:string>>"))
    val train = tk.where(trainCol)
    val uni = train.select(explode(col("tk")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
    // One row: exact token total N and vocabulary size V (longs).
    val tot = uni.agg(sum(col("cnt")).as("n"),
      count(lit(1)).as("v"))
    val bfreq = train.select(explode(pairsOf).as("b"))
      .select(col("b.prev").as("prev"), col("b.cur").as("cur"))
      .groupBy("prev", "cur").agg(count(lit(1)).as("cnt2"))
    // Add-one unigram base over the training slice; `c` is the
    // (possibly missing) training count of the scored term.
    def p1(c: Column): Column =
      (coalesce(c, lit(0L)) + lit(1L)).cast("double") /
        (col("n") + col("v")).cast("double")
    // First token of every doc: unigram base, no alpha (it is the
    // base case, not a backoff).
    val first = tk
      .select(col("doc_id"), element_at(col("tk"), 1).as("term"))
      .join(uni.withColumnRenamed("cnt", "cnt_cur"), Seq("term"),
        "left")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"), lit(1L).as("k"),
        (-log(p1(col("cnt_cur")))).as("surprisal"))
    // Remaining tokens: distinct (doc, prev, cur) with multiplicity,
    // then the two stats joins. cnt2 non-null implies prev was seen
    // in training (the bigram came from there), so the seen branch
    // never divides by a missing context count.
    val bg = tk.select(col("doc_id"), explode(pairsOf).as("b"))
      .select(col("doc_id"), col("b.prev").as("prev"),
        col("b.cur").as("cur"))
      .groupBy("doc_id", "prev", "cur").agg(count(lit(1)).as("k"))
    val rest = bg
      .join(bfreq, Seq("prev", "cur"), "left")
      .join(uni.select(col("term").as("prev"),
        col("cnt").as("cnt_prev")), Seq("prev"), "left")
      .join(uni.select(col("term").as("cur"),
        col("cnt").as("cnt_cur")), Seq("cur"), "left")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"), col("k"),
        when(col("cnt2").isNotNull,
          -log(col("cnt2").cast("double")
            / col("cnt_prev").cast("double")))
          .otherwise(-log(lit(alpha) * p1(col("cnt_cur"))))
          .as("surprisal"))
    // n_tokens = 1 (first) + (size-1) (pairs) = size, recovered as
    // sum(k) — no extra join back to the token arrays.
    first.unionByName(rest)
      .groupBy("doc_id")
      .agg(sum(col("k")).as("n_tokens"),
        (sum((col("k").cast("double") * col("surprisal"))
            .cast("decimal(38,18)")).cast("double")
          / sum(col("k"))).as("ms"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("ms"), 6).as("mean_surprisal"))
  }

  /** BOTH Stupid Backoff models scored in ONE pass over an already
    * tokenized frame — the two-model fusion [[crossEntropyDiff]]
    * runs. [[scoreBigram]] called twice extracts the first-token and
    * distinct-(doc,prev,cur) streams TWICE (the pair explode + its
    * corpus-sized distinct shuffle are per-model there, though only
    * the STATS tables differ between the models) and then pays a
    * corpus-sized equi-join to line the two means back up. Here the
    * instance streams are built once, each instance row joins both
    * models' stats tables (all corpus-bounded; AQE broadcasts them
    * when they fit), and one per-doc aggregation produces both means
    * — halving the pair-explode work, removing one corpus-distinct
    * exchange and the final join outright.
    *
    * Exactness: per instance the two surprisal terms are computed by
    * the same arms as [[scoreBigram]]'s; the per-doc DECIMAL(38,18)
    * sums are exact and order-independent, so ms_in/ms_gen are
    * BIT-IDENTICAL to the two-pass form's (same instances, same
    * terms, same rounding) — every oracle unchanged by construction.
    *
    * @return (doc_id, n_tokens, ms_in, ms_gen) */
  private def scoreBigram2(tk: DataFrame, trainIn: Column,
      trainGen: Column, alpha: Double): DataFrame = {
    val pairsOf = when(size(col("tk")) >= 2,
      transform(sequence(lit(1), size(col("tk")) - 1),
        i => struct(element_at(col("tk"), i).as("prev"),
          element_at(col("tk"), i + 1).as("cur"))))
      .otherwise(array().cast("array<struct<prev:string,cur:string>>"))
    // BOTH models' stats tables from ONE pass each (not one per
    // model): explode the UNION training slice once and count each
    // model's contribution conditionally. A zero conditional count is
    // mapped back to NULL so the merged table joins exactly like the
    // per-model tables did (absent-from-slice = missing row = NULL —
    // the backoff arms key on null-ness). Halves the stats
    // aggregations (6 -> 3), their explode passes over the training
    // slices (4 -> 2) and the stats joins on the instance streams
    // (8 -> 4).
    def nz(c: Column): Column = when(c > 0L, c)
    val train = tk.where(trainIn || trainGen)
    val uniB = train
      .select(explode(col("tk")).as("term"), trainIn.as("ti"),
        trainGen.as("tg"))
      .groupBy("term").agg(count(when(col("ti"), 1)).as("ci"),
        count(when(col("tg"), 1)).as("cg"))
      .select(col("term"), nz(col("ci")).as("cnt_i"),
        nz(col("cg")).as("cnt_g"))
    // One row: each model's exact token total and vocabulary size
    // (count(col) counts non-nulls = terms present in that slice).
    val tot = uniB.agg(
      sum(coalesce(col("cnt_i"), lit(0L))).as("n_i"),
      count(col("cnt_i")).as("v_i"),
      sum(coalesce(col("cnt_g"), lit(0L))).as("n_g"),
      count(col("cnt_g")).as("v_g"))
    val bfB = train
      .select(explode(pairsOf).as("b"), trainIn.as("ti"),
        trainGen.as("tg"))
      .select(col("b.prev").as("prev"), col("b.cur").as("cur"),
        col("ti"), col("tg"))
      .groupBy("prev", "cur").agg(count(when(col("ti"), 1)).as("c2i"),
        count(when(col("tg"), 1)).as("c2g"))
      .select(col("prev"), col("cur"), nz(col("c2i")).as("cnt2_i"),
        nz(col("c2g")).as("cnt2_g"))
    def p1(c: Column, sfx: String): Column =
      (coalesce(c, lit(0L)) + lit(1L)).cast("double") /
        (col("n" + sfx) + col("v" + sfx)).cast("double")
    // First token of every doc: unigram base for BOTH models.
    val first = tk
      .select(col("doc_id"), element_at(col("tk"), 1).as("term"))
      .join(uniB.select(col("term"), col("cnt_i").as("cnt_cur_i"),
        col("cnt_g").as("cnt_cur_g")), Seq("term"), "left")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"), lit(1L).as("k"),
        (-log(p1(col("cnt_cur_i"), "_i"))).as("s_i"),
        (-log(p1(col("cnt_cur_g"), "_g"))).as("s_g"))
    // Remaining tokens: ONE distinct (doc, prev, cur) stream, both
    // models' stats joined onto it.
    val bg = tk.select(col("doc_id"), explode(pairsOf).as("b"))
      .select(col("doc_id"), col("b.prev").as("prev"),
        col("b.cur").as("cur"))
      .groupBy("doc_id", "prev", "cur").agg(count(lit(1)).as("k"))
    val rest = bg
      .join(bfB, Seq("prev", "cur"), "left")
      .join(uniB.select(col("term").as("prev"),
        col("cnt_i").as("cnt_prev_i"),
        col("cnt_g").as("cnt_prev_g")), Seq("prev"), "left")
      .join(uniB.select(col("term").as("cur"),
        col("cnt_i").as("cnt_cur_i"),
        col("cnt_g").as("cnt_cur_g")), Seq("cur"), "left")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"), col("k"),
        when(col("cnt2_i").isNotNull,
          -log(col("cnt2_i").cast("double")
            / col("cnt_prev_i").cast("double")))
          .otherwise(-log(lit(alpha) * p1(col("cnt_cur_i"), "_i")))
          .as("s_i"),
        when(col("cnt2_g").isNotNull,
          -log(col("cnt2_g").cast("double")
            / col("cnt_prev_g").cast("double")))
          .otherwise(-log(lit(alpha) * p1(col("cnt_cur_g"), "_g")))
          .as("s_g"))
    first.unionByName(rest)
      .groupBy("doc_id")
      .agg(sum(col("k")).as("n_tokens"),
        (sum((col("k").cast("double") * col("s_i"))
            .cast("decimal(38,18)")).cast("double")
          / sum(col("k"))).as("msi"),
        (sum((col("k").cast("double") * col("s_g"))
            .cast("decimal(38,18)")).cast("double")
          / sum(col("k"))).as("msg"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("msi"), 6).as("ms_in"),
        round(col("msg"), 6).as("ms_gen"))
  }

  /** Moore–Lewis cross-entropy difference selection (Moore & Lewis,
    * "Intelligent Selection of Language Model Training Data",
    * ACL 2010) — the classic in-domain data-selection score, and the
    * form CCNet-style pipelines (Wenzek et al., LREC 2020) rank web
    * text with: score each document by
    * `H_in(d) − H_gen(d)`, the difference between its mean surprisal
    * under an IN-DOMAIN language model (trained on a curated slice —
    * here a `source`-keyed predicate over the document attributes)
    * and under a GENERAL model (trained on the same deterministic
    * id-modulus sample of the raw pool [[bigramSurprisal]] uses).
    * Lower is better: a negative difference means the in-domain model
    * predicts the document better than the general one, i.e. the
    * document looks like the target domain. Both models are the same
    * Stupid Backoff bigram estimator, so the two surprisals are
    * directly comparable (same backoff arms, same add-one base).
    *
    * Scale posture: the corpus is tokenized ONCE, carrying BOTH train
    * flags as boolean columns, and that single (cached — the shared
    * [[tkSlot]]) frame feeds both model builds and both scoring
    * passes — eight consumers, one materialization. (The pre-r15 form
    * called [[bigramSurprisal]] twice; the two tokenize plans
    * differed at the train slice, so the slot eagerly built the
    * in-domain frame and then swapped it out UNREAD for the general
    * one — a full wasted corpus tokenize+persist pass per invocation.
    * Measured idle-box at sf0.1, best-of-5: shared frame
    * 2.24/2.67 s (best/median) vs 4.05/5.35 s — 0.55x.) Beyond the
    * shared frame it is exactly two
    * Stupid Backoff passes — corpus-bounded stats tables +
    * pair-distinct scoring joins — plus one equi-join of two
    * (doc_id, double) frames; at 100 TB the production shape persists
    * each model's two stats tables once per corpus release and
    * re-scores batches against them, exactly like
    * [[bigramSurprisal]]'s posture. The difference is taken over the
    * ROUND-6 per-model means (the models' own published outputs), so
    * the score restates bit-identically from the two per-model
    * restatements.
    *
    * @param inDomain training predicate for the in-domain model,
    *                 evaluated against the original `docs` columns
    *                 (e.g. `col("source").isin("src0", "src1")`)
    * @return (doc_id, n_tokens, ms_in, ms_gen, ce_diff) — one row per
    *         document with at least one non-empty token
    */
  def crossEntropyDiff(docs: DataFrame, inDomain: Column,
      idCol: String = "doc_id", textCol: String = "text",
      alpha: Double = 0.4, trainMod: Int = 3, trainRem: Int = 1)
      : DataFrame = {
    val tk0 = docs
      .select(col(idCol).as("doc_id"),
        inDomain.as("is_train_in"),
        (col(idCol) % trainMod === trainRem).as("is_train_gen"),
        filter(tokens(col(textCol)), t => length(t) > 0).as("tk"))
      .where(size(col("tk")) > 0)
    val tk = Dedup.swapCached(tkSlot, tk0)
    // ONE fused scoring pass for both models (see [[scoreBigram2]]):
    // instance streams built once, stats joined side by side, one
    // per-doc aggregation — the two-pass form's pair explode, its
    // second corpus-distinct exchange and the final ms_in ⋈ ms_gen
    // join are gone. ms_in/ms_gen bit-identical to the two-pass
    // form's (same instances/terms, exact DECIMAL sums).
    scoreBigram2(tk, col("is_train_in"), col("is_train_gen"), alpha)
      .select(col("doc_id"), col("n_tokens"), col("ms_in"),
        col("ms_gen"),
        round(col("ms_in") - col("ms_gen"), 6).as("ce_diff"))
  }

  /** Per-document mean TRIGRAM surprisal under Stupid Backoff — the
    * order the published distributed-LM setups its citation (Brants
    * et al., EMNLP 2007) actually runs, one backoff arm above
    * [[bigramSurprisal]]. Same split of estimation (the deterministic
    * `id % trainMod == trainRem` training slice) from scoring (the
    * whole corpus), so every backoff arm is live.
    *
    * Per-token score, in backoff order:
    *   - token 1 (no context): the add-one unigram base
    *     `p1(w) = (cnt(w)+1)/(N+V)`, no alpha (base case);
    *   - token 2 (one-token context): seen bigram
    *     `cnt2(prev,w)/cnt(prev)`, else `alpha * p1(w)` — exactly the
    *     bigram model's scoring arm;
    *   - token i >= 3: seen trigram
    *     `cnt3(p2,p1,w)/cnt2(p2,p1)`; else seen backoff bigram
    *     `alpha * cnt2(p1,w)/cnt(p1)`; else `alpha * alpha * p1(w)`.
    *   A seen trigram implies its (p2,p1) context bigram was seen,
    *   and a seen bigram implies its context unigram was — so no
    *   arm ever divides by a missing count.
    *
    * Scale posture: identical to [[bigramSurprisal]] with one more
    * corpus-bounded stats table (distinct adjacent TRIPLES of the
    * training slice — a hash-sharded groupBy like any other, never a
    * cross product) and one more equi-join on the scoring side;
    * scoring still collapses to DISTINCT (doc, p2, p1, cur) context
    * tuples with multiplicity before any join, and the DECIMAL(38,18)
    * per-instance sum keeps the mean partition-order independent and
    * bit-restatable in external SQL.
    *
    * @return (doc_id, n_tokens, mean_surprisal) — one row per
    *         document with at least one non-empty token
    */
  def trigramSurprisal(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", alpha: Double = 0.4,
      trainMod: Int = 3, trainRem: Int = 1): DataFrame = {
    // Tokenized frame deliberately NOT persisted, unlike
    // [[bigramSurprisal]]'s: the round-14 A/B at 100x measured clean
    // recompute at 19.09 s best-of-3 with the persist arm never
    // beating it (21.7-22.3 s across four runs) — the trigram's cost
    // is dominated by its triple-instance shuffles, not tokenization,
    // so the extra materialization pass buys nothing (the d25
    // mechanism: the tokenize subtree fuses into each consumer's
    // whole-stage codegen).
    val tk = docs
      .select(col(idCol).as("doc_id"),
        filter(tokens(col(textCol)), t => length(t) > 0).as("tk"))
      .where(size(col("tk")) > 0)
    val pairsOf = when(size(col("tk")) >= 2,
      transform(sequence(lit(1), size(col("tk")) - 1),
        i => struct(element_at(col("tk"), i).as("prev"),
          element_at(col("tk"), i + 1).as("cur"))))
      .otherwise(array().cast("array<struct<prev:string,cur:string>>"))
    // Adjacent triples, same narrow-expression shape; a sub-3-token
    // doc must yield an EMPTY array (sequence(1, 0) descends — the
    // standing guard).
    val triplesOf = when(size(col("tk")) >= 3,
      transform(sequence(lit(1), size(col("tk")) - 2),
        i => struct(element_at(col("tk"), i).as("p2"),
          element_at(col("tk"), i + 1).as("p1"),
          element_at(col("tk"), i + 2).as("cur"))))
      .otherwise(array()
        .cast("array<struct<p2:string,p1:string,cur:string>>"))
    val train = tk.where(col("doc_id") % trainMod === trainRem)
    val uni = train.select(explode(col("tk")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
    val tot = uni.agg(sum(col("cnt")).as("n"), count(lit(1)).as("v"))
    val bfreq = train.select(explode(pairsOf).as("b"))
      .select(col("b.prev").as("prev"), col("b.cur").as("cur"))
      .groupBy("prev", "cur").agg(count(lit(1)).as("cnt2"))
    val tfreq = train.select(explode(triplesOf).as("t"))
      .select(col("t.p2").as("p2"), col("t.p1").as("p1"),
        col("t.cur").as("cur"))
      .groupBy("p2", "p1", "cur").agg(count(lit(1)).as("cnt3"))
    def p1Base(c: Column): Column =
      (coalesce(c, lit(0L)) + lit(1L)).cast("double") /
        (col("n") + col("v")).cast("double")
    // Token 1: unigram base, no alpha.
    val first = tk
      .select(col("doc_id"), element_at(col("tk"), 1).as("term"))
      .join(uni.withColumnRenamed("cnt", "cnt_cur"), Seq("term"),
        "left")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"), lit(1L).as("k"),
        (-log(p1Base(col("cnt_cur")))).as("surprisal"))
    // Token 2: the bigram arm (one row per doc with >= 2 tokens).
    val second = tk.where(size(col("tk")) >= 2)
      .select(col("doc_id"), element_at(col("tk"), 1).as("prev"),
        element_at(col("tk"), 2).as("cur"))
      .join(bfreq, Seq("prev", "cur"), "left")
      .join(uni.select(col("term").as("prev"),
        col("cnt").as("cnt_prev")), Seq("prev"), "left")
      .join(uni.select(col("term").as("cur"),
        col("cnt").as("cnt_cur")), Seq("cur"), "left")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"), lit(1L).as("k"),
        when(col("cnt2").isNotNull,
          -log(col("cnt2").cast("double")
            / col("cnt_prev").cast("double")))
          .otherwise(-log(lit(alpha) * p1Base(col("cnt_cur"))))
          .as("surprisal"))
    // Tokens >= 3: distinct (doc, p2, p1, cur) with multiplicity,
    // then the four stats joins (trigram, context bigram, backoff
    // bigram, backoff unigrams).
    val tg = tk.select(col("doc_id"), explode(triplesOf).as("t"))
      .select(col("doc_id"), col("t.p2").as("p2"),
        col("t.p1").as("p1"), col("t.cur").as("cur"))
      .groupBy("doc_id", "p2", "p1", "cur")
      .agg(count(lit(1)).as("k"))
    val rest = tg
      .join(tfreq, Seq("p2", "p1", "cur"), "left")
      .join(bfreq.select(col("prev").as("p2"), col("cur").as("p1"),
        col("cnt2").as("cnt2_ctx")), Seq("p2", "p1"), "left")
      .join(bfreq.select(col("prev").as("p1"), col("cur").as("cur"),
        col("cnt2").as("cnt2_bo")), Seq("p1", "cur"), "left")
      .join(uni.select(col("term").as("p1"),
        col("cnt").as("cnt_p1")), Seq("p1"), "left")
      .join(uni.select(col("term").as("cur"),
        col("cnt").as("cnt_cur")), Seq("cur"), "left")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"), col("k"),
        when(col("cnt3").isNotNull,
          -log(col("cnt3").cast("double")
            / col("cnt2_ctx").cast("double")))
          .when(col("cnt2_bo").isNotNull,
            -log(lit(alpha) * (col("cnt2_bo").cast("double")
              / col("cnt_p1").cast("double"))))
          .otherwise(-log(lit(alpha) * lit(alpha)
            * p1Base(col("cnt_cur"))))
          .as("surprisal"))
    // n_tokens = 1 + 1 + (size-2) = size, recovered as sum(k).
    first.unionByName(second).unionByName(rest)
      .groupBy("doc_id")
      .agg(sum(col("k")).as("n_tokens"),
        (sum((col("k").cast("double") * col("surprisal"))
            .cast("decimal(38,18)")).cast("double")
          / sum(col("k"))).as("ms"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("ms"), 6).as("mean_surprisal"))
  }

  /** Corpus-derived surprisal keep-threshold: the `mean_surprisal`
    * value below which the best `keepFraction` of a deterministic
    * document sample falls — i.e. "keep the corpus' own best 90%"
    * instead of a fixed absolute cutoff. A fixed threshold silently
    * degenerates when the corpus distribution shifts (the 100x stress
    * fixture's shifted-alphabet groups push EVERY document over 3.45
    * and the filtered corpus is empty); a quantile tracks the corpus.
    *
    * Exactness discipline: no interpolated percentile — the threshold
    * is the ceil(keepFraction * n)-th SMALLEST sampled value
    * (`quantile_disc` rank semantics), one of the input doubles
    * verbatim, so an external engine running `quantile_disc` over the
    * same doubles reproduces it bit-identically (ties at the boundary
    * share the same value, so tie order cannot change the result).
    * The sample is the deterministic slice `id % sampleMod ==
    * sampleRem`. An EMPTY sample (corpus smaller than the modulus)
    * yields threshold +Inf: a corpus too small to sample is kept
    * whole rather than dropped whole.
    *
    * Scale shape: the order statistic is computed by
    * [[graft.ops.Quantiles.quantileDisc]] — iterative histogram
    * selection with O(buckets) driver state and a constant number of
    * map-side-combined scans over the SAMPLE. The former
    * `orderBy.limit(k).agg(max)` form was a full sort plus a
    * single-partition GlobalLimit over k ≈ 0.9 · |sample| rows: at
    * 1B docs that funnels ~130M rows through one task — the classic
    * driver-funnel shape this repo's own q16 operator exists to
    * avoid. quantileDisc keeps the identical discrete rank, so the
    * swap changes no result anywhere.
    *
    * @param scored [[unigramSurprisal]] output (or any frame with
    *               `idCol` + `mean_surprisal`)
    * @param keepFraction must be in (0, 1] — quantile_disc rank
    *               semantics have no rank for p = 0, and p > 1 has no
    *               meaning; out-of-domain values throw (the pre-r10
    *               form silently yielded +Inf for keepFraction = 0)
    * @return one-row frame `(ms_thr: double)`, +Inf when the sample
    *         is empty
    */
  def surprisalKeepThreshold(scored: DataFrame,
      keepFraction: Double = 0.9, sampleMod: Int = 7,
      sampleRem: Int = 3, idCol: String = "doc_id"): DataFrame = {
    require(keepFraction > 0 && keepFraction <= 1,
      s"surprisalKeepThreshold: keepFraction must be in (0,1], " +
        s"got $keepFraction")
    val samp = scored
      .where(col(idCol) % sampleMod === sampleRem)
      .select(col("mean_surprisal").as("msr"))
      // quantileDisc runs several actions over the sample (stats
      // pass, histogram rounds, bucket collect) and each would
      // otherwise recompute the full surprisal subtree upstream
      // (tokenize + explode + join, itself a two-pass scan). Persist
      // the 1/sampleMod slice — one double per sampled doc — so the
      // multi-pass selection scans a materialized sample.
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val q = graft.ops.Quantiles.quantileDisc(samp, "msr",
        Seq(keepFraction)).collect() // ≤ 1 row by construction
      val thr =
        if (q.isEmpty) Double.PositiveInfinity else q(0).getDouble(1)
      samp.sparkSession.range(1).select(lit(thr).as("ms_thr"))
    } finally samp.unpersist(blocking = false)
  }
}
