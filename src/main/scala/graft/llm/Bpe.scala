package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextFunctions._

/** Byte-pair-encoding vocabulary training — the tokenizer-fitting step
  * of a training-data pipeline (Sennrich, Haddow & Birch, "Neural
  * Machine Translation of Rare Words with Subword Units", ACL 2016).
  * A beyond-reference operator: the reference engine has no tokenizer
  * surface; this implements the published algorithm Spark-first.
  *
  * Scale posture (the reason this shape survives 100 TB):
  *
  *   - Training runs on the WORD-FREQUENCY DICTIONARY, not the token
  *     stream — the classic formulation. One corpus-wide shuffle (a
  *     map-side-combinable `groupBy(word).count()` over narrow rows)
  *     collapses the corpus to its distinct-word table, and every
  *     merge round after that touches only that vocabulary-sized
  *     frame. 100 TB of text is a few tens of millions of distinct
  *     words — executor-trivial.
  *   - Each round is one small pair-count aggregation plus a
  *     `LIMIT 1` argmax; exactly ONE row crosses to the driver per
  *     round, so driver state is `rounds` rows total.
  *   - The evolving dictionary is eagerly locally checkpointed each
  *     round, keeping per-round lineage depth CONSTANT — no plan
  *     growth with rounds, no recompute cascades. (On a multi-node
  *     cluster where executor loss matters, swap `localCheckpoint`
  *     for a reliable `checkpoint` dir; the frame is vocabulary-sized
  *     either way.)
  *   - Merge application is a LITERAL string `replace` on the
  *     spaced-symbol form (" l r " -> " lr "): pure whole-stage
  *     codegen, no UDF, and it restates verbatim in external SQL
  *     engines, which is what makes the operator oracle-checkable.
  *
  * Determinism contract: a word is rendered as the spaced symbol
  * string `" c1 c2 ... cn </W> "`; pair counts are exact integer sums
  * of word frequencies; the argmax tie-break is (count DESC, lhs ASC,
  * rhs ASC) under byte-wise string order. Sequential non-overlapping
  * left-to-right replacement (the semantics of both Spark's and
  * DuckDB's literal `replace`) is exactly the reference algorithm's
  * greedy in-word merge order, so an external engine restating the
  * expression chain reproduces the merge table bit-for-bit.
  */
object Bpe {

  /** One learned merge: at `step`, adjacent symbol pair (`lhs`,`rhs`)
    * had the highest corpus pair count (`pair_count`) and was fused
    * into the new symbol `merged`. */
  case class Merge(step: Int, lhs: String, rhs: String, merged: String,
      pair_count: Long)

  /** Word-end marker appended to every word's symbol sequence, per the
    * published algorithm (distinguishes "est " in "newest" from
    * "estimate"). Uppercase 'W' on purpose: training words come out of
    * [[TextFunctions.normalizeText]], which lowercases, so no sequence
    * of word-internal symbols can ever concatenate to this marker —
    * the reserved-symbol property of the published algorithm holds
    * even on text containing a literal "&lt;/w&gt;". (A control char
    * would also work but an uppercase letter stays printable and
    * SQL-literal-safe for the oracle restatement.) */
  val EndMark = "</W>"

  /** GPT-2-style byte-level pre-tokenizer pattern (Radford et al.,
    * "Language Models are Unsupervised Multitask Learners", 2019 —
    * the `gpt2` regex), in RE2-compatible form so the DuckDB oracle
    * (RE2) and Spark (java.util.regex) tokenize identically:
    *
    *   - the published trailing-whitespace lookahead `\s+(?!\S)` is
    *     dropped (RE2 has no lookahead), so a whitespace RUN between
    *     words is one token instead of splitting its last space onto
    *     the next word — a documented simplification that changes
    *     only multi-space/newline runs;
    *   - `\s` is spelled as the explicit class `[ \t\n\f\r]` (Java's
    *     `\s` additionally matches U+000B vertical tab where RE2's
    *     does not — the explicit class pins both engines to the same
    *     set).
    *
    * Alternation order is load-bearing: contractions, then
    * space-prefixed letter/number/other runs, then whitespace runs.
    * Both Java regex and RE2 resolve alternation leftmost-first, so
    * the two engines agree token-for-token (pinned in BpeSpec against
    * an independent scanner). */
  val PreTokenPattern: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+" +
      "| ?[^ \\t\\n\\f\\r\\p{L}\\p{N}]+|[ \\t\\n\\f\\r]+"

  /** Pre-tokens of RAW text under [[PreTokenPattern]] — byte-level
    * BPE operates on the text as-is (no lowercasing, no whitespace
    * collapse): case distinctions and whitespace are carried into the
    * tokens, and a word's leading space is part of its token (the
    * published "Ġ" convention in raw-byte form, which is what removes
    * the need for an end-of-word sentinel). */
  def pretokens(text: Column): Column =
    regexp_extract_all(text, lit(PreTokenPattern), lit(0))

  /** `"  68  65  6C  "` — the spaced-symbol seed form of a pre-token
    * for BYTE-level training: symbols are the UTF-8 bytes of the
    * token, each rendered as two uppercase hex chars (`hex` is
    * uppercase in both Spark and DuckDB, and hex strings compare in
    * byte order in both, so the argmax tie-break is engine-portable).
    * Same double-space delimiter algebra as [[seedSeq]]; no
    * end-of-word marker (word boundaries live in the leading-space
    * byte 20 of the next pre-token). */
  private def byteSeed(word: Column): Column =
    concat(lit("  "),
      regexp_replace(hex(encode(word, "UTF-8")), "(..)", "$1  "))

  /** `"  h  e  l  l  o  </W>  "` — the spaced-symbol seed form of a
    * word. Symbols are separated by DOUBLE spaces and the merge
    * pattern `" l  r "` consumes exactly one space from each side,
    * leaving one behind — so after a replacement every delimiter is
    * double again and a RUN of the same pair merges correctly in one
    * pass (`a a a a -> aa aa`; with single-space delimiters the first
    * match would consume the space that starts the next one and the
    * run would stall at `aa a a`). The outer spaces also make every
    * symbol boundary explicit, so a merge can never match a symbol's
    * suffix/prefix. */
  private def seedSeq(word: Column): Column =
    concat(lit("  "), regexp_replace(word, "(.)", "$1  "),
      lit(EndMark + "  "))

  /** The chained literal-replace application of `merges`, in learned
    * order, to a seed sequence — used both to rebuild the final
    * dictionary as one narrow pass and to segment out-of-dictionary
    * words in [[bpeTokenCounts]]. */
  private def applyMerges(seed: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(seed) { (e, m) =>
      replace(e, lit(" " + m.lhs + "  " + m.rhs + " "),
        lit(" " + m.merged + " "))
    }

  /** Distinct words of the normalized corpus with exact frequencies;
    * the single corpus-wide shuffle of the whole operator. */
  private def wordCounts(docs: DataFrame, textCol: String,
      minFreq: Long): DataFrame =
    docs.select(explode(tokens(col(textCol))).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .where(col("freq") >= minFreq)

  /** Runs the merge loop and returns the learned merges in order.
    * Stops early if the dictionary runs out of adjacent pairs (every
    * word fully fused) before `rounds` merges. */
  private def train(docs: DataFrame, textCol: String, rounds: Int,
      minFreq: Long): Seq[Merge] = {
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    mergeLoop(wordCounts(docs, textCol, minFreq)
      .select(seedSeq(col("word")).as("seq"), col("freq")), rounds)
  }

  /** Distinct PRE-TOKENS of the raw corpus with exact frequencies —
    * the byte-level twin of [[wordCounts]] (raw text, regex
    * pre-tokenizer, no normalization). Matches are non-empty by
    * construction, so no length filter is needed. */
  private def bytePretokenCounts(docs: DataFrame, textCol: String,
      minFreq: Long): DataFrame =
    docs.select(explode(pretokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .where(col("freq") >= minFreq)

  /** Byte-level training: the same merge loop over the pre-token
    * frequency dictionary with byte seeds. */
  private def trainBytes(docs: DataFrame, textCol: String, rounds: Int,
      minFreq: Long): Seq[Merge] = {
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    mergeLoop(bytePretokenCounts(docs, textCol, minFreq)
      .select(byteSeed(col("word")).as("seq"), col("freq")), rounds)
  }

  /** The shared merge loop over an already-seeded `(seq, freq)`
    * dictionary frame (char-level [[seedSeq]] or byte-level
    * [[byteSeed]] — the pair-count/argmax/replace algebra is
    * identical). */
  /** Rounds between eager dictionary checkpoints in [[mergeLoop]]:
    * lineage depth between truncations is at most this many chained
    * `replace` expressions over the last checkpointed scan — constant
    * plan size either way, but one materialization JOB per stride
    * instead of one per round. (The per-round eager checkpoint was
    * ~a quarter of the loop's Spark jobs — event-log at sf0.1,
    * 12 rounds: t27 47 -> 37 jobs, t29 43 -> 33; re-applying <= 3
    * pending literal replaces inside the next round's aggregation
    * scan is far cheaper than a dedicated write-and-read
    * materialization of the vocabulary frame. Paired idle-box A/B at
    * sf0.1, best/median-of-5: t27_bpe_encode 3.72/4.23 ->
    * 3.50/3.64 s, t29_byte_bpe_encode 3.72/4.04 -> 3.28/3.55 s;
    * merges byte-identical — same argmax stream, so every oracle is
    * unchanged by construction.) */
  private val CkptStride = 4

  /** Candidates fetched per pair-count job in [[mergeLoop]] — the
    * batching window of the provably-safe multi-merge step below. */
  private val BatchK = 16

  private def mergeLoop(seeded: DataFrame, rounds: Int): Seq[Merge] = {
    // Eager localCheckpoint, not persist: a persisted round still
    // carries the previous round's full logical lineage, and the
    // nested cached-plan rendering grows superlinearly with rounds
    // (observed as a plan-string OOM at ~16 rounds). Checkpointing
    // truncates the dictionary to an RDD scan every [[CkptStride]]
    // rounds, so per-round plan depth stays CONSTANT (<= CkptStride
    // replaces) regardless of `rounds`. Blocks of dropped rounds are
    // reclaimed by the context cleaner once unreferenced; the frame
    // is vocabulary-sized either way.
    var cur = seeded.localCheckpoint(true)
    var pendingReplaces = 0
    val merges = Seq.newBuilder[Merge]
    // Products of ALL merges so far in this training run: together
    // with the seeds these are the only symbol strings that can exist
    // in the dictionary, which is what makes the batch-safety
    // freshness check below a driver-side set lookup.
    val allProducts = scala.collection.mutable.Set.empty[String]
    var step = 0
    var exhausted = false
    while (step < rounds && !exhausted) {
      val syms = split(trim(col("seq")), "  ")
      // A seed always has >= 2 symbols (char + EndMark) but merges can
      // fuse a whole word to one symbol; sequence(0, -1) would emit a
      // DESCENDING range, so the short case must be guarded.
      val idx = when(size(syms) >= 2, sequence(lit(0), size(syms) - 2))
        .otherwise(typedLit(Seq.empty[Int]))
      // TOP-BatchK pair counts per job instead of the bare argmax:
      // the published algorithm is strictly sequential (each merge
      // changes the counts the next argmax ranks), but a PREFIX of
      // the ranked candidates can be applied from ONE count when each
      // is provably still the argmax at its turn — fewer full
      // dictionary aggregation passes (guide §1.2), and the merge
      // stream stays byte-identical (same argmax sequence, proved
      // below and pinned by BpeSpec's independent model + the DuckDB
      // merge-table oracles).
      val top = cur
        .select(col("freq"), syms.as("syms"), explode(idx).as("i"))
        .select(col("freq"),
          element_at(col("syms"), col("i") + 1).as("lhs"),
          element_at(col("syms"), col("i") + 2).as("rhs"))
        .groupBy("lhs", "rhs").agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("lhs").asc, col("rhs").asc)
        .limit(BatchK).collect()
      if (top.isEmpty) exhausted = true
      else {
        // Greedy safe-prefix batch over the ranked candidates; stop
        // at the first candidate whose argmax-at-its-turn can no
        // longer be proved from this count. SAFETY ARGUMENT (why the
        // accepted prefix reproduces the sequential argmax stream
        // bit-for-bit): process candidates in rank order, S = symbols
        // consumed by accepted merges, P = their product strings.
        //   - Candidates ranked BEFORE m are all accepted (first
        //     reject ends the batch), so after their replaces they no
        //     longer exist as pairs.
        //   - A pair NOT touching S keeps its exact count (a replace
        //     destroys only pairs overlapping a " l  r " match — both
        //     of whose symbols are in S — and creates only pairs
        //     involving the product), so m's own count is exact when
        //     l,r are outside S ∪ P, and every untouched pair ranked
        //     after m stays after it (equal counts keep their
        //     tie-break order).
        //   - A pair touching S only DECREASES; it ranked after m
        //     (else the batch would have stopped at it), so it cannot
        //     overtake m unless it started TIED with m — hence the
        //     no-tied-touching-candidate check.
        //   - A CREATED pair involves a product; its count is bounded
        //     by some destroyed pair's pre-batch count, i.e. by a
        //     touching pair's, which ranks after m: strictly below
        //     m's count unless tied — covered by the same check for
        //     ranked candidates and by `cnt > cK` for pairs below the
        //     collected window (when the window is full, unseen pairs
        //     can reach cK exactly).
        //   - All of this presumes products are FRESH strings (an
        //     existing symbol equal to a product would let created
        //     occurrences BOOST a pre-existing pair past its observed
        //     count). Symbols are seeds ∪ products-so-far: seeds are
        //     single chars / 2-hex bytes (shorter than any product)
        //     plus the EndMark, so freshness is the driver-side check
        //     `product ∉ allProducts ∪ {EndMark}`. A non-fresh
        //     product's own merge is still the valid argmax — it is
        //     applied, and the batch ends there.
        val full = top.length == BatchK
        val cK = if (full) top.last.getLong(2) else Long.MinValue
        val S = scala.collection.mutable.Set.empty[String]
        val P = scala.collection.mutable.Set.empty[String]
        var i = 0
        var stop = false
        while (!stop && i < top.length && step < rounds) {
          val (l, r, c) = (top(i).getString(0), top(i).getString(1),
            top(i).getLong(2))
          val safe = i == 0 || (
            !S.contains(l) && !P.contains(l) &&
              !S.contains(r) && !P.contains(r) &&
              c > cK &&
              // no tied candidate ranked after m touches S
              (i + 1 until top.length).forall { j =>
                top(j).getLong(2) != c ||
                  (!S.contains(top(j).getString(0)) &&
                    !S.contains(top(j).getString(1)))
              })
          if (!safe) stop = true
          else {
            step += 1
            merges += Merge(step, l, r, l + r, c)
            cur = cur.withColumn("seq",
              replace(col("seq"), lit(" " + l + "  " + r + " "),
                lit(" " + l + r + " ")))
            pendingReplaces += 1
            val prod = l + r
            if (allProducts.contains(prod) || prod == EndMark)
              stop = true // applied, but later candidates unprovable
            allProducts += prod
            S += l; S += r; P += prod
            // No checkpoint after the FINAL merge either: the loop's
            // last dictionary state has no consumer (callers re-apply
            // the learned merges as one expression chain over the raw
            // data).
            if (pendingReplaces >= CkptStride && step < rounds) {
              cur = cur.localCheckpoint(true)
              pendingReplaces = 0
            }
            i += 1
          }
        }
      }
    }
    merges.result()
  }

  /** The learned merge table: (step, lhs, rhs, merged, pair_count),
    * `rounds` rows in merge order (fewer only if the dictionary
    * exhausts). `minFreq` drops sub-threshold words from the training
    * dictionary — the standard guard against hapax noise dominating
    * late merges. */
  def bpeMerges(docs: DataFrame, textCol: String = "text",
      rounds: Int = 12, minFreq: Long = 1L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    train(docs, textCol, rounds, minFreq).toDF()
  }

  /** Per-document BPE token-id encoding — the tokenizer OUTPUT stage
    * (what a training-data pipeline actually emits): each document's
    * ordered token-id sequence under a vocabulary of `rounds` learned
    * merges.
    *
    * Vocabulary contract (deterministic, engine-restatable): the
    * distinct final symbols of the trained dictionary in byte-wise
    * lexicographic order, id = 0-based rank. Symbols outside the
    * vocabulary (possible only in the segmentations of sub-`minFreq`
    * words) encode as -1 (UNK). `token_ids` is emitted as the
    * space-joined id string in (word position, symbol position)
    * order — flat and hashable, so the oracle compare needs no
    * array-cell support.
    *
    * Scale posture: the segmentation chain is the same nested
    * literal-replace EXPRESSION as [[bpeTokenCounts]] (whole-stage
    * codegen, no UDF); the vocabulary join is a vocabulary-sized
    * broadcast; the only corpus-sized shuffle is the per-document
    * reassembly keyed on `idCol` — and its input is the token-id
    * stream, which IS the operator's output, so that shuffle is
    * irreducible. The vocabulary rank runs a Window over the
    * VOCABULARY frame only (bounded like the collected centroid
    * tables elsewhere — never over corpus-sized data). */
  def bpeEncode(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", rounds: Int = 12, minFreq: Long = 1L,
      learned: Option[Seq[Merge]] = None): DataFrame = {
    val merges = learned.getOrElse(train(docs, textCol, rounds, minFreq))
    def segOf(w: Column): Column =
      split(trim(applyMerges(seedSeq(w), merges)), "  ")
    val vocab = wordCounts(docs, textCol, minFreq)
      .select(explode(segOf(col("word"))).as("sym"))
      .distinct()
      .withColumn("tid", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("sym")) - 1)
    val syms = docs
      .select(col(idCol).as("doc_id"),
        posexplode(filter(tokens(col(textCol)), t => length(t) > 0))
          .as(Seq("wpos", "word")))
      .select(col("doc_id"), col("wpos"),
        posexplode(segOf(col("word"))).as(Seq("spos", "sym")))
    syms
      .join(broadcast(vocab), Seq("sym"), "left")
      .select(col("doc_id"), col("wpos"), col("spos"),
        coalesce(col("tid"), lit(-1)).as("tid"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bpe_tokens"),
        array_join(
          transform(
            array_sort(collect_list(
              struct(col("wpos"), col("spos"), col("tid")))),
            s => s.getField("tid").cast("string")),
          " ").as("token_ids"))
  }

  /** The learned BYTE-level merge table — [[bpeMerges]] with seed
    * symbols = UTF-8 bytes (two uppercase hex chars each) of the
    * regex pre-tokens, the GPT-2 training shape (Radford et al.
    * 2019): no normalization, no end-of-word sentinel, whitespace
    * carried in-token. `lhs`/`rhs`/`merged` are hex-rendered byte
    * strings. */
  def bpeMergesBytes(docs: DataFrame, textCol: String = "text",
      rounds: Int = 12, minFreq: Long = 1L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    trainBytes(docs, textCol, rounds, minFreq).toDF()
  }

  /** Byte-level token-id encoding — [[bpeEncode]] in the GPT-2 shape:
    * seed symbols are the UTF-8 bytes of the regex pre-tokens, and
    * the vocabulary is CLOSED (all 256 byte symbols, id = byte value,
    * plus one id per learned merge, id = 256 + merge index — the
    * published id convention), so every string encodes with NO UNK
    * path: any symbol the segmentation can produce is either a single
    * byte or the product of a learned merge.
    *
    * Output: (doc_id, n_bpe_tokens, token_ids) with `token_ids` the
    * space-joined id string in (pre-token position, symbol position)
    * order — the same flat hashable shape as [[bpeEncode]].
    *
    * Scale posture: identical to [[bpeEncode]] — training touches
    * only the pre-token dictionary (one corpus shuffle), segmentation
    * is the nested literal-replace EXPRESSION (whole-stage codegen,
    * no UDF) applied per instance, the id lookup is a 256+rounds
    * entry map LITERAL baked into the plan (no join at all — cheaper
    * than the char-level form's vocabulary broadcast), and the only
    * corpus-sized shuffle is the per-document output reassembly,
    * which is irreducible. `minFreq` prunes the TRAINING dictionary
    * only; sub-threshold pre-tokens still encode (over-fragmented,
    * never dropped) — the published behavior. */
  def bpeEncodeBytes(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", rounds: Int = 12, minFreq: Long = 1L,
      learned: Option[Seq[Merge]] = None): DataFrame = {
    val merges =
      learned.getOrElse(trainBytes(docs, textCol, rounds, minFreq))
    def segOf(w: Column): Column =
      split(trim(applyMerges(byteSeed(w), merges)), "  ")
    // First-wins on duplicate merge PRODUCTS: two distinct merges can
    // concatenate to the same symbol string (("61","6161") and
    // ("6161","61") both yield "616161"), but a vocabulary maps each
    // token STRING to exactly one id — the id of the first merge that
    // produced it (min id; the oracle restates this as min(tid)).
    // Byte entries (length 2) can never collide with merge products
    // (length >= 4).
    val idMap: Map[String, Int] =
      merges.foldLeft((0 until 256).map(b => f"$b%02X" -> b).toMap) {
        (m, mg) =>
          if (m.contains(mg.merged)) m
          else m + (mg.merged -> (255 + mg.step))
      }
    docs
      .select(col(idCol).as("doc_id"),
        posexplode(pretokens(col(textCol))).as(Seq("wpos", "word")))
      .select(col("doc_id"), col("wpos"),
        posexplode(segOf(col("word"))).as(Seq("spos", "sym")))
      .select(col("doc_id"), col("wpos"), col("spos"),
        element_at(typedLit(idMap), col("sym")).as("tid"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bpe_tokens"),
        array_join(
          transform(
            array_sort(collect_list(
              struct(col("wpos"), col("spos"), col("tid")))),
            s => s.getField("tid").cast("string")),
          " ").as("token_ids"))
  }

  /** Per-document BPE token counts under a vocabulary of `rounds`
    * learned merges: (doc_id, n_words, n_bpe_tokens).
    *
    * Segmentation is a DICTIONARY JOIN, not per-instance rewriting:
    * the final symbol sequence of every trained word is rebuilt as one
    * narrow pass over the word table (vocabulary-sized — broadcast
    * range for most corpora, AQE decides), and each word instance
    * looks up its token count there. Words below `minFreq` (absent
    * from the training dictionary) are segmented on the fly by the
    * same chained literal-replace expression, so the output is exactly
    * what the published algorithm's encoder would emit.
    *
    * Pass `learned` to reuse a merge table from a previous
    * [[bpeMerges]]-style training run instead of retraining. */
  def bpeTokenCounts(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", rounds: Int = 12, minFreq: Long = 1L,
      learned: Option[Seq[Merge]] = None): DataFrame = {
    val merges = learned.getOrElse(train(docs, textCol, rounds, minFreq))
    val dict = wordCounts(docs, textCol, minFreq)
      .select(col("word"),
        size(split(trim(applyMerges(seedSeq(col("word")), merges)),
          "  ")).as("dict_toks"))
    val fallback = size(split(
      trim(applyMerges(seedSeq(col("word")), merges)), "  "))
    docs.select(col(idCol), explode(tokens(col(textCol))).as("word"))
      .where(length(col("word")) > 0)
      .join(dict, Seq("word"), "left")
      .select(col(idCol),
        coalesce(col("dict_toks"), fallback).as("n_toks"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_words"),
        sum("n_toks").cast("long").as("n_bpe_tokens"))
  }
}
