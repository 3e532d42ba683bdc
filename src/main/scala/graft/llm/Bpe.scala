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
    // Eager localCheckpoint, not persist: a persisted round still
    // carries the previous round's full logical lineage, and the
    // nested cached-plan rendering grows superlinearly with rounds
    // (observed as a plan-string OOM at ~16 rounds). Checkpointing
    // truncates each round to an RDD scan, so per-round plan depth is
    // CONSTANT regardless of `rounds`. Blocks of dropped rounds are
    // reclaimed by the context cleaner once unreferenced; the frame
    // is vocabulary-sized either way.
    var cur = wordCounts(docs, textCol, minFreq)
      .select(seedSeq(col("word")).as("seq"), col("freq"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[Merge]
    var step = 0
    var exhausted = false
    while (step < rounds && !exhausted) {
      val syms = split(trim(col("seq")), "  ")
      // A seed always has >= 2 symbols (char + EndMark) but merges can
      // fuse a whole word to one symbol; sequence(0, -1) would emit a
      // DESCENDING range, so the short case must be guarded.
      val idx = when(size(syms) >= 2, sequence(lit(0), size(syms) - 2))
        .otherwise(typedLit(Seq.empty[Int]))
      val best = cur
        .select(col("freq"), syms.as("syms"), explode(idx).as("i"))
        .select(col("freq"),
          element_at(col("syms"), col("i") + 1).as("lhs"),
          element_at(col("syms"), col("i") + 2).as("rhs"))
        .groupBy("lhs", "rhs").agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("lhs").asc, col("rhs").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r) = (best(0).getString(0), best(0).getString(1))
        step += 1
        merges += Merge(step, l, r, l + r, best(0).getLong(2))
        cur = cur.withColumn("seq",
            replace(col("seq"), lit(" " + l + "  " + r + " "),
              lit(" " + l + r + " ")))
          .localCheckpoint(true)
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
