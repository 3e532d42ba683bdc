package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-hygiene operators for training-data curation.
  *
  * [[Scrub]]: PII redaction as pure regexp projections (codegen'd, no
  * UDFs) — patterns kept RE2-compatible so external engines apply the
  * identical semantics. [[Contamination]]: benchmark-overlap detection
  * via the same inverted-index shape as the n-gram dedup — a doc is
  * contaminated when a high fraction of its shingles appear in the
  * benchmark set (the standard decontamination test applied before
  * training, cf. the GPT-3/C4 dataset reports' n-gram overlap checks).
  */
object Scrub {

  /** RE2-and-Java-compatible patterns (no lookaround, no backrefs). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  /** Redact emails then IPv4s. Order matters (an email's domain can
    * contain digits/dots): fixed here, mirrored in oracles. */
  def scrub(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailRe, "<EMAIL>"),
      Ipv4Re, "<IP>")

  def emailCount(text: Column): Column = regexp_count(text, lit(EmailRe))
  def ipCount(text: Column): Column = regexp_count(text, lit(Ipv4Re))
}

object Contamination {

  /** Per-document overlap ratio against a benchmark document set:
    * |shingles(doc) ∩ shingles(bench)| / |shingles(doc)|.
    *
    * Dataflow: distinct benchmark grams (small side — benchmarks are
    * thousands of docs, not billions) semi-joined against the corpus
    * inverted index; one count per doc. The semi join hashes on the
    * gram key; no arrays cross a shuffle.
    */
  def overlapRatios(docs: DataFrame, bench: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      shingleN: Int = 8): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    // Fused rolling-hash grams (8-byte keys through the semi join).
    val grams = graft.core.Partitioning.ensureWidth(docs)
      .select(col(idCol).as("id"),
        explode(graft.functions.GraftFunctions
          .polyShingleHashes(col(textCol), shingleN)).as("gram"))
    val benchGrams = bench
      .select(explode(graft.functions.GraftFunctions
        .polyShingleHashes(col(textCol), shingleN)).as("gram"))
      .distinct()
    val sizes = grams.groupBy("id").agg(count(lit(1)).as("n_grams"))
    val hits = grams.join(benchGrams, Seq("gram"), "left_semi")
      .groupBy("id").agg(count(lit(1)).as("n_hit"))
    sizes.join(hits, Seq("id"), "left")
      .select(col("id").as(idCol), col("n_grams"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        round(coalesce(col("n_hit"), lit(0L)).cast("double")
          / col("n_grams").cast("double"), 6).as("overlap_ratio"))
  }
}
