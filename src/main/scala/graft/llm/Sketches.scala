package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PolyHash

/** Count-min sketch (Cormode & Muthukrishnan, "An improved data
  * stream summary: the count-min sketch and its applications",
  * J. Algorithms 2005) over a term column — the sublinear-memory path
  * for corpus-wide frequency queries when the exact `groupBy(term)`
  * of [[graft.queries.LlmQueries]] t05 stops fitting (100 TB corpora
  * have billions of distinct terms; the sketch is depth x width
  * counters regardless).
  *
  * Hashing is the portable polynomial family ([[PolyHash]]): row i's
  * bucket is `((a_i * h + b_i) mod P) mod width` with `h` the base-31
  * code-point hash — deterministic, engine-independent, and exactly
  * restatable in the DuckDB oracle.
  *
  * Dataflow: one narrow projection computes all `depth` buckets per
  * occurrence, one explode fans them out, one hash aggregation on
  * (row, bucket) builds the counters — partial-aggregate friendly, a
  * single shuffle whose cardinality is at most depth x width however
  * large the corpus. Estimation joins candidates to the counter table
  * on (row, bucket) and takes the per-term minimum.
  */
object Sketches {

  /** `h` column for a (already normalized) term. */
  private def termHash(term: Column): Column =
    TextFunctions.rollingFingerprint(term)

  private def bucket(h: Column, i: Int, width: Int): Column =
    ((lit(PolyHash.multiplier(i)) * h + lit(PolyHash.offset(i)))
      % lit(PolyHash.P)) % lit(width.toLong)

  /** Build the counter table: one row per (row, bucket) with the
    * summed occurrence count. Cardinality <= depth x width. */
  def cmsCounters(terms: DataFrame, termCol: String = "term",
      depth: Int = 4, width: Int = 1024): DataFrame = {
    val h = termHash(col(termCol))
    terms
      .select(posexplode(array(
        (0 until depth).map(i => bucket(h, i, width)): _*)))
      .withColumnRenamed("pos", "row")
      .withColumnRenamed("col", "bucket")
      .groupBy("row", "bucket")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-estimate the frequency of each candidate term: the minimum
    * of its `depth` counters (the CMS guarantee: estimate >= truth,
    * overshoot bounded by collisions). `candidates` is expected small
    * (heavy-hitter shortlist) — the join broadcasts it. */
  def cmsEstimate(counters: DataFrame, candidates: DataFrame,
      termCol: String = "term", depth: Int = 4,
      width: Int = 1024): DataFrame = {
    val h = termHash(col(termCol))
    val probes = candidates
      .select(col(termCol),
        posexplode(array(
          (0 until depth).map(i => bucket(h, i, width)): _*)))
      .withColumnRenamed("pos", "row")
      .withColumnRenamed("col", "bucket")
    probes
      .join(counters, Seq("row", "bucket"))
      .groupBy(termCol)
      .agg(min(col("cnt")).as("cms_estimate"))
  }
}
