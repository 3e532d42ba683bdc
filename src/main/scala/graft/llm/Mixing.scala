package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic weighted domain mixing — the "sample source s at
  * rate r_s" step that sets a pretraining corpus's domain proportions
  * (web 30%, books 10%, ... of the token budget).
  *
  * Keep decision: `hash(id) mod M < floor(r * M)` — a pure narrow
  * filter, zero shuffle, any corpus size. Determinism is the point:
  * the same row set survives every rerun (resumable pipelines,
  * reproducible ablations), rates can be tuned per-source without
  * touching other domains, and the SAME predicate can be pushed to a
  * parquet scan.
  *
  * Two hash variants: [[keep]] (xxhash64 — production: full 64-bit
  * mixing, no rate-vs-id correlation) and [[keepPortable]] (LCG step
  * mod 2^31 — plain modular arithmetic restatable in any engine's
  * SQL, used by the gated query exactly like the portable minhash
  * family).
  */
object Mixing {

  private val M: Long = 1000000L

  /** Production keep-predicate: xxhash64-mixed id against the rate. */
  def keep(id: Column, rate: Column): Column =
    pmod(xxhash64(id), lit(M)) < floor(rate * M).cast("long")

  /** Oracle-portable keep-predicate (LCG step; same fraction kept).
    *
    * Defined for the FULL int64 id domain: the id is first reduced to
    * a non-negative residue mod 2^31 (`pmod`, so negative ids land in
    * `[0, 2^31)` on every engine — plain `%` truncates toward zero and
    * would diverge between Spark `pmod` and SQL `%` on negatives),
    * which also bounds the LCG multiply at (2^31-1) * 1103515245
    * ≈ 2.4e18 < Long.MaxValue — no overflow, ANSI-mode safe. The SQL
    * restatement is `((id % 2^31) + 2^31) % 2^31` for the reduction;
    * every later operand is non-negative so plain `%` matches `pmod`. */
  def keepPortable(id: Column, rate: Column): Column = {
    val m = lit(2147483648L)
    pmod(pmod(id, m) * 1103515245L + 12345L, m) % M <
      floor(rate * M).cast("long")
  }

  /** Filtered frame: rows surviving the mix at their row's rate. */
  def sampleByRate(df: DataFrame, id: Column, rate: Column,
      portable: Boolean = false): DataFrame =
    df.where(if (portable) keepPortable(id, rate) else keep(id, rate))
}
