package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact distributed order statistics — discrete quantiles
  * (`quantile_disc` semantics: the element at 1-based rank
  * `max(1, ceil(p * n))` of the sorted non-null values) without a
  * global sort.
  *
  * Why not the obvious forms:
  *  - `ORDER BY` + window `row_number` collapses to one task (the
  *    [[Enumerate]] problem) — a 100 TB column cannot funnel through
  *    one executor's sort.
  *  - Spark's exact `percentile` aggregate buffers a per-partition
  *    value→count map whose size is the column's distinct count —
  *    unbounded for continuous measures.
  *  - `approx_percentile` is a sketch: no exact-oracle parity.
  *
  * This operator is iterative histogram selection (the classic
  * distributed k-th-smallest): a constant number of full scans, each
  * a map-side-combined `groupBy` over a fixed bucket count, with
  * driver state bounded by O(buckets) counts per round — never rows.
  *
  *   1. one pass: `(count, min, max)`;
  *   2. one pass: counts per equal-width bucket over `[min, max]`
  *      (the bucket id is a pure plan-time function of the value, so
  *      the counting pass and the later filters can never disagree);
  *      cumulative counts locate each target rank's bucket and its
  *      within-bucket rank — ALL probabilities share this pass;
  *   3. one pass: every target bucket holding ≤ `collectCap` rows is
  *      collected in a single combined filter scan (the driver
  *      receives O(probs × collectCap) doubles — a bound the caller
  *      controls) and the exact rank is read off the sorted slice;
  *   4. only a SKEWED target bucket (> `collectCap` rows — mass
  *      duplicates or a pathological distribution) recurses with a
  *      sub-histogram over its value range; a range whose
  *      `min == max` IS the answer, so duplicate-heavy columns
  *      cannot loop.
  *
  * Rounds are O(log_buckets n): the shared pass isolates each target
  * to ≤ n/buckets rows (67M per collectCap at the defaults); one
  * recursion covers half a trillion.
  *
  * Ties: equal values are interchangeable — any witness of the rank
  * is THE quantile. NaN is EXCLUDED like NULL (order statistics are
  * defined over the comparable domain; DuckDB 1.0's quantile places
  * NaN inconsistently with its own ORDER BY — measured — so no sane
  * cross-engine contract includes it). Infinities ARE in the domain
  * (DuckDB orders them normally): they are counted in the stats pass
  * and a rank falling inside the ±Inf mass is answered directly —
  * the histogram only ever subdivides the FINITE sub-range, so an
  * infinite endpoint can never poison the bucket width (`hi - lo` =
  * Inf ⇒ every row lands in bucket 0 ⇒ unbounded recursion — the
  * failure mode this guards). Values are compared as doubles; supply
  * a double column (or accept the cast) — the output schema is
  * `(prob double, value double)`.
  */
object Quantiles {

  /** @param probs     probabilities in (0, 1]; emitted in input order
    * @param buckets   histogram width per round (driver holds this
    *                  many counts; 8192 ≈ 128 KiB)
    * @param collectCap largest bucket the final pass may collect —
    *                  the driver-memory bound of step 3
    */
  def quantileDisc(df: DataFrame, valueCol: String,
      probs: Seq[Double], buckets: Int = 8192,
      collectCap: Int = 65536): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p > 0 && p <= 1),
      s"quantileDisc: probabilities must lie in (0, 1], got $probs")
    val spark = df.sparkSession
    import spark.implicits._
    val domain = df.select(col(valueCol).cast("double").as("v"))
      .where(col("v").isNotNull && !isnan(col("v")))
    // ±Inf counted separately so the histogram works over a finite
    // [lo, hi]; the finite slice reuses `isFinite` below as its
    // filter, so counts and filters can never disagree.
    val isFinite = col("v") > Double.NegativeInfinity &&
      col("v") < Double.PositiveInfinity
    val stats = domain.agg(
      count(when(col("v") === Double.NegativeInfinity, 1)).as("nneg"),
      count(when(col("v") === Double.PositiveInfinity, 1)).as("npos"),
      count(when(isFinite, 1)).as("nfin"),
      min(when(isFinite, col("v"))).as("mn"),
      max(when(isFinite, col("v"))).as("mx")).head()
    val nNeg = stats.getLong(0)
    val nPos = stats.getLong(1)
    val nFin = stats.getLong(2)
    val n = nNeg + nFin + nPos
    if (n == 0L)
      return Seq.empty[(Double, Double)].toDF("prob", "value")
    val vals = domain.where(isFinite)

    // DuckDB's quantile_disc rank (measured, v1.0.0): ceil in DOUBLE —
    // deliberately the same arithmetic an external engine runs.
    def rankOf(p: Double): Long =
      math.min(n, math.max(1L, math.ceil(p * n).toLong))

    /** Equal-width bucket id for range [lo, hi]: `floor((v-lo)/w)`
      * clamped into [0, buckets-1] (`hi` itself would land at
      * `buckets`). Histogram and filters share this exact expression,
      * so fp edge wobble assigns consistently. */
    def bucketExpr(v: Column, lo: Double, w: Double): Column =
      least(lit(buckets - 1L),
        greatest(lit(0L), floor((v - lit(lo)) / lit(w)).cast("long")))

    /** (bucket id, count, min, max) rows of one histogram pass,
      * b-ascending. O(buckets) driver state. */
    def histogram(rows: DataFrame, lo: Double, w: Double)
        : Array[(Long, Long, Double, Double)] =
      rows.groupBy(bucketExpr(col("v"), lo, w).as("b"))
        .agg(count(lit(1)).as("c"), min("v").as("mn"),
          max("v").as("mx"))
        .collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2),
          x.getDouble(3)))
        .sortBy(_._1)

    /** Walk cumulative counts to the bucket owning within-range rank
      * `r`; returns (bucket, count, min, max, rank-within-bucket). */
    def locate(hist: Array[(Long, Long, Double, Double)], r: Long)
        : (Long, Long, Double, Double, Long) = {
      var cum = 0L
      for ((b, c, mn, mx) <- hist) {
        if (r <= cum + c) return (b, c, mn, mx, r - cum)
        cum += c
      }
      throw new IllegalStateException( // ranks are clamped to n
        s"quantileDisc: rank $r beyond histogram total $cum")
    }

    /** Equal-width bucket size for [lo, hi], computed as
      * `hi/buckets - lo/buckets` so the full double range cannot
      * overflow to infinity (hi - lo can). Zero or non-positive
      * means the range is too narrow to subdivide in double. */
    def widthOf(lo: Double, hi: Double): Double =
      hi / buckets - lo / buckets

    /** Degenerate range — un-subdividable in double yet holding more
      * than collectCap rows: such a range spans at most ~2*buckets
      * REPRESENTABLE doubles (its width is under buckets * ulp), so
      * the per-distinct-value counts are bounded driver state and
      * the rank is read off the cumulative walk. Long-rank safe. */
    def selectByValueCounts(rows: DataFrame, r: Long): Double = {
      val counts = rows.groupBy("v").agg(count(lit(1)).as("c"))
        .collect().map(x => (x.getDouble(0), x.getLong(1)))
        .sortBy(_._1)
      var cum = 0L
      for ((v, c) <- counts) {
        if (r <= cum + c) return v
        cum += c
      }
      throw new IllegalStateException(
        s"quantileDisc: rank $r beyond value-count total $cum")
    }

    /** Skew path: resolve rank `r` within `rows` ⊆ [lo, hi]. Each
      * level re-histograms under the accumulated bucket predicate —
      * a full-width scan but a bucket-sized combine. */
    def selectSkewed(rows: DataFrame, rangeCount: Long, lo: Double,
        hi: Double, r: Long): Double = {
      if (lo == hi) return lo // every value in range identical
      if (rangeCount <= collectCap) {
        val sorted = rows.collect().map(_.getDouble(0)).sorted
        return sorted((r - 1).toInt)
      }
      val w = widthOf(lo, hi)
      if (w <= 0 || (lo + w) == lo)
        return selectByValueCounts(rows, r)
      val (b, c, mn, mx, r2) = locate(histogram(rows, lo, w), r)
      selectSkewed(rows.where(bucketExpr(col("v"), lo, w) === b),
        c, mn, mx, r2)
    }

    val ranks = probs.map(rankOf).distinct
    // A rank inside the ±Inf mass IS that infinity — answered from
    // the stats pass alone; the rest shift into the finite sub-order
    // (overall rank r ↦ finite rank r - nNeg).
    val (infRanks, finRanks) = ranks.partition(r =>
      r <= nNeg || r > nNeg + nFin)
    val infAnswers: Map[Long, Double] = infRanks.map(r =>
      r -> (if (r <= nNeg) Double.NegativeInfinity
      else Double.PositiveInfinity)).toMap
    val finRanksShifted = finRanks.map(_ - nNeg).distinct
    val lo0 = if (nFin == 0) 0.0 else stats.getDouble(3)
    val hi0 = if (nFin == 0) 0.0 else stats.getDouble(4)
    val finByShifted: Map[Long, Double] =
      if (finRanksShifted.isEmpty) Map.empty
      else if (lo0 == hi0) finRanksShifted.map(_ -> lo0).toMap
      else {
        val w0 = widthOf(lo0, hi0)
        if (w0 <= 0 || (lo0 + w0) == lo0) {
          // Degenerate double range: every rank via the skew path's
          // own guards (collect or bounded value-count walk).
          finRanksShifted.map(r =>
            r -> selectSkewed(vals, nFin, lo0, hi0, r)).toMap
        } else {
          val hist0 = histogram(vals, lo0, w0) // the shared pass
          val located = finRanksShifted.map(r => r -> locate(hist0, r))
          val (small, skewed) =
            located.partition(_._2._2 <= collectCap)
          // One combined collect scan serves every well-behaved rank.
          val smallAnswers: Map[Long, Double] =
            if (small.isEmpty) Map.empty
            else {
              val want = small.map(_._2._1).distinct
              val byBucket = vals
                .where(bucketExpr(col("v"), lo0, w0).isin(want: _*))
                .select(bucketExpr(col("v"), lo0, w0).as("b"),
                  col("v"))
                .collect()
                .groupBy(_.getLong(0))
                .map { case (b, rs) =>
                  b -> rs.map(_.getDouble(1)).sorted }
              small.map { case (r, (b, _, _, _, r2)) =>
                r -> byBucket(b)((r2 - 1).toInt)
              }.toMap
            }
          smallAnswers ++ skewed.map { case (r, (b, c, mn, mx, r2)) =>
            r -> selectSkewed(
              vals.where(bucketExpr(col("v"), lo0, w0) === b),
              c, mn, mx, r2)
          }.toMap
        }
      }
    val answers: Map[Long, Double] = infAnswers ++
      finRanks.map(r => r -> finByShifted(r - nNeg)).toMap
    val byRank = probs.map(p => p -> rankOf(p)).toMap
    probs.map(p => (p, answers(byRank(p)))).toDF("prob", "value")
  }
}
