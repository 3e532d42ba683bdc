package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) lake layout: interleave the bits of two sort
  * keys so that range-partitioning on the combined key co-locates rows
  * that are close in BOTH dimensions. Files then carry tight min/max
  * footer statistics on each key and a predicate on either column
  * prunes most files at planning time — the multi-dimensional
  * data-skipping scheme of Morton (1966) as used by modern lakehouse
  * `OPTIMIZE ZORDER` implementations.
  *
  * Scale posture: the z-value is a pure per-row bit expression (codegen,
  * no shuffle); the layout pass is ONE range shuffle into `targetFiles`
  * partitions plus a per-partition sort — the same cost shape as the
  * day-compaction pass in [[graft.io.Lake]], run offline, paid once,
  * amortized over every subsequent pruned scan.
  */
object ZOrder {

  /** Morton interleave of the low `bits` bits of two non-negative
    * integer columns: x occupies even bit positions, y odd. Built from
    * plain shift/mask arithmetic (disjoint bit positions sum without
    * carries), so any engine can restate it literally. Non-negativity
    * is ENFORCED per row (a negative key's sign bits would smear
    * across every interleave position, silently destroying the
    * layout's skipping property — a layout pass is run rarely and
    * trusted long, so mis-layout must be loud): a negative input
    * throws; nulls propagate as null, as before. With `bits` <= 31
    * each, the result fits a long. */
  def zValue(x: Column, y: Column, bits: Int = 20): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftright(x.cast("long"), i).bitwiseAND(lit(1L)) *
          lit(1L << (2 * i)),
        shiftright(y.cast("long"), i).bitwiseAND(lit(1L)) *
          lit(1L << (2 * i + 1)))
    }
    // assert_true yields null when the condition holds (and nulls are
    // let through to keep null-in/null-out semantics); adding the
    // coalesced 0 folds the guard into the same codegen'd expression.
    val guard = assert_true(
      coalesce(x.cast("long") >= 0 && y.cast("long") >= 0, lit(true)),
      lit("zValue: inputs must be non-negative — a sign bit smears " +
        "across the Morton interleave and silently breaks skipping"))
    terms.reduce(_ + _) + coalesce(guard.cast("long"), lit(0L))
  }

  /** The same interleave as SQL text (for external oracles): a sum of
    * `((col >> i) & 1) * 2^pos` terms, matching [[zValue]] bit for
    * bit on the non-negative domain ([[zValue]]'s runtime guard is
    * deliberately not restated — oracle fixtures are non-negative by
    * construction). */
  def zValueSql(x: String, y: String, bits: Int = 20): String = {
    val terms = (0 until bits).flatMap { i =>
      Seq(
        s"((($x)::BIGINT >> $i) & 1) * ${1L << (2 * i)}",
        s"((($y)::BIGINT >> $i) & 1) * ${1L << (2 * i + 1)}")
    }
    terms.mkString("(", " + ", ")")
  }

  /** Rewrite `df` into a z-ordered layout: range-partition on the
    * Morton key into `targetFiles` buckets and sort within each, so a
    * writer emits one spatially-tight file per bucket. Returns the
    * re-laid-out frame (caller writes it; layout and IO stay
    * separable, as with Lake.compactDays). */
  def layout(df: DataFrame, xCol: String, yCol: String,
      targetFiles: Int, bits: Int = 20): DataFrame = {
    require(targetFiles >= 1, "targetFiles must be positive")
    require(!df.columns.contains("_z"),
      "layout: input already has a '_z' column (withColumn would " +
        "silently replace it)")
    val withZ = df.withColumn("_z",
      zValue(col(xCol), col(yCol), bits))
    withZ
      .repartitionByRange(targetFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
  }
}
