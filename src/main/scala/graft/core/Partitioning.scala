package graft.core

import org.apache.spark.sql.DataFrame

/** Partition-width helpers.
  *
  * Compute-heavy narrow operators (signature hashing, shingling,
  * per-row feature extraction) inherit the scan's partitioning. A small
  * Parquet input — one file, one row group — yields ONE task, so a
  * CPU-bound stage runs on one core no matter how wide the cluster is.
  * At lake scale inputs arrive in thousands of splits and the
  * repartition below collapses to a no-op (the width check), but the
  * guard keeps small/medium inputs from serializing.
  */
object Partitioning {

  /** Round-robin widen `df` to at least the session's default
    * parallelism when the current plan has fewer partitions. The added
    * exchange costs one pass over the (small, by definition) input and
    * buys full-width execution of everything downstream. */
  def ensureWidth(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target)
    else df
  }
}
