package graft.core

import org.apache.spark.sql.DataFrame

/** Partition-width helpers.
  *
  * Compute-heavy narrow operators (signature hashing, shingling,
  * per-row feature extraction) inherit the scan's partitioning. A small
  * Parquet input — one file, one row group — yields ONE task, so a
  * CPU-bound stage runs on one core no matter how wide the cluster is.
  * At lake scale inputs arrive in thousands of splits and the guard
  * below is a pure metadata no-op (no exchange is added), but it keeps
  * small/medium inputs from serializing.
  */
object Partitioning {

  /** Round-robin widen `df` to the session's default parallelism when
    * the scan would plan fewer splits than that.
    *
    * The width estimate comes from catalog/file metadata only — file
    * count and optimizer size stats against
    * `spark.sql.files.maxPartitionBytes` — never from materializing the
    * plan (`df.rdd` would convert the logical plan to an RDD and pin a
    * fixed-width exchange AQE cannot revise). On any input already wide
    * enough this returns `df` unchanged, so at lake scale it costs
    * nothing.
    */
  def ensureWidth(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val maxSplit =
      math.max(1L, spark.sessionState.conf.filesMaxPartitionBytes)
    // Files split at maxPartitionBytes; a file-backed plan yields at
    // least one task per file and roughly bytes/maxSplit overall. For
    // non-file plans (local relations in tests) inputFiles is empty and
    // the optimizer's size stat (actual data size) decides.
    val nFiles = df.inputFiles.length.toLong
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val bySize =
      (bytes / maxSplit).min(BigInt(Int.MaxValue)).toLong
    val estimatedSplits = math.max(nFiles, bySize)
    if (estimatedSplits < target) df.repartition(target) else df
  }
}
