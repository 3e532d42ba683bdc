package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Contiguous global enumeration in a total key order — the "shuffle
  * the corpus into a reproducible training order and number every
  * example" step of a pretraining pipeline.
  *
  * The naive form (`row_number() OVER (ORDER BY ...)`) collapses the
  * whole dataset into ONE window partition — a single-task sort that
  * caps at one executor core's memory. This operator keeps the sort
  * distributed: range-repartition on the keys (what `orderBy` does
  * internally), sort within partitions, number rows locally, then add
  * per-partition offsets computed from partition COUNTS — the only
  * driver-side state is one long per partition, never rows.
  *
  * The key set must be a total order (add a unique tie-break column)
  * for positions to be deterministic.
  */
object Enumerate {

  def withPosition(df: DataFrame, posCol: String, numPartitions: Int,
      keys: Column*): DataFrame = {
    val sorted = df
      .repartitionByRange(numPartitions, keys: _*)
      .sortWithinPartitions(keys: _*)
      .withColumn("_pid", spark_partition_id())
    // One count per partition: O(numPartitions) driver state.
    val counts = sorted.groupBy("_pid").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until numPartitions).scanLeft(0L) {
      (acc, p) => acc + counts.getOrElse(p, 0L)
    }
    val offsetExpr = element_at(
      map((0 until numPartitions).flatMap(p =>
        Seq(lit(p), lit(offsets(p)))): _*), col("_pid"))
    val local = Window.partitionBy(col("_pid"))
      .orderBy(keys.map(_.asc): _*)
    sorted
      .withColumn(posCol, offsetExpr + row_number().over(local))
      .drop("_pid")
  }
}
