package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join.
  *
  * Spark has no native interval-join operator: a raw
  * `f.point >= v.lo && f.point < v.hi` join plans as a nested-loop
  * over the full cross product — O(|points| x |ranges|), hopeless at
  * scale unless one side broadcasts. The standard fix (used by every
  * interval-join implementation, e.g. Flink's window join and the
  * bucketing rewrite in Databricks' range-join optimization) is to
  * quantize the domain: each range explodes to the buckets it covers,
  * each point maps to exactly one bucket, and the join becomes an
  * EQUI join on the bucket key followed by an exact refine filter.
  * Shuffle volume is |points| + sum(range widths)/bucket, and Catalyst
  * is free to pick hash/broadcast strategies for the equi join.
  *
  * `bucket` trades replication (long ranges explode to many buckets)
  * against bucket selectivity (wide buckets admit more false
  * candidates); set it near the median range width.
  */
object RangeJoin {

  /** Join `points` to the ranges whose `[lo, hi)` interval contains
    * `pointCol`. All three columns must be integral (cast dates to
    * epoch days first). Requires `hi > lo` for every range. */
  def pointInRange(points: DataFrame, pointCol: String,
      ranges: DataFrame, loCol: String, hiCol: String,
      bucket: Long): DataFrame = {
    require(bucket > 0, "bucket width must be positive")
    def b(c: Column): Column = floor(c / lit(bucket)).cast("long")
    val pb = points.withColumn("_bucket", b(col(pointCol)))
    val rb = ranges.withColumn("_bucket",
      explode(sequence(b(col(loCol)), b(col(hiCol) - 1))))
    pb.join(rb, Seq("_bucket"))
      .where(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("_bucket")
  }
}
