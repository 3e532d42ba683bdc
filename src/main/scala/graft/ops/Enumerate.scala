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
  * distributed: rows are grouped by a caller-supplied MONOTONE bucket
  * of the keys (all keys in bucket b sort before all keys in bucket
  * b+1), numbered locally per bucket, and offset by the cumulative
  * bucket counts — the only driver-side state is one count per
  * bucket, never rows.
  *
  * The bucket must be a deterministic pure function of the keys.
  * `repartitionByRange` is NOT that function: its range boundaries
  * come from a sample whose seed varies per job, so the counts job
  * and the numbering job can disagree — a divergence the 10x fixture
  * exposed (small fixtures sample the full data and mask it). For
  * uniformly-distributed long keys use [[rangeBucket]]; for arbitrary
  * domains supply any monotone bucketing (e.g. fixed boundaries from
  * a one-off quantile computation, baked as literals).
  *
  * The key set must be a total order (add a unique tie-break column)
  * for positions to be deterministic.
  */
object Enumerate {

  /** Monotone bucketing of a long key in `[0, maxExclusive)` into
    * `buckets` contiguous ranges — exact integer arithmetic, no
    * sampling. (`key * buckets` must fit in int64.) */
  def rangeBucket(key: Column, maxExclusive: Long,
      buckets: Int): Column =
    (key * buckets) / maxExclusive

  def withPosition(df: DataFrame, posCol: String, bucket: Column,
      keys: Column*): DataFrame = {
    val bucketed = df.withColumn("_bkt", bucket.cast("long"))
    // One count per bucket: O(#buckets) driver state. A null bucket
    // key has no place in the total order (its rows would either
    // throw here or silently take null positions) — fail fast with
    // the contract instead.
    val counts = bucketed.groupBy("_bkt").count()
      .collect().map { r =>
        require(!r.isNullAt(0),
          s"Enumerate.withPosition: bucket expression produced NULL " +
            s"for ${r.getLong(1)} row(s); the bucket must be a " +
            "non-null monotone function of the keys (null keys have " +
            "no position in a total order — filter or coalesce them " +
            "before enumerating)")
        (r.getLong(0), r.getLong(1))
      }
      .sortBy(_._1)
    val offsets = counts.map(_._1)
      .zip(counts.scanLeft(0L)(_ + _._2))
    val offsetExpr =
      if (offsets.isEmpty) lit(0L)
      else element_at(
        map(offsets.flatMap { case (b, o) =>
          Seq(lit(b), lit(o)) }.toIndexedSeq: _*), col("_bkt"))
    val local = Window.partitionBy(col("_bkt"))
      .orderBy(keys.map(_.asc): _*)
    bucketed
      .withColumn(posCol, offsetExpr + row_number().over(local))
      .drop("_bkt")
  }
}
