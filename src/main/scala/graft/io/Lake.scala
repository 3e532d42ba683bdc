package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Schemas.Sentinel
import graft.cdc.Merge

/** The day-partitioned Parquet lake.
  *
  * The reference stores one file per calendar day
  * (`/root/data/YYYY-MM-DD.parquet`, `db_extractor.py:15,247`,
  * `consolidate.cpp:116`); we use the Spark-native equivalent — a
  * `day=YYYY-MM-DD/` partitioned directory, snappy-compressed, written
  * with dynamic partition overwrite so a rewrite touches only dirty days
  * (the reference's idempotent whole-day-file overwrite,
  * `db_extractor.py:248`).
  */
object Lake {

  /** Session config this module assumes; call once per session. */
  def configure(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    spark.conf.set("spark.sql.parquet.compression.codec", "snappy")
    // `day` is a string slice of date_time (reference semantics,
    // `consolidate.cpp:66`) — partition-type inference would turn it
    // into a DateType and break string comparisons/joins.
    spark.conf.set(
      "spark.sql.sources.partitionColumnTypeInference.enabled", "false")
  }

  def read(spark: SparkSession, path: String): DataFrame = {
    configure(spark)
    spark.read.parquet(path)
  }

  /** S12/S13: write rows carrying a `day` column as day partitions.
    * `overwrite=true` + dynamic mode replaces only the days present in
    * `df` (refetch-overwrite semantics, `db_extractor.py:284-291`);
    * `overwrite=false` appends (historical backfill,
    * `db_extractor.py:212`). */
  def write(df: DataFrame, path: String, overwrite: Boolean = true): Unit =
    df.write
      .mode(if (overwrite) "overwrite" else "append")
      .partitionBy("day")
      .option("compression", "snappy")
      .parquet(path)

  /** S7 (`db_extractor.py:51-76`): resume point = max `date_time`
    * excluding the sentinel; fallback MIN_DATE handled by the caller.
    * The reference scans newest-file-first and early-exits; with day
    * partitions we get the same effect by pruning to the max day dirs —
    * Catalyst answers the max from footer stats of the pruned scan. */
  def resumePoint(lake: DataFrame): Option[String] = {
    val row = lake
      .where(col("date_time") =!= lit(Sentinel))
      .agg(max("date_time"))
      .head()
    Option(row.getString(0))
  }

  /** [[resumePoint]] with the reference's newest-first early exit
    * (`db_extractor.py:55-70`): list the `day=` partition directories,
    * drop the sentinel day, and aggregate ONLY the lexicographic-max
    * day's files — one directory listing plus one partition's footer
    * stats, regardless of how many years the lake holds. Valid because
    * `day` is derived from `date_time`, so the global non-sentinel max
    * lives in the max non-sentinel day partition by construction. */
  def resumePointAt(spark: SparkSession, path: String): Option[String] = {
    configure(spark)
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return None
    val days = fs.listStatus(root).iterator
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith("day="))
      .map(_.stripPrefix("day="))
      .filter(_ != Sentinel.substring(0, 10))
      .toSeq
    if (days.isEmpty) None
    else {
      val row = spark.read.parquet(s"$path/day=${days.max}")
        .where(col("date_time") =!= lit(Sentinel))
        .agg(max("date_time")).head()
      Option(row.getString(0))
    }
  }

  /** S5/R1 (`row_integrity.py`): lake row count (Spark answers from
    * Parquet footer statistics — no data read). */
  def lakeCount(lake: DataFrame): Long = lake.count()

  /** R1 report (`row_integrity.py:74-83`). */
  final case class Reconciliation(
      dbCount: Long, parquetCount: Long, difference: Long, matches: Boolean)

  def reconcile(dbCount: Long, lake: DataFrame): Reconciliation = {
    val pc = lakeCount(lake)
    Reconciliation(dbCount, pc, pc - dbCount, pc == dbCount)
  }

  /** One compacted day's before/after file counts. */
  final case class CompactionReport(day: String, filesBefore: Int,
      filesAfter: Int, bytes: Long)

  /** Small-file compaction — the lake-maintenance pass every
    * incremental day-partitioned lake needs at scale: each CDC merge
    * or backfill append leaves per-day file counts growing, and scan
    * cost at 100 TB is dominated by file-open/footer overhead once
    * files shrink below ~100 MB.
    *
    * Planning is metadata-only (one FS listing, O(#files) driver
    * work, no data read): a day qualifies when it holds more files
    * than `ceil(bytes / targetBytesPerFile)`. Only qualifying days are
    * read and rewritten — dynamic partition overwrite leaves every
    * other day untouched, matching the merge path's dirty-day
    * discipline. Rows spread across each day's target file count via a
    * deterministic hash salt, so a 2 GB day compacts to ~16 files of
    * ~128 MB, not one giant file.
    *
    * Placement is EXACT, not hash-approximate: each row's target output
    * partition is `offset(day) + (xxhash64(id) mod want(day))`, and that
    * index is routed to precisely that shuffle partition by inverting
    * Spark's `HashPartitioning` with a plan-time probe table (for every
    * partition id we pre-compute an int whose murmur3 lands there — see
    * [[hashPartitionProbes]]). Salt buckets of one day can therefore
    * never collide into the same output partition, and two days never
    * co-locate: a compacted day ends up with exactly `want` files
    * whenever every salt bucket is non-empty (guaranteed-approached as
    * rows-per-day >> want; an empty bucket just writes one file fewer,
    * never more).
    *
    * The rewrite is idempotent and content-preserving (same rows, same
    * schema — gated end-to-end by `c15_compaction`); a crash mid-write
    * is repaired by rerunning, exactly like the day-overwrite extract.
    */
  def compact(spark: SparkSession, path: String,
      targetBytesPerFile: Long = 128L * 1024 * 1024)
      : Seq[CompactionReport] = {
    configure(spark)
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return Seq.empty
    def filesOf(day: String): Array[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(new Path(root, s"day=$day"))
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val plan = fs.listStatus(root).iterator
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("day="))
      .map(_.getPath.getName.stripPrefix("day="))
      .map { day =>
        val files = filesOf(day)
        val bytes = files.map(_.getLen).sum
        val want = math.max(1L,
          (bytes + targetBytesPerFile - 1) / targetBytesPerFile).toInt
        (day, files.length, want, bytes)
      }
      .filter { case (_, have, want, _) => have > want }
      .toSeq.sortBy(_._1)
    if (plan.isEmpty) return Seq.empty

    val wantByDay = plan.map { case (d, _, w, _) => (d, w) }
    // The target-count and day-offset lookups are plan-time literal
    // maps: one entry per compacted day, bounded by the maintenance
    // batch size (pass a day-ranged path for multi-year sweeps).
    val wantExpr = element_at(
      map(wantByDay.flatMap { case (d, w) =>
        Seq(lit(d), lit(w)) }: _*), col("day"))
    val offsets = wantByDay.map(_._1)
      .zip(wantByDay.scanLeft(0L)(_ + _._2))
    val offsetExpr = element_at(
      map(offsets.flatMap { case (d, o) =>
        Seq(lit(d), lit(o)) }: _*), col("day"))
    val total = plan.map(_._3).sum
    // Row → global output-partition index, then index → probe value
    // whose murmur3 hash lands on exactly that shuffle partition. The
    // probe table is a LITERAL ARRAY indexed by the (1-based) global
    // index: constant-folded once, O(1) per-row access — a literal
    // map's GetMapValue would linear-scan all `total` entries per row.
    val probes = hashPartitionProbes(total)
    val probeExpr = element_at(
      array(probes.toIndexedSeq.map(lit): _*),
      (offsetExpr + pmod(xxhash64(col("id")), wantExpr.cast("long")))
        .cast("int") + 1)
    val dirty = plan.map(_._1)
    val df = read(spark, path)
      .where(col("day").isin(dirty: _*))
      .withColumn("_cp", probeExpr)
      .repartition(total, col("_cp"))
      .drop("_cp")
    write(df, path, overwrite = true)

    plan.map { case (day, before, _, bytes) =>
      CompactionReport(day, before, filesOf(day).length, bytes)
    }
  }

  /** Inverse table for Spark's `HashPartitioning`: `probes(p)` is an
    * int whose shuffle hash (`pmod(murmur3(v), n)` — evaluated with the
    * exact Catalyst expressions `repartition(n, col)` plans, so seed
    * and type semantics can never drift) equals `p`. Routing a row
    * through a probe-valued column makes `repartition` place it on a
    * chosen partition deterministically. Driver cost is the coupon-
    * collector expectation O(n ln n) hash evals — microseconds for the
    * few-thousand-partition maintenance batches this serves. */
  private[io] def hashPartitionProbes(n: Int): Array[Int] = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, Murmur3Hash, Pmod}
    val out = new Array[Int](n)
    val found = new Array[Boolean](n)
    var remaining = n
    var v = 0
    while (remaining > 0) {
      val p = Pmod(new Murmur3Hash(Seq(Literal(v))), Literal(n))
        .eval(null).asInstanceOf[Int]
      if (!found(p)) { found(p) = true; out(p) = v; remaining -= 1 }
      v += 1
    }
    out
  }

  /** M1+M2 applied to a lake path: read only the dirty days (partition
    * pruning via the `day IN (...)` filter), merge, dynamic-overwrite the
    * dirty days, then delete day directories whose merged result is empty
    * (M2, `consolidate.cpp:226-238` — Spark's dynamic overwrite never
    * rewrites a partition it writes zero rows to, so empty days must be
    * pruned explicitly).
    *
    * The dirty-day set is assumed small (a CDC batch touches few days —
    * the reference pre-sizes for ~100, `consolidate.cpp:299`); it is
    * collected to the driver for pruning and for the final FS delete.
    * The merge itself never collects data rows.
    */
  def mergeIntoLake(spark: SparkSession, lakePath: String,
      changesIn: DataFrame): Unit = {
    configure(spark)
    // Three actions consume the change set (dirty-day listing,
    // empty-day count, final write) — materialize it once instead of
    // re-running parse+consolidate per action. A CDC batch is small
    // relative to the lake by construction.
    val changes = changesIn.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      mergePersisted(spark, lakePath, changes)
    } finally changes.unpersist()
  }

  private def mergePersisted(spark: SparkSession, lakePath: String,
      changes: DataFrame): Unit = {
    val dirtyDays = changes.select("day").distinct()
      .collect().map(_.getString(0)).sorted
    if (dirtyDays.isEmpty) return

    val lakeExists = {
      val fs = new Path(lakePath)
        .getFileSystem(spark.sessionState.newHadoopConf())
      fs.exists(new Path(lakePath))
    }
    val existing =
      if (lakeExists)
        read(spark, lakePath)
          .where(col("day").isin(dirtyDays.toIndexedSeq: _*))
      else
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(
            graft.core.Schemas.timeseriesSchema.fields :+
              org.apache.spark.sql.types.StructField("day",
                org.apache.spark.sql.types.StringType)))

    val merged = Merge.merge(existing, changes)

    // Days whose merged result is empty: dynamic overwrite won't touch
    // them, delete explicitly (M2).
    val nonEmptyDays = merged.groupBy("day").count()
      .collect().map(_.getString(0)).toSet
    val emptyDays = dirtyDays.filterNot(nonEmptyDays)

    if (nonEmptyDays.nonEmpty)
      write(merged, lakePath, overwrite = true)

    if (emptyDays.nonEmpty) {
      val fs = new Path(lakePath)
        .getFileSystem(spark.sessionState.newHadoopConf())
      emptyDays.foreach { d =>
        fs.delete(new Path(lakePath, s"day=$d"), true)
      }
    }
  }
}
