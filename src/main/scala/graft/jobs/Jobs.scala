package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Schemas.{MinDate, Sentinel}
import graft.cdc.{CdcSource, Consolidate}
import graft.io.Lake
import graft.ops.Timeseries

/** The three reference lifecycles (SURVEY §3) as engine jobs.
  *
  * The MySQL connection is abstracted behind [[SourceTable]] so tests
  * and fixtures stand in for JDBC; a production impl wraps
  * `spark.read.jdbc` with day-window predicates (S1/S2) — Catalyst
  * pushes the filters into the source either way.
  */
object Jobs {

  /** The upstream table surface the extractor needs: day-window reads
    * (S1/S2), MAX date (S3), COUNT (S4). */
  trait SourceTable {
    def readWindow(fromInclusive: String, toExclusive: String): DataFrame
    def maxDate: Option[String]
    def count: Long
  }

  /** Fixture-backed source: any DataFrame with the 4-column raw shape
    * (id, date_time, value, ts) — datetimes may be unnormalized. */
  final class FrameSource(df: DataFrame) extends SourceTable {
    override def readWindow(from: String, to: String): DataFrame =
      df.where(col("date_time") >= from && col("date_time") < to)
    override def maxDate: Option[String] =
      Option(df.agg(max("date_time")).head().getString(0))
    override def count: Long = df.count()
  }

  /** Entry point 1 (`db_extractor.py:254-325`): incremental extraction.
    * Resume from the lake's max non-sentinel date_time (S7), refetch and
    * overwrite the resume day (idempotent, `db_extractor.py:284-291`),
    * then walk forward day by day to the source max (S14), normalizing
    * (S9), validating fail-fast (S8), day-partitioning (S10) and
    * dynamic-overwriting (S12). Returns days written. */
  def extract(spark: SparkSession, source: SourceTable,
      lakePath: String): Seq[String] = {
    Lake.configure(spark)
    val lakeExists = {
      val p = new org.apache.hadoop.fs.Path(lakePath)
      p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
    }
    if (!lakeExists) {
      // Cold start: historical backfill of everything before MIN_DATE
      // (`db_extractor.py:195-216`, `dt < MIN_DATE ORDER BY ASC` —
      // ordering is irrelevant to a partitioned write).
      val hist = source.readWindow("0001-01-01 00:00:00", MinDate)
      val normalized = hist.select(
        col("id").cast("long").as("id"),
        Timeseries.normalizeDt(col("date_time")).as("date_time"),
        col("value").cast("double").as("value"),
        Timeseries.normalizeDt(col("ts")).as("ts"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val withDay = Timeseries.assertValid(normalized)
          .withColumn("day", Timeseries.dayOf(col("date_time")))
        if (!withDay.isEmpty)
          Lake.write(withDay, lakePath, overwrite = false)
      } finally normalized.unpersist()
    }
    val lakeExistsNow = lakeExists || {
      val p = new org.apache.hadoop.fs.Path(lakePath)
      p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
    }
    val resume: String =
      (if (lakeExistsNow) Lake.resumePointAt(spark, lakePath)
       else None).getOrElse(MinDate)
    val stop = source.maxDate.getOrElse(return Seq.empty)

    val fromDay = java.time.LocalDate.parse(resume.substring(0, 10))
    val toDay = java.time.LocalDate.parse(stop.substring(0, 10))
    if (toDay.isBefore(fromDay)) return Seq.empty

    val days = Iterator.iterate(fromDay)(_.plusDays(1))
      .takeWhile(!_.isAfter(toDay)).map(_.toString).toSeq

    // One ranged read covering [resume day, max day]; day partitioning
    // fans the write out — the reference's per-day loop collapses into
    // a single distributed pass, same refetch-overwrite semantics
    // because every touched day partition is fully rewritten.
    val raw = source.readWindow(s"${days.head} 00:00:00",
      s"${toDay.plusDays(1)} 00:00:00")
    val normalized = raw.select(
      col("id").cast("long").as("id"),
      Timeseries.normalizeDt(col("date_time")).as("date_time"),
      col("value").cast("double").as("value"),
      Timeseries.normalizeDt(col("ts")).as("ts"))
      // the fail-fast validation scan and the write both consume the
      // source window — materialize once so a JDBC source is queried
      // once, not twice
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val validated = Timeseries.assertValid(normalized)
      val withDay = validated
        .withColumn("day", Timeseries.dayOf(col("date_time")))
      Lake.write(withDay, lakePath, overwrite = lakeExistsNow)
    } finally normalized.unpersist()
    days
  }

  /** Historical repair pass (S15, `db_extractor.py:151-193`): rows in
    * days before MIN_DATE are re-validated and rewritten in place. */
  def repairHistorical(spark: SparkSession, lakePath: String): Long = {
    Lake.configure(spark)
    val minDay = MinDate.substring(0, 10)
    val old = Lake.read(spark, lakePath)
      .where(col("day") < lit(minDay) && col("day") =!= lit(
        Sentinel.substring(0, 10)))
    val n = old.count()
    if (n > 0) Lake.write(Timeseries.assertValid(old), lakePath)
    n
  }

  /** Entry point 2 (`parse_binlogs.sh` + consolidate): parse binlog
    * dumps, consolidate, merge into the lake, prune empty days. */
  def cdcMerge(spark: SparkSession, binlogGlob: String,
      lakePath: String): Unit = {
    val events = CdcSource.readEvents(spark, binlogGlob)
    Lake.mergeIntoLake(spark, lakePath, Consolidate.netChanges(events))
  }

  /** Entry point 3 (`row_integrity.py`): count reconciliation. */
  def integrity(spark: SparkSession, source: SourceTable,
      lakePath: String): Lake.Reconciliation =
    Lake.reconcile(source.count, Lake.read(spark, lakePath))
}
