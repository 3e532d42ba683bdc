package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.jobs.Jobs.SourceTable

/** JDBC-backed [[SourceTable]] (S1/S2/S3/S4,
  * `Parquet Export/db_extractor.py:198-230,29-49`;
  * `row_integrity.py:48`).
  *
  * The reference streams 1M-row chunks over one connection; the Spark
  * shape is a partitioned JDBC scan — one predicate per day inside the
  * requested window, so each executor reads its own day slice and the
  * day-range WHERE is evaluated by MySQL (the reference's hand-written
  * pushdown, now expressed as predicates). MAX/COUNT are shipped as
  * one-row SQL aggregates through the `query` option — DSv1
  * `spark.read.jdbc` does NOT push aggregates (that exists only on the
  * DSv2 `JDBCTableCatalog` path), so an `.agg(max(...))` over a plain
  * table read would stream the whole table through one connection to
  * compute a scalar. Shipping the text mirrors the reference exactly:
  * `SELECT MAX(date_time)` (`db_extractor.py:29-49`) and
  * `SELECT COUNT(*)` (`row_integrity.py:48`), answered from the
  * source's index.
  *
  * Exercised for real against embedded Derby in `JdbcSourceSpec`
  * (same JDBC code path; MySQL differs only in the URL/driver), plus
  * structurally by the [[graft.jobs.Jobs.FrameSource]] fixture path.
  */
final class JdbcSource(spark: SparkSession, url: String, table: String,
    dtCol: String = "date_time",
    props: java.util.Properties = new java.util.Properties())
  extends SourceTable {

  override def readWindow(from: String, to: String): DataFrame = {
    val f = java.time.LocalDate.parse(from.substring(0, 10))
    val t = java.time.LocalDate.parse(to.substring(0, 10))
    val nDays = math.max(1L,
      java.time.temporal.ChronoUnit.DAYS.between(f, t) + 1)
    // One partition per day — but never more than maxParts predicates:
    // a historical-backfill window can span decades (the cold-start
    // read is `dt < MIN_DATE` from year 1), and a predicate per day
    // there would mean hundreds of thousands of empty JDBC partitions
    // and a task binary carrying them all. Wide windows coarsen to
    // day-aligned chunks instead.
    val maxParts = 128L
    val daysPerPart = (nDays + maxParts - 1) / maxParts
    val predicates = Iterator
      .iterate(f)(_.plusDays(daysPerPart))
      .takeWhile(!_.isAfter(t))
      .map { start =>
        val dayLo = s"$start 00:00:00"
        val dayHi = s"${start.plusDays(daysPerPart)} 00:00:00"
        // Clipping happens HERE (19-char strings compare
        // chronologically), so the predicates are plain range
        // comparisons any JDBC backend accepts.
        val lo = if (from > dayLo) from else dayLo
        val hi = if (to < dayHi) to else dayHi
        s"$dtCol >= '$lo' AND $dtCol < '$hi'"
      }.toArray
    spark.read.jdbc(url, table, predicates, props)
      .select(col("id"), col(dtCol).as("date_time"), col("value"),
        col("ts"))
  }

  /** One-row aggregate pushed to the source as SQL text. The loaded
    * relation IS the aggregate (Spark wraps it as a subquery scan), so
    * exactly one row crosses JDBC. */
  private def aggFrame(sql: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val base = spark.read.format("jdbc")
      .option("url", url).option("query", sql)
    props.stringPropertyNames().asScala.toSeq.sorted
      .foldLeft(base)((r, k) => r.option(k, props.getProperty(k)))
      .load()
  }

  /** Exposed for plan-shape assertions in `JdbcSourceSpec`. */
  private[io] def maxDateFrame: DataFrame =
    aggFrame(s"SELECT MAX($dtCol) AS m FROM $table")
      // Cast Spark-side: one row, and MySQL DATETIME arrives as a
      // timestamp while the Derby fixture stores VARCHAR.
      .select(col("m").cast("string").as("m"))

  override def maxDate: Option[String] =
    Option(maxDateFrame.head().getString(0))

  private[io] def countFrame: DataFrame =
    aggFrame(s"SELECT COUNT(*) AS c FROM $table")

  override def count: Long =
    // Engines disagree on COUNT's return type (Derby INT, MySQL
    // BIGINT) — widen whatever arrives.
    countFrame.head().get(0).asInstanceOf[Number].longValue()
}
