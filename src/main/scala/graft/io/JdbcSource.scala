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
  * pushdown, now expressed as predicates). MAX/COUNT go through
  * Catalyst's JDBC aggregate pushdown.
  *
  * Untested in this environment (no MySQL) — covered structurally by
  * the [[graft.jobs.Jobs.FrameSource]] fixture path, which exercises
  * the same [[SourceTable]] contract.
  */
final class JdbcSource(spark: SparkSession, url: String, table: String,
    dtCol: String = "date_time",
    props: java.util.Properties = new java.util.Properties())
  extends SourceTable {

  override def readWindow(from: String, to: String): DataFrame = {
    val days = {
      val f = java.time.LocalDate.parse(from.substring(0, 10))
      val t = java.time.LocalDate.parse(to.substring(0, 10))
      Iterator.iterate(f)(_.plusDays(1)).takeWhile(!_.isAfter(t))
        .map(_.toString).toArray
    }
    // One partition per day: `dtCol >= day AND dtCol < day+1`, clipped
    // to the window bounds — MySQL evaluates each range on its index.
    val predicates = days.map { d =>
      s"$dtCol >= GREATEST('$d 00:00:00', '$from') AND " +
        s"$dtCol < LEAST('${java.time.LocalDate.parse(d).plusDays(1)}" +
        s" 00:00:00', '$to')"
    }
    spark.read.jdbc(url, table, predicates, props)
      .select(col("id"), col(dtCol).as("date_time"), col("value"),
        col("ts"))
  }

  override def maxDate: Option[String] =
    Option(spark.read.jdbc(url, table, props)
      .agg(max(col(dtCol)).cast("string")).head().getString(0))

  override def count: Long =
    spark.read.jdbc(url, table, props).count()
}
