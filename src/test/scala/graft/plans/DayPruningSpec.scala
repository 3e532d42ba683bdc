package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.Lake

/** The derived-day-predicate rule must turn date_time row filters into
  * actual partition pruning on the lake scan. Own session (extensions
  * bind at session build). */
class DayPruningSpec extends AnyFunSuite {

  /** Sibling sessions off the shared context: the static
    * `spark.sql.extensions` conf only binds for the first session of
    * the JVM, so the rule is attached dynamically via
    * [[GraftExtensions.install]] (same effect — pruning happens at
    * physical planning). */
  private def isolatedSession(withRule: Boolean): SparkSession = {
    val s = graft.SparkSpec.session.newSession()
    if (withRule) GraftExtensions.install(s)
    s
  }

  private lazy val spark: SparkSession = isolatedSession(true)

  private def lakePath(): String = {
    import spark.implicits._
    val p = Files.createTempDirectory("graft_prune").toString + "/lake"
    val df = (1 to 9).map { d =>
      (d.toLong, f"2024-03-0$d 12:00:00", Some(d.toDouble),
        f"2024-03-0$d 12:00:00")
    }.toDF("id", "date_time", "value", "ts")
      .withColumn("day", substring($"date_time", 1, 10))
    Lake.configure(spark)
    Lake.write(df, p)
    p
  }

  private def scannedPartitions(df: org.apache.spark.sql.DataFrame)
      : Seq[String] = {
    df.collect() // force AQE final plan
    df.queryExecution.executedPlan.collectLeaves().flatMap {
      case s: FileSourceScanExec =>
        s.relation.location.listFiles(s.partitionFilters, s.dataFilters)
          .flatMap(_.files.map(_.getPath.toString))
      case _ => Seq.empty
    }.filter(_.contains("day=")).map(_.replaceAll(".*day=", "")
      .replaceAll("/.*", "")).distinct.sorted
  }

  test("date_time range filter prunes day partitions") {
    val p = lakePath()
    val df = Lake.read(spark, p)
      .where(col("date_time") >= "2024-03-03 00:00:00"
        && col("date_time") < "2024-03-05 00:00:00")
    assert(df.select("id").collect().map(_.getLong(0)).sorted
      .toSeq == Seq(3L, 4L))
    val parts = scannedPartitions(df)
    assert(parts == Seq("2024-03-03", "2024-03-04"),
      s"scanned $parts — pruning failed")
  }

  test("equality filter prunes to a single day") {
    val p = lakePath()
    val df = Lake.read(spark, p)
      .where(col("date_time") === "2024-03-07 12:00:00")
    assert(df.count() == 1)
    assert(scannedPartitions(df) == Seq("2024-03-07"))
  }

  test("IN-list filter prunes to the days of its literals") {
    val p = lakePath()
    val df = Lake.read(spark, p)
      .where(col("date_time").isin(
        "2024-03-02 12:00:00", "2024-03-06 12:00:00",
        "2024-03-06 23:59:59"))
    assert(df.select("id").collect().map(_.getLong(0)).sorted
      .toSeq == Seq(2L, 6L))
    val parts = scannedPartitions(df)
    assert(parts == Seq("2024-03-02", "2024-03-06"),
      s"scanned $parts — IN pruning failed")
  }

  test("without the rule the same filter scans every partition") {
    val plain = isolatedSession(false)
    try {
      val p = lakePath()
      val df = plain.read
        .option("basePath", p).parquet(p)
        .where(col("date_time") >= "2024-03-03 00:00:00"
          && col("date_time") < "2024-03-05 00:00:00")
      df.collect()
      val parts = df.queryExecution.executedPlan.collectLeaves()
        .flatMap {
          case s: FileSourceScanExec =>
            s.relation.location.listFiles(s.partitionFilters,
              s.dataFilters).flatMap(_.files.map(_.getPath.toString))
          case _ => Seq.empty
        }.filter(_.contains("day=")).distinct
      assert(parts.size == 9, "control: no pruning expected")
    } finally () // leave the shared default session intact
  }
}
