package graft.jobs

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.Lake

/** The three lifecycles end-to-end on fixture frames + binlog text:
  * SURVEY §7.2's minimum slice. */
class JobsSpec extends SparkSpec {

  import spark.implicits._

  private val T = "`enexory`.`api_data_timeseries`"

  private def rawSource = new Jobs.FrameSource(Seq(
    // historical (pre-2010) rows
    (1L, "2009-06-01 10:00:00", Some(1.0), "2009-06-01 10:00:00"),
    // incremental days
    (2L, "2024-03-01 08:00:00", Some(2.0), "2024-03-01 08:00:00"),
    (3L, "2024-03-01 09:00:00", None: Option[Double],
      "2024-03-01 09:00:00"),
    (4L, "2024-03-02 10:00:00", Some(4.0), "2024-03-02 10:00:00"),
    (5L, "2024-03-03 11:00:00", Some(5.0), "2024-03-03 11:00:00"))
    .toDF("id", "date_time", "value", "ts"))

  test("extract: cold start backfills history then walks days") {
    val lake = Files.createTempDirectory("graft_job").toString + "/lake"
    val days = Jobs.extract(spark, rawSource, lake)
    assert(days.nonEmpty)
    val back = Lake.read(spark, lake)
    assert(back.count() == 5)
    assert(back.select("day").distinct().as[String].collect().sorted
      .toSeq == Seq("2009-06-01", "2024-03-01", "2024-03-02",
      "2024-03-03"))
    // idempotent re-run: refetch-overwrite leaves counts unchanged
    Jobs.extract(spark, rawSource, lake)
    assert(Lake.read(spark, lake).count() == 5)
    // reconciliation closes the loop
    assert(Jobs.integrity(spark, rawSource, lake).matches)
  }

  test("cdcMerge applies a binlog batch onto the extracted lake") {
    val base = Files.createTempDirectory("graft_job2").toString
    val lake = base + "/lake"
    Jobs.extract(spark, rawSource, lake)
    val binlog = base + "/binlogs"
    Files.createDirectories(Paths.get(binlog))
    Files.writeString(Paths.get(binlog, "bin.000001.txt"),
      s"""UPDATE $T
         |SET
         |  @1=2
         |  @3='2024-03-01 08:00:00'
         |  @4=22.5
         |  @6=1709280000
         |DELETE FROM $T
         |WHERE
         |  @1=5
         |  @3='2024-03-03 11:00:00'
         |INSERT INTO $T
         |SET
         |  @1=9
         |  @3='2024-03-04 12:00:00'
         |  @4=NULL
         |  @6=1709280000""".stripMargin)
    Jobs.cdcMerge(spark, binlog + "/*", lake)
    val rows = Lake.read(spark, lake)
      .select("day", "id", "value")
      .as[(String, Long, Option[Double])].collect().toSet
    assert(rows == Set(
      ("2009-06-01", 1L, Some(1.0)),
      ("2024-03-01", 2L, Some(22.5)),
      ("2024-03-01", 3L, None),
      ("2024-03-02", 4L, Some(4.0)),
      ("2024-03-04", 9L, None)))
    // day emptied by the delete is pruned
    val fs = new org.apache.hadoop.fs.Path(lake)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.exists(
      new org.apache.hadoop.fs.Path(lake, "day=2024-03-03")))
  }

  test("validation failure aborts the extract") {
    val bad = new Jobs.FrameSource(
      Seq((-7L, "2024-03-01 08:00:00", Some(1.0),
        "2024-03-01 08:00:00")).toDF("id", "date_time", "value", "ts"))
    val lake = Files.createTempDirectory("graft_job3").toString + "/l"
    intercept[graft.ops.Timeseries.ValidationException] {
      Jobs.extract(spark, bad, lake)
    }
  }
}
