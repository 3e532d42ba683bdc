package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.Lake

class StreamOpsSpec extends SparkSpec {

  import spark.implicits._

  private val T = "`enexory`.`api_data_timeseries`"

  test("streaming CDC: files arriving across micro-batches merge into the lake") {
    val base = Files.createTempDirectory("graft_stream").toString
    val binlog = base + "/in"
    Files.createDirectories(Paths.get(binlog))
    val lake = base + "/lake"

    val events = StreamOps.streamEvents(spark, binlog)
    val q = StreamOps.mergeStream(events, lake, base + "/ckpt")
    try {
      Files.writeString(Paths.get(binlog, "bin.000001.txt"),
        s"INSERT INTO $T\nSET\n@1=1\n@3='2024-03-01 10:00:00'\n@4=1\n@6=100\n")
      q.processAllAvailable()
      assert(Lake.read(spark, lake).count() == 1)

      // second file updates the row; later file number wins
      Files.writeString(Paths.get(binlog, "bin.000002.txt"),
        s"UPDATE $T\nSET\n@1=1\n@3='2024-03-01 10:00:00'\n@4=42\n@6=200\n")
      q.processAllAvailable()
      val rows = Lake.read(spark, lake)
        .select("id", "value").as[(Long, Option[Double])].collect()
      assert(rows.toSeq == Seq((1L, Some(42.0))))
    } finally q.stop()
  }

  test("streaming dedup suppresses duplicate keys across micro-batches") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = mem.toDS().toDF("ts", "k", "v")
    val q = StreamOps.streamingDedup(df, "ts", Seq("k"), "30 minutes")
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      mem.addData(
        (java.sql.Timestamp.valueOf("2024-03-01 10:00:00"), "a", 1.0),
        (java.sql.Timestamp.valueOf("2024-03-01 10:01:00"), "a", 2.0),
        (java.sql.Timestamp.valueOf("2024-03-01 10:02:00"), "b", 3.0))
      q.processAllAvailable()
      // duplicate of "a" in a LATER micro-batch, inside the watermark
      mem.addData(
        (java.sql.Timestamp.valueOf("2024-03-01 10:05:00"), "a", 9.0),
        (java.sql.Timestamp.valueOf("2024-03-01 10:06:00"), "c", 4.0))
      q.processAllAvailable()
      val out = spark.table("dedup").select("k", "v")
        .as[(String, Double)].collect().toSet
      assert(out == Set(("a", 1.0), ("b", 3.0), ("c", 4.0)))
    } finally q.stop()
  }

  test("watermarked windowed aggregation over an event-time stream") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = mem.toDS().toDF("ts", "event_type", "value")
    val agg = StreamOps.windowedCounts(df, "ts", "event_type",
      "10 minutes", "20 minutes")
    val q = agg.writeStream.format("memory").queryName("win")
      .outputMode("complete").start()
    try {
      mem.addData(
        (java.sql.Timestamp.valueOf("2024-03-01 10:01:00"), "a", 1.0),
        (java.sql.Timestamp.valueOf("2024-03-01 10:05:00"), "a", 2.0),
        (java.sql.Timestamp.valueOf("2024-03-01 10:11:00"), "b", 3.0))
      q.processAllAvailable()
      val out = spark.table("win")
        .select(col("event_type"), col("n"), col("sum_value"))
        .as[(String, Long, Double)].collect().toSet
      assert(out == Set(("a", 2L, 3.0), ("b", 1L, 3.0)))
    } finally q.stop()
  }
}
