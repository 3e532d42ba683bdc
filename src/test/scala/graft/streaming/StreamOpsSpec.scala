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

  test("stream-stream interval join replays across micro-batches " +
      "identically to the batch form") {
    implicit val sc = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val viewRows = Seq(
      (1L, 10L, t("2024-03-01 10:00:00")),
      (1L, 11L, t("2024-03-01 11:30:00")),
      (2L, 12L, t("2024-03-01 10:05:00")),
      (3L, 13L, t("2024-03-01 10:10:00")))
    val clickRows = Seq(
      (1L, 20L, t("2024-03-01 10:20:00")), // joins view 10 (20 min)
      (1L, 21L, t("2024-03-01 11:10:00")), // > 60 min after 10; < 11
      (2L, 22L, t("2024-03-01 10:04:00")), // BEFORE view 12: no join
      (2L, 23L, t("2024-03-01 11:04:00")), // 59 min after view 12
      (3L, 24L, t("2024-03-01 11:10:01"))) // 60:01 after view 13: out
    val vmem = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val cmem = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val joined = StreamOps.intervalJoin(
      vmem.toDS().toDF("user_id", "view_id", "view_ts"),
      cmem.toDS().toDF("user_id", "click_id", "click_ts"),
      "user_id", "view_ts", "click_ts", "60 minutes", "120 minutes")
      .select("view_id", "click_id")
    val q = joined.writeStream.format("memory").queryName("ivj")
      .outputMode("append").start()
    try {
      // batch 1: early views + one click; batch 2: the rest arrives
      // later (cross-micro-batch matches must still surface)
      vmem.addData(viewRows.take(3): _*)
      cmem.addData(clickRows.take(1): _*)
      q.processAllAvailable()
      vmem.addData(viewRows.drop(3): _*)
      cmem.addData(clickRows.drop(1): _*)
      q.processAllAvailable()
      val streamed = spark.table("ivj")
        .as[(Long, Long)].collect().toSet
      val batch = StreamOps.intervalJoin(
        viewRows.toDF("user_id", "view_id", "view_ts"),
        clickRows.toDF("user_id", "click_id", "click_ts"),
        "user_id", "view_ts", "click_ts", "60 minutes", "120 minutes")
        .select("view_id", "click_id").as[(Long, Long)].collect().toSet
      assert(streamed == batch)
      assert(batch == Set((10L, 20L), (12L, 23L)))
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
