package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Schemas.NodeStatus
import graft.monitor.Monitor

/** At 100 TB the stateful streaming operators run on the RocksDB
  * state store (bounded executor heap, spillable state), not the
  * default in-memory HDFS-backed provider the other streaming specs
  * exercise. These cases re-run the custom-state
  * (`flatMapGroupsWithState` — w09's operator) and stateful-dedup
  * (`dropDuplicates` with watermark) paths under BOTH providers on
  * isolated sessions and assert identical output: the provider is a
  * storage detail, never a semantics change. */
class RocksDbStateStoreSpec extends SparkSpec {

  private val RocksDb = "org.apache.spark.sql.execution.streaming." +
    "state.RocksDBStateStoreProvider"

  private def withProvider(provider: Option[String]): SparkSession = {
    val s = spark.newSession()
    provider.foreach(p =>
      s.conf.set("spark.sql.streaming.stateStore.providerClass", p))
    s
  }

  /** Replay a 3-batch node-status history through
    * [[Monitor.anomaliesStream]]; every batch boundary is a state
    * handoff through the configured provider. */
  private def replayAnomalies(s: SparkSession,
      name: String): Seq[(String, String, Long)] = {
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[(String, Long, Boolean)]
    val snaps = mem.toDS().map { case (ip, poll, online) =>
      NodeStatus(ip, online, isMaster = false, replication = None,
        pollTs = poll)
    }
    val q = Monitor.anomaliesStream(snaps)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    val batches = Seq(
      Seq(("10.0.0.1", 1L, true), ("10.0.0.2", 1L, true)),
      Seq(("10.0.0.1", 2L, false), ("10.0.0.2", 2L, true),
        ("10.0.0.3", 2L, true)),
      Seq(("10.0.0.1", 3L, true), ("10.0.0.3", 3L, false)))
    try batches.foreach { b =>
      mem.addData(b: _*)
      q.processAllAvailable()
    } finally q.stop()
    s.table(name).select(col("ip"), col("kind"), col("pollTs"))
      .as[(String, String, Long)].collect().toSeq.sorted
  }

  private def replayDedup(s: SparkSession,
      name: String): Set[(String, Double)] = {
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = mem.toDS().toDF("ts", "k", "v")
    val q = StreamOps.streamingDedup(df, "ts", Seq("k"), "30 minutes")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      mem.addData(
        (java.sql.Timestamp.valueOf("2024-03-01 10:00:00"), "a", 1.0),
        (java.sql.Timestamp.valueOf("2024-03-01 10:01:00"), "a", 2.0),
        (java.sql.Timestamp.valueOf("2024-03-01 10:02:00"), "b", 3.0))
      q.processAllAvailable()
      // duplicate of "a" arriving in a LATER micro-batch: suppressing
      // it requires the first batch's state to survive the handoff.
      mem.addData(
        (java.sql.Timestamp.valueOf("2024-03-01 10:05:00"), "a", 9.0),
        (java.sql.Timestamp.valueOf("2024-03-01 10:06:00"), "c", 4.0))
      q.processAllAvailable()
    } finally q.stop()
    s.table(name).select("k", "v").as[(String, Double)].collect().toSet
  }

  /** Replay the w10 stream-stream interval join (both sides buffered
    * in the state store across micro-batches) — the same fixture and
    * batch split as the StreamOpsSpec replay case. */
  private def replayIntervalJoin(s: SparkSession,
      name: String): Set[(Long, Long)] = {
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    def t(ts: String) = java.sql.Timestamp.valueOf(ts)
    val viewRows = Seq(
      (1L, 10L, t("2024-03-01 10:00:00")),
      (1L, 11L, t("2024-03-01 11:30:00")),
      (2L, 12L, t("2024-03-01 10:05:00")),
      (3L, 13L, t("2024-03-01 10:10:00")))
    val clickRows = Seq(
      (1L, 20L, t("2024-03-01 10:20:00")),
      (1L, 21L, t("2024-03-01 11:10:00")),
      (2L, 22L, t("2024-03-01 10:04:00")),
      (2L, 23L, t("2024-03-01 11:04:00")),
      (3L, 24L, t("2024-03-01 11:10:01")))
    val vmem = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val cmem = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val q = StreamOps.intervalJoin(
      vmem.toDS().toDF("user_id", "view_id", "view_ts"),
      cmem.toDS().toDF("user_id", "click_id", "click_ts"),
      "user_id", "view_ts", "click_ts", "60 minutes", "120 minutes")
      .select("view_id", "click_id")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      vmem.addData(viewRows.take(3): _*)
      cmem.addData(clickRows.take(1): _*)
      q.processAllAvailable()
      vmem.addData(viewRows.drop(3): _*)
      cmem.addData(clickRows.drop(1): _*)
      q.processAllAvailable()
    } finally q.stop()
    s.table(name).as[(Long, Long)].collect().toSet
  }

  test("stream-stream interval join (w10) is identical under the " +
      "default and RocksDB state store providers") {
    val default =
      replayIntervalJoin(withProvider(None), "rdb_ivj_default")
    val rocks =
      replayIntervalJoin(withProvider(Some(RocksDb)), "rdb_ivj_rocks")
    assert(default == Set((10L, 20L), (12L, 23L)))
    assert(rocks == default,
      s"provider changed the interval join:\n$rocks\nvs\n$default")
  }

  test("flatMapGroupsWithState anomaly stream is identical under " +
      "the default and RocksDB state store providers") {
    val default =
      replayAnomalies(withProvider(None), "rdb_anom_default")
    val rocks =
      replayAnomalies(withProvider(Some(RocksDb)), "rdb_anom_rocks")
    assert(default.nonEmpty, "replay produced no anomalies")
    assert(rocks == default,
      s"provider changed the anomaly stream:\n$rocks\nvs\n$default")
  }

  test("stateful streaming dedup is identical under the default " +
      "and RocksDB state store providers") {
    val default = replayDedup(withProvider(None), "rdb_dedup_default")
    val rocks =
      replayDedup(withProvider(Some(RocksDb)), "rdb_dedup_rocks")
    assert(default == Set(("a", 1.0), ("b", 3.0), ("c", 4.0)))
    assert(rocks == default,
      s"provider changed the dedup output:\n$rocks\nvs\n$default")
  }
}
