package graft.monitor

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.core.Schemas.{NodeStatus, ReplicationStatus}

/** W2 anomaly diff: batch replay and the streaming stateful form. */
class MonitorSpec extends SparkSpec {

  import spark.implicits._

  private def node(ip: String, t: Long, online: Boolean = true,
      lag: Option[Long] = Some(0L), io: String = "Yes",
      sql: String = "Yes", err: String = ""): NodeStatus =
    NodeStatus(ip, online, isMaster = false,
      if (online) Some(ReplicationStatus(lag, io, sql, "m", err))
      else None, t)

  private val story = Seq(
    node("10.0.0.1", 1),
    node("10.0.0.1", 2, lag = Some(700L)),     // lag crosses 600s
    node("10.0.0.1", 3, lag = Some(100L)),     // recovers
    node("10.0.0.1", 4, online = false),       // goes offline (+null lag)
    node("10.0.0.2", 1),
    node("10.0.0.2", 2, io = "No", err = "1236"))

  test("batch anomaly diff emits each state transition once") {
    val out = Monitor.anomaliesBatch(story.toDS()).collect()
    val kinds = out.groupBy(_.ip).view
      .mapValues(_.sortBy(_.pollTs).map(_.kind).toSeq).toMap
    assert(kinds("10.0.0.1") == Seq("lag_threshold", "lag_threshold",
      "online_flip", "lag_null_edge", "thread_state"))
    assert(kinds("10.0.0.2") == Seq("thread_state", "new_error"))
  }

  test("first observation of a node produces no baseline alert") {
    val out = Monitor.anomaliesBatch(Seq(node("10.0.0.9", 1)).toDS())
    assert(out.isEmpty)
  }

  test("streaming form keeps per-node state across micro-batches") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[NodeStatus]
    val q = Monitor.anomaliesStream(mem.toDS())
      .writeStream.format("memory").queryName("anoms")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(node("10.0.0.1", 1))
      q.processAllAvailable()
      // state survives the batch boundary: the flip is vs batch 1
      mem.addData(node("10.0.0.1", 2, online = false))
      q.processAllAvailable()
      val got = spark.table("anoms").as[graft.core.Schemas.Anomaly]
        .collect()
      assert(got.map(_.kind).toSet == Set("online_flip",
        "lag_null_edge", "thread_state"))
    } finally q.stop()
  }

  test("cluster report + split-brain guard") {
    val snaps = Seq(
      node("10.0.0.1", 5).copy(isMaster = true),
      node("10.0.0.2", 5, lag = Some(900L)),
      node("10.0.0.3", 5, online = false)).toDS().toDF()
    val r = Monitor.clusterReport(snaps).collect().head
    assert(r.getAs[Long]("nodes") == 3)
    assert(r.getAs[Long]("online") == 2)
    assert(r.getAs[Long]("masters") == 1)
    assert(r.getAs[Long]("lagging") == 1)
    Monitor.assertSingleMaster(snaps) // ok
    val split = Seq(
      node("10.0.0.1", 6).copy(isMaster = true),
      node("10.0.0.2", 6).copy(isMaster = true)).toDS().toDF()
    intercept[IllegalStateException] {
      Monitor.assertSingleMaster(split)
    }
  }
}
