package graft.monitor

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.core.Schemas.{Anomaly, LagThresholdSeconds, NodeStatus}

/** Replication-health monitoring surface (W1-W4,
  * `Email Node Status/watcher.py`).
  *
  * W1 (snapshot acquisition) is a connector concern — the engine consumes
  * a `Dataset[NodeStatus]` stream/batch however it is produced. W2 is the
  * real computation: diff each node's snapshot against its previous one
  * and emit anomalies (`watcher.py:234-266`): online flip, lag-threshold
  * crossing (600 s incl. NULL-lag edges, `watcher_config.py:24`),
  * IO/SQL thread state change, new `Last_Error`.
  *
  * Two shapes:
  *  - [[anomaliesBatch]]: snapshots ordered by poll time per node,
  *    diffed with a lag() window — for replay/backfill over a snapshot
  *    history table.
  *  - [[anomaliesStream]]: `flatMapGroupsWithState` keeping the last
  *    snapshot per node — the continuously-stateful form (the watcher's
  *    5 s poll loop, `watcher.py:268-357`). State is one row per node:
  *    O(cluster size), trivially partitioned by node key.
  */
object Monitor {

  private def diff(cur: NodeStatus, prev: Option[NodeStatus])
      : Seq[Anomaly] = prev match {
    case None => Seq.empty // first observation: no baseline, no alert
    case Some(p) =>
      val out = collection.mutable.ArrayBuffer.empty[Anomaly]
      if (cur.isOnline != p.isOnline)
        out += Anomaly(cur.ip, "online_flip",
          s"${p.isOnline} -> ${cur.isOnline}", cur.pollTs)
      val curLag = cur.replication.flatMap(_.secondsBehindMaster)
      val prevLag = p.replication.flatMap(_.secondsBehindMaster)
      val lagged = (l: Option[Long]) => l.exists(_ > LagThresholdSeconds)
      if (lagged(curLag) != lagged(prevLag))
        out += Anomaly(cur.ip, "lag_threshold",
          s"${prevLag.getOrElse("NULL")} -> ${curLag.getOrElse("NULL")}",
          cur.pollTs)
      // NULL lag means "replication not running" (`watcher.py:138,151`)
      if (curLag.isEmpty != prevLag.isEmpty)
        out += Anomaly(cur.ip, "lag_null_edge",
          s"${prevLag.isDefined} -> ${curLag.isDefined}", cur.pollTs)
      val thr = (s: Option[graft.core.Schemas.ReplicationStatus]) =>
        s.map(r => (r.slaveIoRunning, r.slaveSqlRunning))
          .getOrElse(("", ""))
      if (thr(cur.replication) != thr(p.replication))
        out += Anomaly(cur.ip, "thread_state",
          s"${thr(p.replication)} -> ${thr(cur.replication)}", cur.pollTs)
      val err = (s: Option[graft.core.Schemas.ReplicationStatus]) =>
        s.map(_.lastError).getOrElse("")
      if (err(cur.replication) != err(p.replication)
          && err(cur.replication).nonEmpty)
        out += Anomaly(cur.ip, "new_error", err(cur.replication),
          cur.pollTs)
      out.toSeq
  }

  /** W2 over a historical snapshot table (batch replay). A lag()
    * window pairs each snapshot with its predecessor — the shuffle
    * sort spills instead of materializing a node's whole history in
    * one task's heap, so arbitrarily long replay histories are fine. */
  def anomaliesBatch(snapshots: Dataset[NodeStatus]): Dataset[Anomaly] = {
    val spark = snapshots.sparkSession
    import spark.implicits._
    val df = snapshots.toDF()
    val cur = struct(df.columns.toIndexedSeq.map(col): _*)
    val w = Window.partitionBy(col("ip")).orderBy(col("pollTs"))
    df
      .withColumn("cur", cur)
      .withColumn("prev", lag(col("cur"), 1).over(w))
      .select(col("cur"), col("prev"))
      .as[(NodeStatus, Option[NodeStatus])]
      .flatMap { case (c, p) => diff(c, p) }
  }

  /** W2 as a streaming stateful operator; state = last snapshot/node. */
  def anomaliesStream(snapshots: Dataset[NodeStatus]): Dataset[Anomaly] = {
    val spark = snapshots.sparkSession
    import spark.implicits._
    snapshots
      .groupByKey(_.ip)
      .flatMapGroupsWithState[NodeStatus, Anomaly](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[NodeStatus],
            state: GroupState[NodeStatus]) =>
          var prev = state.getOption
          val out = rows.toSeq.sortBy(_.pollTs).flatMap { cur =>
            val a = diff(cur, prev)
            prev = Some(cur)
            a
          }
          prev.foreach(state.update)
          out.iterator
      }
  }

  /** W3 (`watcher.py:344-348`): full-cluster status aggregation for the
    * daily report — per-node latest snapshot + cluster rollup. */
  def clusterReport(snapshots: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("ip")).orderBy(col("pollTs").desc)
    val latest = snapshots
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .drop("rn")
    latest.agg(
      count(lit(1)).as("nodes"),
      count(when(col("isOnline"), 1)).as("online"),
      count(when(col("isMaster"), 1)).as("masters"),
      count(when(col("replication.secondsBehindMaster")
        > LagThresholdSeconds, 1)).as("lagging"))
  }

  /** H2 split-brain guard (`orchestrator.py:262-281`): at most one
    * master; throws otherwise. */
  def assertSingleMaster(snapshots: DataFrame): Unit = {
    val masters = snapshots.where(col("isMaster")).select("ip")
      .distinct().count()
    if (masters > 1)
      throw new IllegalStateException(
        s"split-brain: $masters masters visible")
  }
}
