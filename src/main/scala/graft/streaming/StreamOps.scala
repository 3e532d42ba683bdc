package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.core.Schemas.ChangeEvent
import graft.cdc.{BinlogParser, Consolidate}
import graft.io.Lake

/** Structured-Streaming forms of the pipeline.
  *
  * The reference's CDC job is cron micro-batching
  * (`Readme.txt:7`, daily 06:00, `--days-back=1`); its exact streaming
  * analogue is a file-source stream of binlog dumps merged per
  * micro-batch via `foreachBatch` — late data handled the reference
  * way (idempotent day overwrite + last-write-wins), no watermark
  * needed. Event-time windowed aggregation with watermarks is provided
  * for the monitoring/analytics surface.
  */
object StreamOps {

  /** Streaming CDC ingestion: each arriving binlog dump file becomes a
    * batch of events (whole-file semantics — blocks never split). */
  def streamEvents(spark: org.apache.spark.sql.SparkSession,
      dir: String,
      table: String = BinlogParser.DefaultTable)
      : Dataset[ChangeEvent] = {
    import spark.implicits._
    spark.readStream
      .option("wholetext", "true")
      .text(dir)
      .select(input_file_name().as("_1"), col("value").as("_2"))
      .as[(String, String)]
      .flatMap { case (name, text) =>
        // Per-file seq window from the filename's trailing number (the
        // mysql-bin.NNNNNN convention) — stable across micro-batches,
        // unlike a collected global rank.
        val num = "\\d+".r.findAllIn(name).toSeq.lastOption
          .map(_.toLong).getOrElse(0L)
        BinlogParser.parseText(text, table, seqStart = num << 32)
      }
  }

  /** foreachBatch merge: consolidate each micro-batch and merge it
    * into the lake — exactly the batch pipeline, replayed per trigger.
    * Returns the started query. */
  def mergeStream(events: Dataset[ChangeEvent], lakePath: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[ChangeEvent], _: Long) =>
        Lake.mergeIntoLake(batch.sparkSession, lakePath,
          Consolidate.netChanges(batch))
      }
      .start()

  /** Event-time windowed aggregation with a watermark (late rows
    * beyond the watermark are dropped): counts + value sums per
    * (window, key). */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
      window_ : String = "5 minutes", watermark: String = "10 minutes")
      : DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

  /** Streaming exact dedup: keep the first row per key, with state
    * bounded by the watermark (keys older than the watermark are
    * evicted — the only way streaming dedup state stays finite on an
    * unbounded ingest). Duplicate suppression spans micro-batches
    * within the watermark horizon. */
  def streamingDedup(events: DataFrame, tsCol: String,
      keyCols: Seq[String], watermark: String = "10 minutes")
      : DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Watermarked stream-stream interval join: pair each left row with
    * the right rows of the same key whose event time falls in
    * `(leftTs, leftTs + upper]`. In streaming, the time bound in the
    * join condition plus watermarks on BOTH sides is what lets Spark
    * evict buffered rows once they can no longer match — without the
    * bound, stream-stream join state grows forever. In batch the
    * watermark is a no-op and the same expression is a plain theta
    * join, so the operator is oracle-checkable (`w10_interval_join`)
    * and replay-provable against itself (`StreamOpsSpec`).
    *
    * The two inputs must use distinct timestamp column names (the
    * caller projects them, e.g. `view_ts`/`click_ts`); key columns are
    * matched by `keyCol` on both sides and the left one survives. */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, upper: String = "60 minutes",
      watermark: String = "120 minutes"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark).alias("l")
    val r = right.withWatermark(rightTs, watermark).alias("r")
    l.join(r,
      col(s"l.$keyCol") === col(s"r.$keyCol") &&
        col(s"r.$rightTs") > col(s"l.$leftTs") &&
        col(s"r.$rightTs") <=
          col(s"l.$leftTs") + expr(s"INTERVAL $upper"))
      .drop(col(s"r.$keyCol"))
  }

  /** Batch/replay form of [[streamingDedup]]: the streaming operator
    * keeps each key's first ARRIVAL within the watermark — replaying
    * history, the reproducible statement of the same contract is the
    * first row by EVENT TIME (with an explicit tie-break so the
    * winner is total-order determined). One windowed rank per key,
    * shuffle on the key columns only. */
  def dedupFirst(events: DataFrame, tsCol: String,
      keyCols: Seq[String], tieBreak: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((tsCol +: tieBreak).map(c => col(c).asc): _*)
    events
      .withColumn("_rn", org.apache.spark.sql.functions.row_number()
        .over(w))
      .where(col("_rn") === 1)
      .drop("_rn")
  }
}
