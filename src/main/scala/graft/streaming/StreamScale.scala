package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.util.LongAccumulator

/** State-store scale harness: replays the `events` table of a stress
  * fixture through the stateful streaming operators under the RocksDB
  * state store and reports throughput + state-store telemetry.
  *
  * The RocksDB parity specs ([[RocksDbStateStoreSpec]]) prove the
  * provider never changes semantics on small replays; this harness is
  * the complementary SCALE evidence: millions of events arriving in
  * event-time order across dozens of micro-batches, with state that
  * either grows to the full key space (unbounded-watermark dedup — the
  * worst case the store must absorb) or is continuously evicted by the
  * watermark (the steady-state production shape). At 100 TB the
  * stateful operators run exactly like this — keyed state partitioned
  * across executors, each partition a RocksDB instance spilling to
  * local disk — so the numbers that matter are rows/sec through the
  * store and peak state rows held, not just output equality.
  *
  * Replay construction: the events table is split into `nChunks`
  * files of CONTIGUOUS event-time ranges, written sequentially so
  * file modification order == event-time order; the file stream
  * source (`maxFilesPerTrigger=1`) then delivers one chunk per
  * micro-batch in that order, which is what lets watermarks advance
  * and evict monotonically, as a production ingest would.
  *
  * Runs (each a separate query over the same chunked stream):
  *  - `dedup_unbounded`: [[StreamOps.streamingDedup]] on
  *    (user_id, event_type) with a watermark beyond the fixture's
  *    span — no eviction, peak state = full distinct-key space, and
  *    the emitted count must equal the batch distinct count (asserted
  *    here, not just in the spec: the harness fails fast on a
  *    correctness break at scale).
  *  - `dedup_watermarked`: same dedup with a 1-day watermark over the
  *    ~31-day fixture — state is evicted as the watermark advances;
  *    peak state rows must come in strictly below the unbounded run.
  *  - `interval_join`: the w10 stream-stream interval join
  *    (views x clicks within 60 minutes, 120-minute watermarks) —
  *    BOTH sides buffered in the store; emitted count must equal the
  *    batch theta-join count.
  *  - `windowed_agg`: watermarked hourly counts per event_type
  *    (append mode — only watermark-finalized windows emit).
  */
object StreamScale {

  final case class RunMetrics(
      name: String,
      inputRows: Long,
      outputRows: Long,
      wallSec: Double,
      batches: Long,
      peakStateRows: Long,
      peakStateBytes: Long)

  private val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider"

  /** Split `eventsParquet` into `nChunks` single-file parquet chunks
    * of contiguous ts ranges under `chunkDir`, written oldest-first so
    * the file source's mtime order matches event-time order. Chunk
    * boundaries are exact row-count splits over the (ts, event_id)
    * total order, so chunk sizes are equal to ±1 row.
    *
    * DISTRIBUTED NTILE: the pre-r15 form computed the chunk index as
    * `ntile(n) OVER (ORDER BY ts, event_id)` — a Window with no
    * PARTITION BY, i.e. every event funneled through ONE task
    * (~25 min of the 1000x streaming decade's setup was exactly that
    * single-partition sort of 100M rows). The replacement keeps the
    * identical contiguous ±1-balanced split with no single-task stage:
    * range-repartition on the same total order (RangePartitioner —
    * a sampled boundary pass + one shuffle), sort WITHIN partitions
    * (parallel), then convert per-partition row numbers to global
    * ranks using the per-partition counts (driver state: one long per
    * partition; range partitions are ordered by key range, so the
    * prefix sum over partition ids IS the rank offset). Chunk index =
    * `rank * nChunks / n`. */
  def chunkEvents(spark: SparkSession, eventsParquet: String,
      chunkDir: String, nChunks: Int): Long = {
    // The fixture writes `ts` as TIMESTAMP_NTZ; watermarks require the
    // instant type. The session runs in UTC, so the cast relabels the
    // same values.
    val ev = spark.read.parquet(eventsParquet)
      .withColumn("ts", col("ts").cast("timestamp"))
    val dataCols = ev.columns.map(col)
    val parts = math.max(nChunks,
      spark.sessionState.conf.numShufflePartitions)
    // monotonically_increasing_id() = (stage partition id << 33) +
    // row number within the partition, assigned in the sorted
    // per-partition order of this stage — both components are decoded
    // below instead of re-derived in a second pass. Cached so the id
    // assignment is frozen before any consumer runs.
    val ranged = ev
      .repartitionByRange(parts, col("ts"), col("event_id"))
      .sortWithinPartitions(col("ts"), col("event_id"))
      .withColumn("_mid", monotonically_increasing_id())
      .withColumn("_pid", shiftright(col("_mid"), 33).cast("int"))
      .withColumn("_loc", col("_mid").bitwiseAND((1L << 33) - 1))
    ranged.cache()
    val counts = ranged.groupBy(col("_pid")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val n = counts.values.sum
    val offs = (0 until parts).scanLeft(0L)((acc, p) =>
      acc + counts.getOrElse(p, 0L))
    val offDf = spark.createDataFrame(
      (0 until parts).map(p => (p, offs(p)))).toDF("_pid", "_off")
    // rank * nChunks stays far under 2^53, so the double division is
    // exact enough for floor(); sizes come out ±1 like ntile's.
    val chunked = ranged
      .join(broadcast(offDf), Seq("_pid"))
      .withColumn("_chunk",
        floor((col("_off") + col("_loc")) * nChunks
          / lit(n.toDouble)).cast("int"))
    (0 until nChunks).foreach { k =>
      chunked.where(col("_chunk") === k)
        .select(dataCols: _*)
        .coalesce(1)
        .write.mode(if (k == 0) "overwrite" else "append")
        .parquet(chunkDir)
      // One file per chunk arrives with strictly increasing mtime;
      // parquet part-file names are unique per write (UUID task IDs),
      // so "append" only ever adds the new chunk's file.
    }
    ranged.unpersist()
    n
  }

  private def progressMetrics(q: StreamingQuery)
      : (Long, Long, Long, Long) = {
    val ps = q.recentProgress
    val input = ps.map(_.numInputRows).sum
    val batches = ps.count(_.numInputRows > 0).toLong
    val stateRows = ps.flatMap(_.stateOperators.map(_.numRowsTotal))
    val stateBytes = ps.flatMap(_.stateOperators.map(_.memoryUsedBytes))
    (input, batches,
      if (stateRows.isEmpty) 0L else stateRows.max,
      if (stateBytes.isEmpty) 0L else stateBytes.max)
  }

  /** Run one streaming pipeline over the chunked stream to a counting
    * foreachBatch sink and collect its metrics. */
  private def timed(spark: SparkSession, name: String,
      checkpointRoot: String)(build: DataFrame => DataFrame)
      (stream: => DataFrame): RunMetrics = {
    val acc = new LongAccumulator
    spark.sparkContext.register(acc, s"stream_scale_$name")
    val t0 = System.nanoTime()
    val q = build(stream)
      .writeStream
      .option("checkpointLocation", s"$checkpointRoot/$name")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        acc.add(batch.count())
      }
      .start()
    try q.awaitTermination()
    finally if (q.isActive) q.stop()
    val wall = (System.nanoTime() - t0) / 1e9
    val (input, batches, stateRows, stateBytes) = progressMetrics(q)
    RunMetrics(name, input, acc.value, wall, batches, stateRows,
      stateBytes)
  }

  /** Execute all runs against an already-chunked events dir; returns
    * metrics per run. Fails fast if a streaming count diverges from
    * its batch restatement — scale evidence is only evidence if the
    * answers are still right. */
  def runAll(spark: SparkSession, eventsParquet: String,
      chunkDir: String, checkpointRoot: String): Seq[RunMetrics] = {
    // Batch restatements read the SAME chunked files the stream
    // replays, so stream and batch see identical rows and types.
    val batchEv = spark.read.parquet(chunkDir)
    val schema = batchEv.schema
    def stream: DataFrame = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(chunkDir)
    val distinctKeys = batchEv
      .select(col("user_id"), col("event_type")).distinct().count()
    val joinCount = {
      val views = batchEv.where(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("view_ts"))
      val clicks = batchEv.where(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("click_ts"))
      views.join(clicks,
        views("user_id") === clicks("user_id") &&
          col("click_ts") > col("view_ts") &&
          col("click_ts") <= col("view_ts") + expr("INTERVAL 60 minutes"))
        .count()
    }

    val unbounded = timed(spark, "dedup_unbounded", checkpointRoot)(
      df => StreamOps.streamingDedup(df, "ts",
        Seq("user_id", "event_type"), "3650 days"))(stream)
    require(unbounded.outputRows == distinctKeys,
      s"unbounded streaming dedup emitted ${unbounded.outputRows} " +
        s"rows; batch distinct count is $distinctKeys")

    val watermarked = timed(spark, "dedup_watermarked", checkpointRoot)(
      df => StreamOps.streamingDedup(df, "ts",
        Seq("user_id", "event_type"), "1 day"))(stream)
    // With eviction the stream may re-emit a key whose earlier state
    // aged out, so the count is >= the exact distinct count.
    require(watermarked.outputRows >= distinctKeys,
      s"watermarked dedup emitted ${watermarked.outputRows} < " +
        s"$distinctKeys")

    val ivj = timed(spark, "interval_join", checkpointRoot) { df =>
      val views = df.where(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_id"),
          col("ts").as("view_ts"))
      val clicks = df.where(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("ts").as("click_ts"))
      StreamOps.intervalJoin(views, clicks, "user_id",
        "view_ts", "click_ts", "60 minutes", "120 minutes")
    }(stream)
    require(ivj.outputRows == joinCount,
      s"streaming interval join emitted ${ivj.outputRows} rows; " +
        s"batch theta join yields $joinCount")

    val windowed = timed(spark, "windowed_agg", checkpointRoot)(
      df => StreamOps.windowedCounts(df, "ts", "event_type",
        "1 hour", "2 hours"))(stream)

    Seq(unbounded, watermarked, ivj, windowed)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val nChunks = sys.env.getOrElse("SPARK_GRAFT_STREAM_CHUNKS", "25").toInt
    val work = java.nio.file.Files
      .createTempDirectory("graft_stream_scale").toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.streaming.stateStore.providerClass",
        RocksDbProvider)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val chunkDir = s"$work/chunks"
    val events = s"$sfDir/events.parquet"
    val chunkT0 = System.nanoTime()
    val total = chunkEvents(spark, events, chunkDir, nChunks)
    // Setup cost, recorded since it dominated the round-14 decade run
    // (~25 min single-task ntile sort, replaced by the distributed
    // range-partitioned rank in chunkEvents).
    val chunkSec = (System.nanoTime() - chunkT0) / 1e9
    System.err.println(
      f"[stream-scale] $total events in $nChunks chunks ($chunkSec%.1f s)")

    val runs = runAll(spark, events, chunkDir, s"$work/ckpt")
    def j(m: RunMetrics): String =
      s"""{"name":"${m.name}","input_rows":${m.inputRows},""" +
        s""""output_rows":${m.outputRows},"wall_sec":${m.wallSec},""" +
        s""""rows_per_sec":${(m.inputRows / m.wallSec).toLong},""" +
        s""""batches":${m.batches},""" +
        s""""peak_state_rows":${m.peakStateRows},""" +
        s""""peak_state_bytes":${m.peakStateBytes}}"""
    val line =
      s"""{"metric":"stream_scale","provider":"rocksdb","sf":"$sfDir",""" +
        s""""events":$total,"chunks":$nChunks,"cpus":$cpus,""" +
        s""""shuffle":$shuffle,"chunk_sec":$chunkSec,""" +
        s""""runs":[${runs.map(j).mkString(",")}]}"""
    println(line)
    val out = sys.env.getOrElse("SPARK_GRAFT_STREAM_OUT",
      "/root/repo/stream_scale.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (line + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[stream-scale] could not write $out: " +
        e.getMessage)
    }
    spark.stop()
  }
}
