package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The [[StreamScale]] harness at gate scale: the same chunked
  * file-source replay the 100x run uses, on sf0.001's 1k events under
  * the RocksDB provider, with every built-in count cross-check
  * exercised (the harness `require`s streaming counts equal their
  * batch restatements — this spec proves those tripwires and the
  * chunking construction work before the harness is trusted as scale
  * evidence). */
class StreamScaleSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("chunked replay preserves every event exactly once, in " +
      "event-time file order") {
    val work = Files.createTempDirectory("ss_chunk").toString
    val n = StreamScale.chunkEvents(spark, s"$sfDir/events.parquet",
      s"$work/chunks", 4)
    val orig = spark.read.parquet(s"$sfDir/events.parquet")
    assert(n == orig.count())
    val chunked = spark.read.parquet(s"$work/chunks")
    assert(chunked.count() == n)
    // no row lost or duplicated
    assert(chunked.select("event_id").distinct().count() ==
      orig.select("event_id").distinct().count())
    // files are time-disjoint: each file's [min,max] ts range must not
    // overlap any other's (contiguous ranges are what let the
    // watermark advance monotonically through the replay)
    val ranges = chunked
      .withColumn("f", input_file_name())
      .groupBy("f")
      .agg(min("ts").as("lo"), max("ts").as("hi"))
      .orderBy("lo")
      .collect()
    assert(ranges.length == 4)
    ranges.sliding(2).foreach { case Array(a, b) =>
      assert(a.getTimestamp(2).compareTo(b.getTimestamp(1)) <= 0,
        s"chunk ranges overlap: $a vs $b")
    }
  }

  test("runAll's streaming counts match their batch restatements " +
      "under RocksDB (harness tripwires pass at gate scale)") {
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming." +
        "state.RocksDBStateStoreProvider")
    val work = Files.createTempDirectory("ss_run").toString
    StreamScale.chunkEvents(s, s"$sfDir/events.parquet",
      s"$work/chunks", 4)
    // runAll require()s: unbounded dedup == batch distinct,
    // watermarked dedup >= distinct, interval join == batch theta
    // join. Reaching the assertions below means all tripwires held.
    val runs = StreamScale.runAll(s, s"$sfDir/events.parquet",
      s"$work/chunks", s"$work/ckpt")
    val byName = runs.map(r => r.name -> r).toMap
    assert(runs.length == 4)
    val unbounded = byName("dedup_unbounded")
    val watermarked = byName("dedup_watermarked")
    assert(unbounded.inputRows ==
      spark.read.parquet(s"$sfDir/events.parquet").count())
    assert(unbounded.peakStateRows >= unbounded.outputRows,
      "unbounded dedup must hold every distinct key in state")
    // the 1-day watermark over the ~31-day fixture must evict: its
    // peak state should be well below the full key space
    assert(watermarked.peakStateRows < unbounded.peakStateRows,
      s"watermark did not evict state: ${watermarked.peakStateRows} " +
        s"vs unbounded ${unbounded.peakStateRows}")
    assert(byName("interval_join").outputRows > 0)
    assert(byName("windowed_agg").outputRows > 0)
  }
}
