package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.SparkSpec
import graft.cdc.{BinlogFiles, Consolidate}
import graft.core.Schemas.ChangeEvent
import graft.io.Lake

/** End-to-end streaming CDC lifecycle (the c16 gate's operator
  * composition): binlog dump files arriving on disk → whole-file
  * parse → per-batch consolidate → foreachBatch merge — run as ONE
  * continuous job and proven equal to the single-batch merge of the
  * same events. Covers:
  *
  *  - micro-batch split equivalence: applying per-file net changes
  *    sequentially composes to the global last-write-wins net
  *  - state-store-provider parity (RocksDB vs default): the provider
  *    is a storage detail of the checkpoint, never a semantics change
  *  - checkpoint restart: killing the query mid-stream and restarting
  *    from the same checkpoint converges to the identical lake (the
  *    idempotent day-overwrite merge is what makes replayed batches
  *    safe — the reference's cron-rerun property, `Readme.txt:7`)
  *  - M2 through the stream: a pure-DELETE file empties its day and
  *    the partition directory disappears
  */
class StreamLifecycleSpec extends SparkSpec {

  private val T = "`enexory`.`api_data_timeseries`"

  private def render(e: ChangeEvent): String = e.op match {
    case "I" =>
      s"INSERT INTO $T\nSET\n@1=${e.pk}\n@3='${e.dateTime}'\n" +
        s"@4=${e.value.map(_.toString).getOrElse("NULL")}\n@6=1700000000\n"
    case "U" =>
      s"UPDATE $T\nWHERE\n@1=${e.pk}\n@3='${e.dateTime}'\nSET\n" +
        s"@1=${e.pk}\n@3='${e.dateTime}'\n" +
        s"@4=${e.value.map(_.toString).getOrElse("NULL")}\n@6=1700000000\n"
    case _ =>
      s"DELETE FROM $T\nWHERE\n@1=${e.pk}\n@3='${e.dateTime}'\n"
  }

  private val d1 = "2024-03-01 10:00:00"
  private val d2 = "2024-03-02 11:00:00"

  /** Three files with cross-file last-write-wins interactions on
    * every pk: I→U→D, I→D→I, U-only (must drop: no row exists),
    * I→U (folds), I then delete-day. */
  private val files: Seq[Seq[ChangeEvent]] = {
    def e(op: String, pk: Long, dt: String, v: Option[Double]) =
      ChangeEvent(op, pk, dt, v, "2024-03-01 12:00:00", 0L)
    Seq(
      Seq(e("I", 1, d1, Some(1.0)), e("I", 2, d1, Some(2.0)),
        e("U", 3, d1, Some(3.0)), e("I", 4, d2, Some(4.0)),
        e("I", 5, d2, Some(5.0))),
      Seq(e("U", 1, d1, Some(10.0)), e("D", 2, d1, None),
        e("U", 4, d2, Some(40.0))),
      Seq(e("D", 1, d1, None), e("I", 2, d1, Some(22.0)),
        e("U", 5, d2, None)))
  }

  /** The same events with the seq numbers the streaming parser
    * assigns ((fileNo << 32) + position) — the batch pipeline's
    * input for the equivalence check. */
  private def allEvents(s: SparkSession) = {
    import s.implicits._
    files.zipWithIndex.flatMap { case (evs, f) =>
      evs.zipWithIndex.map { case (e, i) =>
        e.copy(seq = ((f + 1).toLong << 32) + i)
      }
    }.toDS()
  }

  private def writeFile(dir: String, num: Int, evs: Seq[ChangeEvent])
      : Unit =
    BinlogFiles.drop(dir, num, evs.map(render).mkString,
      1700000000000L + num * 60000L)

  private def lakeRows(s: SparkSession, path: String)
      : Seq[(Long, String, Option[Double], String)] = {
    import s.implicits._
    Lake.read(s, path)
      .select("id", "date_time", "value", "day")
      .as[(Long, String, Option[Double], String)]
      .collect().toSeq.sortBy(r => (r._4, r._1))
  }

  private def batchExpected(s: SparkSession, base: String)
      : Seq[(Long, String, Option[Double], String)] = {
    val lake = s"$base/batch_lake"
    Lake.mergeIntoLake(s, lake, Consolidate.netChanges(allEvents(s)))
    lakeRows(s, lake)
  }

  private def runStream(s: SparkSession, base: String,
      restartAfterFirst: Boolean = false)
      : Seq[(Long, String, Option[Double], String)] = {
    val in = s"$base/in"
    val lake = s"$base/lake"
    val ckpt = s"$base/ckpt"
    Files.createDirectories(Paths.get(in))
    var q = StreamOps.mergeStream(StreamOps.streamEvents(s, in),
      lake, ckpt)
    try {
      writeFile(in, 1, files(0))
      q.processAllAvailable()
      if (restartAfterFirst) {
        // Kill the job, drop the remaining files while it is down,
        // restart from the SAME checkpoint: the restarted query must
        // pick up exactly the unseen files and converge to the same
        // lake (file-source offsets live in the checkpoint).
        q.stop()
        writeFile(in, 2, files(1))
        writeFile(in, 3, files(2))
        q = StreamOps.mergeStream(StreamOps.streamEvents(s, in),
          lake, ckpt)
        q.processAllAvailable()
      } else {
        writeFile(in, 2, files(1))
        q.processAllAvailable()
        writeFile(in, 3, files(2))
        q.processAllAvailable()
      }
    } finally q.stop()
    lakeRows(s, lake)
  }

  private val RocksDb = "org.apache.spark.sql.execution.streaming." +
    "state.RocksDBStateStoreProvider"

  test("streamed lifecycle equals the one-shot batch merge") {
    Lake.configure(spark)
    val base = Files.createTempDirectory("graft_slc").toString
    val expected = batchExpected(spark, base)
    assert(expected.nonEmpty)
    assert(runStream(spark, base) == expected)
  }

  test("RocksDB state store provider parity") {
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass", RocksDb)
    Lake.configure(s)
    val base = Files.createTempDirectory("graft_slc_rdb").toString
    assert(runStream(s, base) == batchExpected(s, base))
  }

  test("checkpoint restart mid-stream converges to the same lake") {
    Lake.configure(spark)
    val base = Files.createTempDirectory("graft_slc_rs").toString
    assert(runStream(spark, base, restartAfterFirst = true) ==
      batchExpected(spark, base))
  }

  test("a pure-DELETE file empties its day partition through the stream") {
    Lake.configure(spark)
    val base = Files.createTempDirectory("graft_slc_m2").toString
    val in = s"$base/in"
    val lake = s"$base/lake"
    Files.createDirectories(Paths.get(in))
    val q = StreamOps.mergeStream(StreamOps.streamEvents(spark, in),
      lake, s"$base/ckpt")
    try {
      writeFile(in, 1, files(0))
      q.processAllAvailable()
      assert(Files.isDirectory(Paths.get(lake, "day=2024-03-02")))
      val kills = files(0).filter(_.dateTime == d2)
        .map(e => ChangeEvent("D", e.pk, e.dateTime, None, "", 0L))
      writeFile(in, 2, kills)
      q.processAllAvailable()
      assert(!Files.exists(Paths.get(lake, "day=2024-03-02")))
      assert(Files.isDirectory(Paths.get(lake, "day=2024-03-01")))
    } finally q.stop()
  }
}
