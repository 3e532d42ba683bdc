package graft.cdc

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.input_file_name

import graft.core.Schemas.ChangeEvent

/** Distributed binlog-text ingestion (C1 + B1/B2 batch boundary).
  *
  * The reference pipes `mysqlbinlog` output through awk into the
  * consolidator one file at a time, sequentially
  * (`Parquet Export/parse_binlogs.sh:115-144`); cross-file ordering
  * matters because each file's merge lands on disk before the next file
  * runs. We reproduce that total order in one batch: every file gets a
  * sequence-number window of 2^32 based on its lexicographic filename
  * rank, so events in later files always win last-write-wins without any
  * cross-file coordination — the parse stays embarrassingly parallel,
  * one task per file.
  *
  * Files are read whole (`wholetext`) because binlog blocks are
  * multi-line and must not be split at arbitrary byte offsets. Binlog
  * files are size-bounded by the DB (`max_binlog_size`, typically
  * ≤ 1 GiB), so a whole file per task is safe at any lake scale.
  */
object CdcSource {

  private val SeqWindow = 1L << 32

  /** Parse all binlog dump files under `path` (glob ok) into events. */
  def readEvents(spark: SparkSession, path: String,
      table: String = BinlogParser.DefaultTable): Dataset[ChangeEvent] = {
    import spark.implicits._
    val files = spark.read.option("wholetext", "true").text(path)
      .select(input_file_name().as("_1"), $"value".as("_2"))
      .as[(String, String)]
    parseFiles(files, table)
  }

  /** Parse (fileName, wholeFileText) pairs — separated from the FS read
    * for testability and for streaming reuse. */
  def parseFiles(files: Dataset[(String, String)],
      table: String = BinlogParser.DefaultTable): Dataset[ChangeEvent] = {
    val spark = files.sparkSession
    import spark.implicits._
    // Filename -> rank; file listings are driver-small (thousands of
    // binlogs at most), data content never leaves the executors.
    val names = files.select("_1").distinct().as[String]
      .collect().sorted
    val rank = names.zipWithIndex.toMap
    val rankB = spark.sparkContext.broadcast(rank)
    files.flatMap { case (name, text) =>
      val idx = rankB.value(name)
      BinlogParser.parseText(text, table, seqStart = idx * SeqWindow)
    }
  }
}
