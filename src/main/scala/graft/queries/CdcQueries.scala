package graft.queries

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Schemas.{ChangeEvent, Sentinel}
import graft.cdc.{Consolidate, Merge}
import graft.ops.Timeseries

/** The reference's operator surface (SURVEY §2.1) exercised end-to-end
  * over the driver's `events` fixture. Each query derives a
  * deterministic `api_data_timeseries`-shaped input from `events`
  * (id / 19-char date_time / value / ts), runs the real library
  * operator, and has a DuckDB oracle that restates the semantics
  * independently.
  *
  * Derivation conventions (fixed, mirrored in every oracle):
  *  - `date_time` = `strftime(ts)`; every ~97th row's datetime is
  *    nulled first to exercise the S9 sentinel path
  *  - CDC op from `event_type`: signup/purchase -> I, click/view -> U,
  *    error -> D
  *  - pk = `event_id % 500 + 1` (dense, collision-heavy, never 0)
  *  - seq = `event_id` (the binlog total order)
  */
object CdcQueries {

  private val DT = "yyyy-MM-dd HH:mm:ss"

  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark's reader
    * rejects by default; read it as long nanos (legacy flag) and
    * truncate to microseconds — the same ns->us truncation DuckDB
    * applies, so oracles see identical instants. */
  private def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // `div`, not `/`: epoch NANOS (~1.7e18) overflow a double's
        // 53-bit mantissa, so float division is off by O(100 ns) —
        // invisible at second granularity, a real mismatch for any
        // gate surfacing raw micros (w10's gap_us caught it).
        raw.withColumn("ts",
          timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // Plain-parquet TIMESTAMP (e.g. the synthesized stress
        // fixture): NTZ won't cast to epoch seconds — reinterpret in
        // the UTC session first (same instants).
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  /** The normalized lake projection (S9 output shape). */
  private def tsRows(s: SparkSession, dir: String): DataFrame =
    events(s, dir).select(
      col("event_id").as("id"),
      Timeseries.normalizeDt(
        when(col("event_id") % 97 === 0, lit(null))
          .otherwise(col("ts"))).as("date_time"),
      col("value"),
      Timeseries.epochToUtc2(col("ts").cast("timestamp").cast("long"))
        .as("ts"))

  /** CDC events derived from the fixture (C1's output shape — the text
    * parser itself is covered by [[c10_binlog_roundtrip]] and unit
    * tests). */
  private def changeEvents(s: SparkSession, dir: String)
      : Dataset[ChangeEvent] = {
    import s.implicits._
    events(s, dir).select(
      when(col("event_type").isin("signup", "purchase"), "I")
        .when(col("event_type").isin("click", "view"), "U")
        .otherwise("D").as("op"),
      (col("event_id") % 500 + 1).as("pk"),
      date_format(col("ts"), DT).as("dateTime"),
      col("value"),
      Timeseries.epochToUtc2(col("ts").cast("timestamp").cast("long"))
        .as("ts"),
      col("event_id").as("seq"))
      .as[ChangeEvent]
  }

  /** The change events of [[changeEvents]] rendered as binlog
    * pseudo-SQL dump text (the `mysqlbinlog -v` row format the C1
    * parser consumes), chunked by event_id range into
    * `(chunkNo, text)` "files" — blocks within a chunk in event_id
    * order, so parse order (and therefore parser-assigned sequence
    * numbers) reproduces the binlog total order. Shared by
    * `c10_binlog_roundtrip` (distributed re-parse) and
    * `c16_stream_lifecycle` (written to disk as the file stream's
    * input). */
  private def binlogChunks(s: SparkSession, dir: String,
      chunkSize: Long): Dataset[(Long, String)] = {
    import s.implicits._
    val T = graft.cdc.BinlogParser.DefaultTable
    val ev = events(s, dir)
    val valueStr = when(col("value").isNull, lit("NULL"))
      .otherwise(col("value").cast("string"))
    val pk = col("event_id") % 500 + 1
    val dt = date_format(col("ts"), DT)
    val epoch = col("ts").cast("timestamp").cast("long")
    val block =
      when(col("event_type").isin("signup", "purchase"),
        concat(lit(s"INSERT INTO $T\nSET\n@1="), pk,
          lit("\n@3='"), dt, lit("'\n@4="), valueStr,
          lit("\n@6="), epoch))
      .when(col("event_type").isin("click", "view"),
        concat(lit(s"UPDATE $T\nWHERE\n@1="), pk,
          lit("\n@3='"), dt,
          lit("'\nSET\n@1="), pk,
          lit("\n@3='"), dt, lit("'\n@4="), valueStr,
          lit("\n@6="), epoch))
      .otherwise(
        concat(lit(s"DELETE FROM $T\nWHERE\n@1="), pk,
          lit("\n@3='"), dt, lit("'")))
    ev.select(
      (col("event_id") / chunkSize).cast("long").as("chunk"),
      struct(col("event_id"), block.as("block")).as("entry"))
      .groupBy("chunk")
      .agg(array_join(
        transform(array_sort(collect_list(col("entry"))),
          e => e.getField("block")), "\n").as("text"))
      .as[(Long, String)]
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // S9 + S10: normalization with sentinel fill + derived day.
    "c01_normalize_day" -> ((s, dir) => {
      tsRows(s, dir)
        .withColumn("day", Timeseries.dayOf(col("date_time")))
        .select("id", "date_time", "value", "ts", "day")
        .orderBy("id")
    }),

    // S10 histogram: rows per derived day partition.
    "c02_day_histogram" -> ((s, dir) => {
      tsRows(s, dir)
        .groupBy(Timeseries.dayOf(col("date_time")).as("day"))
        .agg(count(lit(1)).as("n_rows"))
        .orderBy("day")
    }),

    // S7: resume point = max(date_time) excluding the sentinel, plus
    // S3/S4-style aggregates pushed to footer/scan.
    "c03_resume_point" -> ((s, dir) => {
      tsRows(s, dir)
        .agg(
          max(when(col("date_time") =!= Sentinel, col("date_time")))
            .as("resume_point"),
          count(lit(1)).as("total_rows"),
          count(when(col("date_time") === Sentinel, 1))
            .as("sentinel_rows"))
    }),

    // C4: epoch seconds -> UTC+2 19-char string.
    "c04_epoch_utc2" -> ((s, dir) => {
      events(s, dir).select(
        col("event_id"),
        Timeseries.epochToUtc2(col("ts").cast("timestamp").cast("long"))
          .as("ts_utc2"))
        .orderBy("event_id")
    }),

    // S8: fail-fast validation, report form; bad ids injected on every
    // ~101st row so the counts are non-trivial.
    "c05_validation_report" -> ((s, dir) => {
      val dirty = tsRows(s, dir)
        .withColumn("id",
          when(col("id") % 101 === 0, -col("id") - 1)
            .otherwise(col("id")))
      Timeseries.violationReport(dirty)
    }),

    // C3: `"NULL"`-literal value parse round-trip.
    "c06_value_parse" -> ((s, dir) => {
      events(s, dir).select(
        col("event_id"),
        Timeseries.parseValue(
          when(col("event_id") % 13 === 0, lit("NULL"))
            .otherwise(col("value").cast("string"))).as("value_parsed"))
        .where(col("event_id") % 13 === 0
          || col("event_id") % 7 === 0)
        .orderBy("event_id")
    }),

    // C5: per-(day, pk) last-write-wins consolidation with the full
    // D-erase / U-after-I-fold / apply-order semantics.
    "c07_consolidate" -> ((s, dir) => {
      Consolidate.netChanges(changeEvents(s, dir))
        .orderBy("day", "id")
    }),

    // M1: join-based merge of consolidated changes into an existing
    // day-keyed lake (built from even event_ids; changes from odd).
    "c08_merge" -> ((s, dir) => {
      import s.implicits._
      val ev = changeEvents(s, dir)
      val existing = ev.where(col("seq") % 2 === 0)
        .groupBy(substring(col("dateTime"), 1, 10).as("day"),
          col("pk").as("id"))
        .agg(
          max_by(struct(col("dateTime").as("date_time"), col("value"),
            col("ts")), col("seq")).as("img"))
        .select(col("id"), col("img.date_time").as("date_time"),
          col("img.value").as("value"), col("img.ts").as("ts"),
          col("day"))
      val changes = Consolidate.netChanges(
        ev.where(col("seq") % 2 === 1))
      Merge.merge(existing, changes)
        .orderBy("day", "id")
    }),

    // M3: merge audit metrics per day.
    "c09_merge_audit" -> ((s, dir) => {
      import s.implicits._
      val ev = changeEvents(s, dir)
      val existing = ev.where(col("seq") % 2 === 0)
        .groupBy(substring(col("dateTime"), 1, 10).as("day"),
          col("pk").as("id"))
        .agg(max_by(struct(col("dateTime").as("date_time"),
          col("value"), col("ts")), col("seq")).as("img"))
        .select(col("id"), col("img.date_time").as("date_time"),
          col("img.value").as("value"), col("img.ts").as("ts"),
          col("day"))
      val changes = Consolidate.netChanges(
        ev.where(col("seq") % 2 === 1))
      val merged = Merge.merge(existing, changes)
      Merge.auditByDay(existing, changes, merged)
        .orderBy("day")
    }),

    // C1 end-to-end under the oracle: render the change events as
    // binlog pseudo-SQL text (the mysqlbinlog-verbose format), parse it
    // back with the REAL parser distributed over chunk "files", then
    // consolidate. Chunking is by event_id range so parser-assigned
    // sequence numbers equal event_ids and last-write-wins order is
    // preserved exactly; the oracle is the same closed form as c07.
    "c10_binlog_roundtrip" -> ((s, dir) => {
      import s.implicits._
      val chunkSize = 1250L
      val parsed = binlogChunks(s, dir, chunkSize)
        .flatMap { case (chunk, text) =>
          graft.cdc.BinlogParser.parseText(text,
            seqStart = chunk * chunkSize)
        }
      Consolidate.netChanges(parsed).orderBy("day", "id")
    }),

    // S12-S15 + M1-M4 end-to-end: the production lifecycle against a
    // real on-disk lake. Cold-start backfill (append, S13) of the
    // pre-MIN_DATE slice, resume-point incremental walk with
    // refetch-overwrite (S7/S12/S14), CDC consolidate+merge into the
    // persisted lake (M1/M4), a pure-delete batch that empties one day
    // partition (M2 explicit deletion), then the historical repair
    // pass (S15, content-preserving). The final lake state is read
    // back and gated against a DuckDB restatement
    // (`db_extractor.py:254-325` + `consolidate.cpp:184-238`).
    "c13_lifecycle" -> ((s, dir) => {
      import graft.io.Lake
      import graft.jobs.Jobs
      Lake.configure(s)
      // Invocation-unique scratch lake (graft.core.Scratch): a fixed
      // well-known path lets a concurrent JVM running this gate at a
      // different fixture interleave deletes/writes with ours.
      val lakePath = graft.core.Scratch.dir("graft_c13_lake") + "/lake"

      // Raw source rows: wall-clock date_time, shifted 15 years back
      // on every 11th row so the pre-MIN_DATE backfill path has data.
      val ev = events(s, dir)
      val shifted = when(col("event_id") % 11 === 0,
        col("ts") - expr("INTERVAL 15 YEARS")).otherwise(col("ts"))
      val raw = ev.select(
        col("event_id").as("id"),
        date_format(shifted, DT).as("date_time"),
        col("value"),
        Timeseries.epochToUtc2(col("ts").cast("timestamp").cast("long"))
          .as("ts"))

      Jobs.extract(s, new Jobs.FrameSource(raw), lakePath)
      Lake.mergeIntoLake(s, lakePath,
        Consolidate.netChanges(changeEvents(s, dir)))
      // Empty one day via a pure-delete batch: its partition directory
      // must disappear (M2).
      val killDay = "2024-01-15"
      val kill = Lake.read(s, lakePath).where(col("day") === killDay)
        .select(col("day"), col("id"), lit("D").as("op"),
          lit(null).cast("string").as("date_time"),
          lit(null).cast("double").as("value"),
          lit(null).cast("string").as("ts"))
      Lake.mergeIntoLake(s, lakePath, kill)
      Jobs.repairHistorical(s, lakePath)

      Lake.read(s, lakePath)
        .select("id", "date_time", "value", "ts", "day")
        .orderBy("day", "id")
    }),

    // c13's lifecycle re-run as ONE CONTINUOUS STREAMING JOB — the
    // composed pipeline SURVEY §3.2 scopes from `parse_binlogs.sh:
    // 118-144`: binlog-dump FILES arriving on disk → `readStream`
    // (whole-file, per-file seq windows from the mysql-bin.NNNNNN
    // name) → C1 parse → C5 per-batch consolidate → `foreachBatch`
    // M1-M4 merge into the persisted lake → M2 empty-day pruning →
    // S15 repair → R1 reconcile. Every file is dropped AFTER the
    // previous trigger completes, so the merge genuinely replays as
    // many micro-batches; sequential last-write-wins application is
    // what makes the multi-batch stream hash-equal to c13's single
    // batch (the closed-form algebra in graft.cdc.Consolidate
    // composes: splitting an event sequence at any boundary and
    // merging the nets sequentially gives the global net —
    // property-checked in CdcPipelinePropertySpec/
    // StreamLifecycleSpec). Oracle: identical restatement to c13.
    "c16_stream_lifecycle" -> ((s, dir) => {
      import graft.io.Lake
      import graft.jobs.Jobs
      import graft.streaming.StreamOps
      Lake.configure(s)
      // Invocation-unique scratch root (graft.core.Scratch): this
      // gate also runs from test suites (AnsiModeSpec,
      // SessionIsolationSpec) — with a fixed path, a test JVM at
      // sf0.001 racing a Verify JVM at a stress fixture interleaved
      // deletes/writes on the shared lake and the surviving dump was
      // a silent two-fixture mixture (caught by the 10x hash gate).
      val base = graft.core.Scratch.dir("graft_c16")
      val lakePath = s"$base/lake"
      val binlogDir = s"$base/binlog"
      new java.io.File(binlogDir).mkdirs()

      // Cold-start extract: identical to c13 (S12-S14 backfill +
      // incremental walk against the same raw frame).
      val ev = events(s, dir)
      val shifted = when(col("event_id") % 11 === 0,
        col("ts") - expr("INTERVAL 15 YEARS")).otherwise(col("ts"))
      val raw = ev.select(
        col("event_id").as("id"),
        date_format(shifted, DT).as("date_time"),
        col("value"),
        Timeseries.epochToUtc2(col("ts").cast("timestamp").cast("long"))
          .as("ts"))
      Jobs.extract(s, new Jobs.FrameSource(raw), lakePath)

      // The change stream as on-disk binlog dump files — TEST HARNESS
      // synthesis of what production reads from disk (mysqlbinlog
      // writes these files in the reference, `parse_binlogs.sh:
      // 118-144`), not an operator data path. The TRIGGER count is
      // fixed (8) — each processAllAvailable is one micro-batch
      // round, and a fixed per-trigger row count would turn a 100x
      // fixture into 100x sequential merges — but the per-FILE row
      // count is CAPPED (250k): one file is one collect_list group
      // and one driver-fetched row, and an uncapped count/8 file made
      // both a >2 GB single allocation at the 1000x fixture (100M
      // events). Bounded files also match the delivery contract the
      // harness reproduces: mysqlbinlog rotates dumps by size, it
      // never hands over one 12.5M-statement file.
      val total = ev.count()
      val fileRows =
        math.max(1250L, math.min(total / 8L + 1L, 250000L))
      val nFiles = (total + fileRows - 1L) / fileRows
      val perTrigger = math.max(1L, (nFiles + 7L) / 8L)
      // Distinct ascending mtimes (binlog order), dropped via the
      // atomic stage-then-rename contract (graft.cdc.BinlogFiles) —
      // an in-place write races the source's mtime-age filter.
      def writeFile(num: Long, text: String): Unit =
        graft.cdc.BinlogFiles.drop(binlogDir, num, text,
          1700000000000L + num * 60000L)

      // ONE continuous job: file stream → parse → consolidate →
      // foreachBatch merge, driven file-by-file. The sorted
      // toLocalIterator streams one shuffle partition of file texts
      // to the driver at a time — the harness never holds the whole
      // rendered binlog corpus in driver heap.
      val q = StreamOps.mergeStream(
        StreamOps.streamEvents(s, binlogDir), lakePath,
        s"$base/ckpt")
      var maxFileNo = -1L
      try {
        val it = binlogChunks(s, dir, fileRows).orderBy("chunk")
          .toLocalIterator()
        var written = 0L
        while (it.hasNext) {
          val (n, text) = it.next()
          writeFile(n, text)
          maxFileNo = math.max(maxFileNo, n)
          written += 1
          if (written % perTrigger == 0L) q.processAllAvailable()
        }
        q.processAllAvailable()
        // M2 through the SAME stream: a pure-DELETE binlog file that
        // empties one whole day partition (c13's kill batch rendered
        // as the DELETE blocks mysqlbinlog would have produced).
        val killDay = "2024-01-15"
        val T = graft.cdc.BinlogParser.DefaultTable
        val kills = Lake.read(s, lakePath)
          .where(col("day") === killDay)
          .select(concat(lit(s"DELETE FROM $T\nWHERE\n@1="),
            col("id"), lit("\n@3='"), col("date_time"), lit("'"))
            .as("b"))
          .collect().map(_.getString(0)) // one day — fixture-bounded
        writeFile(maxFileNo + 1, kills.mkString("\n"))
        q.processAllAvailable()
      } finally q.stop()

      // S15 repair, then R1 (row_integrity.py's report shape): two
      // INDEPENDENT counting paths over the streamed lake — a forced
      // full-scan row count (rdd.count deserializes every row) vs
      // the optimized columnar count() — must agree, or the stream's
      // merges left the lake internally inconsistent.
      Jobs.repairHistorical(s, lakePath)
      val lake = Lake.read(s, lakePath)
      val rec = Lake.reconcile(lake.rdd.count(), lake)
      require(rec.matches, s"c16 reconcile mismatch: $rec")
      lake.select("id", "date_time", "value", "ts", "day")
        .orderBy("day", "id")
    }),

    // Lake maintenance: small-file compaction. A deliberately
    // fragmented lake (round-robin repartition(8) scatters every day
    // across 8 files) compacts back to one file per day; the gate
    // hashes the full post-compaction content, so a row lost or
    // duplicated by the rewrite fails the oracle. File-count and
    // idempotence assertions live in LakeSpec (the oracle cannot see
    // the filesystem).
    "c15_compaction" -> ((s, dir) => {
      import graft.io.Lake
      Lake.configure(s)
      // Invocation-unique scratch lake — same rationale as c13/c16.
      val lakePath = graft.core.Scratch.dir("graft_c15_lake") + "/lake"
      val rows = tsRows(s, dir)
        .withColumn("day", substring(col("date_time"), 1, 10))
      Lake.write(rows.repartition(8), lakePath)
      Lake.compact(s, lakePath)
      Lake.read(s, lakePath)
        .select("id", "date_time", "value", "ts", "day")
        .orderBy("day", "id")
    }),

    // R1: count reconciliation report.
    "c11_reconcile" -> ((s, dir) => {
      val dbCount = events(s, dir).count()
      val lakeCount = tsRows(s, dir).count()
      val spark = s
      import spark.implicits._
      Seq((dbCount, lakeCount, lakeCount - dbCount,
        lakeCount == dbCount))
        .toDF("db_count", "parquet_count", "difference", "matches")
    }),

    // W2 batch form: state-change detection per user ordered by event
    // sequence (the watcher's anomaly diff as a lag window).
    "w01_state_changes" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("event_id"))
      events(s, dir)
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .where(col("prev_type").isNotNull
          && col("prev_type") =!= col("event_type"))
        .select(col("user_id"), col("event_id"),
          col("prev_type"), col("event_type"))
        .orderBy("user_id", "event_id")
    }),

    // As-of join: each odd event looks up the latest even "reference
    // mark" of the same user at-or-before its timestamp — the
    // point-in-time lake lookup, via the union+window technique.
    "c12_asof" -> ((s, dir) => {
      val ev = events(s, dir)
      val lefts = ev.where(col("event_id") % 2 === 1)
        .select(col("user_id"), col("ts"), col("event_id"))
      val rights = ev.where(col("event_id") % 2 === 0)
        .select(col("user_id"), col("ts"),
          col("event_id").as("ref_id"), col("value").as("ref_value"))
      graft.ops.AsofJoin.asof(lefts, rights, "user_id", "ts")
        .select(col("user_id"), col("event_id"),
          date_format(col("ts"), DT).as("ts_s"),
          col("r_ref_id").as("ref_id"),
          col("r_ref_value").as("ref_value"))
        .orderBy("event_id")
    }),

    // Gap-based sessionization (30-min inactivity) — the classic
    // event-stream window composition.
    "w03_sessionize" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("event_id"))
      val ev = events(s, dir)
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            col("ts").cast("long") - col("prev_ts").cast("long")
              > 1800, 1).otherwise(0))
        .withColumn("session_id",
          sum(col("new_session")).over(
            byUser.rowsBetween(Window.unboundedPreceding, 0)))
      ev.groupBy(col("user_id"), col("session_id"))
        .agg(
          count(lit(1)).as("n_events"),
          date_format(min(col("ts")), DT).as("session_start"),
          date_format(max(col("ts")), DT).as("session_end"),
          // Sum as decimal so the result is independent of partition
          // order (double addition is not associative); final DOUBLE so
          // both engines stringify identically.
          round(sum(col("value").cast("decimal(38,6)")), 2)
            .cast("double").as("session_value"))
        .orderBy("user_id", "session_id")
    }),

    // W3: full-cluster daily report over a snapshot-shaped derivation
    // of the events fixture — 20 "nodes" keyed by user_id, poll order
    // by event_id, replication lag from the value column (NULL for
    // 'view' snapshots to exercise the null-lag edge).
    "w04_cluster_report" -> ((s, dir) => {
      val snaps = events(s, dir).select(
        concat(lit("10.0.0."), col("user_id") % 20).as("ip"),
        col("event_id").cast("long").as("pollTs"),
        (col("event_type") =!= "error").as("isOnline"),
        (col("user_id") % 20 === 0).as("isMaster"),
        when(col("event_type") =!= "view",
          struct(floor(col("value") * 1000).cast("long")
            .as("secondsBehindMaster")))
          .as("replication"))
      graft.monitor.Monitor.clusterReport(snaps)
    }),

    // H1: GTID most-advanced election. Contender GTID sets are
    // rendered from per-node aggregates ("aaaa:1-maxSeq,bbbb:1-count"),
    // so the real interval parser + subset algebra runs; the election
    // itself is driver-side by design (cluster-sized input,
    // `orchestrator.py:584-633`).
    "h01_gtid_election" -> ((s, dir) => {
      import s.implicits._
      val stats = events(s, dir)
        .groupBy((col("user_id") % 3).as("node"))
        .agg(max("event_id").as("x"), count(lit(1)).as("y"))
        .orderBy("node")
        .collect() // 3 rows: cluster-size, driver-side by design (H1)
      val contenders = stats.toSeq.map { r =>
        (s"node${r.getLong(0)}",
          s"aaaa:1-${r.getLong(1)},bbbb:1-${r.getLong(2)}")
      }
      val winner =
        graft.monitor.Gtid.mostAdvanced(contenders).getOrElse("none")
      Seq((winner, contenders.size.toLong))
        .toDF("winner", "n_contenders")
    }),

    // Event-time tumbling windows — the batch form of
    // StreamOps.windowedCounts (same code path; the watermark is a
    // no-op in batch), gating the window-aggregation semantics the
    // streaming surface relies on. Value sums go through DECIMAL so
    // the result is partition-order independent.
    "w05_event_windows" -> ((s, dir) => {
      val ev = events(s, dir).select(
        col("ts"), col("event_type"),
        col("value").cast("decimal(38,6)").as("value"))
      graft.streaming.StreamOps
        .windowedCounts(ev, "ts", "event_type", "1 hour", "1 hour")
        .select(
          date_format(col("window.start"), DT).as("window_start"),
          col("event_type"), col("n"),
          col("sum_value").cast("double").as("sum_value"))
        .orderBy("window_start", "event_type")
    }),

    // Stream-stream interval join in its batch form (the watermark is
    // a no-op in batch; the streaming replay proof is in
    // StreamOpsSpec): each view paired with the same user's clicks in
    // the following hour, gap as exact micros.
    "w10_interval_join" -> ((s, dir) => {
      val ev = events(s, dir)
      val views = ev.where(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_id"),
          col("ts").as("view_ts"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("ts").as("click_ts"))
      graft.streaming.StreamOps.intervalJoin(views, clicks, "user_id",
        "view_ts", "click_ts", "60 minutes", "120 minutes")
        .select(col("user_id"), col("view_id"), col("click_id"),
          (unix_micros(col("click_ts")) - unix_micros(col("view_ts")))
            .as("gap_us"))
        .orderBy("view_id", "click_id")
    }),

    // Two-phase salted aggregation (ops/SkewAgg): hot keys fan out
    // over salt buckets in phase 1, partials merge per key in a tiny
    // phase 2 — must be indistinguishable from the plain groupBy,
    // which is exactly what the oracle states.
    "c14_salted_agg" -> ((s, dir) => {
      import graft.ops.SkewAgg
      val ev = events(s, dir).select(
        col("event_type"), col("value"),
        col("value").cast("decimal(38,6)").as("value_d"))
      SkewAgg.saltedAgg(ev, Seq("event_type"), Seq(
          SkewAgg.count("n"),
          SkewAgg.sum("value_d", "sum_v"),
          SkewAgg.min("value", "min_v"),
          SkewAgg.max("value", "max_v")), buckets = 32)
        .select(col("event_type"), col("n"),
          col("sum_v").cast("double").as("sum_v"),
          col("min_v"), col("max_v"),
          (col("sum_v").cast("double") / col("n")).as("avg_v"))
        .orderBy("event_type")
    }),

    // Ordered-sequence funnel: users progressing signup -> click ->
    // purchase in event order (conditional min-sequence chaining; each
    // stage joins the previous stage's anchor and looks strictly
    // later). One small aggregate per stage — no per-user state.
    "w06_funnel" -> ((s, dir) => {
      val ev = events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"))
      val s1 = ev.where(col("event_type") === "signup")
        .groupBy("user_id").agg(min("event_id").as("s1"))
      val s2 = ev.join(s1, "user_id")
        .where(col("event_type") === "click"
          && col("event_id") > col("s1"))
        .groupBy("user_id").agg(min("event_id").as("s2"))
      val s3 = ev.join(s2, "user_id")
        .where(col("event_type") === "purchase"
          && col("event_id") > col("s2"))
        .groupBy("user_id").agg(min("event_id").as("s3"))
      val n1 = s1.count(); val n2 = s2.count(); val n3 = s3.count()
      import s.implicits._
      Seq((n1, n2, n3))
        .toDF("n_signup", "n_signup_click", "n_full_funnel")
        .select(col("n_signup"), col("n_signup_click"),
          col("n_full_funnel"),
          round(col("n_signup_click") / col("n_signup"), 6)
            .as("click_rate"),
          round(col("n_full_funnel") / col("n_signup"), 6)
            .as("funnel_rate"))
    }),

    // H3: CASE-hierarchy status classification over grouped rows
    // (per-user activity classing, the orchestrator's shape).
    "w02_status_classify" -> ((s, dir) => {
      events(s, dir)
        .groupBy(col("user_id"))
        .agg(
          count(when(col("event_type") === "error", 1)).as("n_err"),
          count(when(col("event_type") === "purchase", 1)).as("n_buy"),
          count(lit(1)).as("n_total"))
        .withColumn("status",
          when(col("n_err") > 0, "broken")
            .when(col("n_buy") > 0, "active")
            .otherwise("idle"))
        .select("user_id", "status", "n_err", "n_buy", "n_total")
        .orderBy("user_id")
    }),

    // Streaming-dedup contract in its deterministic batch/replay
    // form: first event per (user, type) by event time.
    "w08_stream_dedup" -> ((s, dir) => {
      graft.streaming.StreamOps.dedupFirst(
        events(s, dir), "ts", Seq("user_id", "event_type"),
        tieBreak = Seq("event_id"))
        .select(col("user_id"), col("event_type"), col("event_id"),
          date_format(col("ts"), DT).as("first_ts"))
        .orderBy("user_id", "event_type")
    }),

    // Streaming state evolution gated end-to-end: the fixture's event
    // history replays through the REAL flatMapGroupsWithState operator
    // (Monitor.anomaliesStream, state = last snapshot per node) in
    // five event_id-ordered micro-batches, so every batch boundary is
    // a state handoff — exactly what StreamOpsSpec could only assert
    // against itself before. The oracle states the batch form (lag()
    // per node), so stream == batch is what the hash gate certifies.
    // The driver-side collect here feeds the MemoryStream TEST source
    // and is bounded by the fixture; production ingest is the
    // readStream file source (StreamOps.streamEvents).
    "w09_stream_replay" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val rows = events(s, dir).select(
          col("user_id").cast("string"),
          col("event_id"),
          col("event_type") =!= "error")
        .as[(String, Long, Boolean)]
        .collect().sortBy(_._2)
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val mem = MemoryStream[(String, Long, Boolean)]
      val snaps = mem.toDS().map { case (ip, poll, online) =>
        graft.core.Schemas.NodeStatus(ip, online, isMaster = false,
          replication = None, pollTs = poll)
      }
      val sink = "w09_sink"
      s.catalog.dropTempView(sink)
      val q = graft.monitor.Monitor.anomaliesStream(snaps)
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try
        rows.grouped(math.max(1, rows.length / 5 + 1)).foreach { b =>
          mem.addData(b.toSeq)
          q.processAllAvailable()
        }
      finally q.stop()
      s.table(sink).select(
          col("ip"), col("kind"), col("detail"),
          col("pollTs").as("poll_ts"))
        .orderBy("ip", "poll_ts", "kind")
    }),

    // H2 split-brain guard, gated: a healthy snapshot set (a single
    // master node — user_id % 20 == 0 is one ip) and one with an
    // injected second master (user_id % 10 == 0 -> nodes 0 and 10).
    // The guard's contract — throw iff more than one distinct master
    // ip is visible — is gated by reporting whether it threw next to
    // the distributed master count it saw.
    "h02_split_brain" -> ((s, dir) => {
      import s.implicits._
      def snaps(masterMod: Int) = events(s, dir).select(
        concat(lit("10.0.0."), col("user_id") % 20).as("ip"),
        (col("user_id") % masterMod === 0).as("isMaster"))
      val rows = Seq(("healthy", 20), ("injected", 10)).map {
        case (scenario, mod) =>
          val df = snaps(mod)
          val masters = df.where(col("isMaster"))
            .select("ip").distinct().count()
          val threw =
            try { graft.monitor.Monitor.assertSingleMaster(df); false }
            catch { case _: IllegalStateException => true }
          (scenario, masters, masters > 1, threw)
      }
      rows.toDF("scenario", "masters", "is_split_brain", "guard_threw")
        .orderBy("scenario")
    }),

    // W1: the typed snapshot model — snapshot rows round-trip through
    // the Dataset[NodeStatus] encoder (nullable nested replication
    // struct included) and project back out as portable columns. The
    // typed map is deliberate here: this query gates the case-class
    // model itself, not an expression pipeline.
    "w07_node_snapshot" -> ((s, dir) => {
      import s.implicits._
      import graft.core.Schemas
      val typed = events(s, dir).select(
        concat(lit("10.0.0."), col("user_id") % 20).as("ip"),
        (col("event_type") =!= "error").as("isOnline"),
        (col("user_id") % 20 === 0).as("isMaster"),
        when(col("event_type") =!= "view", struct(
          floor(col("value") * 1000).cast("long")
            .as("secondsBehindMaster"),
          lit("Yes").as("slaveIoRunning"),
          when(col("event_type") === "click", "No").otherwise("Yes")
            .as("slaveSqlRunning"),
          lit("10.0.0.0").as("masterHost"),
          when(col("event_type") === "error", "io error")
            .otherwise("").as("lastError"))).as("replication"),
        col("event_id").cast("long").as("pollTs"))
        .as[Schemas.NodeStatus]
      typed.map { n =>
        (n.ip, n.pollTs, n.isOnline, n.isMaster,
          n.replication.flatMap(_.secondsBehindMaster).getOrElse(-1L),
          n.replication.map(_.slaveSqlRunning).getOrElse("NULL"),
          n.replication.exists(_.secondsBehindMaster
            .exists(_ > Schemas.LagThresholdSeconds)))
      }.toDF("ip", "poll_ts", "is_online", "is_master", "lag_s",
          "sql_running", "is_lagging")
        .orderBy("poll_ts")
    }))

  val oracles: Map[String, String] = {
    // Shared CTE snippets (kept in exact sync with the Scala
    // derivations above).
    val tsRowsSql =
      """SELECT event_id AS id,
           coalesce(strftime(CASE WHEN event_id % 97 = 0 THEN NULL
             ELSE ts END, '%Y-%m-%d %H:%M:%S'),
             '0001-01-01 00:00:00') AS date_time,
           value,
           strftime(ts + INTERVAL 2 HOUR, '%Y-%m-%d %H:%M:%S') AS ts
         FROM events"""
    val changeEventsSql =
      """SELECT
           CASE WHEN event_type IN ('signup','purchase') THEN 'I'
                WHEN event_type IN ('click','view') THEN 'U'
                ELSE 'D' END AS op,
           event_id % 500 + 1 AS pk,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS dateTime,
           value,
           strftime(ts + INTERVAL 2 HOUR, '%Y-%m-%d %H:%M:%S') AS ts,
           event_id AS seq
         FROM events"""
    // C5 closed form: net op per (day, pk) from dseq/iseq + last
    // non-D image (see graft.cdc.Consolidate).
    def consolidateSql(filter: String) =
      s"""SELECT substr(dateTime, 1, 10) AS day, pk AS id,
            CASE WHEN coalesce(max(seq) FILTER (WHERE op = 'I'), -1)
                   > coalesce(max(seq) FILTER (WHERE op = 'D'), -1) THEN 'I'
                 WHEN max(seq) FILTER (WHERE op = 'D') IS NOT NULL THEN 'D'
                 ELSE 'U' END AS op,
            arg_max(dateTime, seq) FILTER (WHERE op <> 'D') AS date_time,
            arg_max(value, seq) FILTER (WHERE op <> 'D') AS value,
            arg_max(ts, seq) FILTER (WHERE op <> 'D') AS ts
          FROM ev $filter
          GROUP BY 1, 2"""
    val existingSql =
      """SELECT substr(dateTime, 1, 10) AS day, pk AS id,
           arg_max(dateTime, seq) AS date_time,
           arg_max(value, seq) AS value,
           arg_max(ts, seq) AS ts
         FROM ev WHERE seq % 2 = 0
         GROUP BY 1, 2"""
    val mergeSelectSql =
      """SELECT
            coalesce(e.id, c.id) AS id,
            CASE WHEN c.op IS NULL THEN e.date_time
                 ELSE c.date_time END AS date_time,
            CASE WHEN c.op IS NULL THEN e.value ELSE c.value END AS value,
            CASE WHEN c.op IS NULL THEN e.ts ELSE c.ts END AS ts,
            coalesce(e.day, c.day) AS day
          FROM existing e
          FULL OUTER JOIN changes c ON e.day = c.day AND e.id = c.id
          WHERE CASE WHEN c.op IS NULL THEN TRUE
                     WHEN c.op = 'D' THEN FALSE
                     WHEN c.op = 'I' THEN TRUE
                     ELSE e.id IS NOT NULL END"""
    val mergeSql =
      s"""WITH ev AS ($changeEventsSql),
          existing AS ($existingSql),
          changes AS (${consolidateSql("WHERE seq % 2 = 1")})
          $mergeSelectSql"""

    Map(
      "c01_normalize_day" ->
        s"""WITH tsr AS ($tsRowsSql)
           SELECT id, date_time, value, ts,
             substr(date_time, 1, 10) AS day
           FROM tsr ORDER BY id""",
      "c02_day_histogram" ->
        s"""WITH tsr AS ($tsRowsSql)
           SELECT substr(date_time, 1, 10) AS day, count(*) AS n_rows
           FROM tsr GROUP BY 1 ORDER BY 1""",
      // Compaction is content-preserving: the post-compaction lake
      // must hash-equal the raw derivation.
      "c15_compaction" ->
        s"""WITH tsr AS ($tsRowsSql)
           SELECT id, date_time, value, ts,
             substr(date_time, 1, 10) AS day
           FROM tsr ORDER BY day, id""",
      "c03_resume_point" ->
        s"""WITH tsr AS ($tsRowsSql)
           SELECT
             max(CASE WHEN date_time <> '0001-01-01 00:00:00'
               THEN date_time END) AS resume_point,
             count(*) AS total_rows,
             count(CASE WHEN date_time = '0001-01-01 00:00:00'
               THEN 1 END) AS sentinel_rows
           FROM tsr""",
      "c04_epoch_utc2" ->
        """SELECT event_id,
           strftime(ts + INTERVAL 2 HOUR, '%Y-%m-%d %H:%M:%S') AS ts_utc2
           FROM events ORDER BY event_id""",
      "c05_validation_report" ->
        s"""WITH tsr AS ($tsRowsSql),
           dirty AS (SELECT CASE WHEN id % 101 = 0 THEN -id - 1
               ELSE id END AS id,
             date_time, value, ts FROM tsr)
           SELECT
             count(CASE WHEN id IS NULL THEN 1 END) AS id_null,
             count(CASE WHEN id < 0 THEN 1 END) AS id_negative,
             count(CASE WHEN id >= 0 AND (date_time IS NULL
               OR length(date_time) <> 19
               OR NOT regexp_matches(date_time,
                 '^\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}$$'))
               THEN 1 END) AS date_time_format,
             count(CASE WHEN id >= 0 AND length(date_time) = 19
               AND regexp_matches(date_time,
                 '^\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}$$')
               AND (ts IS NULL OR length(ts) <> 19
                 OR NOT regexp_matches(ts,
                   '^\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}$$'))
               THEN 1 END) AS ts_format,
             -- value is DOUBLE at the source: the cast-failure rule
             -- cannot fire on this derivation
             0::BIGINT AS value_not_numeric,
             count(*) AS rows_total
           FROM dirty""",
      "c06_value_parse" ->
        """SELECT event_id,
           CASE WHEN event_id % 13 = 0 THEN NULL ELSE value END
             AS value_parsed
           FROM events
           WHERE event_id % 13 = 0 OR event_id % 7 = 0
           ORDER BY event_id""",
      "c07_consolidate" ->
        s"""WITH ev AS ($changeEventsSql)
           ${consolidateSql("")}
           ORDER BY day, id""",
      "c08_merge" -> s"$mergeSql ORDER BY day, id",
      // Identical closed form to c07: the text render+parse must be a
      // lossless round-trip.
      "c10_binlog_roundtrip" ->
        s"""WITH ev AS ($changeEventsSql)
           ${consolidateSql("")}
           ORDER BY day, id""",
      "c09_merge_audit" ->
        s"""WITH ev AS ($changeEventsSql),
           existing AS ($existingSql),
           changes AS (${consolidateSql("WHERE seq % 2 = 1")}),
           merged AS ($mergeSelectSql),
           before AS (SELECT day, count(*) AS rows_before FROM existing
             GROUP BY day),
           planned AS (SELECT day,
             count(CASE WHEN op = 'D' THEN 1 END) AS planned_deletes,
             count(CASE WHEN op = 'U' THEN 1 END) AS planned_updates,
             count(CASE WHEN op = 'I' THEN 1 END) AS planned_inserts
             FROM changes GROUP BY day),
           after AS (SELECT day, count(*) AS rows_after FROM merged
             GROUP BY day)
           SELECT coalesce(b.day, p.day, a.day) AS day,
             coalesce(rows_before, 0) AS rows_before,
             coalesce(planned_deletes, 0) AS planned_deletes,
             coalesce(planned_updates, 0) AS planned_updates,
             coalesce(planned_inserts, 0) AS planned_inserts,
             coalesce(rows_after, 0) AS rows_after,
             coalesce(rows_after, 0) - coalesce(rows_before, 0)
               AS net_change
           FROM before b
           FULL OUTER JOIN planned p ON b.day = p.day
           FULL OUTER JOIN after a ON coalesce(b.day, p.day) = a.day
           ORDER BY day""",
      "c11_reconcile" ->
        """SELECT count(*) AS db_count, count(*) AS parquet_count,
           0::BIGINT AS difference, TRUE AS matches FROM events""",
      // Lifecycle restatement: extract lands every raw row exactly once
      // (backfill covers pre-MIN_DATE days; the incremental pass
      // rewrites from the resume day forward with identical content),
      // then the consolidated change batch merges in, then the
      // pure-delete batch removes the killed day wholesale.
      // c16 streams the SAME change events through readStream +
      // foreachBatch and must land on the identical final lake —
      // splitting the event sequence into micro-batches and applying
      // the net changes sequentially composes to the global net
      // (the Consolidate closed-form algebra), so one restatement
      // gates both the batch and the streaming lifecycle.
      "c16_stream_lifecycle" ->
        s"""WITH raw AS (SELECT event_id AS id,
             strftime(CASE WHEN event_id % 11 = 0
                 THEN ts - INTERVAL 15 YEAR ELSE ts END,
               '%Y-%m-%d %H:%M:%S') AS date_time,
             value,
             strftime(ts + INTERVAL 2 HOUR, '%Y-%m-%d %H:%M:%S') AS ts
             FROM events),
           existing AS (SELECT id, date_time, value, ts,
             substr(date_time, 1, 10) AS day FROM raw),
           ev AS ($changeEventsSql),
           changes AS (${consolidateSql("")}),
           merged AS ($mergeSelectSql)
           SELECT id, date_time, value, ts, day FROM merged
           WHERE day <> '2024-01-15'
           ORDER BY day, id""",
      "c13_lifecycle" ->
        s"""WITH raw AS (SELECT event_id AS id,
             strftime(CASE WHEN event_id % 11 = 0
                 THEN ts - INTERVAL 15 YEAR ELSE ts END,
               '%Y-%m-%d %H:%M:%S') AS date_time,
             value,
             strftime(ts + INTERVAL 2 HOUR, '%Y-%m-%d %H:%M:%S') AS ts
             FROM events),
           existing AS (SELECT id, date_time, value, ts,
             substr(date_time, 1, 10) AS day FROM raw),
           ev AS ($changeEventsSql),
           changes AS (${consolidateSql("")}),
           merged AS ($mergeSelectSql)
           SELECT id, date_time, value, ts, day FROM merged
           WHERE day <> '2024-01-15'
           ORDER BY day, id""",
      "c12_asof" ->
        """WITH lefts AS (SELECT user_id, ts, event_id FROM events
             WHERE event_id % 2 = 1),
           rights AS (SELECT user_id, ts, event_id AS ref_id,
             value AS ref_value FROM events WHERE event_id % 2 = 0)
           SELECT l.user_id, l.event_id,
             strftime(l.ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
             r.ref_id, r.ref_value
           FROM lefts l
           ASOF LEFT JOIN rights r
             ON l.user_id = r.user_id AND l.ts >= r.ts
           ORDER BY l.event_id""",
      "w03_sessionize" ->
        """WITH w AS (SELECT user_id, event_id, ts, value,
             lag(ts, 1) OVER (PARTITION BY user_id ORDER BY event_id)
               AS prev_ts
           FROM events),
           flagged AS (SELECT *,
             CASE WHEN prev_ts IS NULL
               OR floor(epoch(ts))::BIGINT
                  - floor(epoch(prev_ts))::BIGINT > 1800
               THEN 1 ELSE 0 END AS new_session
             FROM w),
           sess AS (SELECT user_id, event_id, ts, value,
             (sum(new_session) OVER (PARTITION BY user_id
               ORDER BY event_id
               ROWS UNBOUNDED PRECEDING))::BIGINT AS session_id
             FROM flagged)
           SELECT user_id, session_id, count(*) AS n_events,
             strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
             strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
             round(sum(value::DECIMAL(38,6)), 2)::DOUBLE AS session_value
           FROM sess GROUP BY user_id, session_id
           ORDER BY user_id, session_id""",
      "w01_state_changes" ->
        """WITH w AS (SELECT user_id, event_id, event_type,
             lag(event_type, 1) OVER (PARTITION BY user_id
               ORDER BY event_id) AS prev_type
           FROM events)
           SELECT user_id, event_id, prev_type, event_type
           FROM w WHERE prev_type IS NOT NULL
             AND prev_type <> event_type
           ORDER BY user_id, event_id""",
      "w02_status_classify" ->
        """SELECT user_id,
           CASE WHEN count(CASE WHEN event_type = 'error' THEN 1 END) > 0
             THEN 'broken'
             WHEN count(CASE WHEN event_type = 'purchase' THEN 1 END) > 0
             THEN 'active' ELSE 'idle' END AS status,
           count(CASE WHEN event_type = 'error' THEN 1 END) AS n_err,
           count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_buy,
           count(*) AS n_total
           FROM events GROUP BY user_id ORDER BY user_id""",
      "w06_funnel" ->
        """WITH ev AS (SELECT user_id, event_id, event_type
             FROM events),
           s1 AS (SELECT user_id, min(event_id) AS s1 FROM ev
             WHERE event_type = 'signup' GROUP BY user_id),
           s2 AS (SELECT ev.user_id, min(event_id) AS s2 FROM ev
             JOIN s1 ON ev.user_id = s1.user_id
             WHERE event_type = 'click' AND event_id > s1
             GROUP BY ev.user_id),
           s3 AS (SELECT ev.user_id, min(event_id) AS s3 FROM ev
             JOIN s2 ON ev.user_id = s2.user_id
             WHERE event_type = 'purchase' AND event_id > s2
             GROUP BY ev.user_id)
           SELECT (SELECT count(*) FROM s1)::BIGINT AS n_signup,
             (SELECT count(*) FROM s2)::BIGINT AS n_signup_click,
             (SELECT count(*) FROM s3)::BIGINT AS n_full_funnel,
             round((SELECT count(*) FROM s2)::DOUBLE
               / (SELECT count(*) FROM s1), 6) AS click_rate,
             round((SELECT count(*) FROM s3)::DOUBLE
               / (SELECT count(*) FROM s1), 6) AS funnel_rate""",
      // Tumbling 1h windows align to the epoch exactly like
      // date_trunc('hour').
      "w05_event_windows" ->
        """SELECT strftime(date_trunc('hour', ts),
             '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, count(*) AS n,
           sum(value::DECIMAL(38,6))::DOUBLE AS sum_value
           FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
      // The interval join restated as the plain theta join it must
      // equal in batch; gaps as exact microsecond integers.
      "w10_interval_join" ->
        """WITH v AS (SELECT user_id, event_id AS view_id,
             ts AS view_ts FROM events WHERE event_type = 'view'),
           c AS (SELECT user_id, event_id AS click_id,
             ts AS click_ts FROM events WHERE event_type = 'click')
           SELECT v.user_id, view_id, click_id,
             epoch_us(click_ts) - epoch_us(view_ts) AS gap_us
           FROM v JOIN c ON v.user_id = c.user_id
             AND c.click_ts > v.view_ts
             AND c.click_ts <= v.view_ts + INTERVAL 60 MINUTE
           ORDER BY view_id, click_id""",
      // The salted aggregation must equal the plain groupBy.
      "c14_salted_agg" ->
        """SELECT event_type, count(*) AS n,
           sum(value::DECIMAL(38,6))::DOUBLE AS sum_v,
           min(value) AS min_v, max(value) AS max_v,
           (sum(value::DECIMAL(38,6))::DOUBLE / count(*)) AS avg_v
           FROM events GROUP BY event_type ORDER BY event_type""",
      // W3: latest snapshot per node (arg_max by poll order), then the
      // cluster rollup. 'view' snapshots carry NULL lag, which must
      // not count as lagging.
      "w04_cluster_report" ->
        """WITH latest AS (SELECT user_id % 20 AS node,
             arg_max(event_type, event_id) AS et,
             arg_max(value, event_id) AS v
             FROM events GROUP BY 1)
           SELECT count(*) AS nodes,
             count(CASE WHEN et <> 'error' THEN 1 END) AS online,
             count(CASE WHEN node = 0 THEN 1 END) AS masters,
             count(CASE WHEN et <> 'view'
               AND floor(v * 1000)::BIGINT > 600 THEN 1 END) AS lagging
           FROM latest""",
      // H1 closed form: "aaaa:1-x,bbbb:1-y" is a subset of
      // "aaaa:1-x',bbbb:1-y'" iff x <= x' and y <= y'; the election
      // picks the first contender (node order) dominating all others,
      // 'none' when the cluster diverged.
      "h01_gtid_election" ->
        """WITH stats AS (SELECT user_id % 3 AS node,
             max(event_id) AS x, count(*) AS y
             FROM events GROUP BY 1),
           dom AS (SELECT node FROM stats s
             WHERE NOT EXISTS (SELECT 1 FROM stats o
               WHERE o.x > s.x OR o.y > s.y)
             ORDER BY node LIMIT 1)
           SELECT coalesce((SELECT 'node' || node FROM dom), 'none')
             AS winner,
           (SELECT count(*) FROM stats)::BIGINT AS n_contenders""",
      "w08_stream_dedup" ->
        """SELECT user_id, event_type, event_id,
             strftime(ts, '%Y-%m-%d %H:%M:%S') AS first_ts
           FROM (SELECT user_id, event_type, event_id, ts,
             row_number() OVER (PARTITION BY user_id, event_type
               ORDER BY ts ASC, event_id ASC) AS rn
             FROM events)
           WHERE rn = 1 ORDER BY user_id, event_type""",
      // The streamed anomaly log must equal the batch lag() diff: with
      // replication state absent and mastership constant, the only
      // anomaly kind the diff can emit is online_flip, whose detail is
      // "<prev> -> <cur>" over lowercase booleans.
      "w09_stream_replay" ->
        """WITH w AS (SELECT user_id::VARCHAR AS ip, event_id,
             (event_type <> 'error') AS online,
             lag(event_type <> 'error') OVER (PARTITION BY user_id
               ORDER BY event_id) AS prev_online
           FROM events)
           SELECT ip, 'online_flip' AS kind,
             (CASE WHEN prev_online THEN 'true' ELSE 'false' END)
               || ' -> ' ||
             (CASE WHEN online THEN 'true' ELSE 'false' END) AS detail,
             event_id AS poll_ts
           FROM w WHERE prev_online IS NOT NULL
             AND online <> prev_online
           ORDER BY ip, poll_ts""",
      // H2: the guard throws exactly when more than one master ip is
      // visible — so guard_threw is definitionally masters > 1.
      "h02_split_brain" ->
        """SELECT scenario, masters, masters > 1 AS is_split_brain,
             masters > 1 AS guard_threw
           FROM (
             SELECT 'healthy' AS scenario,
               count(DISTINCT CASE WHEN user_id % 20 = 0
                 THEN user_id % 20 END)::BIGINT AS masters
             FROM events
             UNION ALL
             SELECT 'injected',
               count(DISTINCT CASE WHEN user_id % 10 = 0
                 THEN user_id % 20 END)::BIGINT
             FROM events)
           ORDER BY scenario""",
      // W1: NULL-replication ('view') rows surface as lag -1 /
      // 'NULL'; a NULL lag inside a present struct must not count as
      // lagging (FALSE AND NULL = FALSE, NULL-guarded by coalesce).
      "w07_node_snapshot" ->
        """SELECT '10.0.0.' || (user_id % 20) AS ip,
             event_id AS poll_ts,
             event_type <> 'error' AS is_online,
             user_id % 20 = 0 AS is_master,
             coalesce(CASE WHEN event_type <> 'view'
               THEN floor(value * 1000)::BIGINT END, -1) AS lag_s,
             CASE WHEN event_type = 'view' THEN 'NULL'
                  WHEN event_type = 'click' THEN 'No'
                  ELSE 'Yes' END AS sql_running,
             coalesce(event_type <> 'view'
               AND floor(value * 1000)::BIGINT > 600, FALSE)
               AS is_lagging
           FROM events ORDER BY poll_ts""")
  }
}
