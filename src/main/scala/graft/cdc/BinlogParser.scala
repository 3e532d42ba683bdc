package graft.cdc

import java.time.{LocalDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter

import graft.core.Schemas.ChangeEvent

/** Parser for the binlog pseudo-SQL text stream the reference consumes
  * (reference: `Parquet Export/consolidate.cpp:310-369`; upstream awk
  * filter `Parquet Export/parse_binlogs.sh:125-140`).
  *
  * Input is the post-`mysqlbinlog --verbose` text: statement-type header
  * lines (`INSERT INTO`/`UPDATE`/`DELETE FROM` + a backtick-quoted table)
  * open a block; `WHERE`/`SET` section markers are skipped
  * (`consolidate.cpp:336-340`); `@N=value` lines fill positional fields,
  * later assignments overwriting earlier ones (so an UPDATE's SET image
  * overrides its WHERE image); a block is flushed when the next header
  * arrives or at EOF (`consolidate.cpp:315-335,371-373`).
  *
  * Field mapping (`consolidate.cpp:348-366`): `@1`->pk, `@3`->date_time
  * (single quotes stripped, `consolidate.cpp:355-356`), `@4`->value
  * (`"NULL"` literal -> null else float, `consolidate.cpp:76-86`),
  * `@6`->unix seconds rendered as a UTC+2 19-char string
  * (`ts_to_utc2`, `consolidate.cpp:45-53`). DELETE uses only pk and
  * date_time (`consolidate.cpp:357`).
  *
  * Fail-fast validation (`consolidate.cpp:61-64,82-85`): pk==0, empty
  * date_time, ts==0 on I/U, unparseable value all abort the batch.
  *
  * Pure `Iterator[String] => Iterator[ChangeEvent]` so it unit-tests
  * without Spark and runs distributed via `flatMap` over whole files
  * (blocks are multi-line, so files must not be split mid-block — see
  * [[CdcSource]]).
  */
object BinlogParser {

  final class BinlogParseException(msg: String) extends RuntimeException(msg)

  private val utc2Fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")

  /** Unix seconds -> `"yyyy-MM-dd HH:mm:ss"` in UTC+2
    * (`consolidate.cpp:45-53` adds `std::chrono::hours(2)`). */
  def tsToUtc2(epochSeconds: Long): String =
    LocalDateTime.ofEpochSecond(epochSeconds + 7200L, 0, ZoneOffset.UTC)
      .format(utc2Fmt)

  /** Default fully-qualified table filter (B2,
    * `parse_binlogs.sh:126`). */
  val DefaultTable = "`enexory`.`api_data_timeseries`"

  private final case class Block(
      op: String, // "I" | "U" | "D"
      fields: collection.mutable.Map[Int, String])

  /** Parse one logical stream of lines into events.
    *
    * @param lines    text lines (already awk-style `### `-stripped or not
    *                 — a leading `"### "` prefix is tolerated and removed)
    * @param table    fully-qualified backtick table name to keep; blocks
    *                 for other tables are skipped wholesale
    * @param seqStart first sequence number to assign (callers processing
    *                 multiple files in order offset this so later files
    *                 win, matching the reference's sequential per-file
    *                 apply, `parse_binlogs.sh:118-144`)
    */
  def parse(
      lines: Iterator[String],
      table: String = DefaultTable,
      seqStart: Long = 0L): Iterator[ChangeEvent] = new Iterator[ChangeEvent] {

    private var seqNo = seqStart
    private var current: Option[Block] = None
    private var pending: Option[ChangeEvent] = None
    private var exhausted = false

    private def strip(s: String): String = {
      val t = if (s.startsWith("### ")) s.substring(4) else s
      t.trim
    }

    private def headerOp(line: String): Option[(String, Boolean)] = {
      // Returns (op, isTargetTable) for header lines; None otherwise.
      if (line.startsWith("INSERT INTO "))
        Some(("I", line.substring(12).trim.startsWith(table)))
      else if (line.startsWith("UPDATE "))
        Some(("U", line.substring(7).trim.startsWith(table)))
      else if (line.startsWith("DELETE FROM "))
        Some(("D", line.substring(12).trim.startsWith(table)))
      else None
    }

    private def flush(): Option[ChangeEvent] = current.flatMap { b =>
      current = None
      val pk = b.fields.get(1).map(parseLong("pk", _)).getOrElse(0L)
      if (pk == 0L)
        throw new BinlogParseException(s"pk is 0 or missing in ${b.op} block")
      val dt = unquote(b.fields.getOrElse(3, ""))
      if (dt.isEmpty)
        throw new BinlogParseException(s"empty date_time for pk=$pk")
      val ev =
        if (b.op == "D") {
          ChangeEvent("D", pk, dt, None, "", nextSeq())
        } else {
          val value = b.fields.get(4) match {
            case None | Some("NULL") => None
            case Some(raw) => Some(parseDouble(raw, pk))
          }
          val tsRaw = b.fields.get(6).map(parseLong("ts", _)).getOrElse(0L)
          if (tsRaw == 0L)
            throw new BinlogParseException(s"ts is 0 or missing for pk=$pk")
          ChangeEvent(b.op, pk, dt, value, tsToUtc2(tsRaw), nextSeq())
        }
      Some(ev)
    }

    private def nextSeq(): Long = { val s = seqNo; seqNo += 1; s }

    private def parseLong(what: String, raw: String): Long =
      try raw.trim.toLong
      catch { case _: NumberFormatException =>
        throw new BinlogParseException(s"unparseable $what: '$raw'") }

    private def parseDouble(raw: String, pk: Long): Double =
      try raw.trim.toDouble
      catch { case _: NumberFormatException =>
        throw new BinlogParseException(
          s"unparseable value '$raw' for pk=$pk") }

    private def unquote(s: String): String =
      if (s.length >= 2 && s.head == '\'' && s.last == '\'')
        s.substring(1, s.length - 1)
      else s

    private def advance(): Unit = {
      while (pending.isEmpty && !exhausted) {
        if (!lines.hasNext) {
          exhausted = true
          pending = flush() // final flush (`consolidate.cpp:371-373`)
        } else {
          val line = strip(lines.next())
          headerOp(line) match {
            case Some((op, isTarget)) =>
              pending = flush()
              if (isTarget)
                current = Some(Block(op, collection.mutable.Map.empty))
            case None =>
              current match {
                case Some(b) if line.startsWith("@") =>
                  val eq = line.indexOf('=')
                  if (eq > 1) {
                    val n = line.substring(1, eq).trim
                    if (n.nonEmpty && n.forall(_.isDigit))
                      b.fields(n.toInt) = line.substring(eq + 1).trim
                  }
                case _ => // WHERE / SET markers, comments, non-target noise
              }
          }
        }
      }
    }

    override def hasNext: Boolean = { advance(); pending.isDefined }
    override def next(): ChangeEvent = {
      advance()
      val e = pending.getOrElse(throw new NoSuchElementException)
      pending = None
      e
    }
  }

  /** Convenience: parse a whole text blob (one binlog dump file). */
  def parseText(text: String, table: String = DefaultTable,
      seqStart: Long = 0L): Iterator[ChangeEvent] =
    parse(text.linesIterator, table, seqStart)
}
