package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.core.Schemas

/** Scalar/row-level operators of the extraction pipeline: timestamp
  * normalization (S9), day derivation (S10), fail-fast validation (S8),
  * NULL-literal value parse (C3), epoch->UTC+2 projection (C4).
  * All are codegen'd built-in function compositions — no UDFs.
  */
object Timeseries {

  import Schemas.{Sentinel, DtPattern, DtRegex}

  /** S9 (`db_extractor.py:242-245`): parse + reformat a datetime-ish
    * column to the fixed 19-char string; unparseable/null -> sentinel. */
  def normalizeDt(c: Column): Column =
    coalesce(date_format(c.cast("timestamp"), DtPattern), lit(Sentinel))

  /** S10 (`db_extractor.py:209`, `consolidate.cpp:66`): the partition
    * day is the first 10 chars of the formatted string — NOT a parsed
    * date (sentinel rows land in day "0001-01-01"). */
  def dayOf(dateTime: Column): Column = substring(dateTime, 1, 10)

  /** C3 (`consolidate.cpp:76-86`): `"NULL"` literal -> null, otherwise
    * float parse. A non-numeric, non-"NULL" string casts to null too —
    * pair with [[violations]]-style guards when fail-fast is wanted. */
  def parseValue(raw: Column): Column =
    when(raw === "NULL" || raw.isNull, lit(null).cast(DoubleType))
      .otherwise(raw.cast(DoubleType))

  /** C4 (`consolidate.cpp:45-53`): unix seconds -> 19-char string in
    * UTC+2 (fixed offset, not a DST zone — the reference adds exactly
    * 2 h). Session-timezone independent: the ltz->ntz cast renders the
    * session zone's wall clock, and convert_timezone re-interprets that
    * same zone's wall clock back to UTC — the two cancel for any
    * session timezone, leaving the UTC wall clock of instant t+2h. */
  def epochToUtc2(epochSeconds: Column): Column =
    date_format(
      convert_timezone(current_timezone(), lit("UTC"),
        timestamp_seconds(epochSeconds + lit(7200L))
          .cast("timestamp_ntz")),
      DtPattern)

  /** S8 (`db_extractor.py:78-149`): per-row domain checks. Returns a
    * column naming the first violated rule, null when the row is clean.
    * The reference raises on any violation; callers use
    * [[assertValid]] for that, or keep the column for a violation
    * report. */
  def violationOf(id: Column, dateTime: Column, value: Column,
      ts: Column): Column = {
    val dtBad = (c: Column) =>
      c.isNull || length(c) =!= 19 || !c.rlike(DtRegex)
    when(id.isNull, lit("id_null"))
      .when(id < 0, lit("id_negative"))
      .when(dtBad(dateTime), lit("date_time_format"))
      .when(dtBad(ts), lit("ts_format"))
      .when(value.isNotNull && value.cast(DoubleType).isNull,
        lit("value_not_numeric"))
  }

  final class ValidationException(msg: String)
    extends RuntimeException(msg)

  /** Fail-fast gate: throws if any row violates S8, mirroring the
    * reference's raise-and-halt (`db_extractor.py:188-193`,
    * `consolidate.cpp:412-415`). Cost: one pass that stops at the first
    * violation (`limit(1)`), not a full count. */
  def assertValid(df: DataFrame): DataFrame = {
    val bad = df
      .withColumn("_violation",
        violationOf(col("id"), col("date_time"), col("value"), col("ts")))
      .where(col("_violation").isNotNull)
      .limit(1)
      .collect()
    if (bad.nonEmpty) {
      val r = bad.head
      throw new ValidationException(
        s"validation failed: rule=${r.getAs[String]("_violation")} row=$r")
    }
    df
  }

  /** Violation histogram (report form of S8): count of rows per violated
    * rule — all-zero when clean. Covers every rule [[violationOf]] can
    * emit. */
  def violationReport(df: DataFrame): DataFrame = {
    val v = violationOf(col("id"), col("date_time"), col("value"),
      col("ts"))
    df.select(
      count(when(v === "id_null", 1)).as("id_null"),
      count(when(v === "id_negative", 1)).as("id_negative"),
      count(when(v === "date_time_format", 1)).as("date_time_format"),
      count(when(v === "ts_format", 1)).as("ts_format"),
      count(when(v === "value_not_numeric", 1)).as("value_not_numeric"),
      count(lit(1)).as("rows_total"))
  }
}
