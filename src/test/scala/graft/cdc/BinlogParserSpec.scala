package graft.cdc

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Schemas.ChangeEvent

/** Parser cases from FIXTURES.md §2 (reference parser facts,
  * `consolidate.cpp:310-369`). Pure — no Spark. */
class BinlogParserSpec extends AnyFunSuite {

  private val T = "`enexory`.`api_data_timeseries`"

  private def parse(text: String): List[ChangeEvent] =
    BinlogParser.parseText(text).toList

  test("INSERT block: positional fields, quote stripping, UTC+2 ts") {
    val evs = parse(
      s"""INSERT INTO $T
         |SET
         |  @1=42
         |  @2=7
         |  @3='2024-03-15 10:30:00'
         |  @4=123.45
         |  @5=0
         |  @6=1710498600""".stripMargin)
    assert(evs == List(ChangeEvent("I", 42L, "2024-03-15 10:30:00",
      Some(123.45), BinlogParser.tsToUtc2(1710498600L), 0L)))
    // 1710498600 = 2024-03-15 10:30:00 UTC -> 12:30:00 UTC+2
    assert(evs.head.ts == "2024-03-15 12:30:00")
  }

  test("UPDATE block: SET image overrides WHERE image") {
    val evs = parse(
      s"""UPDATE $T
         |WHERE
         |  @1=42
         |  @3='2024-03-15 10:30:00'
         |  @4=1.0
         |SET
         |  @1=42
         |  @3='2024-03-15 10:30:00'
         |  @4=NULL
         |  @6=1710498700""".stripMargin)
    assert(evs.size == 1)
    assert(evs.head.op == "U")
    assert(evs.head.value.isEmpty) // NULL literal -> null
  }

  test("DELETE block ignores @4/@6 and needs no ts") {
    val evs = parse(
      s"""DELETE FROM $T
         |WHERE
         |  @1=7
         |  @3='2024-03-15 10:30:00'""".stripMargin)
    assert(evs == List(ChangeEvent("D", 7L, "2024-03-15 10:30:00",
      None, "", 0L)))
  }

  test("blocks flush on next header; seq increases in order") {
    val evs = parse(
      s"""INSERT INTO $T
         |SET
         |  @1=1
         |  @3='2024-01-01 00:00:00'
         |  @4=1
         |  @6=100
         |DELETE FROM $T
         |WHERE
         |  @1=2
         |  @3='2024-01-02 00:00:00'
         |INSERT INTO $T
         |SET
         |  @1=3
         |  @3='2024-01-03 00:00:00'
         |  @4=3
         |  @6=300""".stripMargin)
    assert(evs.map(e => (e.op, e.pk, e.seq)) ==
      List(("I", 1L, 0L), ("D", 2L, 1L), ("I", 3L, 2L)))
  }

  test("### prefix (raw mysqlbinlog verbose output) is tolerated") {
    val evs = parse(
      s"""### INSERT INTO $T
         |### SET
         |###   @1=5
         |###   @3='2024-01-01 10:00:00'
         |###   @4=2.5
         |###   @6=100""".stripMargin)
    assert(evs.map(_.pk) == List(5L))
  }

  test("blocks for other tables are skipped wholesale") {
    val evs = parse(
      s"""INSERT INTO `enexory`.`other_table`
         |SET
         |  @1=99
         |  @3='2024-01-01 00:00:00'
         |  @4=1
         |  @6=100
         |INSERT INTO $T
         |SET
         |  @1=1
         |  @3='2024-01-01 00:00:00'
         |  @4=1
         |  @6=100""".stripMargin)
    assert(evs.map(_.pk) == List(1L))
  }

  test("fail-fast: pk=0, empty dt, ts=0 on I/U, unparseable value") {
    def fails(body: String): Boolean =
      try { parse(body).toList; false }
      catch { case _: BinlogParser.BinlogParseException => true }
    assert(fails(s"INSERT INTO $T\nSET\n@1=0\n@3='2024-01-01 00:00:00'\n@4=1\n@6=100"))
    assert(fails(s"INSERT INTO $T\nSET\n@1=1\n@4=1\n@6=100"))
    assert(fails(s"INSERT INTO $T\nSET\n@1=1\n@3='2024-01-01 00:00:00'\n@4=1\n@6=0"))
    assert(fails(s"UPDATE $T\nSET\n@1=1\n@3='2024-01-01 00:00:00'\n@4=1"))
    assert(fails(s"INSERT INTO $T\nSET\n@1=1\n@3='2024-01-01 00:00:00'\n@4=abc\n@6=100"))
    // DELETE without ts is legal
    assert(!fails(s"DELETE FROM $T\nWHERE\n@1=1\n@3='2024-01-01 00:00:00'"))
  }

  test("seqStart offsets file windows") {
    val evs = BinlogParser.parseText(
      s"DELETE FROM $T\nWHERE\n@1=1\n@3='2024-01-01 00:00:00'",
      seqStart = 1L << 32).toList
    assert(evs.head.seq == (1L << 32))
  }

  test("tsToUtc2 epoch edge cases") {
    assert(BinlogParser.tsToUtc2(0L) == "1970-01-01 02:00:00")
    // DST-less fixed offset: always exactly +2h
    assert(BinlogParser.tsToUtc2(1719792000L) == "2024-07-01 02:00:00")
  }
}
