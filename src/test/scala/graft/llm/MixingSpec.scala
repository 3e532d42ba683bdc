package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Oracle-parity property for [[Mixing.keepPortable]] over the id
  * domains the fixtures never reach: negative ids, |id| > 2^33 (the
  * old code overflowed the LCG multiply above ~8.4e9), and the int64
  * extremes. The model below is the DuckDB restatement evaluated in
  * plain Long arithmetic (Java `%` truncates toward zero exactly like
  * DuckDB's `%`), so Spark==model here proves Spark==oracle there.
  * Runs under ANSI mode, where an overflowing multiply would throw
  * instead of silently wrapping.
  */
class MixingSpec extends SparkSpec {

  /** DuckDB-semantics model:
    * `(((id % 2^31) + 2^31) % 2^31 * 1103515245 + 12345) % 2^31 % 1e6
    *  < floor(rate * 1e6)` — every intermediate fits in int64. */
  private def modelKeep(id: Long, rate: Double): Boolean = {
    val m = 2147483648L
    val reduced = ((id % m) + m) % m
    (reduced * 1103515245L + 12345L) % m % 1000000L <
      math.floor(rate * 1000000L).toLong
  }

  private val adversarialIds: Seq[Long] = Seq(
    0L, 1L, -1L, -2L, 42L, -42L,
    2147483647L, 2147483648L, -2147483648L, -2147483649L,
    8400000000L, -8400000000L,            // just below the old overflow edge
    8589934592L, -8589934592L,            // 2^33
    1234567890123456789L, -1234567890123456789L,
    Long.MaxValue, Long.MinValue, Long.MinValue + 1
  ) ++ {
    val rnd = new scala.util.Random(20260812L)
    Seq.fill(200)(rnd.nextLong())
  }

  test("keepPortable matches the DuckDB-semantics model on adversarial " +
      "ids under ANSI mode") {
    val prev = spark.conf.get("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try {
      import spark.implicits._
      val rates = Seq(0.0, 0.2, 0.4, 0.6, 0.8, 1.0)
      val rows = for { id <- adversarialIds; r <- rates } yield (id, r)
      val got = rows.toDF("id", "rate")
        .select(col("id"), col("rate"),
          Mixing.keepPortable(col("id"), col("rate")).as("kept"))
        .collect()
        .map(r => ((r.getLong(0), r.getDouble(1)), r.getBoolean(2)))
        .toMap
      for ((id, r) <- rows)
        assert(got((id, r)) === modelKeep(id, r),
          s"keepPortable($id, $r) diverged from the oracle model")
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }

  test("keepPortable realized rate tracks the nominal rate") {
    import spark.implicits._
    val n = 100000
    val ids = (0 until n).map(_.toLong * 2654435761L) // spread the domain
    val kept = ids.toDF("id")
      .where(Mixing.keepPortable(col("id"), lit(0.3)))
      .count()
    val realized = kept.toDouble / n
    assert(realized > 0.25 && realized < 0.35,
      s"realized rate $realized far from nominal 0.3")
  }
}
