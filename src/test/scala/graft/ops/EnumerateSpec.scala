package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EnumerateSpec extends SparkSpec {

  import spark.implicits._

  test("positions are the contiguous global order, no global window") {
    val df = (1L to 1000L).toDF("id")
      .withColumn("key", pmod(col("id") * 7919L, lit(104729L)))
    val out = Enumerate.withPosition(df, "pos",
      Enumerate.rangeBucket(col("key"), 104729L, 8),
      col("key"), col("id"))
    val rows = out.select("key", "id", "pos")
      .as[(Long, Long, Long)].collect().sortBy(_._3)
    // contiguous 1..N
    assert(rows.map(_._3).toSeq == (1L to 1000L))
    // and in (key, id) order
    assert(rows.map(r => (r._1, r._2)).toSeq ==
      rows.map(r => (r._1, r._2)).sortBy(identity).toSeq)
    // the plan contains no single-partition global window: every
    // window has a partition spec
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window [")
      || !plan.matches("(?s).*Window \\[[^\\]]*\\], \\[\\].*"),
      "global (unpartitioned) window found")
  }

  test("positions are identical across repeated evaluations") {
    // The 10x fixture caught repartitionByRange boundaries varying
    // between the counts job and the numbering job (sample seed is
    // per-job); deterministic bucketing must yield the same positions
    // every time, matching the naive single-window ground truth.
    val df = (1L to 5000L).toDF("id")
      .withColumn("key", pmod(col("id") * 2654435761L,
        lit(1000000007L)))
    def positions() = Enumerate.withPosition(df, "pos",
      Enumerate.rangeBucket(col("key"), 1000000007L, 16),
      col("key"), col("id"))
      .select("id", "pos").as[(Long, Long)].collect().toMap
    val first = positions()
    assert(positions() == first)
    val naive = df.select(col("id"), col("key"))
      .as[(Long, Long)].collect()
      .sortBy { case (id, key) => (key, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    assert(first == naive)
  }

  test("a null bucket key fails fast with the contract error") {
    // Pre-fix, a null bucket silently grouped into a null _bkt whose
    // getLong(0) threw a bare NullPointerException (or rows took null
    // positions) — the contract must surface instead.
    val df = Seq(Some(1L), Some(2L), None).toDF("key")
    val e = intercept[IllegalArgumentException] {
      Enumerate.withPosition(df, "pos", col("key"), col("key")).count()
    }
    assert(e.getMessage.contains("NULL"), e.getMessage)
    assert(e.getMessage.contains("1 row"), e.getMessage)
  }

  test("more buckets than rows still enumerates correctly") {
    val df = (1L to 5L).toDF("id")
    val out = Enumerate.withPosition(df, "pos",
      Enumerate.rangeBucket(col("id"), 6L, 16), col("id"))
    assert(out.select("pos").as[Long].collect().sorted.toSeq ==
      (1L to 5L))
  }
}
