package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The bucket rewrite must be exactly equivalent to the naive theta
  * join, for every alignment of ranges against bucket boundaries. */
class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  test("bucketed result equals the naive theta join") {
    val rnd = new scala.util.Random(5)
    val points = (0 until 400)
      .map(i => (i.toLong, rnd.nextInt(1000).toLong))
      .toDF("pid", "x")
    val ranges = (0 until 40).map { i =>
      val lo = rnd.nextInt(950).toLong
      (i.toLong, lo, lo + 1 + rnd.nextInt(60))
    }.toDF("rid", "lo", "hi")

    for (bucket <- Seq(1L, 7L, 64L, 1000L)) {
      val fast = RangeJoin
        .pointInRange(points, "x", ranges, "lo", "hi", bucket)
        .select("pid", "rid").as[(Long, Long)].collect().toSet
      val naive = points.join(ranges,
          col("x") >= col("lo") && col("x") < col("hi"))
        .select("pid", "rid").as[(Long, Long)].collect().toSet
      assert(fast == naive, s"bucket=$bucket")
    }
  }

  test("boundary semantics: lo inclusive, hi exclusive") {
    val points = Seq((1L, 10L), (2L, 19L), (3L, 20L), (4L, 9L))
      .toDF("pid", "x")
    val ranges = Seq((7L, 10L, 20L)).toDF("rid", "lo", "hi")
    val hit = RangeJoin
      .pointInRange(points, "x", ranges, "lo", "hi", bucket = 5L)
      .select("pid").as[Long].collect().toSet
    assert(hit == Set(1L, 2L))
  }
}
