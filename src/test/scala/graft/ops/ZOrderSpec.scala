package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZOrderSpec extends SparkSpec {

  import spark.implicits._

  test("zValue matches the hand-computed Morton interleave") {
    // x=3 (011), y=5 (101) at 3 bits:
    // pos0(x0)=1, pos1(y0)=2, pos2(x1)=4, pos3(y1)=0, pos4(x2)=0,
    // pos5(y2)=32 -> 39
    val out = Seq((3L, 5L)).toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y"), bits = 3))
      .collect().head.getLong(0)
    assert(out == 39L)
    // zero and identity edges
    val z0 = Seq((0L, 0L)).toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y"), bits = 20))
      .collect().head.getLong(0)
    assert(z0 == 0L)
    // x alone occupies even bits: z(x, 0) spreads x's bits
    val zx = Seq((7L, 0L)).toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y"), bits = 4))
      .collect().head.getLong(0)
    assert(zx == (1L + 4L + 16L)) // 111 -> positions 0, 2, 4
  }

  test("zValue fails fast on negative inputs; nulls still propagate") {
    // A negative key would smear its sign bit across every interleave
    // position and silently destroy the layout's skipping property —
    // the guard must turn that into a loud error.
    val thrown = intercept[Exception] {
      Seq((-1L, 5L)).toDF("x", "y")
        .select(ZOrder.zValue(col("x"), col("y"), bits = 3))
        .collect()
    }
    def rootMessages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ rootMessages(e.getCause))
    assert(rootMessages(thrown).exists(_.contains("non-negative")),
      s"unexpected error: $thrown")
    intercept[Exception] {
      Seq((3L, -5L)).toDF("x", "y")
        .select(ZOrder.zValue(col("x"), col("y"), bits = 3))
        .collect()
    }
    // null-in/null-out unchanged by the guard
    val nullOut = Seq((Some(3L), Option.empty[Long]))
      .toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y"), bits = 3))
      .collect().head
    assert(nullOut.isNullAt(0))
  }

  test("zValueSql restates zValue exactly (random draws)") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(200)((rnd.nextInt(1 << 20).toLong,
      rnd.nextInt(1 << 20).toLong))
    val df = rows.toDF("x", "y")
    df.createOrReplaceTempView("zin")
    val viaSql = spark.sql(
      s"SELECT ${ZOrder.zValueSql("x", "y", 20)} AS z FROM zin")
      .collect().map(_.getLong(0)).toSeq
    val viaCol = df.select(ZOrder.zValue(col("x"), col("y"), 20))
      .collect().map(_.getLong(0)).toSeq
    assert(viaSql == viaCol)
    // model: software interleave
    def model(x: Long, y: Long): Long =
      (0 until 20).foldLeft(0L) { (acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) |
          (((y >> i) & 1L) << (2 * i + 1))
      }
    assert(viaCol == rows.map { case (x, y) => model(x, y) })
  }

  test("z-order layout yields spatially tight partitions that a " +
      "min/max-pruned scan can skip") {
    // 64x64 grid in row-shuffled order: the worst case for locality
    val rnd = new scala.util.Random(3)
    val pts = rnd.shuffle(
      (for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong))
        .toVector)
    val df = pts.toDF("x", "y").repartition(8)
    val parts = 16
    val laid = ZOrder.layout(df, "x", "y", targetFiles = parts, bits = 6)
    // per-output-partition extents = the min/max footer stats a writer
    // would emit per file
    val extents = laid
      .select(col("x"), col("y"), spark_partition_id().as("pid"))
      .groupBy("pid")
      .agg(min("x").as("minx"), max("x").as("maxx"),
        min("y").as("miny"), max("y").as("maxy"))
      .collect()
      .map(r => (r.getAs[Long]("minx"), r.getAs[Long]("maxx"),
        r.getAs[Long]("miny"), r.getAs[Long]("maxy")))
    assert(extents.length == parts)
    // a predicate on x in [16, 23] must prune most partitions by
    // min/max alone; unsorted layout would intersect every one
    val hit = extents.count { case (mnx, mxx, _, _) =>
      mxx >= 16L && mnx <= 23L }
    assert(hit <= parts / 2, s"x-range predicate hit $hit/$parts")
    val hitY = extents.count { case (_, _, mny, mxy) =>
      mxy >= 16L && mny <= 23L }
    assert(hitY <= parts / 2, s"y-range predicate hit $hitY/$parts")
    // mean covered area far below the full domain per partition
    val area = extents.map { case (mnx, mxx, mny, mxy) =>
      (mxx - mnx + 1).toDouble * (mxy - mny + 1).toDouble }.sum / parts
    assert(area < 64.0 * 64.0 / 4.0, s"mean extent area $area")
  }
}
