package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewAggSpec extends SparkSpec {

  import spark.implicits._

  test("salted aggregation equals direct groupBy on a skewed key") {
    // 90% of rows share one key — the skew scenario
    val df = (1 to 20000).map { i =>
      val k = if (i % 10 == 0) s"k${i % 7}" else "hot"
      (k, i.toDouble, i.toLong)
    }.toDF("k", "v", "n")

    val direct = df.groupBy("k").agg(
      count(lit(1)).as("cnt"), sum($"v").as("s"),
      min($"n").as("mn"), max($"n").as("mx"),
      avg($"v").as("a")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap

    val salted = SkewAgg.saltedAgg(df, Seq("k"), Seq(
      SkewAgg.count("cnt"), SkewAgg.sum("v", "s"),
      SkewAgg.min("n", "mn"), SkewAgg.max("n", "mx"),
      SkewAgg.avg("v", "a")), buckets = 16).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap

    assert(salted.keySet == direct.keySet)
    salted.foreach { case (k, (cnt, s, mn, mx, a)) =>
      val (dc, ds, dmn, dmx, da) = direct(k)
      assert(cnt == dc && mn == dmn && mx == dmx)
      assert(math.abs(s - ds) < 1e-6 * math.abs(ds))
      assert(math.abs(a - da) < 1e-9 * math.abs(da))
    }
  }

  test("approximate sketches track exact answers (HLL, quantiles)") {
    val df = (1 to 50000).map(i => (i % 4231, i.toDouble))
      .toDF("k", "v")
    val exact = df.select(countDistinct($"k")).head().getLong(0)
    val approx = df.select(approx_count_distinct($"k", 0.02))
      .head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.06,
      s"HLL $approx vs exact $exact")
    val q = df.stat.approxQuantile("v", Array(0.5), 0.01).head
    assert(math.abs(q - 25000.0) < 25000 * 0.05)
  }
}
