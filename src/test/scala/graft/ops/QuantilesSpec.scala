package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Quantiles.quantileDisc]] against a sequential model: the value at
  * 1-based rank max(1, ceil(p*n)) of the sorted non-null doubles —
  * the rule measured against DuckDB v1.0.0 quantile_disc. */
class QuantilesSpec extends SparkSpec {

  import spark.implicits._

  private def model(values: Seq[Double], p: Double): Double = {
    val sorted = values.sorted
    val r = math.min(sorted.size.toLong,
      math.max(1L, math.ceil(p * sorted.size).toLong))
    sorted((r - 1).toInt)
  }

  private def check(values: Seq[Double], probs: Seq[Double],
      buckets: Int = 64, collectCap: Int = 8): Unit = {
    val df = values.toDF("x")
    val got = Quantiles
      .quantileDisc(df, "x", probs, buckets, collectCap)
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(got.map(_._1).toSeq == probs)
    for (((p, v), i) <- got.zipWithIndex)
      assert(v == model(values, p),
        s"p=$p got $v want ${model(values, p)} (probs[$i])")
  }

  private val probs = Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)

  test("uniform-ish values, tiny collectCap forces histogram path") {
    val rnd = new scala.util.Random(7)
    check(Seq.fill(500)(rnd.nextDouble() * 1000 - 500), probs)
  }

  test("duplicate-heavy column short-circuits on min == max ranges") {
    val rnd = new scala.util.Random(11)
    // 90% of mass on three values — the skewed-bucket recursion must
    // bottom out on identical-value ranges, not loop.
    val vs = Seq.fill(400)(Seq(1.0, 1.0, 1.0, 2.5, 2.5, 2.5, 2.5,
      2.5, 3.0, rnd.nextDouble() * 10)(rnd.nextInt(10)))
    check(vs, probs, buckets = 4, collectCap = 4)
  }

  test("all values identical") {
    check(Seq.fill(50)(42.0), probs)
  }

  test("single row / two rows / exact-integer rank boundaries") {
    check(Seq(7.0), probs)
    check(Seq(7.0, -1.0), probs)
    // p*n landing exactly on integers (the ceil boundary):
    check((1 to 10).map(_.toDouble), Seq(0.1, 0.2, 0.3, 0.5, 0.9))
  }

  test("nulls are ignored; negative and extreme magnitudes") {
    val df = Seq[java.lang.Double](null, 3.0, null, 1.0, 2.0,
      -1e300, 1e300, null).toDF("x")
    val got = Quantiles.quantileDisc(df, "x", Seq(0.5), 16, 2)
      .head().getDouble(1)
    assert(got == model(Seq(3.0, 1.0, 2.0, -1e300, 1e300), 0.5))
  }

  test("NaN is excluded like NULL (and cannot wedge the recursion)") {
    // More rows than collectCap with a NaN present: before the
    // exclusion, NaN infected max() -> hi = NaN -> every width guard
    // false -> unbounded recursion.
    val vs = (1 to 200).map(_.toDouble)
    val df = (vs.map(java.lang.Double.valueOf) :+
      java.lang.Double.valueOf(Double.NaN)).toDF("x")
    val got = Quantiles
      .quantileDisc(df, "x", Seq(0.5, 1.0), buckets = 8,
        collectCap = 4)
      .collect().map(_.getDouble(1)).toSeq
    assert(got == Seq(model(vs, 0.5), model(vs, 1.0)))
  }

  test("degenerate double range resolves via bounded value counts") {
    // Two adjacent doubles, duplicated past collectCap: the range
    // cannot be subdivided (width underflows), so the per-value
    // count walk must answer — with Long-rank-safe arithmetic.
    val a = 1.0
    val b = math.nextUp(a)
    val vs = Seq.fill(40)(a) ++ Seq.fill(60)(b)
    check(vs.toList, Seq(0.1, 0.4, 0.41, 0.9, 1.0), buckets = 8,
      collectCap = 4)
    // Full-double-span range: hi - lo overflows to infinity but the
    // overflow-free width keeps the histogram subdividing.
    val wide = Seq(-1.7e308, -1.0, 0.0, 1.0, 1.7e308) ++
      (1 to 100).map(_.toDouble)
    check(wide.toList, Seq(0.1, 0.5, 0.99), buckets = 8,
      collectCap = 4)
  }

  test("infinities are ordered normally and cannot wedge the " +
      "histogram") {
    // Before the explicit ±Inf handling, an infinite endpoint made
    // widthOf infinite, every row landed in bucket 0, and
    // selectSkewed recursed forever with identical state. DuckDB
    // orders infinities like any value, so the model includes them.
    val vs = Seq(Double.NegativeInfinity, Double.NegativeInfinity) ++
      (1 to 200).map(_.toDouble) ++
      Seq(Double.PositiveInfinity, Double.PositiveInfinity,
        Double.PositiveInfinity)
    check(vs, Seq(0.005, 0.01, 0.5, 0.985, 0.99, 1.0), buckets = 8,
      collectCap = 4)
  }

  test("all-infinite input answers from the stats pass alone") {
    check(Seq(Double.NegativeInfinity, Double.PositiveInfinity,
      Double.PositiveInfinity), Seq(0.1, 0.4, 0.9))
    check(Seq.fill(10)(Double.PositiveInfinity), Seq(0.5, 1.0))
  }

  test("infinities mixed with NaN/null: NaN excluded, Inf ranked") {
    val df = Seq[java.lang.Double](null, Double.NaN,
      Double.NegativeInfinity, 5.0, 1.0, Double.PositiveInfinity)
      .toDF("x")
    val keep = Seq(Double.NegativeInfinity, 5.0, 1.0,
      Double.PositiveInfinity)
    val got = Quantiles
      .quantileDisc(df, "x", Seq(0.25, 0.5, 0.75, 1.0), 8, 2)
      .collect().map(_.getDouble(1)).toSeq
    assert(got == Seq(0.25, 0.5, 0.75, 1.0).map(model(keep, _)))
  }

  test("empty input yields an empty frame with the contract schema") {
    val df = Seq.empty[Double].toDF("x")
    val out = Quantiles.quantileDisc(df, "x", Seq(0.5))
    assert(out.columns.toSeq == Seq("prob", "value"))
    assert(out.count() == 0)
  }

  test("probabilities outside (0, 1] are rejected") {
    val df = Seq(1.0).toDF("x")
    intercept[IllegalArgumentException] {
      Quantiles.quantileDisc(df, "x", Seq(0.0))
    }
    intercept[IllegalArgumentException] {
      Quantiles.quantileDisc(df, "x", Seq(1.5))
    }
  }

  test("duplicate ranks across probs resolve to one computation") {
    // p=0.999 and p=1.0 share rank n at small n; both must answer.
    check((1 to 5).map(_.toDouble), Seq(0.999, 1.0))
  }

  test("randomized model check across bucket/cap configurations") {
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 5) {
      val n = 1 + rnd.nextInt(300)
      val vs = Seq.fill(n)(math.floor(rnd.nextDouble() * 40) / 4.0)
      check(vs, probs, buckets = 2 + rnd.nextInt(30),
        collectCap = 1 + rnd.nextInt(20))
    }
  }
}
