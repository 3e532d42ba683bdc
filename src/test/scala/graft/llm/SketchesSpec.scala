package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Count-min sketch: counter table bounded by depth x width; the
  * estimate dominates the exact count and is exact when no bucket
  * collides. */
class SketchesSpec extends SparkSpec {

  import spark.implicits._

  private val terms = Seq.fill(10)("alpha") ++ Seq.fill(7)("beta") ++
    Seq.fill(3)("gamma") ++ Seq("delta")

  test("estimate >= exact for every term; bounded counter table") {
    val df = terms.toDF("term")
    val counters = Sketches.cmsCounters(df, depth = 4, width = 64)
    assert(counters.count() <= 4L * 64)
    assert(counters.select("row").distinct().count() == 4)
    val exact = df.groupBy("term").agg(count(lit(1)).as("cnt"))
    val est = Sketches.cmsEstimate(counters, exact.select("term"),
      depth = 4, width = 64)
      .join(exact, "term")
      .select("term", "cms_estimate", "cnt")
      .as[(String, Long, Long)].collect()
    assert(est.length == 4)
    est.foreach { case (t, e, c) =>
      assert(e >= c, s"$t: estimate $e < exact $c")
    }
  }

  test("hll registers are bounded and the estimate tracks the truth") {
    val rnd = new scala.util.Random(17)
    // ~600 distinct terms, heavy repetition: registers must not care.
    val vocab = (0 until 600).map(i => s"tok${i}_${rnd.nextInt(9)}")
    val occurrences = (0 until 5000).map(_ => vocab(rnd.nextInt(vocab.size)))
    val df = occurrences.toDF("term")
    val exact = df.distinct().count().toDouble
    val regs = Sketches.hllRegisters(df, p = 8)
    assert(regs.count() <= 256)
    val est = Sketches.hllEstimate(regs, p = 8)
    val err = math.abs(est - exact) / exact
    assert(err < 0.25, s"estimate $est vs exact $exact (err $err)")
    // Occurrences and distinct terms produce identical registers.
    val regsD = Sketches.hllRegisters(df.distinct(), p = 8)
    assert(regs.orderBy("bucket").collect().toSeq
      == regsD.orderBy("bucket").collect().toSeq)
  }

  test("wide sketch with few terms estimates exactly (no collisions)") {
    val df = terms.toDF("term")
    val counters = Sketches.cmsCounters(df, depth = 4, width = 1024)
    val exact = df.groupBy("term").agg(count(lit(1)).as("cnt"))
    val est = Sketches.cmsEstimate(counters, exact.select("term"),
      depth = 4, width = 1024)
      .join(exact, "term")
      .where(col("cms_estimate") =!= col("cnt"))
    assert(est.count() == 0)
  }
}
