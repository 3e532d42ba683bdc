package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bloom aggregate: no false negatives across partition merges;
  * false-positive rate near theory; bitmap exactly reproducible. */
class PolyBloomSpec extends SparkSpec {

  import spark.implicits._

  test("no false negatives; FP rate near theory") {
    GraftFunctions.register(spark)
    val m = 4096; val k = 3
    val build = (0L until 400L).map(_ * 7 + 1)
    val bloom = build.toDF("key").repartition(8)
      .agg(GraftFunctions.polyBloom(col("key"), m, k).as("bm"))
    val probes = (0L until 4000L).toDF("key")
    val out = probes.crossJoin(broadcast(bloom))
      .withColumn("hit",
        PolyBloom.mightContain(col("bm"), col("key"), m, k))
      .select("key", "hit").as[(Long, Boolean)].collect()
    val buildSet = build.toSet
    // every member must hit
    out.filter(r => buildSet(r._1)).foreach { case (key, hit) =>
      assert(hit, s"false negative for $key")
    }
    // FP rate ~ (1 - e^{-kn/m})^k ~ 6.4% for n=400, m=4096, k=3
    val nonMembers = out.filterNot(r => buildSet(r._1))
    val fpRate = nonMembers.count(_._2).toDouble / nonMembers.length
    assert(fpRate < 0.15, s"fp rate $fpRate")
  }

  test("bitmap equals a single-partition build (merge is exact OR)") {
    GraftFunctions.register(spark)
    val keys = (0L until 1000L).map(_ * 13 + 5)
    def bitmap(parts: Int): Seq[Long] =
      keys.toDF("key").repartition(parts)
        .agg(GraftFunctions.polyBloom(col("key"), 1024, 3).as("bm"))
        .as[Seq[Long]].collect().head
    assert(bitmap(1) == bitmap(16))
  }
}
