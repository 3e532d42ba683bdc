package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[TopKByScoreAgg]] must be output-identical to the window top-k it
  * replaces (row_number over score desc, id asc), including ties and
  * k larger than the group. */
class TopKAggSpec extends AnyFunSuite with SparkSpec {

  test("aggregate equals window top-k on random data with ties") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(42)
    // Scores drawn from a small set so ties are common; a few groups
    // smaller than k exercise the short-group path.
    val rows = (0 until 5000).map { i =>
      val qid = (i % 37).toLong
      val id = rnd.nextInt(100000).toLong
      val score = rnd.nextInt(50) / 10.0
      (qid, id, score)
    } ++ Seq((99L, 1L, 2.0), (99L, 2L, 2.0)) // group of 2 with a tie
    val df = rows.toDF("qid", "id", "score")
      .dropDuplicates("qid", "id")
    val k = 7
    val viaAgg = df.groupBy(col("qid"))
      .agg(GraftFunctions.topKByScore(col("score"), col("id"), k)
        .as("tk"))
      .select(col("qid"), posexplode(col("tk")))
      .select(col("qid"), col("col.id").as("id"),
        col("col.score").as("score"),
        (col("pos") + 1).cast("int").as("rank"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("id").asc)
    val viaWindow = df
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("qid", "id", "score", "rank")
    val a = viaAgg.orderBy("qid", "rank").collect().toSeq
    val b = viaWindow.orderBy("qid", "rank").collect().toSeq
    assert(a == b)
  }
}
