package graft.io

import java.nio.file.Files

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Co-located joins via bucketing: when both sides are bucketed by the
  * join key, the join runs with ZERO shuffle exchanges — the layout IS
  * the partitioning. This is the lake-design answer to "a repeated big
  * join shuffles 100 TB every run": pay the shuffle once at write
  * time. */
class BucketedJoinSpec extends SparkSpec {

  import spark.implicits._

  // AQE hides subtrees inside leaf QueryStageExec nodes (including
  // the Spark 4 ResultQueryStage at the root) — walk through them.
  private def countShuffles(p: SparkPlan): Int = p match {
    case a: AdaptiveSparkPlanExec => countShuffles(a.executedPlan)
    case q: QueryStageExec => countShuffles(q.plan)
    case e: ShuffleExchangeExec =>
      1 + e.children.map(countShuffles).sum
    case other => other.children.map(countShuffles).sum
  }

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect()
    countShuffles(df.queryExecution.executedPlan)
  }

  test("bucketed-by-key tables join without any shuffle") {
    // external table paths (warehouse.dir is a static conf; explicit
    // paths keep the filesystem location under our tmp dir)
    val wh = Files.createTempDirectory("graft_wh").toString
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lines")

    val orders = (1 to 2000)
      .map(i => (i.toLong, s"c${i % 97}", i * 1.5))
      .toDF("okey", "cust", "total")
    val lines = (1 to 8000)
      .map(i => ((i % 2000 + 1).toLong, i, i * 0.25))
      .toDF("okey", "line", "amount")

    orders.write.bucketBy(8, "okey").sortBy("okey")
      .option("path", s"$wh/b_orders").saveAsTable("b_orders")
    lines.write.bucketBy(8, "okey").sortBy("okey")
      .option("path", s"$wh/b_lines").saveAsTable("b_lines")

    val joined = spark.table("b_orders")
      .join(spark.table("b_lines"), "okey")
      .groupBy("okey").agg(sum($"amount").as("amt"),
        count(lit(1)).as("n"))

    // control: the same join over plain (unbucketed) frames shuffles
    val plain = orders.join(lines, "okey")
      .groupBy("okey").agg(sum($"amount").as("amt"),
        count(lit(1)).as("n"))
    // disable broadcast so the strategy choice is about partitioning,
    // not size
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      assert(shuffles(joined) == 0,
        "bucketed join must be exchange-free")
      assert(shuffles(plain) > 0, "control join should shuffle")
      assert(joined.count() == 2000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lines")
    }
  }
}
