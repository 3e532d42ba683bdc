package graft.plans

import graft.{SparkEntry, SparkSpec}

/** Physical-plan regression guards for the scale-critical shapes: a
  * query that silently loses filter pushdown, top-k short-circuiting,
  * or broadcast joins still returns correct rows at sf0.01 but
  * becomes a full-scan/full-sort/shuffle catastrophe at 100 TB — only
  * the plan shows it. Uses the smallest fixture; shapes don't depend
  * on SF. */
class PlanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir)
      .queryExecution.executedPlan.toString

  test("q01: filter and projection reach the parquet scan") {
    val p = plan("q01_pushdown_scan")
    assert(p.contains("PushedFilters:"), "no pushed filters in scan")
    assert(p.contains("l_shipdate") && p.contains("l_quantity"))
    // pruned read schema: none of the unused wide columns
    assert(!p.contains("l_comment"), "column pruning lost l_comment")
  }

  test("q04: global top-k plans as TakeOrderedAndProject") {
    val p = plan("q04_topk_orders")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k fell back to a full sort:\n$p")
  }

  test("q03: dimension joins broadcast") {
    val p = plan("q03_join_revenue")
    assert(p.contains("BroadcastHashJoin"),
      "dimension join does not broadcast")
  }

  test("no query materializes the plan to an RDD (ScanRDD leaf)") {
    // ExistingRDD / Scan ExistingRDD leaves mean someone called df.rdd
    // mid-plan — the ensureWidth anti-pattern round 1 flagged.
    for (n <- SparkEntry.benchQueries) {
      val p = plan(n)
      assert(!p.contains("Scan ExistingRDD"),
        s"$n converts the plan to an RDD")
    }
  }
}
