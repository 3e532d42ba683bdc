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

  test("date_time-only filter prunes the lake to the implied days") {
    import org.apache.spark.sql.functions.col
    import graft.io.Lake
    GraftExtensions.install(spark)
    val lakeDir = java.nio.file.Files
      .createTempDirectory("graft_prune_lake").toString + "/lake"
    import spark.implicits._
    val rows = for (d <- 1 to 10; i <- 1 to 5) yield {
      val day = f"2024-05-$d%02d"
      (d * 100L + i, f"$day 01:00:$i%02d", i.toDouble,
        s"$day 02:00:00", day)
    }
    Lake.write(rows.toDF("id", "date_time", "value", "ts", "day"),
      lakeDir)
    val df = Lake.read(spark, lakeDir)
      .where(col("date_time") >= "2024-05-08 00:00:00")
    assert(df.count() == 15)
    val scan = df.queryExecution.sparkPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScanExec leaf in the plan"))
    // The rule must derive a `day` partition filter from the pure
    // date_time predicate, and the scan must actually list only the
    // implied 3 of 10 day directories.
    assert(scan.partitionFilters.exists(_.toString.contains("day")),
      s"DayPruning derived no partition filter: ${scan.partitionFilters}")
    assert(scan.selectedPartitions.partitionCount == 3,
      s"expected 3 of 10 day partitions scanned, got " +
        s"${scan.selectedPartitions.partitionCount}")
  }

  test("ANN plans are window-free: in-row argmax/argmin assignment, " +
      "heap-aggregate top-k, no centroid or codebook join on the " +
      "corpus side") {
    // Round 8 removed the last ranking Windows: per-query top-k (and
    // the ADC shortlist) are now the top_k_by_score aggregate, whose
    // map-side partial heaps consume the scored candidate stream in
    // the stage that produces it — a window would shuffle every
    // candidate row through a per-query sort. Assignment stays the
    // in-row expressions pinned since round 6.
    for (n <- Seq("s02_ann_lsh", "s03_ann_ivf", "s06_ann_pq",
        "s07_ann_ivfpq", "s01_ann_bruteforce")) {
      val p = plan(n)
      if (n == "s03_ann_ivf" || n == "s07_ann_ivfpq")
        assert(p.contains("nearest_centroids"),
          s"$n lost the in-row cell assignment expression")
      if (n == "s06_ann_pq" || n == "s07_ann_ivfpq")
        assert(p.contains("pq_codes"),
          s"$n lost the in-row code assignment expression")
      assert(p.contains("top_k_by_score"),
        s"$n lost the heap-aggregate top-k")
      val windows = "\\bWindow\\b".r.findAllIn(p).length
      assert(windows == 0,
        s"$n expected 0 Window nodes, got $windows")
      if (n != "s01_ann_bruteforce")
        assert(!p.contains("BroadcastNestedLoopJoin"),
          s"$n still crossJoins centroids for assignment")
    }
  }

  test("late-round-6 shapes: d12 in-row assignment, t17 top-k " +
      "short-circuit, q15 join-free codegen, w10 non-cartesian " +
      "interval join") {
    // d12: cluster assignment is the in-row expression (no
    // crossJoin-with-centroids), candidate generation a sort-merge
    // self-join — the same posture pinned for the ANN family.
    val d12 = plan("d12_semantic_dedup")
    assert(d12.contains("nearest_centroids"),
      "d12 lost the in-row cluster assignment")
    assert(d12.contains("SortMergeJoin"),
      "d12 intra-cluster self-join is not sort-merge")
    assert(!d12.contains("BroadcastNestedLoopJoin"),
      "d12 crossJoins for assignment")
    // d19: the probed variant keeps the SAME posture — the two-level
    // assignment is the in-row nearest_centroid_probed expression
    // (coarse ranking + probed fine scan inside codegen; no coarse
    // join, no window, no extra exchange vs d12).
    val d19 = plan("d19_semantic_dedup_probed")
    assert(d19.contains("nearest_centroid_probed"),
      "d19 lost the in-row probed assignment expression")
    assert(!d19.contains("nearest_centroids("),
      "d19 fell back to the exact assignment expression")
    assert(d19.contains("SortMergeJoin"),
      "d19 intra-cluster self-join is not sort-merge")
    assert(!d19.contains("BroadcastNestedLoopJoin"),
      "d19 crossJoins for assignment")
    assert(!"\\bWindow\\b".r.findAllIn(d19).hasNext,
      "d19 grew a Window node")
    // t17: the global top-k must short-circuit, the df/stats sides
    // must broadcast (never shuffle the postings against a 5-row df).
    // d21: the benchmark gram set broadcasts (the corpus gram stream
    // must cross NO exchange for the probe — one corpus read, no
    // corpus shuffle) and the rollup has no window.
    val d21 = plan("d21_decontaminate")
    assert(d21.contains("BroadcastHashJoin"),
      s"d21 benchmark side does not broadcast:\n$d21")
    assert(!d21.contains("Window"), "d21 grew a Window")
    val t17 = plan("t17_bm25")
    assert(t17.contains("TakeOrderedAndProject"),
      s"t17 top-k fell back to a full sort")
    assert(t17.contains("BroadcastHashJoin") ||
      t17.contains("BroadcastNestedLoopJoin"),
      "t17 df/corpus-stats sides do not broadcast")
    // q15: pure per-row arithmetic — no join, no window, no
    // aggregation; the only exchange is the output-order range
    // partitioning.
    val q15 = plan("q15_zorder_key")
    assert(!q15.contains("Join") && !q15.contains("Window") &&
      !q15.contains("HashAggregate"),
      s"q15 grew a shuffle-bearing operator:\n$q15")
    // t18: the scoring join is a real hash/merge join on the term key
    // (never nested-loop over the vocabulary) and there is no Window —
    // the per-doc mean is a hash aggregation.
    val t18 = plan("t18_surprisal")
    assert(t18.contains("SortMergeJoin") ||
      t18.contains("ShuffledHashJoin") ||
      t18.contains("BroadcastHashJoin"),
      s"t18 frequency join degenerated:\n$t18")
    assert(!t18.contains("Window"), "t18 grew a Window")
    // w10: the interval join keys on user_id (a real equi-join with a
    // range residual), never a cartesian/nested-loop; the event_type
    // filters reach the scans.
    val w10 = plan("w10_interval_join")
    assert(w10.contains("SortMergeJoin") ||
      w10.contains("ShuffledHashJoin") ||
      w10.contains("BroadcastHashJoin"),
      s"w10 interval join lost its equi-join key:\n$w10")
    assert(w10.contains("PushedFilters") && w10.contains("event_type"),
      "w10 event_type filters not pushed to the scan")
  }

  test("capped dedup paths: sort-merge candidate joins survive the " +
      "occupancy re-key; no window, no nested-loop join") {
    // The maxBucket machinery adds one narrow count-by-bucket
    // aggregation and a bucket-keyed join — it must NOT change the
    // corpus-side join posture (the pair self-join stays sort-merge;
    // nothing nested-loops; no window appears). The in-row signature
    // expressions survive in both.
    val d22 = plan("d22_embedding_dups_capped")
    assert(d22.contains("hyperplane_sig"),
      "d22 lost the in-row signature expression")
    assert(d22.contains("SortMergeJoin"),
      "d22 candidate self-join is not sort-merge")
    assert(!d22.contains("BroadcastNestedLoopJoin"),
      s"d22 grew a nested-loop join:\n$d22")
    assert(!"\\bWindow\\b".r.findAllIn(d22).hasNext,
      "d22 grew a Window node")
    val d23 = plan("d23_minhash_pairs_capped")
    assert(d23.contains("SortMergeJoin"),
      "d23 band self-join is not sort-merge")
    assert(!d23.contains("BroadcastNestedLoopJoin"),
      s"d23 grew a nested-loop join:\n$d23")
    assert(!"\\bWindow\\b".r.findAllIn(d23).hasNext,
      "d23 grew a Window node")
    // d27 consumes d23's chain through the greedy survivor anti-join:
    // same posture pins, plus the pair list must reduce to distinct
    // losers (an aggregate) and reach the corpus as an anti-join —
    // never a materialized+sorted pair set.
    val d27 = plan("d27_minhash_survivors_capped")
    assert(d27.contains("SortMergeJoin"),
      "d27 band self-join is not sort-merge")
    assert(!d27.contains("BroadcastNestedLoopJoin"),
      s"d27 grew a nested-loop join:\n$d27")
    assert(!"\\bWindow\\b".r.findAllIn(d27).hasNext,
      "d27 grew a Window node")
    assert(d27.contains("LeftAnti"),
      s"d27 lost the survivor anti-join:\n$d27")
    // d28 (estimate-only): same posture, and the pair stream must not
    // carry the gram-key arrays — no `sh` columns past the signature
    // projection (the row-width win is the operator's reason to
    // exist).
    val d28 = plan("d28_minhash_survivors_estimated")
    assert(d28.contains("SortMergeJoin"),
      "d28 band self-join is not sort-merge")
    assert(!d28.contains("BroadcastNestedLoopJoin"),
      s"d28 grew a nested-loop join:\n$d28")
    assert(!"\\bWindow\\b".r.findAllIn(d28).hasNext,
      "d28 grew a Window node")
    assert(d28.contains("LeftAnti"),
      s"d28 lost the survivor anti-join:\n$d28")
    assert(!d28.contains("sh_a") && !d28.contains("sh_b"),
      s"d28's pair stream carries gram arrays:\n$d28")
  }

  test("t20: no corpus-scale single-partition GlobalLimit — the " +
      "quantile threshold is histogram selection, not sort+limit") {
    // The former surprisalKeepThreshold plan was orderBy(msr)
    // .limit(k).agg(max) with k ≈ 0.9·|sample|: a full sort plus a
    // one-task GlobalLimit over ~13% of the corpus (at 1B docs,
    // ~130M rows through a single executor). The threshold now comes
    // from Quantiles.quantileDisc (bounded histogram scans during
    // construction) and enters the plan as a broadcast literal — the
    // final plan must carry no GlobalLimit at all.
    val p = plan("t20_curation_filtered")
    assert(!p.contains("GlobalLimit"),
      s"t20 regrew a global limit funnel:\n$p")
    assert(!p.contains("TakeOrderedAndProject"),
      s"t20 regrew a sort+limit threshold:\n$p")
    // t19 rides the same quantile threshold since the fixed-cutoff
    // degeneracy fix — same funnel pins.
    val p19 = plan("t19_curation_semantic")
    assert(!p19.contains("GlobalLimit"),
      s"t19 regrew a global limit funnel:\n$p19")
    assert(!p19.contains("TakeOrderedAndProject"),
      s"t19 regrew a sort+limit threshold:\n$p19")
  }

  test("t34: winnowing is one narrow fused pass — no join, no " +
      "window, no aggregate anywhere in the plan") {
    val p = plan("t34_winnow_fingerprints")
    assert(!p.contains("Join"), s"winnow plan grew a join:\n$p")
    assert(!p.contains("Window"), s"winnow plan grew a window:\n$p")
    assert(!p.contains("HashAggregate"),
      s"winnow plan grew an aggregate:\n$p")
    assert(p.contains("winnow_fingerprints"),
      "native winnow expression missing from the plan")
  }

  test("t39: the Gopher repetition table is one narrow fused pass — " +
      "no join, no window, no aggregate anywhere in the plan") {
    val p = plan("t39_gopher_repetition")
    assert(!p.contains("Join"), s"gopher plan grew a join:\n$p")
    assert(!p.contains("Window"), s"gopher plan grew a window:\n$p")
    assert(!p.contains("HashAggregate"),
      s"gopher plan grew an aggregate:\n$p")
    assert(p.contains("gopher_repetition"),
      "native gopher expression missing from the plan")
  }

  test("t35: the resample's global top-k plans as " +
      "TakeOrderedAndProject, never a corpus sort") {
    val p = plan("t35_dsir_resample")
    assert(p.contains("TakeOrderedAndProject"),
      s"resample fell back to a full sort:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"resample plan grew a cartesian product:\n$p")
  }

  test("no query materializes the plan to an RDD (ScanRDD leaf)") {
    // ExistingRDD / Scan ExistingRDD leaves mean someone called df.rdd
    // mid-plan — the ensureWidth anti-pattern round 1 flagged. Checked
    // over the WHOLE suite except queries whose construction runs a
    // full lifecycle against an on-disk lake (slow, covered by the
    // driver gate itself).
    // w09's construction replays a real streaming query (its "plan" is
    // the memory sink's local scan — nothing to guard).
    val sideEffecting =
      Set("c13_lifecycle", "c15_compaction", "w09_stream_replay")
    // d07/d10's connected-components loop localCheckpoints each round
    // to truncate lineage — a deliberate RDD materialization (bounded:
    // ids only, one row per doc), not the anti-pattern this guards.
    val checkpointed = Set("d07_survivors_cc", "d10_cc_witness")
    for (n <- SparkEntry.queries.keys.toSeq.sorted
        if !sideEffecting(n) && !checkpointed(n)) {
      val p = plan(n)
      assert(!p.contains("Scan ExistingRDD"),
        s"$n converts the plan to an RDD")
      assert(!p.contains("CartesianProduct"),
        s"$n plans an unbroadcast cartesian product")
    }
  }
}
