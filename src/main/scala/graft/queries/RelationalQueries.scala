package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Generic relational operator surface over the driver fixtures
  * (scan/filter/project, aggregation, joins, window, sort/limit, set
  * ops, rollup). The reference itself contains almost none of these
  * (SURVEY §2.2) — they come with Spark SQL; each query is written so
  * Catalyst produces the plan we'd want at 100 TB: filters/projections
  * reach the Parquet scan, small dimensions broadcast, aggregates have
  * map-side partials.
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Timestamps leave the engine as 19-char strings (the reference's
    * at-rest convention) — also makes oracle comparison exact. */
  private val DT = "yyyy-MM-dd HH:mm:ss"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // S2/S6: filter + projection, both pushed into the Parquet scan.
    "q01_pushdown_scan" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .where(col("l_shipdate") < lit("1997-01-01")
          && col("l_quantity") > 45)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          date_format(col("l_shipdate"), DT).as("ship_dt"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // TPC-H Q1 shape: the canonical partial-aggregate groupBy.
    "q02_agg_pricing" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .where(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          // Sums/avg of doubles accumulate in DECIMAL so the result
          // is independent of partition order (double addition is not
          // associative — the 10x fixture exposed the drift on q09).
          round(sum(col("l_quantity").cast("decimal(38,6)")), 2)
            .cast("double").as("sum_qty"),
          round(sum(col("l_extendedprice").cast("decimal(38,6)")), 2)
            .cast("double").as("sum_base_price"),
          round(sum((col("l_extendedprice")
            * (lit(1) - col("l_discount"))).cast("decimal(38,6)")), 2)
            .cast("double").as("sum_disc_price"),
          round(sum(col("l_discount").cast("decimal(38,6)"))
            .cast("double") / count(lit(1)), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // Multi-way join with broadcast dims: revenue by nation.
    "q03_join_revenue" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          round(sum((col("l_extendedprice")
            * (lit(1) - col("l_discount"))).cast("decimal(38,6)")), 2)
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // Top-k: global sort + limit (Spark: TakeOrderedAndProject — no
    // full sort materialization).
    "q04_topk_orders" -> ((s, dir) => {
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(25)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          date_format(col("o_orderdate"), DT).as("order_dt"))
    }),

    // Distinct aggregation per group.
    "q05_distinct_custkeys" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          countDistinct(col("o_custkey")).as("n_customers"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("c_mktsegment"))
    }),

    // Ranking + analytic windows: per-customer top-3 orders and the
    // gap to the previous order.
    "q06_window_orders" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      val wd = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .withColumn("rnk", row_number().over(w))
        .withColumn("prev_price", lag(col("o_totalprice"), 1).over(wd))
        .where(col("rnk") <= 3)
        .select(col("o_custkey"), col("rnk"), col("o_orderkey"),
          col("o_totalprice"),
          round(col("o_totalprice") - coalesce(col("prev_price"),
            lit(0.0)), 2).as("delta_prev"))
        .orderBy(col("o_custkey"), col("rnk"))
    }),

    // Anti + semi joins: segment counts of customers with orders but
    // none urgent.
    "q07_anti_semi" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val withOrders = c.join(o.select(col("o_custkey")),
        c("c_custkey") === o("o_custkey"), "left_semi")
      val urgent = o.where(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      withOrders.join(urgent,
          withOrders("c_custkey") === urgent("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_without_urgent"))
        .orderBy(col("c_mktsegment"))
    }),

    // Set ops: union + except over key sets.
    "q08_setops" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val hi = o.where(col("o_totalprice") > 50000)
        .select(col("o_custkey"))
      val urgent = o.where(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      hi.union(urgent).distinct()
        .except(hi.intersect(urgent))
        .orderBy(col("o_custkey"))
    }),

    // Grouping sets (rollup) over the join.
    "q09_rollup_revenue" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .rollup(col("n_name"), col("c_mktsegment"))
        .agg(round(sum(col("o_totalprice").cast("decimal(38,6)")), 2)
            .cast("double").as("total"),
          count(lit(1)).as("n"))
        .orderBy(col("n_name").asc_nulls_first,
          col("c_mktsegment").asc_nulls_first)
    }),

    // SQL frontend: the same engine through spark.sql over temp views,
    // with a correlated EXISTS subquery (TPC-H Q4 shape) — Catalyst
    // decorrelates it into the same semi join the DataFrame API builds.
    "q11_sql_frontend" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_v")
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_v")
      s.sql(
        """SELECT o_orderpriority, count(*) AS order_count
           FROM orders_v o
           WHERE EXISTS (
             SELECT 1 FROM lineitem_v l
             WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 48)
           GROUP BY o_orderpriority
           ORDER BY o_orderpriority""")
    }),

    // Exact order statistics: interpolated percentiles per group (the
    // exact `percentile` aggregate — at 100 TB the drop-in is
    // `percentile_approx`, same plan shape, bounded memory).
    "q12_quantiles" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_orders"),
          round(expr("percentile(o_totalprice, 0.5D)"), 4).as("p50"),
          round(expr("percentile(o_totalprice, 0.95D)"), 4).as("p95"),
          round(min(col("o_totalprice")), 2).as("min_price"),
          round(max(col("o_totalprice")), 2).as("max_price"))
        .orderBy(col("o_orderpriority"))
    }),

    // Interval join via bucket quantization (ops/RangeJoin): lineitems
    // shipped inside 14-day promo windows derived from a deterministic
    // order sample. A raw theta join would be a nested loop; the
    // bucket rewrite makes it an equi join + refine.
    "q13_range_join" -> ((s, dir) => {
      def day(c: org.apache.spark.sql.Column) =
        datediff(c.cast("date"), to_date(lit("1970-01-01")))
          .cast("long")
      val li = t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_quantity"),
        day(col("l_shipdate")).as("ship_day"))
      val win = t(s, dir, "orders")
        .where(col("o_orderkey") % 97 === 0)
        .select(col("o_orderkey").as("window_id"),
          day(col("o_orderdate")).as("lo"))
        .withColumn("hi", col("lo") + 14)
      graft.ops.RangeJoin
        .pointInRange(li, "ship_day", win, "lo", "hi", bucket = 7L)
        .groupBy("window_id")
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_quantity").cast("decimal(38,6)")), 2)
            .cast("double").as("sum_qty"))
        .orderBy("window_id")
    }),

    // Custom Catalyst aggregate: portable bloom filter over the
    // urgent orders' keys — the bitmap words are exact integers, so
    // the sketch STATE hash-gates against the oracle's bit_or
    // restatement. (The scale use: semi-join pushdown — ship the
    // bitmap, prune the probe side before the real join.)
    "b01_bloom_bitmap" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      t(s, dir, "orders")
        .where(col("o_orderpriority") === "1-URGENT")
        .agg(graft.functions.GraftFunctions
          .polyBloom(col("o_orderkey"), 4096, 3).as("bm"))
        .select(posexplode(col("bm")))
        .select(col("pos").as("word_idx"), col("col").as("bits"))
        .orderBy("word_idx")
    }),

    // Bloom probe semantics: no false negatives, bounded false
    // positives — both visible in the (bloom_hit, actual) pairing.
    "b02_bloom_probe" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val urgent = t(s, dir, "orders")
        .where(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey").as("key"))
      val bloom = urgent
        .agg(graft.functions.GraftFunctions
          .polyBloom(col("key"), 4096, 3).as("bm"))
      val probes = t(s, dir, "orders")
        .where(col("o_orderkey") % 51 === 0)
        .select(col("o_orderkey").as("key"))
      probes.crossJoin(broadcast(bloom))
        .withColumn("bloom_hit",
          graft.functions.PolyBloom
            .mightContain(col("bm"), col("key"), 4096, 3))
        .join(urgent.distinct().withColumn("present", lit(1)),
          Seq("key"), "left")
        .select(col("key"), col("bloom_hit"),
          col("present").isNotNull.as("actual"))
        .orderBy("key")
    }),

    // Correlated SCALAR subquery (TPC-H Q2 shape): each customer's
    // cheapest orders. Catalyst decorrelates the per-row subquery into
    // an aggregate + join — the second decorrelation path next to
    // q11's correlated EXISTS.
    "q14_correlated_scalar" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_v14")
      s.sql(
        """SELECT o_custkey, o_orderkey, o_totalprice
           FROM orders_v14 o
           WHERE o_totalprice = (
             SELECT min(o2.o_totalprice) FROM orders_v14 o2
             WHERE o2.o_custkey = o.o_custkey)
           ORDER BY o_custkey, o_orderkey""")
    }),

    // Join strategy contrast: big-big shuffle join (orders x lineitem)
    // with aggregate pushdown below the join via pre-aggregation.
    "q10_preagg_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(round(sum(col("l_extendedprice").cast("decimal(38,6)")),
            2).cast("double").as("order_value"),
          count(lit(1)).as("n_lines"))
      val o = t(s, dir, "orders")
      o.join(li, o("o_orderkey") === li("l_orderkey"))
        .where(col("n_lines") >= 6)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("order_value"), col("n_lines"))
        .orderBy(col("o_orderkey"))
    }),

    // Z-order (Morton) key for the two-dimensional lake layout: the
    // per-row interleave the data-skipping rewrite sorts by
    // (graft.ops.ZOrder.layout; skipping effectiveness measured in
    // ZOrderSpec). Pure bit arithmetic, restated literally in SQL.
    "q15_zorder_key" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_linenumber"),
          graft.ops.ZOrder.zValue(col("l_orderkey"), col("l_partkey"),
            bits = 20).as("z"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // Exact GLOBAL order statistics over the engine's biggest table —
    // the scale complement of q12's per-group percentile (whose
    // value-count buffers are bounded by group size): iterative
    // histogram selection, no global sort, driver state O(buckets).
    "q16_quantile_disc" -> ((s, dir) => {
      graft.ops.Quantiles.quantileDisc(t(s, dir, "lineitem"),
        "l_extendedprice", Seq(0.25, 0.5, 0.75, 0.9, 0.99))
        .orderBy(col("prob"))
    }))

  /** Baked affine coefficients for the bloom oracles (must equal
    * PolyHash.multiplier/offset). */
  private def bloomCf: String = (0 until 3).map(i =>
    s"(${graft.functions.PolyHash.multiplier(i)}, " +
      s"${graft.functions.PolyHash.offset(i)})").mkString(", ")

  val oracles: Map[String, String] = Map(
    "b01_bloom_bitmap" ->
      s"""WITH build AS (SELECT DISTINCT o_orderkey % 1000000007 AS h
           FROM orders WHERE o_orderpriority = '1-URGENT'),
         cf(a, b) AS (SELECT * FROM (VALUES $bloomCf)),
         pos AS (SELECT DISTINCT ((a*h + b) % 1000000007) % 4096 AS p
           FROM build CROSS JOIN cf),
         w AS (SELECT (p // 32)::INTEGER AS word_idx,
             bit_or(1::BIGINT << (p % 32)::INTEGER)::BIGINT AS bits
           FROM pos GROUP BY 1)
         SELECT r.word_idx, coalesce(w.bits, 0)::BIGINT AS bits
         FROM (SELECT unnest(range(128))::INTEGER AS word_idx) r
         LEFT JOIN w USING (word_idx)
         ORDER BY word_idx""",
    "b02_bloom_probe" ->
      s"""WITH build AS (SELECT DISTINCT o_orderkey AS key
           FROM orders WHERE o_orderpriority = '1-URGENT'),
         cf(a, b) AS (SELECT * FROM (VALUES $bloomCf)),
         pos AS (SELECT DISTINCT
             ((a*(key % 1000000007) + b) % 1000000007) % 4096 AS p
           FROM build CROSS JOIN cf),
         probe AS (SELECT o_orderkey AS key FROM orders
           WHERE o_orderkey % 51 = 0),
         pp AS (SELECT key,
             ((a*(key % 1000000007) + b) % 1000000007) % 4096 AS p
           FROM probe CROSS JOIN cf),
         hits AS (SELECT key,
             bool_and(p IN (SELECT p FROM pos)) AS bloom_hit
           FROM pp GROUP BY key)
         SELECT key, bloom_hit,
           (key IN (SELECT key FROM build)) AS actual
         FROM hits ORDER BY key""",
    "q01_pushdown_scan" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
         strftime(l_shipdate, '%Y-%m-%d %H:%M:%S') AS ship_dt
         FROM lineitem
         WHERE l_shipdate < '1997-01-01' AND l_quantity > 45
         ORDER BY l_orderkey, l_linenumber""",
    "q02_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity::DECIMAL(38,6)), 2)::DOUBLE AS sum_qty,
         round(sum(l_extendedprice::DECIMAL(38,6)), 2)::DOUBLE
           AS sum_base_price,
         round(sum((l_extendedprice
           * (1 - l_discount))::DECIMAL(38,6)), 2)::DOUBLE
           AS sum_disc_price,
         round(sum(l_discount::DECIMAL(38,6))::DOUBLE / count(*), 6)
           AS avg_disc,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= '1998-09-02'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q03_join_revenue" ->
      """SELECT r_name, n_name,
         round(sum((l_extendedprice
           * (1 - l_discount))::DECIMAL(38,6)), 2)::DOUBLE AS revenue,
         count(*) AS n_items
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name
         ORDER BY r_name, n_name""",
    "q04_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
         strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS order_dt
         FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC
         LIMIT 25""",
    // The oracle states the range join as the plain theta join the
    // bucket rewrite must be equivalent to.
    "q13_range_join" ->
      """WITH li AS (SELECT l_orderkey, l_quantity,
           date_diff('day', DATE '1970-01-01', l_shipdate::DATE)
             AS ship_day FROM lineitem),
         win AS (SELECT o_orderkey AS window_id,
           date_diff('day', DATE '1970-01-01', o_orderdate::DATE)
             AS lo FROM orders WHERE o_orderkey % 97 = 0)
         SELECT window_id, count(*) AS n_items,
           round(sum(l_quantity::DECIMAL(38,6)), 2)::DOUBLE AS sum_qty
         FROM li JOIN win
         ON ship_day >= lo AND ship_day < lo + 14
         GROUP BY window_id ORDER BY window_id""",
    "q14_correlated_scalar" ->
      """SELECT o_custkey, o_orderkey, o_totalprice
         FROM orders o
         WHERE o_totalprice = (
           SELECT min(o2.o_totalprice) FROM orders o2
           WHERE o2.o_custkey = o.o_custkey)
         ORDER BY o_custkey, o_orderkey""",
    // Morton interleave restated as the identical shift/mask sum.
    "q15_zorder_key" ->
      s"""SELECT l_orderkey, l_partkey, l_linenumber,
         ${graft.ops.ZOrder.zValueSql("l_orderkey", "l_partkey", 20)}
           ::BIGINT AS z
         FROM lineitem
         ORDER BY l_orderkey, l_linenumber""",
    // quantile_disc picks an ELEMENT (rank max(1, ceil(p*n)) of the
    // sorted values) — no arithmetic on values, so the compare is
    // exact, no rounding needed.
    "q16_quantile_disc" ->
      Seq(0.25, 0.5, 0.75, 0.9, 0.99).map(p =>
        s"""SELECT CAST($p AS DOUBLE) AS prob,
           CAST(quantile_disc(l_extendedprice, $p) AS DOUBLE) AS value
           FROM lineitem""").mkString(
        "", " UNION ALL ", " ORDER BY prob"),
    // quantile_cont computes the same p*(n-1) linear interpolation as
    // Spark's exact percentile; 4dp rounding absorbs ulp differences.
    "q12_quantiles" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
         round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
         round(quantile_cont(o_totalprice, 0.95), 4) AS p95,
         round(min(o_totalprice), 2) AS min_price,
         round(max(o_totalprice), 2) AS max_price
         FROM orders GROUP BY o_orderpriority
         ORDER BY o_orderpriority""",
    "q05_distinct_custkeys" ->
      """SELECT c_mktsegment,
         count(DISTINCT o_custkey) AS n_customers,
         count(*) AS n_orders
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q06_window_orders" ->
      """WITH w AS (
           SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk,
             lag(o_totalprice, 1) OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate ASC, o_orderkey ASC) AS prev_price
           FROM orders)
         SELECT o_custkey, rnk, o_orderkey, o_totalprice,
           round(o_totalprice - coalesce(prev_price, 0.0), 2) AS delta_prev
         FROM w WHERE rnk <= 3
         ORDER BY o_custkey, rnk""",
    "q07_anti_semi" ->
      """SELECT c_mktsegment, count(*) AS n_without_urgent
         FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
           AND NOT EXISTS (SELECT 1 FROM orders
             WHERE o_custkey = c_custkey
               AND o_orderpriority = '1-URGENT')
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q08_setops" ->
      """WITH hi AS (SELECT o_custkey FROM orders WHERE o_totalprice > 50000),
            urgent AS (SELECT o_custkey FROM orders
                       WHERE o_orderpriority = '1-URGENT')
         SELECT o_custkey FROM (
           SELECT DISTINCT o_custkey FROM (
             SELECT o_custkey FROM hi UNION ALL SELECT o_custkey FROM urgent)
           EXCEPT
           (SELECT o_custkey FROM hi INTERSECT SELECT o_custkey FROM urgent))
         ORDER BY o_custkey""",
    "q09_rollup_revenue" ->
      """SELECT n_name, c_mktsegment,
         round(sum(o_totalprice::DECIMAL(38,6)), 2)::DOUBLE AS total,
         count(*) AS n
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY ROLLUP (n_name, c_mktsegment)
         ORDER BY n_name ASC NULLS FIRST, c_mktsegment ASC NULLS FIRST""",
    "q11_sql_frontend" ->
      """SELECT o_orderpriority, count(*) AS order_count
         FROM orders o
         WHERE EXISTS (
           SELECT 1 FROM lineitem l
           WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 48)
         GROUP BY o_orderpriority
         ORDER BY o_orderpriority""",
    "q10_preagg_join" ->
      """WITH li AS (
           SELECT l_orderkey,
             round(sum(l_extendedprice::DECIMAL(38,6)), 2)::DOUBLE
               AS order_value,
             count(*) AS n_lines
           FROM lineitem GROUP BY l_orderkey)
         SELECT o_orderkey, o_orderstatus, order_value, n_lines
         FROM orders JOIN li ON o_orderkey = l_orderkey
         WHERE n_lines >= 6
         ORDER BY o_orderkey""")
}
