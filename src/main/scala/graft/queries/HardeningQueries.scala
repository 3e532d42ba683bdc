package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.llm.{Mixing, TextAnalysis}

/** Hardening gates: the ANSI-mode and adversarial-value-domain
  * sweeps, promoted from ScalaTest-only suites (`AnsiModeSpec`,
  * `AdversarialDomainSpec`) into the driver's oracle gate so every
  * round re-checks them against DuckDB.
  *
  *  - `x01_ansi_mix` re-runs the overflow-sensitive domain-mixing
  *    query with `spark.sql.ansi.enabled=true` on an isolated
  *    session (same SparkContext, separate conf): under ANSI, any
  *    silent wrap the mod-2^31 reduction failed to prevent would
  *    throw instead of corrupting the sample — the gate proves the
  *    full pipeline is ANSI-clean AND still hash-equal to the
  *    non-ANSI oracle.
  *  - `x02_adversarial_domain` remaps the fixture into the value
  *    domains the driver fixtures never reach — negative ids through
  *    the portable mixing hash, astral-plane/unicode-augmented text
  *    through the fused token kernels — each restated exactly in the
  *    DuckDB oracle.
  *  - `x03_quantile_inf` drives ±Infinity through the exact
  *    distributed quantile operator's histogram selection
  *    ([[graft.ops.Quantiles.quantileDisc]]), probing both infinite
  *    masses and the finite interior against DuckDB's
  *    `quantile_disc`.
  */
object HardeningQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x01_ansi_mix" -> ((s, dir) => {
      // newSession shares the SparkContext (and the fixture cache)
      // but takes its own SQL conf — ANSI stays scoped to this gate.
      val ansi = s.newSession()
      ansi.conf.set("spark.sql.ansi.enabled", "true")
      LlmQueries.queries("t14_domain_mix")(ansi, dir)
    }),

    // quantileDisc's ±Inf domain handling under the driver gate: the
    // r10 infinity fix is spec-covered (QuantilesSpec) but no gated
    // query fed infinite values through the histogram selection until
    // this one. Every 997th order key becomes +Inf, the next key
    // class -Inf; the probe probabilities hit BOTH infinite masses
    // (rank 1 → the -Inf mass; rank ceil(0.9999 n) → the +Inf mass)
    // and the finite interior. DuckDB orders infinities as ordinary
    // doubles, so the oracle restatement is mechanical.
    "x03_quantile_inf" -> ((s, dir) => {
      val v = s.read.parquet(s"$dir/lineitem.parquet")
        .select(
          when(col("l_orderkey") % 997 === 0,
            lit(Double.PositiveInfinity))
            .when(col("l_orderkey") % 997 === 1,
              lit(Double.NegativeInfinity))
            .otherwise(col("l_extendedprice")).as("v"))
      graft.ops.Quantiles.quantileDisc(v, "v",
        Seq(0.0001, 0.25, 0.5, 0.75, 0.9999))
        .orderBy(col("prob"))
    }),

    "x02_adversarial_domain" -> ((s, dir) => {
      GraftFunctions.register(s)
      // Negative ids (full int64 sign domain through the mod-2^31
      // sampling hash) and unicode-augmented text (Greek, CJK, an
      // astral-plane emoji, combining accents) on every 3rd doc.
      val aug = s.read.parquet(s"$dir/documents.parquet")
        .withColumn("neg_id", col("doc_id") * lit(-7919L) - 3L)
        .withColumn("text2",
          when(col("doc_id") % 3 === 0,
            concat(col("text"), lit(" δοκιμή 测试 🚀 éé")))
            .otherwise(col("text")))
      aug.select(
        col("doc_id"),
        col("neg_id"),
        when(Mixing.keepPortable(col("neg_id"), lit(0.4d)), 1)
          .otherwise(0).as("kept40"),
        GraftFunctions.textQualityStats(col("text2"),
          TextAnalysis.allStopCsv)
          .getField("n_tokens").as("n_tokens"),
        TextAnalysis.bpeishTokenCount(col("text2")).as("n_subtokens"))
        .orderBy("doc_id")
    }))

  val oracles: Map[String, String] = Map(
    // Same restatement as t14: ANSI mode must not change the result.
    "x01_ansi_mix" -> LlmQueries.oracles("t14_domain_mix"),
    // quantile_disc picks an element of the input, so infinities pass
    // through the compare exactly — no rounding needed.
    "x03_quantile_inf" ->
      Seq(0.0001, 0.25, 0.5, 0.75, 0.9999).map(p =>
        s"""SELECT CAST($p AS DOUBLE) AS prob,
           CAST(quantile_disc(v, $p) AS DOUBLE) AS value
           FROM (SELECT CASE
             WHEN l_orderkey % 997 = 0 THEN 'infinity'::DOUBLE
             WHEN l_orderkey % 997 = 1 THEN '-infinity'::DOUBLE
             ELSE l_extendedprice END AS v FROM lineitem)""").mkString(
        "", " UNION ALL ", " ORDER BY prob"),
    "x02_adversarial_domain" ->
      """WITH d AS (SELECT doc_id,
           doc_id * -7919 - 3 AS neg_id,
           CASE WHEN doc_id % 3 = 0
             THEN text || ' δοκιμή 测试 🚀 éé' ELSE text END AS text2
         FROM documents)
         SELECT doc_id, neg_id,
           CASE WHEN (((neg_id % 2147483648) + 2147483648)
                 % 2147483648 * 1103515245 + 12345) % 2147483648
               % 1000000 < 400000
             THEN 1 ELSE 0 END AS kept40,
           len(string_split(trim(regexp_replace(lower(text2),
             '\s+', ' ', 'g')), ' ')) AS n_tokens,
           len(regexp_extract_all(text2,
             '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_subtokens
         FROM d ORDER BY doc_id""")
}
