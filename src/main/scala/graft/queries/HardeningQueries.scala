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
