package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PII scrubbing and contamination: redaction exactness, clean-text
  * passthrough, overlap-ratio boundaries. */
class ScrubSpec extends SparkSpec {

  import spark.implicits._

  test("scrub redacts emails and IPs, leaves clean text unchanged") {
    val rows = Seq(
      "reach me at jane.doe+x@sub.example.org thanks",
      "server 192.168.001.12 is down",
      "both a@b.co and 10.0.0.1 here",
      "no pii in this sentence at all").toDF("text")
    val out = rows.select(
      Scrub.scrub(col("text")).as("s"),
      Scrub.emailCount(col("text")).as("ne"),
      Scrub.ipCount(col("text")).as("ni"))
      .as[(String, Int, Int)].collect()
    assert(out(0) == (("reach me at <EMAIL> thanks", 1, 0)))
    assert(out(1) == (("server <IP> is down", 0, 1)))
    assert(out(2) == (("both <EMAIL> and <IP> here", 1, 1)))
    assert(out(3) == (("no pii in this sentence at all", 0, 0)))
  }

  test("overlap ratio: identical doc 1.0, disjoint doc 0.0") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"), // = bench
      (3L, "utterly disjoint wording nothing shared here ok"))
      .toDF("doc_id", "text")
    val bench = docs.where(col("doc_id") === 1)
    val out = Contamination.overlapRatios(docs, bench, shingleN = 5)
      .select("doc_id", "overlap_ratio")
      .as[(Long, Double)].collect().toMap
    assert(out(1L) == 1.0 && out(2L) == 1.0)
    assert(out(3L) == 0.0)
  }
}
