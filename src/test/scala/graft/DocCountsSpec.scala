package graft

import org.scalatest.funsuite.AnyFunSuite

/** The gate-count reconciliation check, made standing: rounds 11 and
  * 12 both ended with a final commit whose new gates left the docs'
  * suite count stale. The three canonical count phrases must carry
  * `SparkEntry.queries.size` — the number in the docs is now checked
  * against the registry, not typed from memory. (Historical counts —
  * "round 9's 105", "111 of 117 at 100x" — are records of past
  * sweeps, deliberately NOT anchored here.)
  */
class DocCountsSpec extends AnyFunSuite {

  private val n = SparkEntry.queries.size

  private def firstCount(file: String, phrase: scala.util.matching.Regex): Int = {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(file)), "UTF-8")
    phrase.findFirstMatchIn(text) match {
      case Some(m) => m.group(1).toInt
      case None => fail(s"$file no longer contains the canonical " +
        s"count phrase $phrase — re-anchor this spec to the new wording")
    }
  }

  test("oracle map covers every query (no rows-only gates)") {
    assert(SparkEntry.oracleSql.keySet == SparkEntry.queries.keySet)
  }

  test("README.md headline gate count matches the registry") {
    assert(firstCount("README.md", """gate — \*\*(\d+) queries""".r) == n)
  }

  test("COVERAGE.md suite count matches the registry") {
    assert(firstCount("COVERAGE.md",
      """the suite is now (\d+) gates""".r) == n)
  }

  test("SURVEY.md driver-gate count matches the registry") {
    assert(firstCount("SURVEY.md", """all (\d+) gates green""".r) == n)
  }
}
