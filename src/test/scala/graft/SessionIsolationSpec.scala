package graft

/** Every query must work in a FRESH session (new function registry,
  * fresh conf) — operators that rely on another operator having
  * registered the custom expressions first only work in the shared
  * driver session by accident (the d04 UNRESOLVED_ROUTINE bug class).
  * `newSession()` shares the SparkContext but isolates session state,
  * which is exactly the coupling this guards against. */
class SessionIsolationSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // Side-effecting lifecycle queries excluded (they rewrite on-disk
  // lakes and are exercised by the driver gate); everything else runs.
  private val excluded = Set("c13_lifecycle", "c15_compaction")

  test("each query executes in an isolated fresh session") {
    for (n <- SparkEntry.queries.keys.toSeq.sorted
        if !excluded(n)) {
      val fresh = spark.newSession()
      val rows =
        try SparkEntry.queries(n)(fresh, dir).limit(5).count()
        catch {
          case e: Throwable =>
            fail(s"$n failed in a fresh session: ${e.getMessage}")
        }
      assert(rows >= 0)
    }
  }
}
