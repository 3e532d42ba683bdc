package graft

/** Every query must work in a FRESH session (new function registry,
  * fresh conf) — operators that rely on another operator having
  * registered the custom expressions first only work in the shared
  * driver session by accident (the d04 UNRESOLVED_ROUTINE bug class).
  * `newSession()` shares the SparkContext but isolates session state,
  * which is exactly the coupling this guards against. */
class SessionIsolationSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("each query executes in an isolated fresh session") {
    // Lifecycle queries included: their scratch lakes are
    // invocation-unique (graft.core.Scratch), so running them here
    // can no longer race a concurrent Verify/Bench JVM.
    for (n <- SparkEntry.queries.keys.toSeq.sorted) {
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
