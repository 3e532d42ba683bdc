package graft

/** Every query must FULLY evaluate under `spark.sql.ansi.enabled` —
  * ANSI mode turns silent overflow/invalid-cast wraparound into
  * runtime errors, so any arithmetic that only works on the fixture's
  * comfortable value domain throws here instead of quietly producing
  * a wrong number at scale (the Mixing.keepPortable overflow class,
  * caught by the round-3 audit, generalized to the whole surface).
  * Evaluation is forced through the noop sink: `limit(n).count()`
  * would skip most rows and with them most of the arithmetic. */
class AnsiModeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("every query fully evaluates under ANSI mode") {
    // Lifecycle queries included: their scratch lakes are
    // invocation-unique (graft.core.Scratch), so running them here
    // can no longer race a concurrent Verify/Bench JVM.
    for (n <- SparkEntry.queries.keys.toSeq.sorted) {
      val fresh = spark.newSession()
      fresh.conf.set("spark.sql.ansi.enabled", "true")
      try SparkEntry.queries(n)(fresh, dir)
        .write.format("noop").mode("overwrite").save()
      catch {
        case e: Throwable =>
          fail(s"$n failed under ANSI mode: ${e.getMessage}")
      }
    }
  }
}
