package graft

/** Mirror of the driver's t1 smoke: the flagship entry returns rows
  * and every declared query executes on the smallest fixture. Catches
  * a query that compiles but dies at runtime before the driver does. */
class SparkEntrySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("entry() produces rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("every bench query exists") {
    val missing = SparkEntry.benchQueries.toSet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"bench names without queries: $missing")
  }

  test("all queries execute on sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, sf).count(); None }
        catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
