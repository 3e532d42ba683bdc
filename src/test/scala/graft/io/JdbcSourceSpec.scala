package graft.io

import java.sql.DriverManager

import graft.SparkSpec
import graft.jobs.Jobs

/** S1-S4 against a REAL JDBC backend (embedded Derby, which ships
  * with Spark): day-partitioned window reads with clipped predicates,
  * MAX/COUNT, and the full extract lifecycle driving the same
  * spark.read.jdbc path a MySQL deployment would. */
class JdbcSourceSpec extends SparkSpec {

  private val dbDir =
    java.nio.file.Files.createTempDirectory("graft_derby").toString
  private val url = s"jdbc:derby:$dbDir/db;create=true"

  private lazy val seeded: Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute(
        """CREATE TABLE ts (id BIGINT NOT NULL,
           date_time VARCHAR(19) NOT NULL, value DOUBLE,
           ts VARCHAR(19) NOT NULL)""")
      val ins = conn.prepareStatement(
        "INSERT INTO ts VALUES (?, ?, ?, ?)")
      // 5 days x 40 rows, hours spread across the day
      var id = 1L
      for (day <- 1 to 5; row <- 0 until 40) {
        val dt = f"2024-04-0$day ${row % 24}%02d:${row % 60}%02d:00"
        ins.setLong(1, id); ins.setString(2, dt)
        ins.setDouble(3, id * 0.5); ins.setString(4, dt)
        ins.addBatch(); id += 1
      }
      ins.executeBatch()
    } finally conn.close()
  }

  private def source =
    new JdbcSource(spark, url, "ts")

  test("readWindow: day-partitioned scan, clipped bounds") {
    seeded
    val full = source.readWindow("2024-04-01 00:00:00",
      "2024-04-06 00:00:00")
    assert(full.count() == 200)
    // one JDBC partition per day in the window
    assert(full.rdd.getNumPartitions == 6)
    // clipped interior window: day 2 from noon, day 4 exclusive end
    val part = source.readWindow("2024-04-02 12:00:00",
      "2024-04-04 00:00:00")
    val rows = part.select("date_time").collect().map(_.getString(0))
    assert(rows.nonEmpty)
    assert(rows.forall(dt =>
      dt >= "2024-04-02 12:00:00" && dt < "2024-04-04 00:00:00"))
  }

  test("maxDate and count push to the source") {
    seeded
    assert(source.maxDate.contains("2024-04-05 23:55:00")
      || source.maxDate.exists(_.startsWith("2024-04-05")))
    assert(source.count == 200)
  }

  test("maxDate/count plans carry the aggregate to the source") {
    seeded
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    for ((df, sqlFragment) <- Seq(
        source.maxDateFrame -> "SELECT MAX(date_time)",
        source.countFrame -> "SELECT COUNT(*)")) {
      val plan = df.queryExecution.optimizedPlan
      // No Spark-side Aggregate: the scan relation IS the one-row
      // aggregate query, so only a scalar crosses JDBC.
      assert(plan.collect { case a: Aggregate => a }.isEmpty,
        s"Spark-side aggregate found — not pushed:\n$plan")
      assert(plan.toString.contains(sqlFragment),
        s"relation does not embed `$sqlFragment`:\n$plan")
      assert(df.count() == 1)
    }
  }

  test("schema-qualified quoted identifiers survive the same paths") {
    seeded
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE SCHEMA GRAFTX")
      st.execute(
        """CREATE TABLE GRAFTX."tsQ" (id BIGINT NOT NULL,
           date_time VARCHAR(19) NOT NULL, value DOUBLE,
           ts VARCHAR(19) NOT NULL)""")
      st.execute("""INSERT INTO GRAFTX."tsQ" VALUES
        (1, '2024-04-01 08:00:00', 0.5, '2024-04-01 08:00:00'),
        (2, '2024-04-02 09:00:00', 1.0, '2024-04-02 09:00:00')""")
    } finally conn.close()
    // The reference reads `enexory`.`api_data_timeseries` — a
    // schema-qualified, quoted identifier. Same shape here in Derby's
    // (ANSI double-quote) dialect; MySQL differs only in quote char.
    val qualified = new JdbcSource(spark, url, """GRAFTX."tsQ"""")
    assert(qualified.count == 2)
    assert(qualified.maxDate.contains("2024-04-02 09:00:00"))
    val win = qualified.readWindow("2024-04-01 00:00:00",
      "2024-04-03 00:00:00")
    assert(win.count() == 2)
  }

  test("MySQL URLs resolve the backtick-quoting dialect") {
    // No MySQL server in the sandbox; assert the dialect Spark would
    // apply to the reference's URL quotes identifiers with backticks,
    // so `enexory`.`api_data_timeseries` round-trips unharmed.
    import org.apache.spark.sql.jdbc.JdbcDialects
    val d = JdbcDialects.get("jdbc:mysql://db:3306/enexory")
    assert(d.quoteIdentifier("api_data_timeseries")
      == "`api_data_timeseries`")
  }

  test("empty table: maxDate is None, count is 0") {
    seeded
    val conn = DriverManager.getConnection(url)
    try conn.createStatement().execute(
      """CREATE TABLE empty_ts (id BIGINT NOT NULL,
         date_time VARCHAR(19) NOT NULL, value DOUBLE,
         ts VARCHAR(19) NOT NULL)""")
    finally conn.close()
    val src = new JdbcSource(spark, url, "empty_ts")
    assert(src.maxDate.isEmpty)
    assert(src.count == 0L)
  }

  test("extract lifecycle runs end-to-end over real JDBC") {
    seeded
    val lake = java.nio.file.Files
      .createTempDirectory("graft_jdbc_lake").toString + "/lake"
    val days = Jobs.extract(spark, source, lake)
    assert(days.nonEmpty)
    val back = Lake.read(spark, lake)
    assert(back.count() == 200)
    assert(Lake.resumePointAt(spark, lake)
      .exists(_.startsWith("2024-04-05")))
  }
}
