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
