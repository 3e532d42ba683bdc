package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.cdc.Consolidate
import graft.core.Schemas.{ChangeEvent, Sentinel}

/** Lake IO: day-partitioned write, dynamic-overwrite merge, empty-day
  * pruning (M2), resume point (S7), reconciliation (R1). */
class LakeSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_lake").toString

  private def seed(path: String): Unit = {
    val df = Seq(
      (1L, "2024-03-01 10:00:00", Some(1.0), "2024-03-01 10:00:00"),
      (2L, "2024-03-01 11:00:00", None: Option[Double],
        "2024-03-01 11:00:00"),
      (3L, "2024-03-02 09:00:00", Some(3.0), "2024-03-02 09:00:00"),
      (4L, Sentinel, Some(4.0), "2024-03-02 09:30:00"))
      .toDF("id", "date_time", "value", "ts")
      .withColumn("day", substring($"date_time", 1, 10))
    Lake.configure(spark)
    Lake.write(df, path)
  }

  test("write + read round-trip preserves rows and day partitions") {
    val path = tmp()
    seed(path)
    val back = Lake.read(spark, path)
    assert(back.count() == 4)
    assert(back.select("day").distinct().as[String].collect().sorted
      .toSeq == Seq("0001-01-01", "2024-03-01", "2024-03-02"))
  }

  test("resume point excludes the sentinel day") {
    val path = tmp()
    seed(path)
    assert(Lake.resumePoint(Lake.read(spark, path))
      .contains("2024-03-02 09:00:00"))
  }

  test("resumePointAt reads only the max day partition (early exit)") {
    val path = tmp()
    seed(path)
    assert(Lake.resumePointAt(spark, path)
      .contains("2024-03-02 09:00:00"))
    // Prove the pruning: inject an out-of-place row with a LARGER
    // date_time inside a SMALLER day partition (cannot arise naturally
    // because day derives from date_time). The early-exit read must
    // not see it, while the full-scan form does.
    Seq((99L, "2024-03-05 00:00:00", Some(9.0), "2024-03-05 00:00:00"))
      .toDF("id", "date_time", "value", "ts")
      .withColumn("day", lit("2024-03-01"))
      .write.mode("append").partitionBy("day").parquet(path)
    assert(Lake.resumePointAt(spark, path)
      .contains("2024-03-02 09:00:00"))
    assert(Lake.resumePoint(Lake.read(spark, path))
      .contains("2024-03-05 00:00:00"))
    // An empty lake directory and a missing path both resolve to None.
    assert(Lake.resumePointAt(spark, path + "_missing").isEmpty)
  }

  test("mergeIntoLake applies changes and prunes emptied days") {
    val path = tmp()
    seed(path)
    val events = Seq(
      // day 1: update id=1, insert id=9
      ChangeEvent("U", 1L, "2024-03-01 10:00:00", Some(100.0),
        "2024-03-03 00:00:00", 0L),
      ChangeEvent("I", 9L, "2024-03-01 23:59:59", Some(9.0),
        "2024-03-03 00:00:00", 1L),
      // day 2: delete its only real row
      ChangeEvent("D", 3L, "2024-03-02 09:00:00", None, "", 2L))
      .toDS()
    Lake.mergeIntoLake(spark, path,
      Consolidate.netChanges(events))
    val back = Lake.read(spark, path)
    val rows = back.select("day", "id", "value")
      .as[(String, Long, Option[Double])].collect().toSet
    assert(rows == Set(
      ("2024-03-01", 1L, Some(100.0)),
      ("2024-03-01", 2L, None),
      ("2024-03-01", 9L, Some(9.0)),
      ("0001-01-01", 4L, Some(4.0))))
    // day=2024-03-02 emptied -> directory pruned (M2)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.exists(
      new org.apache.hadoop.fs.Path(path, "day=2024-03-02")))
  }

  test("merge into a non-existent lake bootstraps from inserts only") {
    val path = tmp() + "/fresh"
    val events = Seq(
      ChangeEvent("I", 1L, "2024-03-01 10:00:00", Some(1.0),
        "2024-03-01 10:00:00", 0L),
      ChangeEvent("U", 2L, "2024-03-01 11:00:00", Some(2.0),
        "2024-03-01 11:00:00", 1L)) // lone U: dropped
      .toDS()
    Lake.mergeIntoLake(spark, path, Consolidate.netChanges(events))
    val back = Lake.read(spark, path)
    assert(back.select("id").as[Long].collect().toSeq == Seq(1L))
  }

  test("compaction merges small files, preserves content, idempotent") {
    val path = tmp() + "/lake"
    // 3 days x 40 rows, deliberately scattered into 8 files per day
    val rows = (for (d <- 1 to 3; i <- 1 to 40) yield {
      val day = f"2024-06-0$d"
      (d * 100L + i, f"$day 10:00:${i % 60}%02d", Some(i.toDouble),
        s"$day 11:00:00")
    }).toDF("id", "date_time", "value", "ts")
      .withColumn("day", substring($"date_time", 1, 10))
    Lake.configure(spark)
    Lake.write(rows.repartition(8), path)

    def filesPerDay(): Map[String, Int] = {
      val root = new java.io.File(path)
      root.listFiles().filter(f => f.isDirectory
          && f.getName.startsWith("day=")).map { d =>
        d.getName.stripPrefix("day=") ->
          d.listFiles().count(_.getName.endsWith(".parquet"))
      }.toMap
    }
    assert(filesPerDay().values.forall(_ > 1), "fixture not fragmented")
    val before = Lake.read(spark, path).orderBy("id").collect().toSeq

    val report = Lake.compact(spark, path)
    assert(report.size == 3)
    assert(report.forall(r => r.filesAfter < r.filesBefore))
    assert(filesPerDay().values.forall(_ == 1),
      s"expected single-file days, got ${filesPerDay()}")
    // content-preserving
    assert(Lake.read(spark, path).orderBy("id").collect().toSeq
      == before)
    // second pass finds nothing to do
    assert(Lake.compact(spark, path).isEmpty)
  }

  test("compaction splits oversized days by the byte target") {
    val path = tmp() + "/lake"
    val rows = (1 to 4000).map { i =>
      (i.toLong, f"2024-07-01 ${i % 24}%02d:00:00", Some(i.toDouble),
        "2024-07-01 12:00:00")
    }.toDF("id", "date_time", "value", "ts")
      .withColumn("day", substring($"date_time", 1, 10))
    Lake.configure(spark)
    Lake.write(rows.repartition(16), path)
    // Tiny byte target: one output file cannot hold the day, so the
    // salt must spread rows over multiple files (not one giant file).
    val report = Lake.compact(spark, path, targetBytesPerFile = 16L * 1024)
    assert(report.size == 1)
    val after = report.head.filesAfter
    assert(after > 1 && after < 16,
      s"expected 1 < files < 16 after compaction, got $after")
    assert(Lake.read(spark, path).count() == 4000)
  }

  test("hash-partition probe table routes rows to chosen partitions") {
    import org.apache.spark.sql.functions.spark_partition_id
    val n = 37
    val probes = Lake.hashPartitionProbes(n)
    assert(probes.length == n)
    // Each probe value, repartitioned by the probe column, must land
    // on exactly the partition it was computed to invert.
    val placed = probes.toSeq.toDF("v")
      .repartition(n, $"v")
      .select($"v", spark_partition_id().as("p"))
      .collect().map(r => (r.getInt(0), r.getInt(1))).toMap
    probes.zipWithIndex.foreach { case (v, p) =>
      assert(placed(v) == p, s"probe $v should land on partition $p")
    }
  }

  test("compaction hits the per-day target file count exactly") {
    val path = tmp() + "/lake"
    val rows = (for (d <- 1 to 3; i <- 1 to 3000) yield {
      val day = f"2024-08-0$d"
      ((d * 100000 + i).toLong, f"$day 10:${i % 60}%02d:${i % 60}%02d",
        Some(i.toDouble), s"$day 12:00:00")
    }).toDF("id", "date_time", "value", "ts")
      .withColumn("day", substring($"date_time", 1, 10))
    Lake.configure(spark)
    Lake.write(rows.repartition(16), path)
    val target = 16L * 1024
    val report = Lake.compact(spark, path, targetBytesPerFile = target)
    assert(report.size == 3)
    // Deterministic placement: with rows >> want, every salt bucket is
    // occupied and each day lands on EXACTLY ceil(bytes/target) files —
    // no hash-collision undershoot, no day co-location.
    report.foreach { r =>
      val want = math.max(1L, (r.bytes + target - 1) / target)
      assert(want > 1, s"fixture too small to exercise the salt: $r")
      assert(r.filesAfter.toLong == want,
        s"day ${r.day}: expected exactly $want files, got ${r.filesAfter}")
    }
    assert(Lake.read(spark, path).count() == 9000)
  }

  test("reconciliation report") {
    val path = tmp()
    seed(path)
    val r = Lake.reconcile(4L, Lake.read(spark, path))
    assert(r.matches && r.difference == 0)
    val r2 = Lake.reconcile(5L, Lake.read(spark, path))
    assert(!r2.matches && r2.difference == -1)
  }
}
