package graft.cdc

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** Distributed binlog ingestion: whole-file reads, per-file sequence
  * windows preserving the reference's sequential file order. */
class CdcSourceSpec extends SparkSpec {

  private val T = "`enexory`.`api_data_timeseries`"

  test("later files win last-write-wins across files") {
    val dir = Files.createTempDirectory("graft_binlog")
    // file a: insert value 1; file b (later name): update to 2
    Files.writeString(Paths.get(dir.toString, "bin.000001.txt"),
      s"INSERT INTO $T\nSET\n@1=1\n@3='2024-01-01 10:00:00'\n@4=1\n@6=100\n")
    Files.writeString(Paths.get(dir.toString, "bin.000002.txt"),
      s"UPDATE $T\nSET\n@1=1\n@3='2024-01-01 10:00:00'\n@4=2\n@6=200\n")
    val events = CdcSource.readEvents(spark, dir.toString + "/*")
    val net = Consolidate.netChanges(events).collect()
    assert(net.length == 1)
    val r = net.head
    assert(r.getAs[String]("op") == "I") // I then U folds to insert
    assert(r.getAs[Double]("value") == 2.0) // later file's image wins
  }

  test("events parse in parallel across files with stable seqs") {
    val dir = Files.createTempDirectory("graft_binlog2")
    (0 until 4).foreach { i =>
      Files.writeString(Paths.get(dir.toString, f"bin.$i%06d.txt"),
        (0 until 10).map(j =>
          s"INSERT INTO $T\nSET\n@1=${i * 10 + j + 1}\n" +
          s"@3='2024-01-01 10:00:00'\n@4=$j\n@6=100\n").mkString)
    }
    val events = CdcSource.readEvents(spark, dir.toString + "/*")
      .collect()
    assert(events.length == 40)
    // every file's events sit in that file's 2^32 window
    assert(events.map(_.seq >> 32).distinct.sorted.toSeq ==
      Seq(0L, 1L, 2L, 3L))
  }
}
