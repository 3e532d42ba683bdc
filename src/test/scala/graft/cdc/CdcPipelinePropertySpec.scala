package graft.cdc

import java.nio.file.{Files, Paths}

import scala.collection.mutable
import scala.util.Random

import graft.SparkSpec
import graft.core.Schemas.ChangeEvent
import graft.io.Lake
import graft.jobs.Jobs

/** The full SURVEY §7.2 slice as a randomized property test: random
  * event batches are rendered to binlog pseudo-SQL text files on disk,
  * ingested through the real pipeline (CdcSource parse -> consolidate
  * -> merge -> empty-day prune), and the resulting lake is compared
  * against the reference's three-map algorithm applied batch-by-batch
  * to an in-memory model — the HA_test2.py pattern end-to-end,
  * including the filesystem. */
class CdcPipelinePropertySpec extends SparkSpec {

  private val T = "`enexory`.`api_data_timeseries`"

  private def render(e: ChangeEvent, epoch: Long): String = e.op match {
    case "I" =>
      s"INSERT INTO $T\nSET\n@1=${e.pk}\n@3='${e.dateTime}'\n" +
        s"@4=${e.value.map(_.toString).getOrElse("NULL")}\n@6=$epoch\n"
    case "U" =>
      s"UPDATE $T\nWHERE\n@1=${e.pk}\n@3='${e.dateTime}'\nSET\n" +
        s"@1=${e.pk}\n@3='${e.dateTime}'\n" +
        s"@4=${e.value.map(_.toString).getOrElse("NULL")}\n@6=$epoch\n"
    case _ =>
      s"DELETE FROM $T\nWHERE\n@1=${e.pk}\n@3='${e.dateTime}'\n"
  }

  /** Reference algorithm (consolidate.cpp three maps + apply order),
    * applied to the model lake. */
  private def applyModel(lake: mutable.Map[(String, Long), Option[Double]],
      events: Seq[ChangeEvent]): Unit = {
    val ins = mutable.Map.empty[(String, Long), Option[Double]]
    val upd = mutable.Map.empty[(String, Long), Option[Double]]
    val del = mutable.Set.empty[(String, Long)]
    events.foreach { e =>
      val k = (e.day, e.pk)
      e.op match {
        case "I" => ins(k) = e.value
        case "U" => if (ins.contains(k)) ins(k) = e.value
                    else upd(k) = e.value
        case "D" => del += k; ins -= k; upd -= k
      }
    }
    del.foreach(lake -= _)
    upd.foreach { case (k, v) => if (lake.contains(k)) lake(k) = v }
    ins.foreach { case (k, v) => lake(k) = v }
  }

  test("3 sequential binlog batches through disk match the model") {
    val rnd = new Random(1234)
    val base = Files.createTempDirectory("graft_pipe").toString
    val lakePath = s"$base/lake"
    val days = Seq("2024-03-01", "2024-03-02", "2024-03-03")
    val model = mutable.Map.empty[(String, Long), Option[Double]]
    val epoch = 1709280000L

    (1 to 3).foreach { batch =>
      val events = (0 until 150).map { i =>
        val op = rnd.nextInt(10) match {
          case x if x < 4 => "I"
          case x if x < 8 => "U"
          case _ => "D"
        }
        ChangeEvent(op, (rnd.nextInt(20) + 1).toLong,
          s"${days(rnd.nextInt(3))} ${10 + rnd.nextInt(10)}:00:00",
          if (rnd.nextInt(8) == 0) None
          else Some(rnd.nextInt(1000).toDouble),
          "", i.toLong)
      }
      // two files per batch, split preserving order (later file wins)
      val dir = s"$base/binlog$batch"
      Files.createDirectories(Paths.get(dir))
      val (f1, f2) = events.splitAt(events.length / 2)
      Files.writeString(Paths.get(dir, "bin.000001.txt"),
        f1.map(render(_, epoch)).mkString)
      Files.writeString(Paths.get(dir, "bin.000002.txt"),
        f2.map(render(_, epoch)).mkString)

      Jobs.cdcMerge(spark, s"$dir/*", lakePath)
      applyModel(model, events)

      val lakeExists = Files.exists(Paths.get(lakePath))
      val got: Map[(String, Long), Option[Double]] =
        if (!lakeExists) Map.empty
        else Lake.read(spark, lakePath)
          .select("day", "id", "value").collect()
          .map(r => (r.getString(0), r.getLong(1)) ->
            Option(r.getAs[java.lang.Double](2)).map(_.doubleValue))
          .toMap
      assert(got == model.toMap, s"batch $batch diverged")
    }
  }

  test("a parse failure aborts the batch before touching the lake") {
    val base = Files.createTempDirectory("graft_pipe_bad").toString
    val lakePath = s"$base/lake"
    // seed a good lake
    val good = s"$base/good"
    Files.createDirectories(Paths.get(good))
    Files.writeString(Paths.get(good, "bin.000001.txt"),
      s"INSERT INTO $T\nSET\n@1=1\n@3='2024-03-01 10:00:00'\n@4=1\n@6=100\n")
    Jobs.cdcMerge(spark, s"$good/*", lakePath)
    val before = Lake.read(spark, lakePath).collect().toSeq

    // bad batch: second block has pk=0 (hard error)
    val bad = s"$base/bad"
    Files.createDirectories(Paths.get(bad))
    Files.writeString(Paths.get(bad, "bin.000001.txt"),
      s"DELETE FROM $T\nWHERE\n@1=1\n@3='2024-03-01 10:00:00'\n" +
      s"INSERT INTO $T\nSET\n@1=0\n@3='2024-03-01 11:00:00'\n@4=2\n@6=200\n")
    intercept[org.apache.spark.SparkException] {
      Jobs.cdcMerge(spark, s"$bad/*", lakePath)
    }
    // the delete in the same failed batch must NOT have been applied
    val after = Lake.read(spark, lakePath).collect().toSeq
    assert(after == before, "failed batch mutated the lake")
  }
}
