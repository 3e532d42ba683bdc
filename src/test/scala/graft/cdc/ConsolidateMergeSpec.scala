package graft.cdc

import scala.collection.mutable
import scala.util.Random

import graft.SparkSpec
import graft.core.Schemas.ChangeEvent

/** Consolidation + merge semantics, checked two ways:
  *  1. the scenario cases required by FIXTURES.md §2;
  *  2. a randomized model test against a faithful reimplementation of
  *     the reference's three-map algorithm (`consolidate.cpp:56-109`
  *     buckets + `:184-214` apply order) — the HA_test2.py pattern.
  */
class ConsolidateMergeSpec extends SparkSpec {

  import spark.implicits._

  private case class Img(dateTime: String, value: Option[Double],
      ts: String)

  /** The reference algorithm, literally: ordered events fill
    * insert/update/delete maps (D erases from I/U; U folds into an
    * existing I); apply order is delete -> update-if-exists ->
    * insert-upsert. */
  private def model(lake: Map[(String, Long), Img],
      events: Seq[ChangeEvent]): Map[(String, Long), Img] = {
    val inserts = mutable.Map.empty[(String, Long), Img]
    val updates = mutable.Map.empty[(String, Long), Img]
    val deleted = mutable.Set.empty[(String, Long)]
    events.sortBy(_.seq).foreach { e =>
      val k = (e.day, e.pk)
      val img = Img(e.dateTime, e.value, e.ts)
      e.op match {
        case "I" => inserts(k) = img
        case "U" =>
          if (inserts.contains(k)) inserts(k) = img
          else updates(k) = img
        case "D" =>
          deleted += k; inserts -= k; updates -= k
      }
    }
    var m = lake
    deleted.foreach(m -= _)
    updates.foreach { case (k, img) =>
      if (m.contains(k)) m += k -> img
    }
    inserts.foreach { case (k, img) => m += k -> img }
    m
  }

  private def engine(lake: Map[(String, Long), Img],
      events: Seq[ChangeEvent]): Map[(String, Long), Img] = {
    val existing = lake.toSeq.map { case ((day, id), img) =>
      (id, img.dateTime, img.value, img.ts, day)
    }.toDF("id", "date_time", "value", "ts", "day")
    val changes = Consolidate.netChanges(events.toDS())
    Merge.merge(existing, changes).collect().map { r =>
      (r.getAs[String]("day"), r.getAs[Long]("id")) ->
        Img(r.getAs[String]("date_time"),
          Option(r.getAs[java.lang.Double]("value")).map(_.doubleValue),
          r.getAs[String]("ts"))
    }.toMap
  }

  private def ev(op: String, pk: Long, day: String, seq: Long,
      value: Option[Double] = Some(1.0)): ChangeEvent =
    ChangeEvent(op, pk, s"$day 12:00:00",
      if (op == "D") None else value,
      if (op == "D") "" else "2024-01-01 00:00:00", seq)

  private val D1 = "2024-03-01"
  private val D2 = "2024-03-02"

  test("last-write-wins: later UPDATE overwrites earlier") {
    val lake = Map((D1, 1L) -> Img(s"$D1 12:00:00", Some(0.0), "t"))
    val out = engine(lake, Seq(
      ev("U", 1, D1, 0, Some(10)), ev("U", 1, D1, 1, Some(20))))
    assert(out((D1, 1L)).value.contains(20.0))
  }

  test("U after I folds into insert (upsert even when absent)") {
    val out = engine(Map.empty, Seq(
      ev("I", 1, D1, 0, Some(1)), ev("U", 1, D1, 1, Some(2))))
    assert(out((D1, 1L)).value.contains(2.0))
  }

  test("D then I = net insert") {
    val lake = Map((D1, 1L) -> Img(s"$D1 12:00:00", Some(0.0), "t"))
    val out = engine(lake, Seq(
      ev("D", 1, D1, 0), ev("I", 1, D1, 1, Some(5))))
    assert(out((D1, 1L)).value.contains(5.0))
  }

  test("lone U for absent pk is silently dropped") {
    val out = engine(Map.empty, Seq(ev("U", 9, D1, 0, Some(7))))
    assert(!out.contains((D1, 9L)))
  }

  test("D for absent pk is a no-op; deletes can empty a day") {
    val lake = Map((D1, 1L) -> Img(s"$D1 12:00:00", Some(0.0), "t"))
    val out = engine(lake, Seq(ev("D", 1, D1, 0), ev("D", 2, D1, 1)))
    assert(out.isEmpty)
  }

  test("I then D then U = net delete (U-if-exists sees the delete)") {
    val lake = Map((D1, 1L) -> Img(s"$D1 12:00:00", Some(0.0), "t"))
    val out = engine(lake, Seq(
      ev("I", 1, D1, 0, Some(1)), ev("D", 1, D1, 1),
      ev("U", 1, D1, 2, Some(2))))
    assert(!out.contains((D1, 1L)))
  }

  test("same pk on two days = two independent rows") {
    val out = engine(Map.empty, Seq(
      ev("I", 1, D1, 0, Some(1)), ev("I", 1, D2, 1, Some(2))))
    assert(out((D1, 1L)).value.contains(1.0))
    assert(out((D2, 1L)).value.contains(2.0))
  }

  test("null value round-trips through consolidation and merge") {
    val out = engine(Map.empty, Seq(ev("I", 1, D1, 0, None)))
    assert(out((D1, 1L)).value.isEmpty)
  }

  test("randomized model check: engine == reference algorithm") {
    val rnd = new Random(42)
    val days = Seq(D1, D2, "2024-03-03")
    (1 to 8).foreach { round =>
      val lake = (1 to 30).flatMap { _ =>
        val k = (days(rnd.nextInt(3)), (rnd.nextInt(15) + 1).toLong)
        if (rnd.nextBoolean()) Some(k -> Img(s"${k._1} 12:00:00",
          Some(rnd.nextInt(100).toDouble), "2024-01-01 00:00:00"))
        else None
      }.toMap
      val events = (0 until 120).map { i =>
        val op = rnd.nextInt(10) match {
          case x if x < 4 => "I"
          case x if x < 8 => "U"
          case _ => "D"
        }
        ev(op, (rnd.nextInt(15) + 1).toLong, days(rnd.nextInt(3)),
          i.toLong,
          if (rnd.nextInt(10) == 0) None
          else Some(rnd.nextInt(1000).toDouble))
      }
      val expected = model(lake, events)
      val got = engine(lake, events)
      assert(got == expected,
        s"round $round: engine disagrees with reference model")
    }
  }
}
