package graft.ops

import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {

  import spark.implicits._

  test("matches latest at-or-before per key; unmatched lefts keep null") {
    val lefts = Seq(
      ("u1", 100L, "e1"), // after r@50 -> matches 50
      ("u1", 200L, "e2"), // after r@150 -> matches 150
      ("u1", 150L, "e3"), // ties with r@150 -> inclusive match
      ("u2", 10L, "e4"),  // before any right -> null
      ("u3", 99L, "e5"))  // key with no rights at all -> null
      .toDF("k", "ts", "tag")
    val rights = Seq(
      ("u1", 50L, 1.0), ("u1", 150L, 2.0), ("u2", 20L, 9.0))
      .toDF("k", "ts", "v")
    val out = AsofJoin.asof(lefts, rights, "k", "ts")
      .select("tag", "r_ts", "r_v")
      .as[(String, Option[Long], Option[Double])]
      .collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(out("e1") == ((Some(50L), Some(1.0))))
    assert(out("e2") == ((Some(150L), Some(2.0))))
    assert(out("e3") == ((Some(150L), Some(2.0)))) // inclusive
    assert(out("e4") == ((None, None)))
    assert(out("e5") == ((None, None)))
  }

  test("left row count is preserved (pure enrichment)") {
    val lefts = (1 to 500).map(i => ("k" + i % 7, i.toLong, i))
      .toDF("k", "ts", "n")
    val rights = (1 to 100).map(i => ("k" + i % 7, i.toLong * 3, i * 1.5))
      .toDF("k", "ts", "v")
    assert(AsofJoin.asof(lefts, rights, "k", "ts").count() == 500)
  }
}
