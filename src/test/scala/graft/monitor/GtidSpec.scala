package graft.monitor

import org.scalatest.funsuite.AnyFunSuite

class GtidSpec extends AnyFunSuite {

  private val u1 = "3e11fa47-71ca-11e1-9e33-c80aa9429562"
  private val u2 = "9f37ac13-0000-11e1-9e33-c80aa9429562"

  test("subset relation matches MySQL GTID_SUBSET semantics") {
    val a = Gtid.parse(s"$u1:1-5")
    val b = Gtid.parse(s"$u1:1-10")
    assert(a.subsetOf(b) && !b.subsetOf(a))
    // multi-interval / multi-uuid
    val c = Gtid.parse(s"$u1:1-3:7-9,$u2:1")
    val d = Gtid.parse(s"$u1:1-10,$u2:1-2")
    assert(c.subsetOf(d) && !d.subsetOf(c))
    // gap not covered
    val e = Gtid.parse(s"$u1:1-3:5")
    val f = Gtid.parse(s"$u1:1-4")
    assert(!e.subsetOf(f))
    // empty set is subset of anything
    assert(Gtid.parse("").subsetOf(a))
  }

  test("most-advanced election: dominant wins, divergence yields None") {
    val n = Gtid.mostAdvanced(Seq(
      "n1" -> s"$u1:1-5",
      "n2" -> s"$u1:1-10",
      "n3" -> s"$u1:1-8"))
    assert(n.contains("n2"))
    // diverged: nobody contains everyone
    val div = Gtid.mostAdvanced(Seq(
      "n1" -> s"$u1:1-5,$u2:1-3",
      "n2" -> s"$u1:1-10"))
    assert(div.isEmpty)
    // equal sets: first in order
    val tie = Gtid.mostAdvanced(Seq(
      "a" -> s"$u1:1-5", "b" -> s"$u1:1-5"))
    assert(tie.contains("a"))
  }

  test("union merges adjacent and overlapping intervals") {
    val g = Gtid.parse(s"$u1:1-3").union(Gtid.parse(s"$u1:4-6:10"))
    assert(g.intervals(u1) == Seq((1L, 6L), (10L, 10L)))
  }

  test("retry combinator: succeeds, exhausts, counts attempts") {
    var calls = 0
    val ok = Retry.keepTrying(3) {
      calls += 1; if (calls == 2) Some("done") else None
    }
    assert(ok.contains("done") && calls == 2)
    var calls2 = 0
    val fail = Retry.keepTrying[String](3) { calls2 += 1; None }
    assert(fail.isEmpty && calls2 == 3)
  }
}
