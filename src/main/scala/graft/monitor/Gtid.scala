package graft.monitor

/** GTID utilities for the failover surface (H1,
  * `HA and Failover/orchestrator.py:584-633`; same algorithm
  * `HA_test1.py:178-211`).
  *
  * The reference asks MySQL `GTID_SUBSET(a, b)` pairwise and elects the
  * node whose executed set contains every other contender's set. The
  * set algebra is tiny (n = cluster size), driver-side by design — it
  * is not a data-scale operator; we reimplement the subset relation
  * locally so no SQL round-trip is needed.
  *
  * GTID set grammar (MySQL): `uuid:1-5:7:9-11[,uuid2:...]`.
  */
object Gtid {

  final case class GtidSet(intervals: Map[String, Seq[(Long, Long)]]) {

    /** True iff `this` ⊆ `other` (MySQL `GTID_SUBSET(this, other)`). */
    def subsetOf(other: GtidSet): Boolean =
      intervals.forall { case (uuid, ivs) =>
        val theirs = other.intervals.getOrElse(uuid, Seq.empty)
        ivs.forall { case (lo, hi) =>
          // every txn in [lo,hi] is covered by some interval of theirs
          var cur = lo
          theirs.sortBy(_._1).foreach { case (tlo, thi) =>
            if (tlo <= cur && cur <= thi + 1 && cur <= hi)
              cur = math.max(cur, thi + 1)
          }
          cur > hi
        }
      }

    def union(other: GtidSet): GtidSet = {
      val keys = intervals.keySet ++ other.intervals.keySet
      GtidSet(keys.map { k =>
        val merged = (intervals.getOrElse(k, Seq.empty) ++
          other.intervals.getOrElse(k, Seq.empty)).sortBy(_._1)
          .foldLeft(List.empty[(Long, Long)]) {
            case ((lo, hi) :: tail, (nlo, nhi)) if nlo <= hi + 1 =>
              (lo, math.max(hi, nhi)) :: tail
            case (acc, iv) => iv :: acc
          }.reverse
        k -> merged
      }.toMap)
    }
  }

  def parse(s: String): GtidSet =
    GtidSet(s.split(",").iterator.map(_.trim).filter(_.nonEmpty)
      .map { part =>
        val fields = part.split(":")
        val uuid = fields.head.toLowerCase
        val ivs = fields.tail.toSeq.map { r =>
          r.split("-") match {
            case Array(a) => (a.toLong, a.toLong)
            case Array(a, b) => (a.toLong, b.toLong)
            case _ => throw new IllegalArgumentException(
              s"bad GTID interval '$r'")
          }
        }
        uuid -> ivs
      }.toMap)

  /** H1: elect the contender whose set contains all others; None when
    * no node dominates (diverged cluster — the reference refuses to
    * fail over, `orchestrator.py:615-627`). Ties (equal sets) resolve
    * to the first contender in input order. */
  def mostAdvanced(contenders: Seq[(String, String)])
      : Option[String] = {
    val parsed = contenders.map { case (n, g) => (n, parse(g)) }
    parsed.find { case (_, g) =>
      parsed.forall { case (_, o) => o.subsetOf(g) }
    }.map(_._1)
  }
}

/** H4 (`orchestrator.py:85-131`): bounded retry around flaky
  * connector/side-effect calls. */
object Retry {
  def keepTrying[T](maxRetries: Int, delayMs: Long = 0L)
      (op: => Option[T]): Option[T] = {
    var i = 0
    while (i < maxRetries) {
      op match {
        case some @ Some(_) => return some
        case None =>
          i += 1
          if (i < maxRetries && delayMs > 0) Thread.sleep(delayMs)
      }
    }
    None
  }
}
