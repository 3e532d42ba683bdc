package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Per-group top-k by score as a custom Catalyst aggregate.
  *
  * The Spark-native shape for "k best matches per probe" at scale:
  * the classic window form (`row_number().over(partitionBy(qid)
  * .orderBy(score))` then `rank <= k`) must SHUFFLE the entire scored
  * stream — for a brute-force ANN pass that stream is |corpus| x
  * |probes| rows, and the 100x stress fixture killed the JVM sorting
  * it. A [[TypedImperativeAggregate]] instead keeps a bounded k-entry
  * heap per group: partial aggregation runs map-side inside the scan
  * stage, so only |groups| x k heap entries ever cross the exchange —
  * the cross product itself is consumed where it is produced and never
  * materialized or shuffled.
  *
  * Ordering matches the window form exactly — score descending, id
  * ascending on ties, doubles compared like Spark's sort order
  * (NaN greatest; -0.0 normalized to 0.0 on entry so the pair falls
  * through to the id tie-break exactly as `nanSafeCompareDoubles`
  * would) — so replacing the window with this aggregate is
  * output-identical, and external oracles can restate it with their
  * own window functions unchanged.
  *
  * Null handling: rows with a null score OR null id are SKIPPED (the
  * usual aggregate-input convention), whereas the window form ranks
  * null scores NULLS LAST — a group with fewer than k non-null scores
  * emits fewer rows here than the window would. Callers wanting exact
  * window parity on nullable inputs must filter or coalesce nulls
  * themselves; every in-repo caller scores with non-null arithmetic.
  *
  * eval emits `array<struct<id:long, score:double>>` already sorted
  * best-first; `posexplode` recovers (rank - 1) as the position.
  */
case class TopKByScoreAgg(score: Expression, id: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKByScoreAgg.Buffer]
  with BinaryLike[Expression] {

  require(k > 0, "k must be positive")

  override def left: Expression = score
  override def right: Expression = id

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (double, long), got " +
          s"${s.simpleString(10)}, ${i.simpleString(10)}")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKByScoreAgg.Buffer =
    new TopKByScoreAgg.Buffer(k)

  override def update(buf: TopKByScoreAgg.Buffer, input: InternalRow)
      : TopKByScoreAgg.Buffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKByScoreAgg.Buffer,
      other: TopKByScoreAgg.Buffer): TopKByScoreAgg.Buffer = {
    var j = 0
    while (j < other.size) {
      buf.offer(other.scores(j), other.ids(j))
      j += 1
    }
    buf
  }

  override def eval(buf: TopKByScoreAgg.Buffer): Any = {
    // Non-destructive: extract from a copy (worst pops first), filling
    // the output back-to-front so it reads best-first.
    val heap = buf.copy()
    val n = heap.size
    val rows = new Array[Any](n)
    var j = n - 1
    while (j >= 0) {
      val row = new GenericInternalRow(2)
      row.update(0, heap.ids(0))
      row.update(1, heap.scores(0))
      rows(j) = row
      heap.removeWorst()
      j -= 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKByScoreAgg.Buffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    var j = 0
    while (j < buf.size) {
      bb.putDouble(buf.scores(j)); bb.putLong(buf.ids(j)); j += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKByScoreAgg.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKByScoreAgg.Buffer(k)
    var j = 0
    while (j < n) { buf.offer(bb.getDouble, bb.getLong); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int)
      : TopKByScoreAgg = copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int)
      : TopKByScoreAgg = copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): TopKByScoreAgg =
    copy(score = newLeft, id = newRight)

  override def prettyName: String = "top_k_by_score"
}

object TopKByScoreAgg {

  /** Bounded binary min-heap over parallel primitive arrays; the root
    * (index 0) is the WORST retained entry — smallest score, largest
    * id on ties. Scores compare via `Double.compare` (NaN greatest)
    * with -0.0 normalized to 0.0 in [[offer]]: `Double.compare` alone
    * orders -0.0 < 0.0, but Spark's sort (`nanSafeCompareDoubles`)
    * treats them equal and falls through to the id tie-break — the
    * normalization keeps mixed ±0.0 scores window-identical. */
  final class Buffer(k: Int) {
    val scores = new Array[Double](k)
    val ids = new Array[Long](k)
    var size: Int = 0

    def copy(): Buffer = {
      val b = new Buffer(k)
      System.arraycopy(scores, 0, b.scores, 0, size)
      System.arraycopy(ids, 0, b.ids, 0, size)
      b.size = size
      b
    }

    /** a-entry strictly worse than b-entry? */
    private def worse(sa: Double, ia: Long, sb: Double, ib: Long)
        : Boolean = {
      val c = java.lang.Double.compare(sa, sb)
      c < 0 || (c == 0 && ia > ib)
    }

    def offer(s0: Double, i: Long): Unit = {
      val s = if (s0 == 0.0d) 0.0d else s0 // -0.0 -> 0.0 (see above)
      if (size < k) {
        // Sift up from the next leaf.
        var j = size
        size += 1
        scores(j) = s; ids(j) = i
        while (j > 0 && worse(scores(j), ids(j),
            scores((j - 1) / 2), ids((j - 1) / 2))) {
          swap(j, (j - 1) / 2); j = (j - 1) / 2
        }
      } else if (worse(scores(0), ids(0), s, i)) {
        // Better than the current worst: replace root, sift down.
        scores(0) = s; ids(0) = i
        siftDown()
      }
    }

    def removeWorst(): Unit = {
      size -= 1
      scores(0) = scores(size); ids(0) = ids(size)
      siftDown()
    }

    private def siftDown(): Unit = {
      var j = 0
      var continue = true
      while (continue) {
        val l = 2 * j + 1; val r = 2 * j + 2
        var w = j
        if (l < size && worse(scores(l), ids(l), scores(w), ids(w)))
          w = l
        if (r < size && worse(scores(r), ids(r), scores(w), ids(w)))
          w = r
        if (w == j) continue = false
        else { swap(j, w); j = w }
      }
    }

    private def swap(a: Int, b: Int): Unit = {
      val ts = scores(a); scores(a) = scores(b); scores(b) = ts
      val ti = ids(a); ids(a) = ids(b); ids(b) = ti
    }
  }
}
