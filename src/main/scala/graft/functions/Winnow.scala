package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StructField, StructType}

/** Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken,
  * "Winnowing: Local Algorithms for Document Fingerprinting",
  * SIGMOD 2003).
  *
  * Input: the position-ordered k-gram hash array of one document
  * (what [[PolyShingleHashesWideAll]] emits). Over every window of
  * `w` consecutive hashes, select the MINIMUM hash, breaking ties by
  * the RIGHTMOST occurrence (the paper's §4 selection rule); the
  * document's fingerprints are the distinct (position, hash) pairs so
  * selected. The scheme is LOCAL — whether a position is selected
  * depends only on the w-1 hashes on each side — which is what gives
  * the paper's guarantee: any shared substring of length at least
  * w + k - 1 produces at least one shared fingerprint, while the
  * expected density is 2/(w+1) of all grams, an ~(w+1)/2 fold index
  * shrink over full-gram indexing.
  *
  * Short-document arm: a document with fewer than `w` gram hashes
  * (including the single whole-text hash a sub-k-char text yields)
  * forms one window covering all of them — every document fingerprints
  * to at least one entry, mirroring the `len < n` arm of the gram
  * kernels.
  *
  * Positions are 1-based gram start offsets in the normalized text,
  * matching the `substr(t, i, k)` positions of the external oracle's
  * gram derivation.
  *
  * The selection is one O(n) pass with a monotonic deque (ascending
  * hash values; an incoming equal-or-smaller hash evicts from the
  * back, which is exactly what makes the surviving equal value the
  * rightmost one). Recorded positions are strictly increasing — the
  * window minimum's index never moves left — so consecutive-repeat
  * suppression yields the distinct fingerprint set directly.
  */
object Winnow {

  /** Selected (pos, hash) fingerprints of one hash array; `flat`
    * packs pair i as [2i]=pos (1-based, as long), [2i+1]=hash. */
  def select(hashes: ArrayData, w: Int): Array[Long] = {
    val n = hashes.numElements()
    if (n == 0) return Array.emptyLongArray
    if (n <= w) {
      // One window over the whole array: rightmost minimum.
      var best = hashes.getLong(0)
      var bestPos = 0
      var i = 1
      while (i < n) {
        val h = hashes.getLong(i)
        if (h <= best) { best = h; bestPos = i }
        i += 1
      }
      return Array((bestPos + 1).toLong, best)
    }
    // Deque of candidate indices, hash-ascending front to back.
    val deque = new Array[Int](n)
    var head = 0
    var tail = 0 // exclusive
    val out = new Array[Long](2 * (n - w + 1))
    var count = 0
    var lastRecorded = -1
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      while (tail > head && hashes.getLong(deque(tail - 1)) >= h)
        tail -= 1
      deque(tail) = i
      tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) {
        val sel = deque(head)
        if (sel != lastRecorded) {
          out(count) = (sel + 1).toLong
          out(count + 1) = hashes.getLong(sel)
          count += 2
          lastRecorded = sel
        }
      }
      i += 1
    }
    java.util.Arrays.copyOf(out, count)
  }

  /** [[select]] packaged as array<struct<pos:int, fp:long>> rows. */
  def selectRows(hashes: ArrayData, w: Int): ArrayData = {
    val flat = select(hashes, w)
    val rows = new Array[Any](flat.length / 2)
    var i = 0
    while (i < rows.length) {
      rows(i) = new GenericInternalRow(
        Array[Any](flat(2 * i).toInt, flat(2 * i + 1)))
      i += 1
    }
    new GenericArrayData(rows)
  }
}

/** Native winnowing selection over a position-ordered gram-hash
  * array: array<long> → array<struct<pos:int, fp:long>> of the
  * distinct rightmost-minimum fingerprints per w-window (see
  * [[Winnow]]). Codegen delegates to the static kernel, so the
  * expression stays inside whole-stage codegen next to the gram-hash
  * kernel feeding it — per document the full pipeline
  * text → grams → fingerprints is one fused narrow pass, the shape
  * that lets a 100 TB corpus fingerprint as a pure map with no
  * shuffle before the index groupBy. */
case class WinnowFingerprints(child: Expression, w: Int)
    extends UnaryExpression {
  require(w >= 1, s"winnow window must be >= 1, got $w")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint>, got ${t.simpleString(10)}")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pos", IntegerType, nullable = false),
      StructField("fp", LongType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(input: Any): Any =
    Winnow.selectRows(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Winnow.selectRows($c, $w)")

  override protected def withNewChildInternal(newChild: Expression)
      : WinnowFingerprints = copy(child = newChild)

  override def prettyName: String = "winnow_fingerprints"
}
