package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Shuffle-free nearest-centroid assignment for the IVF family
  * ([[graft.llm.Similarity]]): given an `array<double>` vector and a
  * driver-collected centroid set (a plan-time constant — IVF centroid
  * counts are bounded by construction), returns the ids of the `n`
  * centroids with the highest cosine similarity, ordered by (cosine
  * desc, cid asc).
  *
  * This replaces the `crossJoin(broadcast(centroids))` + windowed
  * `row_number` argmax shape, which shuffles |input| x nCentroids
  * rows through an Exchange + per-group sort just to take a maximum —
  * a gratuitous exchange at billion-vector corpus scale. Here the
  * argmax runs inside whole-stage codegen with zero data movement:
  * each row is evaluated in place and emits only its centroid ids.
  *
  * The cosine per centroid uses EXACTLY [[ArrayCosine]]'s evaluation
  * order (left-to-right accumulation, zero-norm -> 0.0), so results
  * are bit-identical to the join+window formulation the DuckDB
  * oracles restate.
  */
case class NearestCentroids(child: Expression, cids: Array[Long],
    cents: Array[Array[Double]], n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<double> argument, got " +
          t.simpleString(10))
    }

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    NearestCentroids.topN(v.asInstanceOf[ArrayData], cents, cids, n)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    // The centroid matrix is a per-plan constant: ship it into the
    // generated class as a reference object, not per-row state.
    val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
    val cidsRef = ctx.addReferenceObj("cids", cids, "long[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} = graft.functions.NearestCentroids.topN(
         $v, $centsRef, $cidsRef, $n);""")
  }

  override protected def withNewChildInternal(
      newChild: Expression): NearestCentroids = copy(child = newChild)

  override def prettyName: String = "nearest_centroids"
}

object NearestCentroids {

  /** Top-`n` centroid ids by (cosine desc, cid asc). Called from
    * generated code — one invocation per row, no allocation beyond
    * the (small) result. */
  def topN(vec: ArrayData, cents: Array[Array[Double]],
      cids: Array[Long], n: Int): ArrayData = {
    val m = cents.length
    val sims = new Array[Double](m)
    var c = 0
    while (c < m) {
      val cv = cents(c)
      val len = math.min(vec.numElements(), cv.length)
      var dot = 0.0
      var na = 0.0
      var nb = 0.0
      var i = 0
      while (i < len) {
        val x = if (vec.isNullAt(i)) 0.0 else vec.getDouble(i)
        val y = cv(i)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      val sa = math.sqrt(na)
      val sb = math.sqrt(nb)
      sims(c) = if (sa == 0.0 || sb == 0.0) 0.0 else dot / (sa * sb)
      c += 1
    }
    // Selection by repeated max: n is small (1..nProbe), m is the
    // centroid count — O(n*m) with no sort allocation.
    val k = math.min(n, m)
    val out = new Array[Long](k)
    val used = new Array[Boolean](m)
    var r = 0
    while (r < k) {
      var best = -1
      var c2 = 0
      while (c2 < m) {
        if (!used(c2) && (best < 0 || sims(c2) > sims(best) ||
            (sims(c2) == sims(best) && cids(c2) < cids(best))))
          best = c2
        c2 += 1
      }
      used(best) = true
      out(r) = cids(best)
      r += 1
    }
    new GenericArrayData(out)
  }
}
