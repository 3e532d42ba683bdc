package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Two-level (coarse-quantized) nearest-centroid assignment — the
  * IVF-probed form of [[NearestCentroids]] for clustered operators
  * whose centroid count scales with the corpus
  * ([[graft.llm.Dedup.semanticDedup]]'s adaptive k).
  *
  * Exact assignment is |corpus| x k cosines; with corpus-adaptive
  * k = n/targetCluster that is n^2/targetCluster FLOPs — the
  * SemDeDup algorithm's own scaling law, measured 52.7x for 10x data
  * at the 1000x fixture. This expression bounds it: rank the
  * `coarse` set (~sqrt(k) vectors, the LCG-order prefix of the fine
  * set), then scan only fine centroids whose coarse cell
  * (`coarseOfFine`) is among the top-`probes` coarse cells — per-row
  * work drops from k to ~sqrt(k) * (1 + probes) dot products, still
  * entirely inside whole-stage codegen with zero data movement.
  *
  * Semantics are total and externally restatable (the DuckDB oracles
  * reproduce them row-for-row):
  *   1. coarse ranking: cosine desc, ARRAY INDEX asc on ties — the
  *      caller contracts to order `coarse` by the LCG sample rank,
  *      so index order IS the deterministic sample order;
  *   2. fine argmax over probed cells: cosine desc, cid asc on ties
  *      (exactly [[NearestCentroids]]'s rule);
  *   3. if no fine centroid maps to a probed cell (possible only on
  *      degenerate duplicate-vector coarse sets), fall back to the
  *      EXACT full scan — approximate never means unassigned.
  *
  * All cosines use [[ArrayCosine]]'s evaluation order (left-to-right
  * accumulation, element null -> 0, zero-norm -> 0.0), so results are
  * bit-identical to the cross-join restatement.
  */
case class NearestCentroidProbed(child: Expression,
    coarse: Array[Array[Double]], fineCids: Array[Long],
    fineVecs: Array[Array[Double]], coarseOfFine: Array[Int],
    probes: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<double> argument, got " +
          t.simpleString(10))
    }

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    NearestCentroidProbed.assign(v.asInstanceOf[ArrayData], coarse,
      fineCids, fineVecs, coarseOfFine, probes)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    // Plan-time constants ride as reference objects on the generated
    // class, exactly like NearestCentroids' centroid matrix.
    val coarseRef = ctx.addReferenceObj("coarse", coarse, "double[][]")
    val cidsRef = ctx.addReferenceObj("fineCids", fineCids, "long[]")
    val vecsRef = ctx.addReferenceObj("fineVecs", fineVecs, "double[][]")
    val mapRef = ctx.addReferenceObj("coarseOfFine", coarseOfFine, "int[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} = graft.functions.NearestCentroidProbed.assign(
         $v, $coarseRef, $cidsRef, $vecsRef, $mapRef, $probes);""")
  }

  override protected def withNewChildInternal(
      newChild: Expression): NearestCentroidProbed = copy(child = newChild)

  override def prettyName: String = "nearest_centroid_probed"
}

object NearestCentroidProbed {

  /** [[ArrayCosine]]'s cosine against a constant centroid — shared by
    * the generated per-row code here and in [[NearestCentroids]]. */
  def cosine(vec: ArrayData, cv: Array[Double]): Double = {
    val len = math.min(vec.numElements(), cv.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < len) {
      val x = if (vec.isNullAt(i)) 0.0 else vec.getDouble(i)
      val y = cv(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val sa = math.sqrt(na); val sb = math.sqrt(nb)
    if (sa == 0.0 || sb == 0.0) 0.0 else dot / (sa * sb)
  }

  /** Driver-side twin of [[cosine]] for two plain arrays (the
    * fine-to-coarse map construction runs on collected centroids). */
  def cosineArrays(a: Array[Double], b: Array[Double]): Double = {
    val len = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < len) {
      val x = a(i); val y = b(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val sa = math.sqrt(na); val sb = math.sqrt(nb)
    if (sa == 0.0 || sb == 0.0) 0.0 else dot / (sa * sb)
  }

  /** The per-row probed assignment. Called from generated code — one
    * invocation per row, allocation bounded by the (small) coarse
    * count. */
  def assign(vec: ArrayData, coarse: Array[Array[Double]],
      fineCids: Array[Long], fineVecs: Array[Array[Double]],
      coarseOfFine: Array[Int], probes: Int): Long = {
    val c = coarse.length
    val cs = new Array[Double](c)
    var j = 0
    while (j < c) { cs(j) = cosine(vec, coarse(j)); j += 1 }
    // Top-`probes` coarse cells by (cosine desc, index asc): repeated
    // max — probes is small, c ~ sqrt(k).
    val probed = new Array[Boolean](c)
    val p = math.min(probes, c)
    var r = 0
    while (r < p) {
      var best = -1
      var j2 = 0
      while (j2 < c) {
        if (!probed(j2) && (best < 0 || cs(j2) > cs(best)))
          best = j2
        j2 += 1
      }
      probed(best) = true
      r += 1
    }
    // Argmax over fine centroids in probed cells (cosine desc, cid
    // asc) — cosines only computed for scanned members.
    val k = fineVecs.length
    var bestIdx = -1
    var bestCos = 0.0
    var i = 0
    while (i < k) {
      if (probed(coarseOfFine(i))) {
        val cos = cosine(vec, fineVecs(i))
        if (bestIdx < 0 || cos > bestCos ||
            (cos == bestCos && fineCids(i) < fineCids(bestIdx))) {
          bestIdx = i; bestCos = cos
        }
      }
      i += 1
    }
    if (bestIdx >= 0) return fineCids(bestIdx)
    // Fallback: no fine centroid in any probed cell — exact scan.
    i = 0
    while (i < k) {
      val cos = cosine(vec, fineVecs(i))
      if (bestIdx < 0 || cos > bestCos ||
          (cos == bestCos && fineCids(i) < fineCids(bestIdx))) {
        bestIdx = i; bestCos = cos
      }
      i += 1
    }
    fineCids(bestIdx)
  }
}
