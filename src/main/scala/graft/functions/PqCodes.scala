package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Shuffle-free product-quantization code assignment
  * ([[graft.llm.Similarity.pqTopK]] / `ivfpqTopK`): given an
  * `array<double>` vector and the driver-bounded codebook (plan-time
  * constant — `codebookSize` segments-sliced sample vectors), returns
  * the per-segment nearest codeword indices (L2, ties to the lower
  * code) as `array<int>`.
  *
  * Replaces the posexplode → broadcast-join(codebook) → windowed
  * `row_number` argmin shape, which shuffled |corpus| x segments x
  * codebookSize rows through an Exchange + per-(id, segment) sort to
  * take a minimum. The L2 accumulation order matches the former
  * `aggregate(zip_with(...))` fold exactly (left-to-right
  * `acc + (x-y)^2`), so the emitted codes are bit-identical.
  *
  * `codeSegs(code * segments + seg)` holds codeword `code`'s segment
  * `seg` (length `segLen`); the input vector's segment `seg` spans
  * elements `[seg*segLen, (seg+1)*segLen)`.
  */
case class PqCodes(child: Expression, codeSegs: Array[Array[Double]],
    segments: Int, segLen: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<double> argument, got " +
          t.simpleString(10))
    }

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    PqCodes.assign(v.asInstanceOf[ArrayData], codeSegs, segments,
      segLen)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val segsRef = ctx.addReferenceObj("codeSegs", codeSegs,
      "double[][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} = graft.functions.PqCodes.assign(
         $v, $segsRef, $segments, $segLen);""")
  }

  override protected def withNewChildInternal(
      newChild: Expression): PqCodes = copy(child = newChild)

  override def prettyName: String = "pq_codes"
}

object PqCodes {

  /** Per-segment argmin codeword. Called from generated code. */
  def assign(vec: ArrayData, codeSegs: Array[Array[Double]],
      segments: Int, segLen: Int): ArrayData = {
    val nCodes = codeSegs.length / segments
    val out = new Array[Int](segments)
    var seg = 0
    while (seg < segments) {
      var best = -1
      var bestD = 0.0
      var code = 0
      while (code < nCodes) {
        val cs = codeSegs(code * segments + seg)
        var d = 0.0
        var i = 0
        val base = seg * segLen
        while (i < segLen) {
          val x =
            if (base + i < vec.numElements() &&
              !vec.isNullAt(base + i)) vec.getDouble(base + i)
            else 0.0
          val diff = x - cs(i)
          d += diff * diff
          i += 1
        }
        if (best < 0 || d < bestD) { best = code; bestD = d }
        code += 1
      }
      out(seg) = best
      seg += 1
    }
    new GenericArrayData(out)
  }
}
