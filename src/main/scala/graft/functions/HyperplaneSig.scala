package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Random-hyperplane LSH signature (Charikar, STOC 2002) over an
  * `array<double>` vector: packs the sign bit of `planes` pseudo-random
  * +-1 hyperplane dot products into one long. Used by the embedding
  * near-dup family ([[graft.llm.Dedup.embeddingPairs]]) and the ANN
  * multi-probe index ([[graft.llm.Similarity]]).
  *
  * This replaces a planes x dim tree of `element_at(v,d) * lit(+-1)`
  * column expressions (1024 nodes at 16x64), which blows past the
  * generated-method size budget and drops the projection out of
  * whole-stage codegen — the per-row kernel here is a tight loop the
  * JIT vectorizes, invoked from generated code like the sibling
  * [[NearestCentroids]] / [[PqCodes]] expressions.
  *
  * Bit-compat contract: the dot product accumulates left-to-right in
  * doubles — EXACTLY the old column tree's `reduce(_ + _)` order and
  * the order the DuckDB oracles restate — and the +-1 plane components
  * come from the same byteswap64 hash ([[HyperplaneSig.planeSign]]), so
  * signatures are bit-identical to both. A null vector element nulls
  * every dot, which the old tree's `when(dot > 0)` collapsed to an
  * all-zero signature; the kernel preserves that (scan-then-zero). */
case class HyperplaneSig(child: Expression, dim: Int, planes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<double> argument, got " +
          t.simpleString(10))
    }

  override def dataType: DataType = LongType

  // Plan-time constant: planes x dim sign matrix, flattened row-major.
  @transient private lazy val signs: Array[Double] =
    HyperplaneSig.signMatrix(dim, planes)

  override def nullSafeEval(v: Any): Any =
    HyperplaneSig.sig(v.asInstanceOf[ArrayData], signs, dim, planes)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("signs", signs, "double[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} = graft.functions.HyperplaneSig.sig(
         $v, $signsRef, $dim, $planes);""")
  }

  override protected def withNewChildInternal(
      newChild: Expression): HyperplaneSig = copy(child = newChild)

  override def prettyName: String = "hyperplane_sig"
}

object HyperplaneSig {

  /** Plane p's component d: a fixed pseudo-random +-1 from a byteswap
    * hash of (p, d). The same values are baked as literals into the
    * DuckDB oracle SQL, so the signature needs no portable hashing. */
  def planeSign(p: Int, d: Int): Double =
    if (scala.util.hashing.byteswap64(
      p.toLong * 1000003L + d) % 2 == 0) 1.0 else -1.0

  /** Flattened row-major planes x dim sign matrix. */
  def signMatrix(dim: Int, planes: Int): Array[Double] =
    Array.tabulate(planes * dim)(i => planeSign(i / dim, i % dim))

  /** Signature kernel; called once per row from generated code. */
  def sig(vec: ArrayData, signs: Array[Double], dim: Int,
      planes: Int): Long = {
    if (vec.numElements() < dim)
      throw new IllegalArgumentException(
        s"hyperplane_sig: vector has ${vec.numElements()} elements, " +
          s"needs $dim")
    // A null component nulled every plane's dot in the column-tree
    // formulation, collapsing the signature to 0 — preserve that.
    var d = 0
    while (d < dim) {
      if (vec.isNullAt(d)) return 0L
      d += 1
    }
    var out = 0L
    var p = 0
    while (p < planes) {
      val off = p * dim
      var dot = 0.0
      var i = 0
      while (i < dim) {
        dot += vec.getDouble(i) * signs(off + i)
        i += 1
      }
      if (dot > 0.0) out |= 1L << p
      p += 1
    }
    out
  }
}
