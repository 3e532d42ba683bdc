package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native MinHash signature over a shingle array.
  *
  * Each element is hashed ONCE (xxhash64, seed 42); the k signature
  * components come from k pairwise-independent affine permutations
  * `a_i * h + b_i` over Z_2^64 (odd multipliers from SplitMix64 of the
  * component index) — the standard one-hash construction (used by
  * Spark ML's MinHashLSH). Versus re-hashing the string per seed, this
  * turns O(k x n) string hashes + k temporary arrays into O(n) string
  * hashes + O(k x n) register-only multiply-adds in a single pass.
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${t.simpleString(10)}")
    }

  override def dataType: DataType = ArrayType(LongType, false)

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      MinHashSig.compute(input.asInstanceOf[ArrayData], k))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.MinHashSig.compute($c, $k))")

  override protected def withNewChildInternal(newChild: Expression)
      : MinHashSig = copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

object MinHashSig {

  private val Seed = 42L

  /** SplitMix64 — deterministic per-component multiplier/offset. */
  private def splitmix(x0: Long): Long = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def multipliers(k: Int): Array[Long] =
    Array.tabulate(k)(i => splitmix(2L * i) | 1L) // odd => bijective
  def offsets(k: Int): Array[Long] =
    Array.tabulate(k)(i => splitmix(2L * i + 1))

  // per-k coefficient cache (shared across rows/tasks in a JVM)
  private val coeffCache =
    new java.util.concurrent.ConcurrentHashMap[Int,
      (Array[Long], Array[Long])]()

  def compute(shingles: ArrayData, k: Int): Array[Long] = {
    val (as, bs) = coeffCache.computeIfAbsent(k,
      kk => (multipliers(kk), offsets(kk)))
    val mins = Array.fill(k)(Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val h = XXH64.hashUTF8String(shingles.getUTF8String(i), Seed)
        var j = 0
        while (j < k) {
          val v = as(j) * h + bs(j)
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    mins
  }
}
