package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Portable bloom filter as a custom Catalyst aggregate.
  *
  * A [[TypedImperativeAggregate]] building a fixed-size bitmap (the
  * same imperative-buffer shape as Spark's own `bloom_filter_agg` /
  * percentile aggregates): update sets k bit positions per key, merge
  * ORs two bitmaps, eval emits the words as `array<long>` — so the
  * sketch state is exact integers an external oracle can reproduce.
  * Bit positions come from the [[PolyHash]] affine family; only 32
  * bits of each word are used because external engines reject shifts
  * into the sign bit (`1::BIGINT << 63` overflows in DuckDB).
  *
  * The scale story: a bloom bitmap of a join's build side is the
  * classic semi-join pushdown — ship `mBits/8` bytes to prune a
  * corpus-sized probe side before the real join. Partial aggregation
  * means each map task ORs locally; the shuffle carries one bitmap per
  * partition.
  */
case class PolyBloomAgg(child: Expression, mBits: Int, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(mBits % 32 == 0, "mBits must be a multiple of 32")
  private def words = mBits / 32

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType | StringType =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires long/int/string, got ${t.simpleString(10)}")
    }

  override def dataType: DataType = ArrayType(LongType, false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](words)

  override def update(buf: Array[Long], input: InternalRow)
      : Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h0 = v match {
        case l: Long => math.floorMod(l, PolyHash.P)
        case i: Int => math.floorMod(i.toLong, PolyHash.P)
        case s: UTF8String => PolyHash.hashString(s)
      }
      var i = 0
      while (i < k) {
        val pos = (((PolyHash.multiplier(i) * h0 + PolyHash.offset(i))
          % PolyHash.P) % mBits).toInt
        buf(pos >> 5) |= (1L << (pos & 31))
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long])
      : Array[Long] = {
    var i = 0
    while (i < words) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(words * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(words)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int)
      : PolyBloomAgg = copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int)
      : PolyBloomAgg = copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression)
      : PolyBloomAgg = copy(child = newChild)

  override def prettyName: String = "poly_bloom_agg"
}

object PolyBloom {

  /** Membership probe against a [[PolyBloomAgg]] bitmap column: true
    * iff all k bit positions of `key` are set (bloom semantics:
    * no false negatives; false positives at the sketch's rate).
    * Composed from builtin expressions — stays in codegen. */
  def mightContain(bitmap: Column, key: Column, mBits: Int,
      k: Int): Column = {
    val h0 = pmod(key.cast("long"), lit(PolyHash.P))
    (0 until k).map { i =>
      val pos = ((lit(PolyHash.multiplier(i)) * h0
        + lit(PolyHash.offset(i))) % lit(PolyHash.P)) % lit(mBits.toLong)
      val word = element_at(bitmap,
        floor(pos / lit(32)).cast("int") + 1)
      call_function("shiftright", word, (pos % 32).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }
}
