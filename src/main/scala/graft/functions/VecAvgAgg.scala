package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Element-wise mean of embedding vectors (`array<float>`/`array<double>`)
  * — the pooling step that turns chunk embeddings into a document
  * embedding (mean pooling), or cluster members into a centroid.
  *
  * The naive SQL shape (posexplode → groupBy(group, pos) → avg →
  * re-collect) shuffles n × dim rows and needs a second pass to
  * reassemble arrays. This aggregate keeps one running (sums[dim], count)
  * buffer per group: updates are map-side, merges add element-wise, and
  * the exchange carries one array per group per partition — at 100 TB the
  * traffic is group-cardinality × dim doubles, independent of row count.
  *
  * Sums accumulate in double precision regardless of input element type
  * (float inputs are widened per element, the same contract as Spark's
  * own avg over FloatType). NULL vectors are skipped; NULL elements
  * contribute 0 to their position's sum but the row still counts — use
  * only densely-populated embedding columns (the multimodal/embeddings
  * tables guarantee this). Mismatched lengths fail loudly: silently
  * truncating embeddings would corrupt every downstream similarity.
  */
final class VecAvgBuffer(var sums: Array[Double], var count: Long) {
  def serialize(): Array[Byte] = {
    val n = if (sums == null) -1 else sums.length
    val buf = java.nio.ByteBuffer.allocate(12 + math.max(n, 0) * 8)
    buf.putInt(n).putLong(count)
    var i = 0
    while (i < math.max(n, 0)) { buf.putDouble(sums(i)); i += 1 }
    buf.array()
  }
}

object VecAvgBuffer {
  def deserialize(bytes: Array[Byte]): VecAvgBuffer = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val n = buf.getInt()
    val count = buf.getLong()
    if (n < 0) new VecAvgBuffer(null, count)
    else {
      val sums = new Array[Double](n)
      var i = 0
      while (i < n) { sums(i) = buf.getDouble(); i += 1 }
      new VecAvgBuffer(sums, count)
    }
  }
}

case class VecAvgAgg(
    vec: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecAvgBuffer] {

  override def children: Seq[Expression] = Seq(vec)
  override def nullable: Boolean = true // empty group → null, like avg
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private lazy val elementIsFloat: Boolean = vec.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = vec.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_avg requires array<float> or array<double>, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): VecAvgBuffer = new VecAvgBuffer(null, 0L)

  override def update(buffer: VecAvgBuffer, input: InternalRow): VecAvgBuffer = {
    val v = vec.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (buffer.sums == null) buffer.sums = new Array[Double](n)
    require(buffer.sums.length == n,
      s"vec_avg: mixed vector lengths in one group (${buffer.sums.length} vs $n)")
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i))
        buffer.sums(i) += (if (elementIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i))
      i += 1
    }
    buffer.count += 1L
    buffer
  }

  override def merge(b1: VecAvgBuffer, b2: VecAvgBuffer): VecAvgBuffer = {
    if (b2.sums == null) return b1
    if (b1.sums == null) { b1.sums = b2.sums; b1.count = b2.count; return b1 }
    require(b1.sums.length == b2.sums.length,
      s"vec_avg: mixed vector lengths across partitions (${b1.sums.length} vs ${b2.sums.length})")
    var i = 0
    while (i < b1.sums.length) { b1.sums(i) += b2.sums(i); i += 1 }
    b1.count += b2.count
    b1
  }

  override def eval(buffer: VecAvgBuffer): Any =
    if (buffer.sums == null || buffer.count == 0L) null
    else new GenericArrayData(buffer.sums.map(_ / buffer.count))

  override def serialize(buffer: VecAvgBuffer): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): VecAvgBuffer = VecAvgBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): VecAvgAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VecAvgAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): VecAvgAgg =
    copy(vec = c.head)

  override def prettyName: String = "vec_avg"
}

object VecAvgAgg {
  def vec_avg(vec: Column): Column =
    Bridge.column(VecAvgAgg(Bridge.expr(vec)).toAggregateExpression())
}
