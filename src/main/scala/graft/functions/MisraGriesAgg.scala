package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Mergeable Misra-Gries heavy-hitters summary: at most `k` counters; any
  * key whose true frequency exceeds n/(k+1) is guaranteed present, and
  * every kept counter underestimates its key's true count by at most
  * n/(k+1).
  *
  * Mergeability (Agarwal et al., "Mergeable Summaries"): two summaries
  * merge by adding counters, then subtracting the (k+1)-th largest count
  * from all and dropping the non-positive — the error bound adds, so
  * Spark's partial/final aggregation (map-side summaries merged on the
  * driver side of the exchange) preserves the guarantee at any
  * parallelism. State is ≤ k (key, count) pairs per partition — at 100 TB
  * the pass is shuffle-free except the final tiny merge, the same
  * execution shape as `fagms_sketch`.
  */
final class MGSummary(val k: Int) {
  val counts = new java.util.HashMap[Long, Long]()

  def add(key: Long): Unit = {
    // containsKey first: get() on an absent key would unbox null → NPE.
    if (counts.containsKey(key)) counts.put(key, counts.get(key) + 1L)
    else if (counts.size < k) counts.put(key, 1L)
    else decrementAll(1L)
  }

  /** Subtract `by` from every counter, dropping non-positive ones. Each
    * call removes ≥ k total count, so over n updates it runs ≤ n/k times:
    * amortized O(1) per row.
    */
  private def decrementAll(by: Long): Unit = {
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val nv = e.getValue - by
      if (nv <= 0L) it.remove() else e.setValue(nv)
    }
  }

  def mergeIn(other: MGSummary): Unit = {
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      counts.merge(e.getKey, e.getValue, (a, b) => a + b)
    }
    if (counts.size > k) {
      // Subtract the (k+1)-th largest count; at most k survive.
      val vals = new Array[Long](counts.size)
      var i = 0
      val vit = counts.values().iterator()
      while (vit.hasNext) { vals(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(vals)
      decrementAll(vals(vals.length - (k + 1)))
    }
  }

  def serialize(): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(8 + 16 * counts.size)
    buf.putInt(k).putInt(counts.size)
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      buf.putLong(e.getKey).putLong(e.getValue)
    }
    buf.array()
  }
}

object MGSummary {
  def deserialize(bytes: Array[Byte]): MGSummary = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val s = new MGSummary(buf.getInt())
    var n = buf.getInt()
    while (n > 0) { s.counts.put(buf.getLong(), buf.getLong()); n -= 1 }
    s
  }
}

/** `misra_gries(key, k)` aggregate → `array<struct<key:long, cnt:long>>`
  * ordered by (cnt desc, key asc): the candidate heavy-hitter set. NULL
  * keys are skipped. Counts are the summary's LOWER estimates — callers
  * wanting exact figures re-count the (≤ k) candidates in a second pass
  * ([[graft.operators.HeavyHitters.topK]]), mirroring how the dedup
  * operators verify LSH candidates exactly.
  */
case class MisraGriesAgg(
    key: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGSummary] {

  require(k > 0, "misra_gries: k must be positive")

  override def children: Seq[Expression] = Seq(key)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("key", LongType, nullable = false),
      StructField("cnt", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = key.dataType match {
    case LongType | IntegerType | ShortType | ByteType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"misra_gries requires an integral key column, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): MGSummary = new MGSummary(k)

  override def update(buffer: MGSummary, input: InternalRow): MGSummary = {
    val v = key.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[java.lang.Number].longValue())
    buffer
  }

  override def merge(b1: MGSummary, b2: MGSummary): MGSummary = {
    b1.mergeIn(b2); b1
  }

  override def eval(buffer: MGSummary): Any = {
    val entries = new Array[(Long, Long)](buffer.counts.size)
    var i = 0
    val it = buffer.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      entries(i) = (e.getKey, e.getValue); i += 1
    }
    val sorted = entries.sortBy { case (key, cnt) => (-cnt, key) }
    new GenericArrayData(sorted.map { case (key, cnt) =>
      new GenericInternalRow(Array[Any](key, cnt))
    })
  }

  override def serialize(buffer: MGSummary): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): MGSummary = MGSummary.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MisraGriesAgg =
    copy(key = c.head)

  override def prettyName: String = "misra_gries"
}

object MisraGriesAgg {
  def misra_gries(key: Column, k: Int): Column =
    Bridge.column(MisraGriesAgg(Bridge.expr(key), k).toAggregateExpression())
}
