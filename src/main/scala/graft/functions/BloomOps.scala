package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter build + probe as in-plan expressions — the third sketch
  * family beside FAGMS (join sizes) and CMS (point frequencies): a Bloom
  * filter answers SET MEMBERSHIP with zero false negatives and a sized
  * false-positive rate, which is the semi-join pre-filter shape — reduce
  * a 100 TB fact scan to candidate rows with one broadcast bitset BEFORE
  * paying the shuffled exact join (the user-level face of the runtime
  * bloom pruning PlanAuditSpec pins on Spark's InjectRuntimeFilter, for
  * when the dim side is computed rather than a join Catalyst can see).
  *
  * Build is a mergeable TypedImperativeAggregate over Spark's public
  * `org.apache.spark.util.sketch.BloomFilter` (the same library class
  * `DataFrameStatFunctions.buildBloomFilter` serves): map-side partial
  * bitsets OR-merge across the exchange, so the pass over the dim is
  * shuffle-free except the tiny final merge. The probe travels as a
  * `lit(bytes)` broadcast literal — exactly how k-means centroids and the
  * CMS sketch re-enter the plan.
  *
  * No false negatives is LOAD-BEARING for correctness of the compose
  * pattern (bloom pre-filter → exact verify): a dropped true key would
  * silently lose result rows, which is precisely what the differential
  * `q_bloom_semijoin` entry would catch against the plain semi-join
  * oracle. False positives only cost work in the verify join; BloomSpec
  * measures the rate against the sized bound.
  */
case class BloomFilterAgg(
    key: Expression,
    expectedItems: Long,
    fpp: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] {

  require(expectedItems > 0, "bloom_agg: expectedItems must be positive")
  require(fpp > 0 && fpp < 1, s"bloom_agg: fpp must be in (0,1), got $fpp")

  override def children: Seq[Expression] = Seq(key)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = key.dataType match {
    case LongType | IntegerType | ShortType | ByteType | StringType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_agg requires an integral or string key column, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buffer: BloomFilter, input: InternalRow): BloomFilter = {
    val v = key.eval(input)
    if (v != null) v match {
      case s: UTF8String => buffer.putBinary(s.getBytes)
      case n: java.lang.Number => buffer.putLong(n.longValue())
    }
    buffer
  }

  override def merge(b1: BloomFilter, b2: BloomFilter): BloomFilter = {
    b1.mergeInPlace(b2); b1
  }

  override def eval(buffer: BloomFilter): Any = serialize(buffer)

  override def serialize(buffer: BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    buffer.writeTo(out)
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(o: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BloomFilterAgg =
    copy(key = c.head)

  override def prettyName: String = "bloom_agg"
}

/** `bloom_might_contain(sketch, key)` — the probe. Unlike [[CmsEstimate]]
  * this DOES sit on the corpus-sized hot path (it is a scan filter), so it
  * participates in whole-stage codegen: the generated code calls back into
  * this instance (a codegen reference object) whose cached deserialized
  * filter serves every row of the task when the sketch operand is the
  * intended foldable literal.
  */
final case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  private def deserialize(v: Any): BloomFilter =
    BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(v.asInstanceOf[Array[Byte]]))

  @transient private lazy val cachedBf: BloomFilter = deserialize(left.eval())

  // Non-foldable sketch operands (e.g. a joined-in per-group sketch
  // column) would otherwise deserialize the filter on EVERY row — an
  // O(rows × filter-size) hazard on the scan hot path this expression
  // is built for. The byte array is immutable in Spark's row lifecycle
  // and repeats by reference across consecutive rows of the same
  // sketch, so an identity-keyed one-slot cache amortizes it to one
  // deserialization per distinct upstream buffer.
  // Held as ONE immutable pair written once per miss: two separate fields
  // updated non-atomically could interleave under cross-thread reuse of a
  // plan fragment and pair bytes from one sketch with another's filter —
  // silent wrong pruning. A stale or torn *reference* read of the pair is
  // harmless (worst case: one redundant deserialize).
  @transient private var slot: (AnyRef, BloomFilter) = _

  /** Codegen/interpreted shared kernel (public: the generated code calls it). */
  def test(sketchBytes: Any, key: Any): Boolean = {
    val bf =
      if (left.foldable) cachedBf
      else {
        val ref = sketchBytes.asInstanceOf[AnyRef]
        val s = slot
        if (s != null && (s._1 eq ref)) s._2
        else {
          val fresh = deserialize(sketchBytes)
          slot = (ref, fresh)
          fresh
        }
      }
    key match {
      case s: UTF8String => bf.mightContainBinary(s.getBytes)
      case n: java.lang.Number => bf.mightContainLong(n.longValue())
    }
  }

  override def nullSafeEval(sketchBytes: Any, key: Any): Any =
    test(sketchBytes, key)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomMightContain", this,
      classOf[BloomMightContain].getName)
    // (Object) cast forces boxing of primitive key codegen values so the
    // call resolves against test(Object, Object).
    defineCodeGen(ctx, ev, (sk, k) => s"$ref.test($sk, (Object) $k)")
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain sketch must be binary, got ${left.dataType.simpleString}")
    else right.dataType match {
      case LongType | IntegerType | ShortType | ByteType | StringType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain key must be integral or string, got ${other.simpleString}")
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

object BloomOps {
  def bloom_agg(key: Column, expectedItems: Long, fpp: Double = 0.03): Column =
    Bridge.column(
      BloomFilterAgg(Bridge.expr(key), expectedItems, fpp).toAggregateExpression())

  def bloom_might_contain(sketch: Column, key: Column): Column =
    Bridge.column(BloomMightContain(Bridge.expr(sketch), Bridge.expr(key)))
}
