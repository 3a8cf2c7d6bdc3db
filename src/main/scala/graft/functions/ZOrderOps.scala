package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Z-order (Morton) interleaving for multi-dimensional data clustering.
  *
  * Sorting a table by `interleave_bits(x, y)` places rows that are close
  * in BOTH dimensions into the same neighborhood of the sort order, so
  * parquet row-group min/max stats on x and y become tight per row group
  * and a 2-D box predicate prunes most groups at scan time — the
  * data-skipping layout a 100 TB fact table wants when queries filter on
  * two independent columns at once. (A single-column sort gives perfect
  * stats on that column and useless stats on every other; the Z-curve
  * trades a little of each for locality in all interleaved dimensions.)
  * The reference engine gets the same effect from its fragment-level
  * min/max metadata skipping (mapd-core/QueryEngine/
  * AggregatedColRange.cpp + InputMetadata.cpp fragment skipping); here
  * the layout itself is the index.
  *
  * The kernel is the textbook parallel-bit-spread (five mask-shift
  * rounds), compiled into WholeStageCodegen via `defineCodeGen` — one
  * static call per row, no boxing, no fallback.
  *
  * Contract: the low 32 bits of each input are interleaved (x in even
  * bit positions, y in odd); higher bits are ignored. Callers bucket or
  * range-reduce wider domains first — at petabyte scale z-codes key
  * RANGE partitioning, so only relative order within the domain matters.
  */
object ZOrderKernel {
  /** Spread the low 32 bits of v so input bit i lands at position 2i. */
  def spread(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  def interleave(x: Long, y: Long): Long = spread(x) | (spread(y) << 1)
}

/** `interleave_bits(x, y)` → BIGINT Morton code (x even bits, y odd). */
case class InterleaveBits(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(c =>
        c.dataType == LongType || c.dataType == IntegerType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "interleave_bits expects two integral columns")

  private def asLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int  => i.toLong
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrderKernel.interleave(asLong(a), asLong(b))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ZOrderKernel.interleave((long)($a), (long)($b))")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): InterleaveBits =
    copy(left = l, right = r)
  override def prettyName: String = "interleave_bits"
}
