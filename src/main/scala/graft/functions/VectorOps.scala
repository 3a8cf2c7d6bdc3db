package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native codegen dot product over two numeric arrays (float or double
  * elements), accumulated in double in element order — bit-identical to
  * the `aggregate(zip_with(a, b, _*_), 0.0, _+_)` higher-order formula it
  * replaces, but compiled into the enclosing WholeStageCodegen span
  * instead of interpreted per element (higher-order functions are
  * CodegenFallback; at 64 dims × corpus × queries the interpreter
  * overhead dominates ANN scoring).
  *
  * Null handling matches the HOF formula: a null array OR a null element
  * yields null.
  */
case class VectorDot(left: Expression, right: Expression)
  extends BinaryExpression {

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"vec_dot expects array<float|double> inputs, got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private lazy val lFloat = elemType(left).contains(FloatType)
  private lazy val rFloat = elemType(right).contains(FloatType)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // Length mismatch → null, matching zip_with's null padding (a silent
    // prefix dot would mask a dimension misconfiguration with
    // plausible-looking numbers).
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rFloat) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val getX = if (lFloat) s"(double) $x.getFloat($i)" else s"$x.getDouble($i)"
      val getY = if (rFloat) s"(double) $y.getFloat($i)" else s"$y.getDouble($i)"
      s"""
         |if ($x.numElements() != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $x.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $getX * $getY;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VectorDot =
    copy(left = l, right = r)

  override def prettyName: String = "vec_dot"
}

/** One-pass LSH signature kernel: all `tables` bucket ids of a vector in a
  * single compiled call. The per-plane formulation builds tables x bits
  * separate dot expressions — each re-reading the vector and inflating the
  * generated code; this reads the vector once and runs the
  * tables x bits x dim FMA loop tight (same accumulation order and
  * precision as [[VectorDot]]: ascending i, double acc — spec-pinned
  * bit-identity with the expression formulation).
  */
object VecKernel {
  /** `planes` is flattened [t][j][i] → t*bits*dim + j*dim + i. A vector of
    * the wrong dimension (or with null elements) yields bucket 0 in every
    * table — exactly what the per-plane formulation produced (VectorDot →
    * null → bit 0 for every plane). The sign test is `!(acc < 0)`, not
    * `acc >= 0`: Spark SQL orders NaN above every value, so the HOF's
    * `dot >= 0` sets the bit on NaN dots and Java's `NaN >= 0` would not.
    * `floatElems` selects the element reader (array<float> vs
    * array<double> — both accepted, like VectorDot).
    */
  def lshSigs(vec: ArrayData, planes: Array[Double], tables: Int, bits: Int,
      dim: Int, floatElems: Boolean): ArrayData = {
    val out = new Array[Long](tables)
    if (vec.numElements() == dim) {
      var ok = true
      var i = 0
      while (ok && i < dim) { ok = !vec.isNullAt(i); i += 1 }
      if (ok) {
        val v = new Array[Double](dim)
        var k0 = 0
        while (k0 < dim) {
          v(k0) = if (floatElems) vec.getFloat(k0).toDouble else vec.getDouble(k0)
          k0 += 1
        }
        var t = 0
        while (t < tables) {
          var bucket = 0L
          var j = 0
          while (j < bits) {
            val base = (t * bits + j) * dim
            var acc = 0.0
            var k = 0
            while (k < dim) {
              acc += v(k) * planes(base + k)
              k += 1
            }
            if (!(acc < 0)) bucket |= 1L << j
            j += 1
          }
          out(t) = bucket
          t += 1
        }
      }
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** `planes` as an immutable IndexedSeq for structural equality (see
  * MinhashSigExpr). NULL input vectors return null (no bucket rows after
  * the explode) — deliberately diverging from the per-plane formulation,
  * which bucketed every null vector into bucket 0 of every table: at
  * corpus scale that manufactures one mega-bucket of nulls.
  */
case class LshSigsExpr(child: Expression, planes: IndexedSeq[Double],
    tables: Int, bits: Int, dim: Int) extends UnaryExpression {
  @transient private lazy val planesArr: Array[Double] = planes.toArray
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_sigs expects array<float|double>, got ${other.simpleString}")
  }
  private lazy val floatElems: Boolean =
    child.dataType match { case ArrayType(FloatType, _) => true; case _ => false }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    VecKernel.lshSigs(v.asInstanceOf[ArrayData], planesArr, tables, bits, dim, floatElems)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshPlanes", planesArr, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VecKernel.lshSigs($c, $ref, $tables, $bits, $dim, $floatElems)")
  }
  override protected def withNewChildInternal(c: Expression): LshSigsExpr =
    copy(child = c)
  override def prettyName: String = "lsh_sigs"
}

object VectorOps {
  /** Σ aᵢ·bᵢ in double precision, codegen'd. */
  def dot(a: Column, b: Column): Column =
    Bridge.column(VectorDot(Bridge.expr(a), Bridge.expr(b)))

  /** All LSH table signatures of a vector, one compiled pass. */
  def lshSigs(vec: Column, planes: Array[Double], tables: Int, bits: Int,
      dim: Int): Column =
    Bridge.column(LshSigsExpr(Bridge.expr(vec), planes.toIndexedSeq, tables, bits, dim))
}
