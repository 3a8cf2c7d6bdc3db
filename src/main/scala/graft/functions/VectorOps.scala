package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
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

object VectorOps {
  /** Σ aᵢ·bᵢ in double precision, codegen'd. */
  def dot(a: Column, b: Column): Column =
    Bridge.column(VectorDot(Bridge.expr(a), Bridge.expr(b)))
}
