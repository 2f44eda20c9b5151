package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd inner product over two `array<float>` (or two
  * `array<double>`) columns — [[CosineSimilarity]] with the
  * normalization dropped: the MIPS scoring primitive.
  *
  * Same left-fold accumulation order and float->double casts as
  * [[graft.similarity.VectorOps.dot]] / its DuckDB `dotSql` mirror, so
  * all three are bit-identical; like its sibling it participates in
  * whole-stage codegen (a primitive loop inlined into the stage).
  * Serving note: on a norm-AUGMENTED pair (x' = [x, aug], q' = [q, 0])
  * this fold equals the unaugmented dot(q, x) BIT-FOR-BIT — the last
  * term is 0.0 · aug = ±0.0 and IEEE double addition of a zero is
  * exact — which is what lets `knn_mips_ann` score candidates on the
  * augmented frame without re-attaching the original vectors.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "dot_product"

  private def elementType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(et @ (FloatType | DoubleType), _) => Some(et)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elementType(left), elementType(right)) match {
      case (Some(a), Some(b)) if a == b => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "dot_product requires two array<float> or two array<double> arguments, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  private lazy val isFloat: Boolean = elementType(left).contains(FloatType)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val float = isFloat
    var dot = 0.0
    var i = 0
    while (i < n) {
      val xv = if (float) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (float) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xv * yv
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val get = if (isFloat) "getFloat" else "getDouble"
      s"""
         |double $dot = 0.0;
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (double) $a.$get($i) * (double) $b.$get($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
