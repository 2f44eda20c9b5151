package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd cosine similarity over two `array<float>` (or two
  * `array<double>`) columns.
  *
  * Same left-fold accumulation order and float->double casts as
  * [[graft.similarity.VectorOps.cosine]] / its DuckDB SQL mirror, so the
  * three implementations are bit-identical — but this one participates
  * in whole-stage codegen: the generated Java is a primitive loop
  * inlined into the surrounding stage, no lambda interpretation, no row
  * materialization. Preference order per SURVEY.md §3: builtin
  * composition -> native `Expression` (this) -> mapPartitions kernel.
  *
  * Input types are validated in [[checkInputDataTypes]] (the public
  * analysis-time hook; `ExpectsInputTypes.inputTypes` is `private[sql]`):
  * both children must be arrays of the SAME floating element type. SQL
  * array literals like `array(1.0, 0.1)` are `array<double>` and take
  * the `getDouble` path; mixed float/double input is an analysis error
  * rather than a silent wrong-byte read.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "cosine_sim"

  private def elementType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(et @ (FloatType | DoubleType), _) => Some(et)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elementType(left), elementType(right)) match {
      case (Some(a), Some(b)) if a == b => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "cosine_sim requires two array<float> or two array<double> arguments, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  // Resolved only after checkInputDataTypes succeeds, so the .get is safe
  // anywhere eval/codegen runs. lazy val: the interpreted path evaluates
  // per row and must not re-pattern-match the element type each time.
  private lazy val isFloat: Boolean = elementType(left).contains(FloatType)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val float = isFloat
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = if (float) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (float) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xv * yv
      na += xv * xv
      nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val get = if (isFloat) "getFloat" else "getDouble"
      s"""
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.$get($i);
         |  double $y = (double) $b.$get($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
