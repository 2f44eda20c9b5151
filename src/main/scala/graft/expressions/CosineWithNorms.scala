package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** [[CosineSimilarity]] with the two squared norms PRECOMPUTED per
  * vector instead of re-accumulated per pair — the candidate-verify
  * optimization for blocked all-pairs joins (guide §1.2 "per-task
  * work"): a pair join over b candidates evaluates the verifier b
  * times but touches only n distinct vectors, so hoisting the two
  * norm folds out of the pair loop cuts the inner loop from three
  * multiply-adds per element to one.
  *
  * BIT-IDENTICAL to `CosineSimilarity(a, b)` by construction:
  *
  *  - `na2`/`nb2` must be the [[DotProduct]] self-fold (`dot(a, a)`),
  *    which accumulates the same `x*x` products in the same order as
  *    CosineSimilarity's inline `na`/`nb` when the two arrays have
  *    EQUAL length (the fold runs over min(|a|,|b|) = |a|);
  *  - on RAGGED pairs (|a| != |b|) the precomputed full-length norms
  *    would differ from the min-length inline ones, so this expression
  *    falls back to re-accumulating both norms over min(|a|,|b|)
  *    exactly like CosineSimilarity — the precomputed values are
  *    ignored. Every corpus in the suite is fixed-width, so the
  *    fallback is a dead branch in practice, but it makes the
  *    equivalence unconditional rather than a caller obligation.
  */
case class CosineWithNorms(first: Expression, second: Expression,
                           third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "cosine_sim_prenorm"

  private def elementType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(et @ (FloatType | DoubleType), _) => Some(et)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elementType(first), elementType(second), third.dataType, fourth.dataType) match {
      case (Some(a), Some(b), DoubleType, DoubleType) if a == b =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "cosine_sim_prenorm requires (array<float>, array<float>, double, double) " +
          "or the array<double> equivalent, got " +
          s"${first.dataType.catalogString}, ${second.dataType.catalogString}, " +
          s"${third.dataType.catalogString}, ${fourth.dataType.catalogString}")
    }

  private lazy val isFloat: Boolean = elementType(first).contains(FloatType)

  override protected def nullSafeEval(a: Any, b: Any, na2In: Any, nb2In: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    val n = math.min(nx, ny)
    val float = isFloat
    var dot = 0.0
    var i = 0
    while (i < n) {
      val xv = if (float) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (float) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xv * yv
      i += 1
    }
    if (nx == ny) {
      dot / (math.sqrt(na2In.asInstanceOf[Double]) *
        math.sqrt(nb2In.asInstanceOf[Double]))
    } else {
      // ragged pair: recompute both norms over min length, exactly the
      // CosineSimilarity fold
      var na = 0.0
      var nb = 0.0
      i = 0
      while (i < n) {
        val xv = if (float) x.getFloat(i).toDouble else x.getDouble(i)
        val yv = if (float) y.getFloat(i).toDouble else y.getDouble(i)
        na += xv * xv
        nb += yv * yv
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, na2, nb2) => {
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val n = ctx.freshName("n")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val get = if (isFloat) "getFloat" else "getDouble"
      s"""
         |double $dot = 0.0;
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $n = java.lang.Math.min($nx, $ny);
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (double) $a.$get($i) * (double) $b.$get($i);
         |}
         |if ($nx == $ny) {
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na2) * java.lang.Math.sqrt($nb2));
         |} else {
         |  double $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $x = (double) $a.$get($i);
         |    double $y = (double) $b.$get($i);
         |    $na += $x * $x; $nb += $y * $y;
         |  }
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond,
      third = newThird, fourth = newFourth)
}
