package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd |A ∩ B| over two SORTED arrays — the
  * [[JaccardSorted]] sorted-merge two-pointer intersection returning
  * the raw intersection SIZE instead of the Jaccard ratio, for
  * operators whose threshold is an integer inequality rather than a
  * float (containment: `den*inter >= num*|A|` — dividing and
  * re-comparing a double would reintroduce exactly the FP boundary
  * the integer form exists to avoid).
  *
  * Same contracts as its sibling: `array<string>` compares binary
  * UTF8 order (the order `array_sort` produced) and `array<int>`
  * compares dense ids; O(|A|+|B|), inlined into whole-stage codegen —
  * the builtin `array_intersect` instead builds a hash set per call
  * and allocates the intersection array this operator never needs.
  */
case class IntersectSizeSorted(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def prettyName: String = "intersect_size_sorted"

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(StringType, _)  => Some(StringType)
    case ArrayType(IntegerType, _) => Some(IntegerType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(a), Some(b)) if a == b => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "intersect_size_sorted requires two array<string> or two array<int> arguments, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  private lazy val intElements: Boolean =
    left.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var inter = 0
    if (intElements) {
      while (i < nx && j < ny) {
        val xi = x.getInt(i)
        val yj = y.getInt(j)
        if (xi == yj) { inter += 1; i += 1; j += 1 }
        else if (xi < yj) i += 1
        else j += 1
      }
    } else {
      while (i < nx && j < ny) {
        val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
        if (c == 0) { inter += 1; i += 1; j += 1 }
        else if (c < 0) i += 1
        else j += 1
      }
    }
    inter
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val inter = ctx.freshName("inter")
      val body =
        if (intElements) {
          val xi = ctx.freshName("xi")
          val yj = ctx.freshName("yj")
          s"""
             |int $xi = $a.getInt($i); int $yj = $b.getInt($j);
             |if ($xi == $yj) { $inter++; $i++; $j++; }
             |else if ($xi < $yj) { $i++; } else { $j++; }
           """.stripMargin
        } else {
          val c = ctx.freshName("c")
          s"""
             |int $c = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
             |if ($c == 0) { $inter++; $i++; $j++; }
             |else if ($c < 0) { $i++; } else { $j++; }
           """.stripMargin
        }
      s"""
         |int $nx = $a.numElements(); int $ny = $b.numElements();
         |int $i = 0; int $j = 0; int $inter = 0;
         |while ($i < $nx && $j < $ny) {
         |  $body
         |}
         |${ev.value} = $inter;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
