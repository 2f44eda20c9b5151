package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd Jaccard similarity over two SORTED arrays (the
  * output of `array_sort`): a sorted-merge two-pointer intersection
  * inlined into whole-stage codegen. Accepts `array<string>` (binary
  * UTF8 order — exactly the order `array_sort` produced, so the merge
  * and the sort can never disagree on collation) or `array<int>`
  * (dictionary-encoded token ids: the dedup verify path encodes tokens
  * to dense ids BEFORE the candidate join, so the wide pair join ships
  * 4-byte ids instead of full strings and the merge compares ints — the
  * id mapping is bijective, so the jaccard value is identical).
  *
  * Replaces the previous mapPartitions JVM kernel on the dedup verify
  * path — same O(|a|+|b|) merge, but as an `Expression` it no longer
  * breaks the codegen stage around the candidate join.
  *
  * Result: `|A ∩ B| / (|A| + |B| - |A ∩ B|)` as double, with the same
  * int-to-double division as the DuckDB mirror
  * (`CAST(len(list_intersect(..)) AS DOUBLE) / ...`).
  */
case class JaccardSorted(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "jaccard_sorted"

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(StringType, _)  => Some(StringType)
    case ArrayType(IntegerType, _) => Some(IntegerType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(a), Some(b)) if a == b => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "jaccard_sorted requires two array<string> or two array<int> arguments, got " +
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
    inter.toDouble / (nx + ny - inter).toDouble
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
         |${ev.value} = (double) $inter / (double) ($nx + $ny - $inter);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
