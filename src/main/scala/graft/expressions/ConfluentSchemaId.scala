package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Extract the schema id from a CP1-framed Confluent message (magic byte
  * `0x00` + 4-byte big-endian id + Avro body — reference:
  * `src/SchemaRegistry.cpp:25-28`) as a nullable INT: null for bad magic
  * or truncated frames.
  *
  * Native `Expression` with `doGenCode` so schema-id routing (e.g.
  * per-id dispatch or id-histogram monitoring over a raw topic dump)
  * stays inside whole-stage codegen instead of paying the full decode
  * path — the expression touches exactly 5 bytes per row.
  */
case class ConfluentSchemaId(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def nullable: Boolean = true

  override def prettyName: String = "confluent_schema_id"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"confluent_schema_id requires binary input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    if (b.length >= 5 && b(0) == 0)
      ((b(1) & 0xff) << 24) | ((b(2) & 0xff) << 16) | ((b(3) & 0xff) << 8) | (b(4) & 0xff)
    else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |if ($v.length >= 5 && $v[0] == (byte) 0) {
         |  ${ev.value} = (($v[1] & 0xff) << 24) | (($v[2] & 0xff) << 16) |
         |    (($v[3] & 0xff) << 8) | ($v[4] & 0xff);
         |} else {
         |  ${ev.isNull} = true;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
