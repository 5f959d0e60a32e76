package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, IntegerType}

/** Native Catalyst expression for the S7 buffer decode (SURVEY.md §2.10 D3)
  * — `decode_s7(buf BINARY, typeCode INT, bit INT) → DOUBLE`.
  *
  * Implemented as a codegen'd `TernaryExpression` (not a Scala UDF) so it
  * stays inside WholeStageCodegen: the generated code is a single static
  * call into [[S7.decode]], no boxing, no serialization of a closure.
  * NaN from the decoder (unknown type / short buffer) surfaces as NULL,
  * matching the reference's None-sample drop (InfluxConnector2.py:172).
  */
case class DecodeS7(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "decode_s7"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = first.dataType == BinaryType && second.dataType == IntegerType &&
      third.dataType == IntegerType
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"decode_s7 expects (BINARY, INT, INT), got ${children.map(_.dataType.simpleString).mkString(", ")}")
  }

  override protected def nullSafeEval(buf: Any, typeCode: Any, bit: Any): Any = {
    val d = S7.decode(buf.asInstanceOf[Array[Byte]], typeCode.asInstanceOf[Int], bit.asInstanceOf[Int])
    if (java.lang.Double.isNaN(d)) null else d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (buf, tc, bit) =>
      s"""
         |${ev.value} = graft.functions.S7.decode($buf, $tc, $bit);
         |if (Double.isNaN(${ev.value})) { ${ev.isNull} = true; }
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object DecodeS7 {

  /** Register `decode_s7` in the session's function registry so plans can
    * use it via `expr("decode_s7(...)")` / SQL. Idempotent.
    */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.registerFunction(
      FunctionIdentifier("decode_s7"),
      new ExpressionInfo(classOf[DecodeS7].getName, "decode_s7"),
      (children: Seq[Expression]) => DecodeS7(children(0), children(1), children(2)))
  }
}
