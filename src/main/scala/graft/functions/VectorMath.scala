package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst vector arithmetic — `vec_dot`, `vec_cos`, `vec_l2sq`
  * over numeric arrays (SURVEY.md §2 D6/F10 hot path).
  *
  * Why not the `aggregate(zip_with(...))` higher-order functions the
  * oracles mirror: Catalyst evaluates HOF lambdas INTERPRETED, one boxed
  * closure call per element — three such folds per cosine put ~400
  * megamorphic calls on every corpus row of the knn/dedup scans. These
  * expressions run the same arithmetic as a single codegen'd static call
  * over the unboxed `ArrayData` (primitive getters, no closures).
  *
  * Oracle parity is bit-exact by construction: each accumulator folds
  * LEFT-TO-RIGHT in double, the same order as the `aggregate` fold and
  * DuckDB's `list_dot_product`; `vec_cos` keeps three independent
  * accumulators in its single pass, so each equals its separate-fold
  * value. Null semantics mirror `zip_with` + `aggregate`: length mismatch
  * or any null element → NULL (zip_with pads the shorter side with null,
  * the product poisons the fold). `vec_l2sq` is pure integer arithmetic
  * (long), for the int8-quantized kmeans/IVF distance path.
  */
object VectorMath {

  // element-type codes baked into the generated code (no per-row dispatch)
  final val F = 0; final val D = 1; final val L = 2; final val I = 3

  def typeCode(t: DataType): Int = t match {
    case ArrayType(FloatType, _)   => F
    case ArrayType(DoubleType, _)  => D
    case ArrayType(LongType, _)    => L
    case ArrayType(IntegerType, _) => I
    case other => throw new IllegalArgumentException(s"unsupported vector type $other")
  }

  private def okType(t: DataType): Boolean = t match {
    case ArrayType(FloatType | DoubleType | LongType | IntegerType, _) => true
    case _ => false
  }

  @inline private def get(a: ArrayData, i: Int, t: Int): Double = t match {
    case F => a.getFloat(i).toDouble
    case D => a.getDouble(i)
    case L => a.getLong(i).toDouble
    case I => a.getInt(i).toDouble
  }

  @inline private def getL(a: ArrayData, i: Int, t: Int): Long = t match {
    case L => a.getLong(i)
    case I => a.getInt(i).toLong
    case _ => throw new IllegalArgumentException("vec_l2sq needs integral arrays")
  }

  private def anyNull(a: ArrayData): Boolean = {
    var i = 0; val n = a.numElements()
    while (i < n) { if (a.isNullAt(i)) return true; i += 1 }
    false
  }

  /** Σ a_i·b_i in double, left-to-right. Boxed null on length mismatch or
    * null element (the zip_with/aggregate result). */
  def dot(a: ArrayData, b: ArrayData, ta: Int, tb: Int): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements() || anyNull(a) || anyNull(b)) return null
    var s = 0.0; var i = 0
    while (i < n) { s += get(a, i, ta) * get(b, i, tb); i += 1 }
    java.lang.Double.valueOf(s)
  }

  /** dot(a,b) / (sqrt(dot(a,a)) · sqrt(dot(b,b))) — one pass, three
    * independent accumulators (each bit-equal to its separate fold). */
  def cos(a: ArrayData, b: ArrayData, ta: Int, tb: Int): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements() || anyNull(a) || anyNull(b)) return null
    var sab = 0.0; var saa = 0.0; var sbb = 0.0; var i = 0
    while (i < n) {
      val x = get(a, i, ta); val y = get(b, i, tb)
      sab += x * y; saa += x * x; sbb += y * y; i += 1
    }
    java.lang.Double.valueOf(sab / (math.sqrt(saa) * math.sqrt(sbb)))
  }

  /** Σ (a_i−b_i)² in LONG (int8-quantized distance: |q| ≤ 127 ⇒ exact). */
  def l2sq(a: ArrayData, b: ArrayData, ta: Int, tb: Int): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements() || anyNull(a) || anyNull(b)) return null
    var s = 0L; var i = 0
    while (i < n) { val d = getL(a, i, ta) - getL(b, i, tb); s += d * d; i += 1 }
    java.lang.Long.valueOf(s)
  }

  /** Register vec_dot / vec_cos / vec_l2sq in the session registry so
    * plans use them via `expr(...)`/SQL. Idempotent. */
  def register(spark: SparkSession): Unit = {
    val r = spark.sessionState.functionRegistry
    r.registerFunction(FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (c: Seq[Expression]) => VecDot(c(0), c(1)))
    r.registerFunction(FunctionIdentifier("vec_cos"),
      new ExpressionInfo(classOf[VecCos].getName, "vec_cos"),
      (c: Seq[Expression]) => VecCos(c(0), c(1)))
    r.registerFunction(FunctionIdentifier("vec_l2sq"),
      new ExpressionInfo(classOf[VecL2Sq].getName, "vec_l2sq"),
      (c: Seq[Expression]) => VecL2Sq(c(0), c(1)))
  }

  private[functions] def checkVec(name: String, l: Expression, r: Expression,
      integral: Boolean): TypeCheckResult = {
    val need: DataType => Boolean =
      if (integral) { case ArrayType(LongType | IntegerType, _) => true; case _ => false }
      else okType
    if (need(l.dataType) && need(r.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name expects two ${if (integral) "integral " else ""}numeric arrays, got " +
        s"${l.dataType.simpleString}, ${r.dataType.simpleString}")
  }
}

sealed trait VecBinary extends BinaryExpression {
  override def nullable: Boolean = true
  protected def integral: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    VectorMath.checkVec(prettyName, left, right, integral)
  protected def ta: Int = VectorMath.typeCode(left.dataType)
  protected def tb: Int = VectorMath.typeCode(right.dataType)
  /** static method on VectorMath the generated code calls */
  protected def method: String
  protected def boxed: String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("vecr")
      s"""
         |$boxed $r = graft.functions.VectorMath.$method($a, $b, $ta, $tb);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
}

/** `vec_dot(array, array) → double` — codegen'd left-to-right dot. */
case class VecDot(left: Expression, right: Expression) extends VecBinary {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"
  override protected def method: String = "dot"
  override protected def boxed: String = "java.lang.Double"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorMath.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], ta, tb)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `vec_cos(array, array) → double` — codegen'd single-pass cosine. */
case class VecCos(left: Expression, right: Expression) extends VecBinary {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_cos"
  override protected def method: String = "cos"
  override protected def boxed: String = "java.lang.Double"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorMath.cos(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], ta, tb)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `vec_l2sq(array<long|int>, array<long|int>) → long` — exact integer
  * squared L2 (the int8-quantized kmeans/IVF distance). */
case class VecL2Sq(left: Expression, right: Expression) extends VecBinary {
  override def dataType: DataType = LongType
  override def prettyName: String = "vec_l2sq"
  override protected def integral: Boolean = true
  override protected def method: String = "l2sq"
  override protected def boxed: String = "java.lang.Long"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorMath.l2sq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], ta, tb)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
