package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd float/double-array dot product: `float_dot(a, b)`.
  *
  * The embedding hot path (SURVEY §7.6 similarity search) multiplies
  * millions of 64-float pairs per query; Catalyst's higher-order
  * `aggregate(zip_with(...))` evaluates interpreted lambdas and allocates
  * an intermediate array per row, which dominated the benchmark. This
  * expression emits a tight primitive loop inside whole-stage codegen —
  * no boxing, no allocation.
  *
  * Each side independently accepts `array<float>` OR `array<double>`
  * (mixed is fine — the LSH planes are float literals whatever the
  * corpus width), so a testdata regeneration that ships true doubles
  * keeps every ANN query analyzing AND numerically exact: the corpus
  * column passes through at its native width instead of being narrowed
  * at ingest (the round-6 single-point mass-breakage vector).
  *
  * Determinism contract (shared with the DuckDB oracle, which computes
  * on `CAST(embedding AS DOUBLE[])`): each float widens to double
  * exactly, doubles pass through untouched, each product of two 24-bit
  * mantissas is exact in double, and accumulation is left-to-right —
  * the same reduction order as DuckDB's `list_dot_product` — so results
  * are bit-identical across engines at either input width.
  */
case class FloatDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float|double> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = DoubleType

  override def prettyName: String = "float_dot"

  private def isDouble(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (xd, yd) = (isDouble(left.dataType), isDouble(right.dataType))
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (xd) x.getDouble(i) else x.getFloat(i).toDouble
      val yv = if (yd) y.getDouble(i) else y.getFloat(i).toDouble
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      def elem(dt: DataType, v: String): String =
        if (isDouble(dt)) s"$v.getDouble(i)" else s"(double) $v.getFloat(i)"
      s"""
         |int n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double acc = 0.0;
         |for (int i = 0; i < n; i++) {
         |  acc += ${elem(left.dataType, x)} * ${elem(right.dataType, y)};
         |}
         |${ev.value} = acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDot =
    copy(left = newLeft, right = newRight)
}
