package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd squared-L2 distance between two long arrays:
  * `long_l2(a, b) = Σ (aᵢ − bᵢ)²`.
  *
  * The k-means training loop (q75) runs its assignment step in exact
  * integer micro-space — components quantized to `floor(x·10⁶)` — so that
  * argmin decisions are bit-identical on any engine, with no float
  * accumulation order to pin down. That makes the hot loop k long-array
  * distances per vector per pass; like [[FloatDot]] this emits a tight
  * primitive loop inside whole-stage codegen instead of an interpreted
  * `aggregate(zip_with(...))` lambda per row.
  *
  * Overflow contract: |component| < 2²⁰ micro-units and dims ≤ 64 keep
  * the sum below 2⁴⁶ — integer-exact in a 64-bit long with no wraparound.
  */
case class LongL2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<bigint>, array<bigint>) arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "long_l2"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      val d = x.getLong(i) - y.getLong(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      s"""
         |int n = java.lang.Math.min($x.numElements(), $y.numElements());
         |long acc = 0L;
         |for (int i = 0; i < n; i++) {
         |  long d = $x.getLong(i) - $y.getLong(i);
         |  acc += d * d;
         |}
         |${ev.value} = acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongL2 =
    copy(left = newLeft, right = newRight)
}
