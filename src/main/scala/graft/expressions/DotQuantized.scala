package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native codegen quantized dot product over two `array<float>` columns:
  * `Σ round(a[i]·b[i]·1e12)` as LONG.
  *
  * Semantics identical to the composable form in functions.Vectors.dotQ
  * (`aggregate(zip_with(...))`) but compiled to a tight primitive loop in
  * whole-stage codegen instead of interpreted higher-order-function
  * evaluation — ~10× on the similarity-search hot path. The quantized
  * integer sum keeps results bit-identical across engines and
  * partitionings (the oracle-parity property; see Vectors).
  *
  * This is the SURVEY §7.1 "custom `Expression` (perf)" deliverable:
  * scalar extension via Catalyst, not a UDF — null-safe, codegen'd,
  * registered through SparkSessionExtensions (GraftExtensions).
  */
case class DotQuantized(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dotq expects (array<float>, array<float>), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_dotq"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += Math.round(x.getFloat(i).toDouble * y.getFloat(i).toDouble * 1e12)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += java.lang.Math.round(
         |    (double) $a.getFloat($i) * (double) $b.getFloat($i) * 1e12);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotQuantized =
    copy(left = newLeft, right = newRight)
}
