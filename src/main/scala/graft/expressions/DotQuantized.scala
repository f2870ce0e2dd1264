package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

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
  * Rounding is HALF AWAY FROM ZERO — the one rule shared by Spark's
  * `round()` (HALF_UP BigDecimal) and DuckDB's `ROUND`, so the native
  * path, the composable Vectors.dotQ, and every oracle SQL agree on
  * exact-tie products (signed embeddings make negative x.5 products
  * real). Plain `Math.round` (half toward +∞) would diverge on those
  * ties; see the tie test in FunctionsSpec.
  *
  * This is the SURVEY §7.1 "custom `Expression` (perf)" deliverable:
  * scalar extension via Catalyst, not a UDF — null-safe, codegen'd,
  * registered through SparkSessionExtensions (GraftExtensions).
  */
case class DotQuantized(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dotq expects array<float|double> on both sides, " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_dotq"

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = isFloat(left)
    val rf = isFloat(right)
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      val p = xv * yv * 1e12
      acc += (if (p < 0) -Math.round(-p) else Math.round(p))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val p = ctx.freshName("p")
      val getL = if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getR = if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $p = $getL * $getR * 1e12;
         |  $acc += ($p < 0) ? -java.lang.Math.round(-$p) : java.lang.Math.round($p);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotQuantized =
    copy(left = newLeft, right = newRight)
}
