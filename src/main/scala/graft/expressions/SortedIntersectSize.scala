package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Native codegen intersection SIZE of two SORTED DISTINCT
  * `array<string>` or `array<bigint>` columns — a two-pointer merge,
  * no per-call hash set.
  *
  * `size(array_intersect(a, b))` builds a hash set of one side for
  * every row; on a similarity-verify join evaluating millions of
  * candidate pairs (Dedup.jaccardPairs), that allocation dominates the
  * stage. The merge is allocation-free and each element is compared at
  * most once. The `array<bigint>` form is the hot path: jaccardPairs
  * fingerprints grams to 64-bit hashes map-side, so the per-pair merge
  * compares longs (one branch each) instead of UTF8 byte strings.
  *
  * PRECONDITION (caller-enforced, see jaccardPairs): both arrays are
  * sorted ascending (UTF8String binary order for strings, numeric for
  * longs — both are `sort_array`'s order) and element-distinct.
  * Unsorted input silently undercounts — the sortedness contract is
  * the caller's. Null ELEMENTS are skipped (they can't match
  * anything), so the function is safe from arbitrary SQL via its
  * session registration. Mixed element types are a type-check error.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(StringType, _) | ArrayType(LongType, _) => true
    case _ => false
  }

  private def isLong: Boolean = left.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(rt, _))
        if elemOk(left.dataType) && lt == rt => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_inter_size expects array<string> or array<bigint> on both sides " +
        s"(same element type), got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_inter_size"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    val longs = isLong
    var i = 0
    var j = 0
    var cnt = 0
    while (i < nx && j < ny) {
      if (x.isNullAt(i)) i += 1
      else if (y.isNullAt(j)) j += 1
      else {
        val c =
          if (longs) java.lang.Long.compare(x.getLong(i), y.getLong(j))
          else x.getUTF8String(i).compareTo(y.getUTF8String(j))
        if (c == 0) { cnt += 1; i += 1; j += 1 }
        else if (c < 0) i += 1
        else j += 1
      }
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val cnt = ctx.freshName("cnt")
      val c = ctx.freshName("c")
      val cmp =
        if (isLong) s"Long.compare($a.getLong($i), $b.getLong($j))"
        else s"$a.getUTF8String($i).compareTo($b.getUTF8String($j))"
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0, $j = 0, $cnt = 0;
         |while ($i < $nx && $j < $ny) {
         |  if ($a.isNullAt($i)) { $i++; }
         |  else if ($b.isNullAt($j)) { $j++; }
         |  else {
         |    int $c = $cmp;
         |    if ($c == 0) { $cnt++; $i++; $j++; }
         |    else if ($c < 0) { $i++; } else { $j++; }
         |  }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}
