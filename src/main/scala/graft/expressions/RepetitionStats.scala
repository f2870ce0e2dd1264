package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Native n-gram repetition statistics over a token array:
  * `graft_repstats(tokens, n)` → `array<bigint>` of
  * `[n_grams, top_gram_count, dup_occurrences]` where `top_gram_count`
  * is the frequency of the most-repeated n-gram and `dup_occurrences`
  * the number of gram occurrences whose gram appears ≥ 2 times — the
  * Gopher/MassiveText repetition signals.
  *
  * One JVM pass per row: xxhash64 each token once, roll gram
  * fingerprints with a multiply-mix (counts survive fingerprinting —
  * the d05 injectivity argument), sort the long[] in place, scan runs.
  * The composable higher-order-function form of the same computation
  * (transform → sort_array → aggregate with a struct accumulator) is
  * CodegenFallback all the way down: every lambda step is an
  * interpreted tree walk, and the alias-substituted copies in
  * Filter/Project multiply it — measured ~18 s for the sf0.1 document
  * stream vs ~2 s with this expression doing the identical work in one
  * call. Same design rule as [[SortedIntersectSize]]: when a per-row
  * kernel is hot, hand Catalyst ONE native expression, not a lambda
  * forest.
  *
  * Null tokens hash as empty strings (the tokenizer never produces
  * them; the rule makes the function total for arbitrary SQL use).
  * `n < 1` is a type-check error; `n > tokens` yields `[0, 0, 0]`.
  */
case class RepetitionStats(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), IntegerType) =>
      if (right.foldable) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure("graft_repstats gram length must be a literal")
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_repstats expects (array<string>, int), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_repstats"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    RepetitionStats.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.RepetitionStats.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RepetitionStats =
    copy(left = newLeft, right = newRight)
}

object RepetitionStats {
  private val EmptyHash =
    XxHash64Function.hash(org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8, StringType, 42L)
  // Weyl-style odd multiplier for the rolling gram mix — any odd
  // constant keeps the combination near-injective on 64 bits.
  private val Mix = 0x9E3779B97F4A7C15L

  /** Shared by interpreted eval and generated code (one call per row). */
  def compute(tokens: ArrayData, n: Int): ArrayData = {
    require(n >= 1, s"graft_repstats gram length must be >= 1, got $n")
    val nTok = tokens.numElements()
    if (nTok < n) return new GenericArrayData(Array(0L, 0L, 0L))
    val th = new Array[Long](nTok)
    var i = 0
    while (i < nTok) {
      th(i) = if (tokens.isNullAt(i)) EmptyHash
        else XxHash64Function.hash(tokens.getUTF8String(i), StringType, 42L)
      i += 1
    }
    val m = nTok - n + 1
    val gh = new Array[Long](m)
    i = 0
    while (i < m) {
      var h = 0L
      var k = 0
      while (k < n) { h = h * Mix + th(i + k); k += 1 }
      gh(i) = h
      i += 1
    }
    java.util.Arrays.sort(gh)
    var top = 0L
    var ones = 0L
    var run = 1L
    i = 1
    while (i <= m) {
      if (i < m && gh(i) == gh(i - 1)) run += 1
      else {
        if (run > top) top = run
        if (run == 1L) ones += 1
        run = 1L
      }
      i += 1
    }
    new GenericArrayData(Array(m.toLong, top, m - ones))
  }
}
