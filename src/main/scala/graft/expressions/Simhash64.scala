package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 64-bit SimHash over a document: `graft_simhash64(text)` →
  * the per-bit majority vote of the top-64-bit (big-endian) md5 prefix
  * of every whitespace token, as one JVM pass per row.
  *
  * Equivalence to the relational vote table (the original
  * explode → md5 nibbles → 64 `sum(when(bit,1,-1))` → assemble form):
  * the relational form reads vote `b` from bit `b % 4` of hex nibble
  * `15 - b/4`, and nibble `i` (0 = most significant) of the 8-byte BE
  * digest prefix `fp` is `(fp >>> (60 - 4i)) & 0xF` — so vote `b` is
  * exactly bit `b` of `fp`. Tokenization matches `Text.tokens`
  * (lowercase, split on the single space character, drop empties;
  * multiset — duplicate tokens vote once each), and md5 runs over the
  * token's UTF-8 bytes like Spark's / DuckDB's `md5(tok)`.
  *
  * The 16-bit tier needs no second function: its per-token hash is the
  * first 4 md5 nibbles = bits 63..48 of `fp`, so its vote `b` equals
  * the 64-bit tier's vote `48 + b` and
  * `simhash16 = graft_simhash64(text) >>> 48` (unsigned).
  *
  * A document with NO tokens returns NULL (the relational form's inner
  * explode simply dropped such docs — consumers filter the NULLs,
  * keeping the output row set identical).
  *
  * Why native: the relational form explodes the corpus to one row per
  * token and shuffles |tokens| rows into a 64-aggregate groupBy. At
  * corpus scale SimHash should be a map-side projection — this runs
  * inside whole-stage codegen with zero shuffle, the same design rule
  * as [[RepetitionStats]] and [[BandSignatures]].
  */
case class Simhash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash64 expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_simhash64"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else Simhash64.compute(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val boxed = ctx.freshName("simhash")
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.isNull} = true;
      long ${ev.value} = 0L;
      if (!${c.isNull}) {
        java.lang.Long $boxed = graft.expressions.Simhash64.compute(${c.value});
        if ($boxed != null) {
          ${ev.isNull} = false;
          ${ev.value} = $boxed.longValue();
        }
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): Simhash64 =
    copy(child = newChild)
}

object Simhash64 {

  // one digester per task thread, not per row (ADVICE r13): reset()
  // between tokens already makes reuse safe within a row, and MD5
  // instances hold no cross-call state after reset
  private val localMd = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Shared by interpreted eval and generated code (one call per row).
    * Returns null when the document has no tokens.
    */
  def compute(text: UTF8String): java.lang.Long = {
    val md = localMd.get()
    val votes = new Array[Int](64)
    var any = false
    // Text.tokens semantics: Spark lower(), split on ' ', drop empties
    val lower = text.toLowerCase.toString
    val n = lower.length
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || lower.charAt(i) == ' ') {
        if (i > start) {
          any = true
          md.reset()
          // String.getBytes(UTF_8) produces the identical bytes the
          // previous String -> UTF8String -> getBytes round trip did,
          // without the intermediate UTF8String allocation (ADVICE r13)
          val d = md.digest(lower.substring(start, i)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          var fp = 0L
          var k = 0
          while (k < 8) { fp = (fp << 8) | (d(k) & 0xffL); k += 1 }
          var b = 0
          while (b < 64) {
            if (((fp >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    if (!any) return null
    var sim = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sim |= 1L << b
      b += 1
    }
    java.lang.Long.valueOf(sim)
  }
}
