package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-ROW MinHash band signatures:
  * `graft_bandsigs(tokens, numHashes, bands)` → `array<string>` of
  * `bands` hex signatures, position = band index — bit-identical to
  * the table-form [[graft.operators.Dedup.bandSignatures]] (seeded
  * minhash = min md5 hex of `"s<seed>_" + token` over DISTINCT tokens;
  * band signature = md5 hex of the lexicographically sorted
  * `"<seed>:<minhash>"` strings joined with `'|'`).
  *
  * The table form shares one token shuffle across the corpus — right
  * for batch. This expression is the STREAM shape: a stateless
  * projection computes an arriving document's signatures with no
  * shuffle and no state, so an ingest stream can probe a persisted
  * corpus band table with a plain stream-static join (st6). One JVM
  * pass per row (|distinct tokens| × numHashes digests) — the same
  * native-kernel rule as [[RepetitionStats]]: per-row crypto in a
  * lambda forest would run interpreted per element.
  *
  * Null tokens are skipped (the tokenizer never emits them); an empty
  * token set yields no minhash, and the band signature is the md5 of
  * the empty join — deterministic, and such docs collide only with
  * each other. numHashes must divide by bands (the table form's rule).
  */
case class BandSignatures(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), IntegerType, IntegerType) =>
        if (second.foldable && third.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          "graft_bandsigs numHashes/bands must be literals")
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_bandsigs expects (array<string>, int, int), got " +
          s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
          s"${third.dataType.simpleString})")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_bandsigs"

  override protected def nullSafeEval(a: Any, nh: Any, nb: Any): Any =
    BandSignatures.compute(a.asInstanceOf[ArrayData],
      nh.asInstanceOf[Int], nb.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, nh, nb) =>
      s"${ev.value} = graft.expressions.BandSignatures.compute($a, $nh, $nb);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): BandSignatures =
    copy(first = f, second = s, third = t)
}

object BandSignatures {
  private val HexDigits = "0123456789abcdef".toCharArray

  private def hex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(2 * i) = HexDigits((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = HexDigits(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Shared by interpreted eval and generated code (one call per row). */
  def compute(tokens: ArrayData, numHashes: Int, bands: Int): ArrayData = {
    require(numHashes > 0 && bands > 0 && numHashes % bands == 0,
      s"graft_bandsigs: numHashes ($numHashes) must be a positive multiple " +
        s"of bands ($bands)")
    val md = java.security.MessageDigest.getInstance("MD5")
    // DISTINCT tokens — the minhash of a multiset equals the set's
    // (min ignores dups), matching Text.distinctTokens in the table form
    val distinct = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i < tokens.numElements()) {
      if (!tokens.isNullAt(i)) distinct.add(tokens.getUTF8String(i).toString)
      i += 1
    }
    val mh = new Array[String](numHashes)
    var s = 0
    while (s < numHashes) {
      var best: String = null
      val it = distinct.iterator()
      while (it.hasNext) {
        md.reset()
        val h = hex(md.digest(
          UTF8String.fromString("s" + s + "_" + it.next()).getBytes))
        if (best == null || h.compareTo(best) < 0) best = h
      }
      mh(s) = best
      s += 1
    }
    val rowsPerBand = numHashes / bands
    val sigs = new Array[UTF8String](bands)
    var b = 0
    while (b < bands) {
      val elems = new Array[String](rowsPerBand)
      var k = 0
      while (k < rowsPerBand) {
        val seed = b * rowsPerBand + k
        // a doc with zero tokens has no minhash: the element is just
        // the seed prefix (matches concat_ws skipping the null column)
        elems(k) = if (mh(seed) == null) seed.toString else seed + ":" + mh(seed)
        k += 1
      }
      java.util.Arrays.sort(elems, java.util.Comparator.naturalOrder[String]())
      md.reset()
      sigs(b) = UTF8String.fromString(
        hex(md.digest(UTF8String.fromString(elems.mkString("|")).getBytes)))
      b += 1
    }
    new GenericArrayData(sigs.asInstanceOf[Array[Any]])
  }
}
