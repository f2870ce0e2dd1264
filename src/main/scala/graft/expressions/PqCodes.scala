package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Broadcast-path product-quantization encode + query LUT — the
  * codebook-axis sequel to [[CentroidExprBase]]: the same literal-
  * inlining cliff the centroid expressions removed for the k axis
  * exists one tier down in IVF+PQ, where the literal encode inlines
  * one `struct(‖c‖q − 2·dotq(slice, lit(c)), ki)` term PER CODEBOOK
  * ENTRY PER SUBSPACE (m × codebookSize struct terms in one
  * projection). At the catalog's m=8/cbSize=16 that is the
  * zero-shuffle ideal; at FAISS-typical m=16/cbSize=256 it is 4096
  * inlined terms — past the measured codegen cliff. Here the whole
  * codebook tensor ships ONCE as a foldable
  * `array<array<array<float|double>>>` literal (m × codebookSize ×
  * sub), held in generated code as a REFERENCE OBJECT, and the
  * per-row work is tight nested loops whose CODE size is constant in
  * m·codebookSize.
  *
  * Semantics are bit-identical to the literal path (pinned by
  * PqCodesSpec value-identity and the unchanged s08/s09/s10 hashes
  * with the literal path forced):
  *   - subvector mi of `vec` = elements [mi·sub, mi·sub+sub), sub =
  *     codebook entry length; a short row truncates exactly like
  *     `slice(vec, mi·sub+1, sub)` + graft_dotq's min-length loop;
  *   - dotq: Σ round(x·c·1e12) as LONG, HALF AWAY FROM ZERO (the
  *     DotQuantized rule);
  *   - entry norms ‖c‖q = Σ round(c²·1e12), precomputed once from the
  *     codebook literal (the literal path's constant-folded
  *     dotq(lit, lit));
  *   - encode argmin: lowest `‖c‖q − 2·dotq`, ties → LOWEST code id
  *     (ascending scan, strict <) — the literal `array_min(struct(d,
  *     k))` lexicographic rule.
  *
  * Residual IVF+PQ reuses both unchanged: the encode input is the
  * residual vector (computed upstream by exact double subtraction)
  * and the codebooks are the residual codebook — double entries, which
  * is why the literal accepts float OR double innermost arrays
  * (float→double widening is exact, so one double[][][] holds both).
  */
abstract class PqExprBase extends BinaryExpression {

  private def vecOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
  private def cbOk(dt: DataType): Boolean = dt match {
    case ArrayType(ArrayType(ArrayType(FloatType, _), _), _) => true
    case ArrayType(ArrayType(ArrayType(DoubleType, _), _), _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!vecOk(left.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<float|double> vector, got ${left.dataType.simpleString}")
    else if (!cbOk(right.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<array<array<float|double>>> codebooks, " +
          s"got ${right.dataType.simpleString}")
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName codebooks must be a foldable literal (the broadcast model artifact)")
    else TypeCheckResult.TypeCheckSuccess

  protected def vecIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private def cbIsFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType
      .asInstanceOf[ArrayType].elementType
      .asInstanceOf[ArrayType].elementType == FloatType

  /** The codebook tensor cb(mi)(ki)(j), evaluated ONCE from the
    * foldable child (float entries widened exactly to double) and
    * injected into generated code as a reference object.
    */
  @transient protected lazy val cb: Array[Array[Array[Double]]] = {
    val f = cbIsFloat
    val t = right.eval(null).asInstanceOf[ArrayData]
    val m = Array.tabulate(t.numElements()) { mi =>
      val sub = t.getArray(mi)
      require(sub != null, s"$prettyName: codebook subspace $mi is null")
      Array.tabulate(sub.numElements()) { ki =>
        val e = sub.getArray(ki)
        require(e != null, s"$prettyName: codebook entry ($mi, $ki) is null")
        if (f) e.toFloatArray().map(_.toDouble) else e.toDoubleArray()
      }
    }
    require(m.nonEmpty && m(0).nonEmpty, s"$prettyName: empty codebooks")
    // uniform-tensor guard (ADVICE r16): subLen is cb(0)(0).length and
    // is used as the slice stride for EVERY subspace — a ragged
    // codebook (an empty later subspace, or entries of differing
    // lengths) would silently mis-offset subvectors or emit code -1
    // that later crashes ADC's element_at with an opaque error. Fail
    // loudly at analysis time instead.
    m.iterator.zipWithIndex.foreach { case (sub, mi) =>
      require(sub.nonEmpty, s"$prettyName: codebook subspace $mi is empty")
      sub.iterator.zipWithIndex.foreach { case (e, ki) =>
        require(e.length == m(0)(0).length,
          s"$prettyName: ragged codebook — entry ($mi, $ki) has length " +
            s"${e.length}, expected ${m(0)(0).length}")
      }
    }
    m
  }

  /** Quantized entry self-norms Σ round(c²·1e12) (signed-safe round for
    * rule uniformity — squares are non-negative, so it equals
    * Math.round): the encode argmin's constant term, precomputed so the
    * per-row loop never re-derives it.
    */
  @transient protected lazy val cbNormQ: Array[Array[Long]] = cb.map(_.map { e =>
    var acc = 0L
    var j = 0
    while (j < e.length) {
      val p = e(j) * e(j) * 1e12
      acc += (if (p < 0) -Math.round(-p) else Math.round(p))
      j += 1
    }
    acc
  })

  @transient protected lazy val numSub: Int = cb.length
  @transient protected lazy val subLen: Int = cb(0)(0).length

  /** Interpreted per-subspace quantized dots: dots(mi)(ki) =
    * dotq(vec[mi·sub .. mi·sub+sub), cb(mi)(ki)) — shared by both
    * concrete shapes (encode argmins it; LUT returns it).
    */
  protected def dotsAll(vec: ArrayData): Array[Array[Long]] = {
    val lf = vecIsFloat
    val n = vec.numElements()
    val out = Array.ofDim[Array[Long]](numSub)
    var mi = 0
    while (mi < numSub) {
      val entries = cb(mi)
      val row = new Array[Long](entries.length)
      var ki = 0
      while (ki < entries.length) {
        val e = entries(ki)
        var acc = 0L
        var j = 0
        // slice semantics: element mi·sub+j while both in range
        while (j < e.length && mi * subLen + j < n) {
          val x = if (lf) vec.getFloat(mi * subLen + j).toDouble
                  else vec.getDouble(mi * subLen + j)
          val p = x * e(j) * 1e12
          acc += (if (p < 0) -Math.round(-p) else Math.round(p))
          j += 1
        }
        row(ki) = acc
        ki += 1
      }
      out(mi) = row
      mi += 1
    }
    out
  }

  /** One generated block: outer loop over subspaces, inner loop over
    * codebook entries, computing the quantized dot per (mi, ki).
    * `perSub(mi)` opens each subspace, `perEntry(mi, ki, dotVar)` runs
    * once per entry, `endSub(mi)` closes each subspace. Code size
    * constant in m·codebookSize.
    */
  protected def genDotsLoop(ctx: CodegenContext, a: String,
                            perSub: String => String,
                            perEntry: (String, String, String) => String,
                            endSub: String => String): String = {
    val cbRef = ctx.addReferenceObj("pqcb", cb, "double[][][]")
    val n = ctx.freshName("n")
    val mi = ctx.freshName("mi")
    val ki = ctx.freshName("ki")
    val j = ctx.freshName("j")
    val e = ctx.freshName("e")
    val acc = ctx.freshName("acc")
    val p = ctx.freshName("p")
    val base = ctx.freshName("base")
    val getV = (idx: String) =>
      if (vecIsFloat) s"(double) $a.getFloat($idx)" else s"$a.getDouble($idx)"
    s"""
       |int $n = $a.numElements();
       |for (int $mi = 0; $mi < ${numSub}; $mi++) {
       |  int $base = $mi * ${subLen};
       |  ${perSub(mi)}
       |  for (int $ki = 0; $ki < $cbRef[$mi].length; $ki++) {
       |    double[] $e = $cbRef[$mi][$ki];
       |    long $acc = 0L;
       |    for (int $j = 0; $j < $e.length && $base + $j < $n; $j++) {
       |      double $p = ${getV(s"$base + $j")} * $e[$j] * 1e12;
       |      $acc += ($p < 0) ? -java.lang.Math.round(-$p) : java.lang.Math.round($p);
       |    }
       |    ${perEntry(mi, ki, acc)}
       |  }
       |  ${endSub(mi)}
       |}
     """.stripMargin
  }
}

/** `graft_pq_encode(vec, codebooks)` → `array<int>` of m codes: per
  * subspace, the argmin of `‖c‖q − 2·dotq(subvec, c)` (ties → lowest
  * code id) — the corpus-side encode of IVF+PQ (raw form) and residual
  * IVF+PQ (pass the residual vector). A pure projection: the 100 TB
  * code table is built with NO join and NO shuffle.
  */
case class PqEncode(left: Expression, right: Expression) extends PqExprBase {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "graft_pq_encode"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val dots = dotsAll(a.asInstanceOf[ArrayData])
    val out = new Array[Int](numSub)
    var mi = 0
    while (mi < numSub) {
      val norms = cbNormQ(mi)
      var bestD = Long.MaxValue
      var bestK = -1
      var ki = 0
      while (ki < norms.length) {
        val d = norms(ki) - 2L * dots(mi)(ki)
        if (d < bestD) { bestD = d; bestK = ki }
        ki += 1
      }
      out(mi) = bestK
      mi += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val normsRef = ctx.addReferenceObj("pqnorms", cbNormQ, "long[][]")
      val codes = ctx.freshName("codes")
      val bestD = ctx.freshName("bestD")
      val bestK = ctx.freshName("bestK")
      val d = ctx.freshName("d")
      val loop = genDotsLoop(ctx, a,
        perSub = _ => s"long $bestD = java.lang.Long.MAX_VALUE; int $bestK = -1;",
        perEntry = (mi, ki, dot) =>
          s"""long $d = $normsRef[$mi][$ki] - 2L * $dot;
             |if ($d < $bestD) { $bestD = $d; $bestK = $ki; }""".stripMargin,
        endSub = mi => s"$codes[$mi] = $bestK;")
      s"""
         |int[] $codes = new int[${numSub}];
         |$loop
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncode =
    copy(left = newLeft, right = newRight)
}

/** `graft_pq_luts(vec, codebooks)` → `array<array<long>>` (m ×
  * codebookSize): luts[mi][ki] = dotq(subvec_mi, cb[mi][ki]) — the
  * query-side ADC lookup tables, computed once per query row; a
  * candidate's ADC score is then m integer array lookups. Raw and
  * residual IVF+PQ share it (raw query subvectors against the
  * respective codebook in both — FAISS's inner-product decomposition
  * needs no query residualization).
  */
case class PqLuts(left: Expression, right: Expression) extends PqExprBase {

  override def dataType: DataType = ArrayType(
    ArrayType(LongType, containsNull = false), containsNull = false)

  override def prettyName: String = "graft_pq_luts"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val dots = dotsAll(a.asInstanceOf[ArrayData])
    new GenericArrayData(dots.map(row => new GenericArrayData(row): Any))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val out = ctx.freshName("out")
      val row = ctx.freshName("row")
      val cbSizes = ctx.addReferenceObj("pqsizes", cb.map(_.length), "int[]")
      val loop = genDotsLoop(ctx, a,
        perSub = mi => s"long[] $row = new long[$cbSizes[$mi]];",
        perEntry = (_, ki, dot) => s"$row[$ki] = $dot;",
        endSub = mi =>
          s"$out[$mi] = new org.apache.spark.sql.catalyst.util.GenericArrayData($row);")
      s"""
         |Object[] $out = new Object[${numSub}];
         |$loop
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqLuts =
    copy(left = newLeft, right = newRight)
}
