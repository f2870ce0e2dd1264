package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Detection post-processing filter cascade (SURVEY §2.2 F1–F6):
  * everything the reference applies after the model call
  * (_is_valid_detection, reference src/detection.py:1043-1118).
  *
  * Boxes here are corner-format `(x1,y1,x2,y2)` exactly as at the
  * reference call site. All filters are Column predicates emitted
  * cheap-to-expensive in one conjunction — Catalyst fuses them into a
  * single codegen stage and `And` short-circuits, preserving the
  * reference's hand-rolled cascade order (SURVEY §4 P3) while letting
  * the scan prune on the cheap ones.
  */
object DetectFilters {

  /** F1 — confidence (reference src/detection.py:1067-1069). */
  def confFilter(score: Column, threshold: Double): Column = score >= threshold

  /** F2 — min size; active only when threshold > 0 (reference
    * src/detection.py:1071-1074).
    */
  def sizeFilter(x1: Column, y1: Column, x2: Column, y2: Column, minSize: Double): Column =
    if (minSize <= 0) lit(true) else (x2 - x1) * (y2 - y1) >= minSize

  /** F4 — edge proximity: reject boxes within `tol` px of any border
    * (reference src/detection.py:1077-1084; boundary comparisons are
    * inclusive).
    */
  def edgeFilter(x1: Column, y1: Column, x2: Column, y2: Column,
                 imgW: Column, imgH: Column, tol: Double): Column =
    if (tol <= 0) lit(true)
    else !(x1 <= tol || y1 <= tol || x2 >= imgW - tol || y2 >= imgH - tol)

  /** F5 — mask-overlap filter via a broadcast INTEGRAL IMAGE.
    *
    * The reference counts masked pixels inside every box
    * (reference src/detection.py:1086-1116) — O(box area) per detection.
    * We precompute a 2-D prefix-sum of the mask once per sequence
    * (`integralImage`) and ship it as a literal array column: the masked
    * count for any box is then 4 `element_at` lookups — O(1) per row,
    * codegen'd, no join, no UDF. Same accept/reject decision, including
    * the reference's clamping and its (replicated verbatim) rejection
    * condition `water_ratio > mask_ratio_threshold`.
    *
    * `integral` is (h+1)×(w+1) row-major: I[r][c] = masked-count of
    * mask[0..r)[0..c).
    */
  def integralImage(mask: Array[Array[Boolean]]): Array[Long] = {
    val h = mask.length
    val w = if (h == 0) 0 else mask(0).length
    val ii = Array.ofDim[Long]((h + 1) * (w + 1))
    var r = 1
    while (r <= h) {
      var rowSum = 0L
      var c = 1
      while (c <= w) {
        rowSum += (if (mask(r - 1)(c - 1)) 1L else 0L)
        ii(r * (w + 1) + c) = ii((r - 1) * (w + 1) + c) + rowSum
        c += 1
      }
      r += 1
    }
    ii
  }

  /** Mask statistics for a box: struct(maskedCnt, total, degenerate) —
    * the O(1) integral-image lookups the filter builds on, exposed for
    * oracle checks and diagnostics.
    */
  def maskStats(x1: Column, y1: Column, x2: Column, y2: Column,
                integral: Array[Long], maskH: Int, maskW: Int,
                imgW: Column, imgH: Column): Column = {
    val l0 = greatest(lit(0), x1.cast("int"))
    val t0 = greatest(lit(0), y1.cast("int"))
    val r0 = least(x2.cast("int"), imgW.cast("int"))
    val b0 = least(y2.cast("int"), imgH.cast("int"))
    val degenerate = r0 <= l0 || b0 <= t0
    val l = greatest(lit(0), least(l0, lit(maskW - 1)))
    val r = greatest(l + 1, least(r0, lit(maskW)))
    val t = greatest(lit(0), least(t0, lit(maskH - 1)))
    val b = greatest(t + 1, least(b0, lit(maskH)))
    val iiCol = lit(integral)
    val wid = maskW + 1
    def at(row: Column, colIdx: Column): Column =
      element_at(iiCol, (row * wid + colIdx + 1).cast("int"))
    val maskedCnt = at(b, r) - at(t, r) - at(b, l) + at(t, l)
    val total = ((r - l) * (b - t)).cast("long")
    struct(maskedCnt.as("maskedCnt"), total.as("total"), degenerate.as("degenerate"))
  }

  def maskFilter(x1: Column, y1: Column, x2: Column, y2: Column,
                 integral: Array[Long], maskH: Int, maskW: Int,
                 imgW: Column, imgH: Column, ratioThreshold: Double): Column = {
    // Reference clamping (src/detection.py:1090-1103): image bounds, then
    // mask bounds with a guaranteed ≥1px extent.
    val l0 = greatest(lit(0), x1.cast("int"))
    val t0 = greatest(lit(0), y1.cast("int"))
    val r0 = least(x2.cast("int"), imgW.cast("int"))
    val b0 = least(y2.cast("int"), imgH.cast("int"))
    val degenerate = r0 <= l0 || b0 <= t0
    val l = greatest(lit(0), least(l0, lit(maskW - 1)))
    val r = greatest(l + 1, least(r0, lit(maskW)))
    val t = greatest(lit(0), least(t0, lit(maskH - 1)))
    val b = greatest(t + 1, least(b0, lit(maskH)))
    val iiCol = lit(integral) // broadcast literal; (maskH+1)*(maskW+1) longs
    val wid = maskW + 1
    // element_at is 1-based.
    def at(row: Column, colIdx: Column): Column =
      element_at(iiCol, (row * wid + colIdx + 1).cast("int"))
    val maskedCnt = at(b, r) - at(t, r) - at(b, l) + at(t, l)
    val total = (r - l) * (b - t)
    val waterRatio = lit(1.0) - maskedCnt.cast("double") / total.cast("double")
    !degenerate && !(waterRatio > ratioThreshold)
  }

  /** F6 — the full cascade as one conjunction, already cost-ordered. */
  def cascade(df: DataFrame, score: Column,
              x1: Column, y1: Column, x2: Column, y2: Column,
              imgW: Column, imgH: Column,
              confThreshold: Double, minSize: Double, edgeTol: Double,
              mask: Option[(Array[Long], Int, Int, Double)] = None): DataFrame = {
    val base = confFilter(score, confThreshold) &&
      sizeFilter(x1, y1, x2, y2, minSize) &&
      edgeFilter(x1, y1, x2, y2, imgW, imgH, edgeTol)
    val full = mask match {
      case Some((ii, mh, mw, ratio)) =>
        base && maskFilter(x1, y1, x2, y2, ii, mh, mw, imgW, imgH, ratio)
      case None => base
    }
    df.filter(full)
  }
}
