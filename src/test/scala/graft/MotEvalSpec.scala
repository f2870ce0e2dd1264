package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MotEval

/** Golden test for the CLEAR/Identity metric plans against a fixture
  * hand-traced through the reference semantics
  * (compute_sequence_metrics, reference src/utils/eval.py:174-457).
  */
class MotEvalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // (seq, frameIdx, id, x, y, w, h)
  private val gtRows = Seq(
    ("x", 1, 1, 0.0, 0.0, 10.0, 10.0), ("x", 2, 1, 0.0, 0.0, 10.0, 10.0),
    ("x", 3, 1, 0.0, 0.0, 10.0, 10.0), ("x", 4, 1, 0.0, 0.0, 10.0, 10.0),
    ("x", 5, 1, 0.0, 0.0, 10.0, 10.0),
    ("x", 1, 2, 100.0, 0.0, 10.0, 10.0), ("x", 2, 2, 100.0, 0.0, 10.0, 10.0),
    ("x", 3, 2, 100.0, 0.0, 10.0, 10.0))

  private val trackRows = Seq(
    ("x", 1, 11, 0.0, 0.0, 10.0, 10.0), ("x", 2, 11, 1.0, 0.0, 10.0, 10.0),
    ("x", 3, 33, 0.0, 0.0, 10.0, 10.0), ("x", 5, 33, 0.0, 0.0, 10.0, 10.0),
    ("x", 1, 22, 100.0, 0.0, 10.0, 10.0), ("x", 3, 22, 100.0, 0.0, 10.0, 10.0),
    ("x", 1, 44, 500.0, 500.0, 10.0, 10.0))

  private def df(rows: Seq[(String, Int, Int, Double, Double, Double, Double)]) =
    rows.toDF("seq", "frameIdx", "id", "x", "y", "w", "h")

  test("matchFrames: greedy per-GT IoU argmax") {
    val m = MotEval.matchFrames(df(gtRows), df(trackRows), 0.3)
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getInt(3))).toSet
    assert(m == Set((1, 1, 11), (2, 1, 11), (3, 1, 33), (5, 1, 33),
      (1, 2, 22), (3, 2, 22)))
  }

  test("metrics: hand-traced CLEAR + Identity values") {
    val row = MotEval.metrics(df(gtRows), df(trackRows), 0.3).collect().head
    def l(n: String) = row.getLong(row.fieldIndex(n))
    def d(n: String) = row.getDouble(row.fieldIndex(n))
    assert(l("GT_Dets") == 8 && l("GT_IDs") == 2)
    assert(l("Dets") == 7 && l("IDs") == 4)
    assert(l("CLR_TP") == 6 && l("CLR_FN") == 2)
    assert(math.abs(d("CLR_Re") - 0.75) < 1e-12)
    // LocA = (1 + 90/110 + 1 + 1 + 1 + 1)/6, quantized at 1e-9
    assert(math.abs(d("LocA") - 0.9696969696) < 1e-8)
    assert(l("IDSW") == 1)  // gt1: 11 -> 33
    assert(l("Frag") == 2)  // gt1 gap 3->5, gt2 gap 1->3
    assert(l("MT") == 1 && l("PT") == 1 && l("ML") == 0) // cov 0.8 / 0.667
    assert(l("IDTP") == 4)  // gt1 longest run 2, gt2 run 2
    assert(l("IDFN") == 2 && l("IDFP") == 0)
    assert(math.abs(d("IDR") - 4.0 / 6.0) < 1e-12)
    assert(math.abs(d("IDP") - 1.0) < 1e-12)
    assert(math.abs(d("IDF1") - 0.8) < 1e-12)
  }

  test("combine: count sums + TP-weighted LocA") {
    val gt2 = df(gtRows.map(r => r.copy(_1 = "y")))
    val tr2 = df(trackRows.map(r => r.copy(_1 = "y")))
    val per = MotEval.metrics(df(gtRows).union(gt2), df(trackRows).union(tr2), 0.3)
    assert(per.count() == 2)
    val c = MotEval.combine(per).collect().head
    assert(c.getLong(c.fieldIndex("CLR_TP")) == 12)
    assert(c.getLong(c.fieldIndex("IDSW")) == 2)
    assert(math.abs(c.getDouble(c.fieldIndex("LocA")) - 0.9696969696) < 1e-8)
    assert(math.abs(c.getDouble(c.fieldIndex("IDF1")) - 0.8) < 1e-12)
  }

  test("eval.txt filter: strict threshold + per-frame-track dedup") {
    val f = MotEval.gtFilteredTracks(df(gtRows), df(trackRows), 0.3)
    // track 44 never matches; all others do (iou 1 or 0.818 > 0.3)
    assert(f.count() == 6)
    assert(!f.collect().exists(_.getInt(2) == 44))
  }
}
