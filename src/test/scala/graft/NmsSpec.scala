package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{DetBox, Nms}

/** Golden + property tests for the greedy suppression kernels (O5/O6),
  * incl. the reference's nested-removal precedence matrix
  * (src/detection.py:1163-1189).
  */
class NmsSpec extends AnyFunSuite {

  private def box(id: Int, x1: Double, y1: Double, x2: Double, y2: Double,
                  score: Double) = DetBox("s", "f", id, x1, y1, x2, y2, score)

  test("NMS keeps best and suppresses IoU >= threshold") {
    val a = box(1, 0, 0, 10, 10, 0.9)
    val b = box(2, 1, 1, 11, 11, 0.8) // IoU ~0.68 with a -> suppressed
    val c = box(3, 50, 50, 60, 60, 0.7) // disjoint -> kept
    val kept = Nms.nmsFrame(Seq(b, c, a), 0.5)
    assert(kept.map(_.id) == Seq(1, 3))
  }

  test("NMS property: pairwise IoU of kept boxes < threshold") {
    val boxes = for (i <- 0 until 40) yield
      box(i, (i % 7) * 8, (i % 5) * 9, (i % 7) * 8 + 20 + i % 11, (i % 5) * 9 + 18 + i % 6,
        0.1 + (i % 13) * 0.07)
    val kept = Nms.nmsFrame(boxes, 0.5)
    for (a <- kept; b <- kept if a.id < b.id)
      assert(Nms.iouCorners(a, b) < 0.5, s"${a.id} ${b.id}")
    assert(kept.nonEmpty && kept.size < boxes.size)
  }

  test("nested removal: high-confidence kept beats nested low-confidence") {
    val outer = box(1, 0, 0, 100, 100, 0.9)  // high conf (> 0.5)
    val inner = box(2, 10, 10, 30, 30, 0.3)  // low conf, fully nested
    val kept = Nms.removeNestedFrame(Seq(outer, inner), 0.5)
    assert(kept.map(_.id) == Seq(1))
  }

  test("nested removal: low container loses to nested high-confidence box") {
    val container = box(1, 0, 0, 100, 100, 0.4) // low conf
    val nestedHi = box(2, 10, 10, 30, 30, 0.9)  // high conf, nested in container
    // sorted desc: nestedHi kept first; container's kept_in_current check
    // sees a high-confidence kept box inside it -> container dropped
    val kept = Nms.removeNestedFrame(Seq(container, nestedHi), 0.5)
    assert(kept.map(_.id) == Seq(2))
  }

  test("nested removal: later high container EVICTS earlier-kept nested high box") {
    // the remove_indices path (reference src/detection.py:1191-1196):
    // small high box kept first, larger (lower-score) high container
    // arrives and evicts it
    val smallHi = box(1, 10, 10, 30, 30, 0.9)
    val bigHi = box(2, 0, 0, 100, 100, 0.8)
    val kept = Nms.removeNestedFrame(Seq(smallHi, bigHi), 0.5)
    assert(kept.map(_.id) == Seq(2))
  }

  test("nested removal: both low-confidence -> higher score wins") {
    val a = box(1, 0, 0, 100, 100, 0.45)
    val b = box(2, 10, 10, 30, 30, 0.35)
    val kept = Nms.removeNestedFrame(Seq(a, b), 0.5)
    assert(kept.map(_.id) == Seq(1))
  }

  test("nested removal: two high-confidence boxes both kept unless nested") {
    val a = box(1, 0, 0, 100, 100, 0.9)
    val b = box(2, 10, 10, 30, 30, 0.8)  // nested in a, both high: kept(a) high -> b dropped
    val c = box(3, 200, 200, 250, 250, 0.7)
    val kept = Nms.removeNestedFrame(Seq(a, b, c), 0.5)
    assert(kept.map(_.id) == Seq(1, 3))
  }

  test("containment ratio is directional intersection over first-box area (E7)") {
    val a = box(1, 0, 0, 10, 10, 0.5)
    val b = box(2, 0, 0, 5, 5, 0.5)
    assert(Nms.containment(b, a) == 1.0)   // all of b inside a
    assert(Nms.containment(a, b) == 0.25)  // quarter of a inside b
    val c = box(3, 20, 20, 30, 30, 0.5)
    assert(Nms.containment(a, c) == 0.0)
  }
}
