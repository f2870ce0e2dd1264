package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.mot.{Bbox, Kalman}
import graft.operators.{DetBox, Nms}

/** ScalaCheck property tests (SURVEY §5): IoU symmetry/range, size-sim
  * symmetry, NMS pairwise invariant, Kalman covariance sanity.
  */
class PropertySpec extends AnyFunSuite {

  // deterministic mini-forAll over ScalaCheck Gens (scalatestplus bridge
  // is not on the offline classpath)
  private def forAll[A](g: Gen[A], n: Int = 120)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }
  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(t => f(t._1, t._2))
  private def forAll[A, B, C, D](ga: Gen[A], gb: Gen[B], gc: Gen[C], gd: Gen[D])(
      f: (A, B, C, D) => Unit): Unit =
    forAll(Gen.zip(ga, gb, gc, gd))(t => f(t._1, t._2, t._3, t._4))

  private val boxGen: Gen[DetBox] = for {
    x1 <- Gen.choose(0.0, 500.0)
    y1 <- Gen.choose(0.0, 500.0)
    w <- Gen.choose(1.0, 120.0)
    h <- Gen.choose(1.0, 120.0)
    s <- Gen.choose(0.01, 0.99)
    id <- Gen.choose(0, 1000000)
  } yield DetBox("s", "f", id, x1, y1, x1 + w, y1 + h, s)

  test("IoU: symmetric, in [0,1], 1 iff identical boxes") {
    forAll(boxGen, boxGen) { (a, b) =>
      val ab = Nms.iouCorners(a, b)
      val ba = Nms.iouCorners(b, a)
      assert(math.abs(ab - ba) < 1e-12)
      assert(ab >= 0.0 && ab <= 1.0 + 1e-12)
    }
    forAll(boxGen) { a => assert(math.abs(Nms.iouCorners(a, a) - 1.0) < 1e-12) }
  }

  test("containment: in [0,1]; full containment iff box inside") {
    forAll(boxGen, boxGen) { (a, b) =>
      val c = Nms.containment(a, b)
      assert(c >= 0.0 && c <= 1.0 + 1e-12)
      // a inside b => containment(a, b) == 1
      val inside = a.x1 >= b.x1 && a.y1 >= b.y1 && a.x2 <= b.x2 && a.y2 <= b.y2
      if (inside) assert(math.abs(c - 1.0) < 1e-12)
    }
  }

  test("NMS: kept boxes pairwise IoU < threshold; suppressed dominated by a kept box") {
    forAll(Gen.listOfN(30, boxGen)) { boxes =>
      val uniq = boxes.zipWithIndex.map { case (b, i) => b.copy(id = i) }
      val kept = Nms.nmsFrame(uniq, 0.5)
      for (a <- kept; b <- kept if a.id < b.id)
        assert(Nms.iouCorners(a, b) < 0.5)
      val keptIds = kept.map(_.id).toSet
      uniq.filterNot(d => keptIds.contains(d.id)).foreach { d =>
        assert(kept.exists(k => k.score >= d.score && Nms.iouCorners(k, d) >= 0.5 ||
          kept.exists(k2 => Nms.iouCorners(k2, d) >= 0.5)))
      }
    }
  }

  test("Kalman: covariance diagonal stays positive; update shrinks position variance") {
    forAll(Gen.choose(0.0, 500.0), Gen.choose(0.0, 500.0),
      Gen.choose(5.0, 80.0), Gen.choose(5.0, 80.0)) { (x, y, w, h) =>
      var s = Kalman.init(Bbox(x, y, w, h))
      s = Kalman.predict(s, 10.0)
      val preVar = s.p(0)
      (0 until 6).foreach(i => assert(s.p(i * 6 + i) > 0.0))
      s = Kalman.update(s, Array(x + 1, y - 1, w, h), 18.0)
      assert(s.p(0) < preVar) // measurement reduces uncertainty
      (0 until 6).foreach(i => assert(s.p(i * 6 + i) > 0.0))
    }
  }

  test("tileOrigins: every pixel of the image is covered by some tile") {
    forAll(Gen.choose(520, 2000), Gen.choose(520, 2000)) { (hh, ww) =>
      val tiles = graft.operators.Tiling.tileOrigins(hh, ww, 512, 512, 0.35)
      // corners + a grid of probe points all covered
      val probes = for (px <- Seq(0, ww / 2, ww - 1); py <- Seq(0, hh / 2, hh - 1)) yield (px, py)
      probes.foreach { case (px, py) =>
        assert(tiles.exists { case (tx, ty) =>
          px >= tx && px < tx + 512 && py >= ty && py < ty + 512
        }, s"uncovered ($px,$py) for $hh x $ww")
      }
    }
  }
}
