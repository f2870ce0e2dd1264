package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.mot.{Bbox, Kalman}

/** Kalman filter vs hand-computed filterpy-equivalent values (reference
  * config: process 10, measurement 18, P₀=100·I — src/tracking.py:248-299).
  * Expected numbers computed independently with numpy using filterpy's
  * predict/Joseph-update equations.
  */
class KalmanSpec extends AnyFunSuite {
  private val eps = 1e-9

  test("init state and covariance") {
    val s = Kalman.init(Bbox(10, 20, 30, 40))
    assert(s.x.toSeq == Seq(10.0, 20.0, 0.0, 0.0, 30.0, 40.0))
    assert(s.p(0) == 100.0 && s.p(7) == 100.0 && s.p(35) == 100.0)
    assert(s.p(1) == 0.0)
  }

  test("predict: x <- Fx, P <- FPF' + Q") {
    val s = Kalman.predict(Kalman.init(Bbox(10, 20, 30, 40)), 10.0)
    assert(s.x.toSeq == Seq(10.0, 20.0, 0.0, 0.0, 30.0, 40.0))
    val diag = (0 until 6).map(i => s.p(i * 6 + i))
    assert(math.abs(diag(0) - 210.0) < eps)
    assert(math.abs(diag(1) - 210.0) < eps)
    assert(math.abs(diag(2) - 110.0) < eps)
    assert(math.abs(diag(4) - 110.0) < eps)
    // velocity-position coupling FPF' term
    assert(math.abs(s.p(0 * 6 + 2) - 100.0) < eps)
    // E11 uncertainty: 2*sqrt(P00+P11)
    assert(math.abs(Kalman.uncertainty(s) - 40.98780306383839) < 1e-9)
  }

  test("update (Joseph form) matches filterpy numerics") {
    val s1 = Kalman.predict(Kalman.init(Bbox(10, 20, 30, 40)), 10.0)
    val s2 = Kalman.update(s1, Array(12.0, 22.0, 31.0, 41.0), 18.0)
    val exp = Seq(11.842105263158, 21.842105263158, 0.877192982456,
      0.877192982456, 30.859375, 40.859375)
    s2.x.toSeq.zip(exp).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9, s"$a vs $b") }
    val expP = Seq(16.578947368421, 16.578947368421, 66.140350877193,
      66.140350877193, 15.46875, 15.46875)
    (0 until 6).foreach(i => assert(math.abs(s2.p(i * 6 + i) - expP(i)) < 1e-9))
    // second predict: velocity carries position forward
    val s3 = Kalman.predict(s2, 10.0)
    assert(math.abs(s3.x(0) - 12.719298245614) < 1e-9)
    assert(math.abs(s3.x(1) - 22.719298245614) < 1e-9)
    assert(math.abs(Kalman.stateBbox(s3).w - 30.859375) < 1e-9)
  }

  /** The invariant `KernelQ.kalmanTrackOracle` is built on: with
    * diagonal P₀/Q/R and the (x,vx),(y,vy)-coupled F, cross-block
    * covariance entries are EXACTLY ±0.0 after any predict/update
    * sequence — so the 6×6 filter decomposes into two 2×2 blocks + two
    * scalars, which is what the DuckDB replay carries. Checked bitwise
    * (== 0.0), not within eps, over a long pseudo-random measurement
    * sequence with irregular coast gaps.
    */
  test("covariance stays exactly block-diagonal across {0,2},{1,3},{4},{5}") {
    val blocks = Seq(Set(0, 2), Set(1, 3), Set(4), Set(5))
    def blockOf(i: Int): Set[Int] = blocks.find(_.contains(i)).get
    var s = Kalman.init(Bbox(3.7, -2.9, 17.3, 23.1))
    var seed = 0x9e3779b97f4a7c15L
    def rnd(): Double = { seed = seed * 6364136223846793005L + 1442695040888963407L; (seed >>> 11).toDouble / (1L << 53).toDouble }
    (0 until 200).foreach { k =>
      s = Kalman.predict(s, 10.0)
      if (k % 7 != 3) // irregular coasting: some frames never update
        s = Kalman.update(s, Array(3.7 + k * rnd(), -2.9 - k * rnd(), 17.3 + rnd(), 23.1 - rnd()), 18.0)
      for (i <- 0 until 6; j <- 0 until 6 if blockOf(i) != blockOf(j))
        assert(s.p(i * 6 + j) == 0.0, s"P($i,$j) left the block structure at step $k: ${s.p(i * 6 + j)}")
    }
    // and the blocks themselves are live (nonzero), so the test bites
    assert(s.p(0) > 0.0 && s.p(2) != 0.0 && s.p(7) > 0.0 && s.p(35) > 0.0)
  }
}
