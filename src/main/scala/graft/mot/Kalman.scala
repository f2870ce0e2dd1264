package graft.mot

/** 6-state constant-velocity Kalman filter, hand-rolled dense linear
  * algebra (no BLAS dependency). State `[x, y, vx, vy, w, h]`, measurement
  * `[x, y, w, h]`.
  *
  * Faithful to the reference's filterpy configuration (reference
  * src/tracking.py:234-301): F = constant velocity, H observes position
  * and size, Q = diag(processNoise), R = diag(measurementNoise),
  * P₀ = 100·I, v₀ = 0. The update uses filterpy's Joseph-stabilized
  * covariance form `P = (I-KH)P(I-KH)ᵀ + KRKᵀ`.
  *
  * All matrices are 6×6 / 4×4 — tiny, so this runs inside the tracker
  * kernel per track per frame with zero allocation pressure concerns at
  * scale (the 100 TB cost center is the shuffle, not this arithmetic).
  */
object Kalman {
  private val N = 6 // state dim
  private val M = 4 // measurement dim

  /** Initial state from a bbox (zero velocity, P=100·I). */
  def init(b: Bbox): KalmanState = {
    val x = Array(b.x, b.y, 0.0, 0.0, b.w, b.h)
    val p = Array.ofDim[Double](N * N)
    var i = 0
    while (i < N) { p(i * N + i) = 100.0; i += 1 }
    KalmanState(x, p)
  }

  /** Predict step: x ← Fx, P ← FPFᵀ + Q. F is sparse (identity + two
    * velocity couplings), applied directly.
    */
  def predict(s: KalmanState, processNoise: Double): KalmanState = {
    val x = s.x
    val nx = Array(x(0) + x(2), x(1) + x(3), x(2), x(3), x(4), x(5))
    // FP: row-transform of P. F differs from I only in rows 0 (adds row 2)
    // and 1 (adds row 3).
    val p = s.p
    val fp = p.clone()
    var j = 0
    while (j < N) {
      fp(0 * N + j) = p(0 * N + j) + p(2 * N + j)
      fp(1 * N + j) = p(1 * N + j) + p(3 * N + j)
      j += 1
    }
    // (FP)Fᵀ: column-transform — col 0 adds col 2, col 1 adds col 3.
    val np = fp.clone()
    var i = 0
    while (i < N) {
      np(i * N + 0) = fp(i * N + 0) + fp(i * N + 2)
      np(i * N + 1) = fp(i * N + 1) + fp(i * N + 3)
      i += 1
    }
    i = 0
    while (i < N) { np(i * N + i) += processNoise; i += 1 }
    KalmanState(nx, np)
  }

  // H picks state indices (0,1,4,5) as the 4 measured components.
  private val hIdx = Array(0, 1, 4, 5)

  /** Update step with measurement z = [x, y, w, h] (reference
    * src/tracking.py:339-369). Joseph form for covariance.
    */
  def update(s: KalmanState, z: Array[Double], measurementNoise: Double): KalmanState = {
    val p = s.p
    val x = s.x
    // S = HPHᵀ + R  (4×4): select rows/cols hIdx of P, add R on diagonal.
    val sMat = Array.ofDim[Double](M * M)
    var i = 0
    while (i < M) {
      var j = 0
      while (j < M) {
        sMat(i * M + j) = p(hIdx(i) * N + hIdx(j)) + (if (i == j) measurementNoise else 0.0)
        j += 1
      }
      i += 1
    }
    val sInv = inv4(sMat)
    // K = PHᵀ S⁻¹  (6×4): PHᵀ = columns hIdx of P.
    val k = Array.ofDim[Double](N * M)
    i = 0
    while (i < N) {
      var j = 0
      while (j < M) {
        var acc = 0.0
        var m = 0
        while (m < M) { acc += p(i * N + hIdx(m)) * sInv(m * M + j); m += 1 }
        k(i * M + j) = acc
        j += 1
      }
      i += 1
    }
    // x ← x + K(z − Hx)
    val resid = Array(z(0) - x(0), z(1) - x(1), z(2) - x(4), z(3) - x(5))
    val nx = x.clone()
    i = 0
    while (i < N) {
      var acc = 0.0
      var m = 0
      while (m < M) { acc += k(i * M + m) * resid(m); m += 1 }
      nx(i) += acc
      i += 1
    }
    // A = I − KH  (6×6): KH has K's columns scattered to hIdx positions.
    val a = Array.ofDim[Double](N * N)
    i = 0
    while (i < N) {
      var j = 0
      while (j < N) { a(i * N + j) = if (i == j) 1.0 else 0.0; j += 1 }
      var m = 0
      while (m < M) { a(i * N + hIdx(m)) -= k(i * M + m); m += 1 }
      i += 1
    }
    // P ← A P Aᵀ + K R Kᵀ (R diagonal ⇒ KRKᵀ = r · KKᵀ)
    val ap = mul(a, p, N, N, N)
    val apat = mulT(ap, a, N, N, N)
    i = 0
    while (i < N) {
      var j = 0
      while (j < N) {
        var acc = 0.0
        var m = 0
        while (m < M) { acc += k(i * M + m) * k(j * M + m); m += 1 }
        apat(i * N + j) += measurementNoise * acc
        j += 1
      }
      i += 1
    }
    KalmanState(nx, apat)
  }

  /** Predicted/estimated bbox from state (reference src/tracking.py:330,383). */
  def stateBbox(s: KalmanState): Bbox = Bbox(s.x(0), s.x(1), s.x(4), s.x(5))

  /** 2σ position-uncertainty radius `2·sqrt(P00+P11)` (E11, reference
    * src/tracking.py:407-435).
    */
  def uncertainty(s: KalmanState): Double =
    2.0 * math.sqrt(s.p(0) + s.p(N + 1))

  // C = A(ra×ca) · B(ca×cb)
  private def mul(a: Array[Double], b: Array[Double], ra: Int, ca: Int, cb: Int): Array[Double] = {
    val c = Array.ofDim[Double](ra * cb)
    var i = 0
    while (i < ra) {
      var m = 0
      while (m < ca) {
        val av = a(i * ca + m)
        if (av != 0.0) {
          var j = 0
          while (j < cb) { c(i * cb + j) += av * b(m * cb + j); j += 1 }
        }
        m += 1
      }
      i += 1
    }
    c
  }

  // C = A(ra×ca) · B(rb×ca)ᵀ
  private def mulT(a: Array[Double], b: Array[Double], ra: Int, ca: Int, rb: Int): Array[Double] = {
    val c = Array.ofDim[Double](ra * rb)
    var i = 0
    while (i < ra) {
      var j = 0
      while (j < rb) {
        var acc = 0.0
        var m = 0
        while (m < ca) { acc += a(i * ca + m) * b(j * ca + m); m += 1 }
        c(i * rb + j) = acc
        j += 1
      }
      i += 1
    }
    c
  }

  /** 4×4 inverse via Gauss-Jordan with partial pivoting. S = HPHᵀ+R is
    * symmetric positive definite here, so the pivot never vanishes.
    */
  private def inv4(m0: Array[Double]): Array[Double] = {
    val n = 4
    val a = m0.clone()
    val inv = Array.ofDim[Double](n * n)
    var i = 0
    while (i < n) { inv(i * n + i) = 1.0; i += 1 }
    var col = 0
    while (col < n) {
      var piv = col
      var best = math.abs(a(col * n + col))
      var r = col + 1
      while (r < n) {
        val v = math.abs(a(r * n + col))
        if (v > best) { best = v; piv = r }
        r += 1
      }
      if (piv != col) {
        var j = 0
        while (j < n) {
          var t = a(col * n + j); a(col * n + j) = a(piv * n + j); a(piv * n + j) = t
          t = inv(col * n + j); inv(col * n + j) = inv(piv * n + j); inv(piv * n + j) = t
          j += 1
        }
      }
      val d = a(col * n + col)
      var j = 0
      while (j < n) { a(col * n + j) /= d; inv(col * n + j) /= d; j += 1 }
      r = 0
      while (r < n) {
        if (r != col) {
          val f = a(r * n + col)
          if (f != 0.0) {
            var jj = 0
            while (jj < n) {
              a(r * n + jj) -= f * a(col * n + jj)
              inv(r * n + jj) -= f * inv(col * n + jj)
              jj += 1
            }
          }
        }
        r += 1
      }
      col += 1
    }
    inv
  }
}
