package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** Simhash hamming-ball tiers vs BRUTE FORCE: the masked-chunk
  * pigeonhole (d14 16-bit, d16 64-bit) must emit exactly the pairs a
  * quadratic scan of the fingerprints finds at hamming 1..3 — a chunk
  * split that missed a bit range, a mask that leaked the sign fill, or
  * a dropped candidate bucket all change the pair set. Runs on the
  * sf0.001 documents corpus (driver-shaped data, small enough for the
  * n² reference scan on the driver).
  */
class SimhashSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  private def bruteBall(fps: Map[Long, Long], maxHamming: Int): Set[(Long, Long, Long)] = {
    val ids = fps.keys.toArray.sorted
    val out = Set.newBuilder[(Long, Long, Long)]
    for {
      i <- ids.indices
      j <- (i + 1) until ids.length
      h = java.lang.Long.bitCount(fps(ids(i)) ^ fps(ids(j)))
      if h >= 1 && h <= maxHamming
    } out += ((ids(i), ids(j), h.toLong))
    out.result()
  }

  private def canon(rows: Array[org.apache.spark.sql.Row]): Set[(Long, Long, Long)] =
    rows.map { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      (math.min(a, b), math.max(a, b), r.getLong(2))
    }.toSet

  test("simhash64BallPairs == brute-force hamming scan of simhash64 fingerprints") {
    val docs = Tables.documents(spark, dir)
    val fps = Dedup.simhash64(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps.nonEmpty)
    // the 64-bit fingerprints genuinely use the upper half (a silent
    // 16-bit truncation would pass the pair comparison vacuously)
    assert(fps.values.exists(fp => (fp >>> 32) != 0L && (fp >>> 32) != 0xFFFFFFFFL),
      "no fingerprint uses bits 32..63 — width regression?")
    val got = canon(Dedup.simhash64BallPairs(docs, maxHamming = 3).collect())
    assert(got == bruteBall(fps, 3))
  }

  test("simhashBallPairs (16-bit) == brute-force hamming scan") {
    val docs = Tables.documents(spark, dir)
    val fps = Dedup.simhash(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = canon(Dedup.simhashBallPairs(docs, maxHamming = 3).collect())
    assert(got == bruteBall(fps, 3))
  }

  test("simhash64 sign-bit assembly: negative fingerprints appear and round-trip the chunk join") {
    // ~half of all 64-bit fingerprints should set bit 63 (negative as a
    // signed long); the masked-chunk extraction must not let the
    // arithmetic-shift sign fill corrupt chunk keys — covered by the
    // parity tests above, but assert the negative population exists so
    // that coverage is not vacuous.
    val docs = Tables.documents(spark, dir)
    val fps = Dedup.simhash64(docs).collect().map(_.getLong(1))
    assert(fps.exists(_ < 0), "no negative fingerprint — sign-bit path untested")
    assert(fps.exists(_ >= 0))
  }
}
