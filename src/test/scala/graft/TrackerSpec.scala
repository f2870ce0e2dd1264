package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{SeqTrackOut, Tracker, TrackerConfig, TrackerIn}
import graft.streaming.StreamingTracker

/** Tracker kernel invariants + batch/streaming parity (SURVEY §7.2 M5/M7).
  * Scenarios use identical embeddings so the appearance gate passes and
  * geometry drives the matching.
  */
class TrackerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val emb = Array.fill(8)(1.0f)

  private def det(seq: String, frame: Int, id: Int, x: Double, y: Double,
                  w: Double = 30, h: Double = 30) =
    TrackerIn(seq, f"$frame%06d", id, x, y, w, h, 0.9, emb)

  private def run(dets: Seq[TrackerIn], cfg: TrackerConfig = TrackerConfig()): Seq[SeqTrackOut] = {
    import spark.implicits._
    Tracker.track(spark.createDataset(dets), cfg).collect().toSeq
      .sortBy(r => (r.seq, r.frame, r.trackId))
  }

  test("single moving object keeps one track id across frames") {
    val dets = (1 to 6).map(f => det("a", f, 0, 5.0 * f, 10))
    val out = run(dets)
    assert(out.size == 6)
    assert(out.map(_.trackId).distinct == Seq(1))
    assert(out.map(_.frame) == (1 to 6).map(f => f"$f%06d"))
  }

  test("two separated objects get distinct stable ids; ids monotonic from 1") {
    val dets = (1 to 5).flatMap(f => Seq(
      det("a", f, 0, 5.0 * f, 10), det("a", f, 1, 600.0, 600 + 5.0 * f)))
    val out = run(dets)
    assert(out.size == 10)
    assert(out.map(_.trackId).distinct.sorted == Seq(1, 2))
    // per frame one-to-one: no duplicate (frame, trackId) or (frame, detId)
    assert(out.map(r => (r.frame, r.trackId)).distinct.size == out.size)
    assert(out.map(r => (r.frame, r.detId)).distinct.size == out.size)
  }

  test("track dies after maxAge (strict >) unmatched frames; reappearance gets new id") {
    // object A in frames 1-2, gone 3-6 (4 unmatched > maxAge 3), back 7-8
    // object B keeps every frame alive
    val dets =
      (1 to 2).map(f => det("a", f, 0, 10, 10)) ++
      (1 to 8).map(f => det("a", f, 1, 600, 600)) ++
      (7 to 8).map(f => det("a", f, 0, 10, 10))
    val out = run(dets)
    val aTracks = out.filter(_.detId == 0).map(_.trackId).distinct
    assert(aTracks.size == 2, s"expected new id after death, got $aTracks")
  }

  test("reappearance within maxAge keeps the same id (Kalman-predicted match)") {
    // gone frames 3-4 only (2 <= maxAge 3): still alive, same id
    val dets =
      (1 to 2).map(f => det("a", f, 0, 10, 10)) ++
      (1 to 6).map(f => det("a", f, 1, 600, 600)) ++
      (5 to 6).map(f => det("a", f, 0, 10, 10))
    val out = run(dets)
    val aTracks = out.filter(_.detId == 0).map(_.trackId).distinct
    assert(aTracks.size == 1, s"expected same id within maxAge, got $aTracks")
  }

  test("greedy matcher honors the spatial-index radius gate (J4 + E12)") {
    // The one matcher×gate combination no DuckDB oracle covers (k04
    // runs the reference's index-off fallback to dodge a DuckDB 1.0
    // evaluation bug): greedy matching WITH useSpatialIndex=true.
    // One track at (0,0); frame 2's only det jumps 200 px — beyond the
    // search radius max(2σ, thresholdDistance·(1+tolerance)) ≈ 128.9.
    //  - gated: the track sees NO candidates → det starts track 2
    //  - ungated (reference fallback, no distance filter): the pair is
    //    scored (negative sim, but greedy has no > 0 floor — mirroring
    //    the reference) and the track CONTINUES as id 1
    // The pair of outcomes pins both the gate and the fallback.
    val dets = Seq(det("a", 1, 0, 0, 0), det("a", 2, 0, 200, 0))
    for (kalman <- Seq(true, false)) {
      val gated = run(dets, TrackerConfig(bidirectional = false,
        useSpatialIndex = true, useKalman = kalman))
      assert(gated.map(r => (r.frame, r.trackId)) ==
        Seq(("000001", 1), ("000002", 2)),
        s"gated greedy (kalman=$kalman): $gated")
      val ungated = run(dets, TrackerConfig(bidirectional = false,
        useSpatialIndex = false, useKalman = kalman))
      assert(ungated.map(r => (r.frame, r.trackId)) ==
        Seq(("000001", 1), ("000002", 1)),
        s"ungated greedy (kalman=$kalman): $ungated")
    }
    // and a det INSIDE the radius still matches under the gate
    val near = Seq(det("a", 1, 0, 0, 0), det("a", 2, 0, 50, 0))
    val out = run(near, TrackerConfig(bidirectional = false,
      useSpatialIndex = true))
    assert(out.map(_.trackId).distinct == Seq(1), s"near det split: $out")
  }

  test("emission only on matched frames (T5)") {
    val dets = (1 to 2).map(f => det("a", f, 0, 10, 10)) ++
      (3 to 4).map(f => det("a", f, 1, 600, 600))
    val out = run(dets)
    // track of object 0 emits only frames 1-2 even though alive until aged out
    assert(out.filter(_.detId == 0).map(_.frame) == Seq("000001", "000002"))
  }

  test("minTrackLength filter (F8) drops short tracks") {
    val dets = (1 to 5).map(f => det("a", f, 0, 10, 10)) :+ det("a", 3, 9, 900, 900)
    val out = run(dets, TrackerConfig(minTrackLength = 2))
    assert(out.forall(_.detId == 0))
    assert(out.size == 5)
  }

  test("per-sequence state isolation (T6): ids restart per sequence") {
    val dets = (1 to 3).flatMap(f => Seq(det("a", f, 0, 10, 10), det("b", f, 0, 10, 10)))
    val out = run(dets)
    assert(out.filter(_.seq == "a").map(_.trackId).distinct == Seq(1))
    assert(out.filter(_.seq == "b").map(_.trackId).distinct == Seq(1))
  }

  test("greedy matching matches at least as many as bidirectional") {
    val dets = (1 to 6).flatMap(f => (0 until 4).map(i =>
      det("a", f, i, 40.0 * i + 3.0 * f, 50.0 * i, 30 + i, 30)))
    val bi = run(dets)
    val gr = run(dets, TrackerConfig(bidirectional = false))
    assert(gr.size >= bi.size)
  }

  test("spatial index on/off equivalence (grid == exact radius query)") {
    val dets = (1 to 5).flatMap(f => (0 until 6).map(i =>
      det("a", f, i, 150.0 * i + 4.0 * f, 90.0 * i, 25 + i, 25)))
    val on = run(dets, TrackerConfig(useSpatialIndex = true))
    // NOTE: without the index the reference skips the radius filter
    // entirely, so exact equality is only guaranteed when all candidates
    // are within radius; this fixture keeps distances < threshold.
    val off = run(dets, TrackerConfig(useSpatialIndex = false))
    assert(on.map(r => (r.frame, r.trackId, r.detId)).toSet
      == off.map(r => (r.frame, r.trackId, r.detId)).toSet)
  }

  test("streaming host parity: flatMapGroupsWithState == batch kernel") {
    import spark.implicits._
    val dets = (1 to 6).flatMap(f => (0 until 3).map(i =>
      det("a", f, i, 100.0 * i + 5.0 * f, 80.0 * i)))
    val batch = run(dets)
    val streamed = StreamingTracker.track(spark.createDataset(dets), TrackerConfig())
      .collect().toSeq.sortBy(r => (r.seq, r.frame, r.trackId))
    assert(batch == streamed)
  }
}
