package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.GtThresholds

/** A3–A5 feature statistics: population stddev, exact median, two-pass
  * normalized distance, threshold extraction — hand-computed goldens.
  */
class GtThresholdsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // consecutive-frame pairs for one object moving right 10px/frame with
  // constant size: distance 10, sizeSim 1; second object shrinking.
  private def gt = Seq(
    ("s", 1, 1, 0.0, 0.0, 10.0, 10.0, Array(1f, 0f)),
    ("s", 2, 1, 10.0, 0.0, 10.0, 10.0, Array(1f, 0f)),
    ("s", 3, 1, 20.0, 0.0, 10.0, 10.0, Array(0f, 1f)),
    ("s", 1, 2, 100.0, 0.0, 20.0, 20.0, Array(1f, 1f)),
    ("s", 2, 2, 100.0, 0.0, 10.0, 20.0, Array(1f, 1f))
  ).toDF("seq", "frameIdx", "id", "x", "y", "w", "h", "emb")

  test("pairFeatures: distance / size / appearance per consecutive match") {
    val f = GtThresholds.pairFeatures(gt)
      .select("id", "frameIdx", "size_similarity", "distance", "appearance_similarity")
      .collect().map(r => (r.getInt(0), r.getInt(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4))).sortBy(x => (x._1, x._2))
    assert(f.length == 3)
    // object 1 frame1->2: same box moved 10px, same emb -> app 1.0
    assert(f(0) == ((1, 1, 1.0, 10.0, 1.0)))
    // object 1 frame2->3: orthogonal embs -> app (0+1)/2 = 0.5
    assert(f(1)._3 == 1.0 && f(1)._4 == 10.0 && math.abs(f(1)._5 - 0.5) < 1e-9)
    // object 2: area 400 -> 200: sizeSim 0.5; center shifts (110,10)->(105,10)
    assert(math.abs(f(2)._3 - 0.5) < 1e-9 && math.abs(f(2)._4 - 5.0) < 1e-9)
  }

  test("thresholds: min appearance, max distance, min size") {
    val t = GtThresholds.thresholds(GtThresholds.pairFeatures(gt)).collect().head
    assert(math.abs(t.getDouble(0) - 0.5) < 1e-9)   // min appearance
    assert(math.abs(t.getDouble(1) - 10.0) < 1e-9)  // max distance
    assert(math.abs(t.getDouble(2) - 0.5) < 1e-9)   // min size
  }

  test("featureStats: population stddev and exact median") {
    val stats = GtThresholds.featureStats(GtThresholds.pairFeatures(gt))
      .filter(col("feature") === "distance").collect().head
    // distances: 10, 10, 5 -> mean 25/3, median 10, pop-std sqrt(50/9)
    assert(math.abs(stats.getDouble(1) - 25.0 / 3) < 1e-9)
    assert(math.abs(stats.getDouble(2) - 10.0) < 1e-6)
    assert(math.abs(stats.getDouble(3) - math.sqrt(50.0 / 9)) < 1e-9)
  }

  test("withNormalizedDistance: 1 - minmax against the global max") {
    val n = GtThresholds.withNormalizedDistance(GtThresholds.pairFeatures(gt))
      .select("distance", "distance_norm").collect()
      .map(r => (r.getDouble(0), r.getDouble(1))).toSet
    assert(n.contains((10.0, 0.0)))
    assert(n.exists { case (d, nn) => d == 5.0 && math.abs(nn - 0.5) < 1e-9 })
  }
}
