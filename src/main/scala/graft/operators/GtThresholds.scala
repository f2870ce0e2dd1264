package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{Geometry, Vectors}

/** GT-derived threshold statistics (SURVEY §2.4 A3–A5, §3 entry point 4;
  * reference get_gt_thresholds, src/utils/feature_extraction.py:51-144).
  *
  * A tiny "cost-based optimizer": a prior Spark job whose scalar results
  * parameterize the tracker's join predicates (SURVEY §4 P11). Pure
  * relational: J7 consecutive-frame join → E1/E2/E3 pair features →
  * cross-sequence union (the input may already be multi-sequence) →
  * global aggregation.
  */
object GtThresholds {

  /** Pair features for every consecutive-frame GT match. Input columns:
    * seq, frameIdx, id, x, y, w, h, emb (array<float>, nullable).
    */
  def pairFeatures(gt: DataFrame): DataFrame = {
    val m = Matching.consecutiveMatches(gt)
    val withNextEmb = m.join(
      gt.select(col("seq"), col("frameIdx").as("nextFrameIdx"), col("id"),
        col("emb").as("next_emb")),
      Seq("seq", "nextFrameIdx", "id"))
    withNextEmb
      .withColumn("size_similarity", Geometry.sizeSim(
        col("w"), col("h"), col("next_w"), col("next_h")))
      .withColumn("distance", Geometry.centerDist(
        col("x"), col("y"), col("w"), col("h"),
        col("next_x"), col("next_y"), col("next_w"), col("next_h")))
      .withColumn("appearance_similarity",
        when(col("emb").isNull || col("next_emb").isNull, lit(null))
          .otherwise((Vectors.cosine(col("emb"), col("next_emb")) + 1.0) / 2.0))
  }

  /** A5 — normalized distance `1 − minmax(d, 0, max(d))`: needs the
    * global max first (two-pass; reference
    * src/utils/feature_extraction.py:109-111). The max is a scalar
    * aggregate broadcast back over the rows — a partition-less window
    * (`max() OVER ()`) would route every row through ONE task at scale,
    * while the agg is a map-side partial + 1-row exchange.
    */
  def withNormalizedDistance(features: DataFrame): DataFrame = {
    val mx = broadcast(features.agg(max("distance").as("__max_d")))
    features.crossJoin(mx)
      .withColumn("distance_norm",
        lit(1.0) - Geometry.minMaxNorm(col("distance"), lit(0.0), col("__max_d")))
      .drop("__max_d")
  }

  /** A3 — per-feature statistics: Mean/Median/StdDev/Min/Max. `np.std`
    * is POPULATION std dev and the median is EXACT (reference
    * src/utils/feature_extraction.py:106-122) — `percentile` sorts each
    * group's values exactly (q16 proves engine parity for this form),
    * unlike `percentile_approx` whose result depends on sketch accuracy.
    */
  def featureStats(features: DataFrame): DataFrame = {
    val feats = Seq("size_similarity", "distance", "appearance_similarity")
    val rows = feats.map { f =>
      features.select(
        lit(f).as("feature"),
        avg(col(f)).as("mean"),
        expr(s"percentile($f, 0.5)").as("median"),
        stddev_pop(col(f)).as("stddev"),
        min(col(f)).as("min"),
        max(col(f)).as("max"))
    }
    rows.reduce(_ unionByName _)
  }

  /** A4 — the thresholds: min appearance, max distance, min size over
    * all GT-match pairs (reference src/utils/feature_extraction.py:125-129).
    */
  def thresholds(features: DataFrame): DataFrame =
    features.agg(
      min("appearance_similarity").as("appearance"),
      max("distance").as("distance"),
      min("size_similarity").as("size"))
}
