package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Geometry

/** Plan-level matching operators (SURVEY §2.3). These are the
  * Catalyst-native forms of the joins the reference hand-rolls; the
  * tracker kernel uses the in-kernel equivalents (Tracker.scala) because
  * its join inputs depend on same-frame Kalman state (SURVEY §7.3 item 2).
  */
object Matching {

  /** J1 — distance/band join via grid-cell equi-keys (SURVEY §4 P1).
    *
    * `dist(center_l, center_r) <= radius` is not something Catalyst will
    * rewrite into an equi-join — emitted explicitly: quantize centers to
    * `cellSize` cells (E14), explode the left side to its
    * (2k+1)²-neighborhood of cells, hash-join on (keys..., cellx, celly),
    * post-filter exact distance. Shuffle cost is |left|·(2k+1)² +
    * |right|, versus |frames|·|left|·|right| for the naive theta join —
    * the same ~80× pruning the reference's spatial index claims
    * (reference src/tracking.py:442-554), but as a fully parallel
    * hash join that AQE can still broadcast or skew-split.
    *
    * Both sides need `cx`, `cy` center columns; `keys` are additional
    * equi-keys (typically seq + frame).
    */
  def bandJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               radius: Double, cellSize: Double = 100.0): DataFrame = {
    val k = math.ceil(radius / cellSize).toInt
    val l = left.columns.foldLeft(left)((d, c) =>
      if (keys.contains(c)) d else d.withColumnRenamed(c, s"l_$c"))
    val r = right.columns.foldLeft(right)((d, c) =>
      if (keys.contains(c)) d else d.withColumnRenamed(c, s"r_$c"))
    val neighbors = array((-k to k).flatMap(dx => (-k to k).map(dy =>
      struct(lit(dx).as("dx"), lit(dy).as("dy")))): _*)
    val lCells = l
      .withColumn("cell0x", Geometry.cellKey(col("l_cx"), cellSize))
      .withColumn("cell0y", Geometry.cellKey(col("l_cy"), cellSize))
      .withColumn("nb", explode(neighbors))
      .withColumn("cellx", col("cell0x") + col("nb.dx"))
      .withColumn("celly", col("cell0y") + col("nb.dy"))
      .drop("cell0x", "cell0y", "nb")
    val rCells = r
      .withColumn("cellx", Geometry.cellKey(col("r_cx"), cellSize))
      .withColumn("celly", Geometry.cellKey(col("r_cy"), cellSize))
    val dist = sqrt(pow(col("l_cx") - col("r_cx"), 2) + pow(col("l_cy") - col("r_cy"), 2))
    lCells.join(rCells, keys ++ Seq("cellx", "celly"))
      .filter(dist <= radius)
      .withColumn("dist", dist)
      .drop("cellx", "celly")
  }

  /** J1 via the OPTIMIZER: declare the theta join with the
    * `graft_dist_le` marker predicate and let
    * [[graft.optimizer.BandJoinRewrite]] turn it into the cell
    * equi-join. Requires GraftExtensions registered on the session.
    * Same results as [[bandJoin]]; this is the "Catalyst rewrites your
    * intent" form, bandJoin the explicit-plan form.
    */
  def distanceJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                   radius: Double): DataFrame = {
    val l = left.columns.foldLeft(left)((d, c) =>
      if (keys.contains(c)) d else d.withColumnRenamed(c, s"l_$c"))
    val r = right.columns.foldLeft(right)((d, c) =>
      if (keys.contains(c)) d else d.withColumnRenamed(c, s"r_$c"))
    val keyCond = keys.map(k => l(k) === r(k)).reduceOption(_ && _)
    val distCond = call_function("graft_dist_le",
      l("l_cx"), l("l_cy"), r("r_cx"), r("r_cy"), lit(radius))
    val cond = keyCond.map(_ && distCond).getOrElse(distCond)
    keys.foldLeft(l.join(r, cond))((df, k) => df.drop(r(k)))
      .withColumn("dist",
        sqrt(pow(col("l_cx") - col("r_cx"), 2) + pow(col("l_cy") - col("r_cy"), 2)))
  }

  /** J3 — bidirectional (mutual-best) match over a scored pair table
    * (reference `_matching_bidirectional`, src/tracking.py:929-1035).
    *
    * Faithfulness: det-side "best" ranks ONLY the track-best pairs
    * (reference src/tracking.py:1002-1011), not all candidates — a naive
    * symmetric rank-1 ∩ rank-1 is NOT equivalent (SURVEY §7.3 item 3).
    * Similarity must be strictly positive (reference best starts at 0).
    * Tie-break pinned to (sim desc, other-id asc).
    */
  def mutualBest(pairs: DataFrame, keys: Seq[String],
                 leftId: String, rightId: String, sim: String): DataFrame = {
    val kc = keys.map(col)
    val trackW = Window.partitionBy(kc :+ col(leftId): _*)
      .orderBy(col(sim).desc, col(rightId).asc)
    val trackBest = pairs.filter(col(sim) > 0.0)
      .withColumn("rn_t", row_number().over(trackW)).filter(col("rn_t") === 1).drop("rn_t")
    val detW = Window.partitionBy(kc :+ col(rightId): _*)
      .orderBy(col(sim).desc, col(leftId).asc)
    trackBest.withColumn("rn_d", row_number().over(detW))
      .filter(col("rn_d") === 1).drop("rn_d")
  }

  /** J9 — unmatched-entity anti-joins (reference
    * src/tracking.py:1030-1033).
    */
  def unmatched(all: DataFrame, matches: DataFrame, on: Seq[String]): DataFrame =
    all.join(matches.select(on.map(col): _*), on, "left_anti")

  /** J7 — consecutive-frame self-join over GT (extract_matches, reference
    * src/utils/helpers.py:481-530): id present in frame k and the NEXT
    * populated frame. `lead` over the distinct-frame order derives the
    * successor; a self equi-join on (seq, id, nextFrame) completes it —
    * no cross join, no window over the full table.
    */
  def consecutiveMatches(gt: DataFrame): DataFrame = {
    val frames = gt.select("seq", "frameIdx").distinct()
      .withColumn("nextFrameIdx",
        lead("frameIdx", 1).over(Window.partitionBy("seq").orderBy("frameIdx")))
    val cur = gt.join(frames, Seq("seq", "frameIdx"))
      .filter(col("nextFrameIdx").isNotNull)
    val nxt = gt.select(
      col("seq"), col("frameIdx").as("nextFrameIdx"), col("id"),
      col("x").as("next_x"), col("y").as("next_y"),
      col("w").as("next_w"), col("h").as("next_h"))
    cur.join(nxt, Seq("seq", "nextFrameIdx", "id"))
  }

  /** J8 — negative-pair sampling: for each consecutive match, up to `n`
    * OTHER ids from the next frame (reference src/embedding.py:917-931),
    * deterministically pseudo-random via a seeded hash order instead of
    * Python's RNG (documented deviation; the reference's sampling is
    * irreproducible across runs anyway).
    */
  def negativePairs(matches: DataFrame, gt: DataFrame, n: Int, seed: Int = 42): DataFrame = {
    val nextIds = gt.select(col("seq"), col("frameIdx").as("nextFrameIdx"),
      col("id").as("neg_id"))
    val cands = matches.select("seq", "frameIdx", "nextFrameIdx", "id")
      .join(nextIds, Seq("seq", "nextFrameIdx"))
      .filter(col("neg_id") =!= col("id"))
    val w = Window.partitionBy("seq", "frameIdx", "id")
      .orderBy(md5(concat_ws("_", lit(seed), col("seq"), col("frameIdx"),
        col("id"), col("neg_id"))), col("neg_id"))
    cands.withColumn("rn", row_number().over(w)).filter(col("rn") <= n).drop("rn")
  }
}
