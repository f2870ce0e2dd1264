package graft.queries

import org.apache.spark.sql.functions._
import graft.Derived
import graft.operators.{DetBox, Nms, Tracker, TrackerConfig, TrackerIn}
import graft.sources.Multimodal
import graft.streaming.StreamingTracker

/** Sequential-kernel queries (SURVEY §7.1 layer 2): not SQL-expressible
  * — order-dependent greedy loops and keyed mutable state — so the
  * driver records rows-only checks. Semantics are covered by ScalaTest
  * goldens (see src/test/scala/graft) instead of the DuckDB oracle.
  */
object KernelQ {

  private def detBoxes(s: org.apache.spark.sql.SparkSession, d: String) = {
    import s.implicits._
    Derived.table(s, d, "dets")
      .select(col("seq"), col("frame").cast("string").as("frame"), col("id"),
        col("x1"), col("y1"), col("x2"), col("y2"), col("score"))
      .as[DetBox]
  }

  private def trackerInput(s: org.apache.spark.sql.SparkSession, d: String) = {
    import s.implicits._
    // gt boxes + per-(id,frame) embeddings as the tracker's detection
    // stream; frame zero-padded so lexicographic order == numeric order.
    Derived.table(s, d, "gt_emb")
      .select(col("seq"),
        format_string("%06d", col("frameIdx")).as("frame"),
        col("id"), col("x"), col("y"), col("w"), col("h"),
        lit(1.0).as("conf"), col("emb"))
      .as[TrackerIn]
  }

  val defs: Seq[Q] = Seq(

    // O5 — greedy NMS kernel per (seq, frame).
    Q("k01_nms",
      (s, d) => {
        Nms.nms(detBoxes(s, d), iouThreshold = 0.5).toDF()
          .groupBy("seq").agg(count(lit(1)).as("n_kept"),
            countDistinct("frame").as("n_frames"))
      }, None),

    // O6 — nested-detection removal kernel (containment + confidence
    // precedence matrix).
    Q("k02_nested_removal",
      (s, d) => {
        Nms.removeNested(detBoxes(s, d), nmsThreshold = 0.5).toDF()
          .groupBy("seq").agg(count(lit(1)).as("n_kept"))
      }, None),

    // T1–T6 — the full batch tracker: Kalman + spatial index +
    // bidirectional matching + lifecycle + min-length filter.
    Q("k03_track",
      (s, d) => {
        val out = Tracker.track(trackerInput(s, d), TrackerConfig())
        out.toDF().groupBy("seq").agg(
          count(lit(1)).as("n_rows"),
          countDistinct("trackId").as("n_tracks"),
          max("trackId").cast("long").as("max_track_id"))
      }, None),

    // J4 — same tracker under pure-greedy global matching.
    Q("k04_track_greedy",
      (s, d) => {
        val out = Tracker.track(trackerInput(s, d),
          TrackerConfig(bidirectional = false))
        out.toDF().groupBy("seq").agg(count(lit(1)).as("n_rows"),
          countDistinct("trackId").as("n_tracks"))
      }, None),

    // M7 — streaming host (flatMapGroupsWithState) run over the batch
    // source: must emit rows (batch/streaming parity is asserted in
    // ScalaTest).
    Q("k05_track_streaming",
      (s, d) => {
        val out = StreamingTracker.track(trackerInput(s, d), TrackerConfig())
        out.toDF().groupBy("seq").agg(count(lit(1)).as("n_rows"))
      }, None),

    // BASELINE.md domain anchor: CLEAR/Identity metrics over the
    // reference's "typical dataset" shape — 1000 frames × ~50 objects
    // (≈50k gt rows). The reference docstring estimates 10–15 s
    // (src/utils/eval.py:685-689); bench records ours. Rows-only (the
    // metric semantics are oracle-checked at m02 on the smaller shape).
    Q("m11_eval_anchor",
      (s, d) => {
        graft.Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
        def derive(jitter: Boolean) = s.sql(
          s"""SELECT seq, frameIdx, id,
             |  x${if (jitter) " + CAST(l_orderkey % 7 AS DOUBLE) - 3.0" else ""} AS x,
             |  y${if (jitter) " + CAST(l_suppkey % 7 AS DOUBLE) - 3.0" else ""} AS y, w, h
             |FROM (
             |  SELECT *, row_number() OVER (PARTITION BY frameIdx, id ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey) AS rn
             |  FROM (
             |    SELECT 'anchor' AS seq,
             |      CAST(l_orderkey % 1000 AS INT) AS frameIdx,
             |      CAST(l_partkey % 50 AS INT) AS id,
             |      CAST((l_partkey * 37) % 1600 AS DOUBLE) AS x,
             |      CAST((l_suppkey * 53) % 1600 AS DOUBLE) AS y,
             |      CAST(20 + (l_partkey % 40) AS DOUBLE) AS w,
             |      CAST(20 + (l_suppkey % 40) AS DOUBLE) AS h,
             |      l_orderkey, l_linenumber, l_partkey, l_suppkey
             |    FROM lineitem) raw) t
             |WHERE rn = 1${if (jitter) " AND (l_orderkey + l_suppkey) % 9 <> 0" else ""}""".stripMargin)
        // Cache both derived relations: metrics fans them into several
        // aggregation branches, and each branch would otherwise repeat
        // the 600k-row lineitem scan + dedup window.
        graft.operators.MotEval.metrics(derive(false).cache(), derive(true).cache(), 0.3)
      }, None),

    // M8 — multimodal featurize: binary payloads (document text bytes as
    // stand-in media) through the batched stub decoder.
    Q("k06_multimodal",
      (s, d) => {
        val media = graft.Tables.documents(s, d).select(
          concat(lit("doc://"), col("doc_id")).as("path"),
          lit("image").as("modality"),
          col("text").cast("binary").as("content"))
        Multimodal.featurize(media, dim = 16, batchSize = 32).toDF()
          .select(col("path"), col("modality"),
            element_at(col("feature"), 1).as("f0"),
            size(col("feature")).cast("long").as("dim"))
      }, None)
  )
}
