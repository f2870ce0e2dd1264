package graft.queries

import org.apache.spark.sql.functions._
import graft.Derived
import graft.operators.{DetBox, Nms, Tracker, TrackerConfig, TrackerIn}
import graft.sources.Multimodal
import graft.streaming.StreamingTracker

/** Sequential-kernel queries (SURVEY §7.1 layer 2). The greedy
  * suppression kernels (k01/k02) ARE oracle-checked despite being
  * order-dependent: the DuckDB oracle replays the exact greedy scan as
  * a recursive CTE — pairwise suppress/block/evict relations are
  * precomputed vectorized, then the recursion carries the kept-list
  * through the scan order (see the SQL below; validated row-identical
  * against both the Scala kernels and the independent python port in
  * tools/nms_oracle.py). The tracker kernels (Kalman state) stay
  * rows-only — covered by ScalaTest goldens + tools/tracker_oracle.py.
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

  /** Per-frame greedy-NMS oracle: boxes ordered (score desc, id asc)
    * per (seq, frame); `sup_pairs` holds every ordered pair whose IoU
    * ≥ τ (vectorized); the recursion walks the order once, keeping box
    * i iff no already-KEPT box suppresses it (`list_intersect` of the
    * kept list with box i's precomputed suppressor list). MATERIALIZED
    * stops DuckDB re-inlining the group table into every iteration.
    */
  private val nmsOracle: String = s"""WITH RECURSIVE ${Derived.detCte},
    |ordd AS (
    |  SELECT seq, frame, id, x1, y1, x2, y2, score,
    |    CAST(row_number() OVER (PARTITION BY seq, frame ORDER BY score DESC, id) AS INT) AS ord
    |  FROM dets
    |),
    |sup_pairs AS (
    |  SELECT a.seq, a.frame, b.ord AS i, a.ord AS j
    |  FROM ordd a JOIN ordd b ON a.seq = b.seq AND a.frame = b.frame AND a.ord < b.ord
    |  WHERE CASE WHEN (a.x2 - a.x1) * (a.y2 - a.y1) + (b.x2 - b.x1) * (b.y2 - b.y1)
    |             - greatest(least(a.x2, b.x2) - greatest(a.x1, b.x1), 0)
    |               * greatest(least(a.y2, b.y2) - greatest(a.y1, b.y1), 0) <= 0 THEN 0.0
    |        ELSE (greatest(least(a.x2, b.x2) - greatest(a.x1, b.x1), 0)
    |               * greatest(least(a.y2, b.y2) - greatest(a.y1, b.y1), 0))
    |           / ((a.x2 - a.x1) * (a.y2 - a.y1) + (b.x2 - b.x1) * (b.y2 - b.y1)
    |             - greatest(least(a.x2, b.x2) - greatest(a.x1, b.x1), 0)
    |               * greatest(least(a.y2, b.y2) - greatest(a.y1, b.y1), 0)) END >= 0.5
    |),
    |g AS MATERIALIZED (
    |  SELECT o.seq, o.frame, count(*) AS n,
    |    list(o.id ORDER BY o.ord) AS ids,
    |    list(o.score ORDER BY o.ord) AS ss,
    |    list(coalesce(p.js, []) ORDER BY o.ord) AS sups
    |  FROM ordd o LEFT JOIN (
    |    SELECT seq, frame, i, list(j) AS js FROM sup_pairs GROUP BY seq, frame, i
    |  ) p ON p.seq = o.seq AND p.frame = o.frame AND p.i = o.ord
    |  GROUP BY o.seq, o.frame
    |),
    |step(seq, frame, i, kept) AS (
    |  SELECT seq, frame, 1, [CAST(1 AS INT)] FROM g
    |  UNION ALL
    |  SELECT s.seq, s.frame, s.i + 1,
    |    CASE WHEN len(list_intersect(s.kept, g.sups[s.i + 1])) = 0
    |      THEN list_append(s.kept, CAST(s.i + 1 AS INT)) ELSE s.kept END
    |  FROM step s JOIN g ON g.seq = s.seq AND g.frame = s.frame
    |  WHERE s.i < g.n
    |),
    |final AS (
    |  SELECT s.seq AS fseq, s.frame AS fframe, unnest(s.kept) AS k
    |  FROM step s JOIN g ON g.seq = s.seq AND g.frame = s.frame
    |  WHERE s.i = g.n
    |)
    |SELECT f.fseq AS seq, f.fframe AS frame, g.ids[f.k] AS id, g.ss[f.k] AS score
    |FROM final f JOIN g ON g.seq = f.fseq AND g.frame = f.fframe""".stripMargin

  /** Nested-removal oracle: same recursive-scan machinery with the
    * high/low-confidence precedence matrix. Per ordered pair (kept j,
    * current i): `blk` = j stops the scan and rejects i; `rmv` = a
    * high-confidence i evicts j. The reference scan applies evictions
    * found BEFORE the first blocker, so the recursion removes
    * `rmv`-flagged kept entries with ordinal < first blocking kept
    * ordinal, and appends i only when no blocker was hit
    * (reference src/detection.py:1120-1198 exactly).
    */
  private val nestedOracle: String = s"""WITH RECURSIVE ${Derived.detCte},
    |ordd AS (
    |  SELECT seq, frame, id, x1, y1, x2, y2, score,
    |    CAST(row_number() OVER (PARTITION BY seq, frame ORDER BY score DESC, id) AS INT) AS ord
    |  FROM dets
    |),
    |pairc AS (
    |  SELECT a.seq, a.frame, b.ord AS i, a.ord AS j,
    |    a.score > 0.5 AS kept_high, b.score > 0.5 AS cur_high,
    |    CASE WHEN (b.x2 - b.x1) * (b.y2 - b.y1) <= 0 THEN 0.0
    |      ELSE greatest(least(a.x2, b.x2) - greatest(a.x1, b.x1), 0)
    |         * greatest(least(a.y2, b.y2) - greatest(a.y1, b.y1), 0)
    |         / ((b.x2 - b.x1) * (b.y2 - b.y1)) END AS cink,
    |    CASE WHEN (a.x2 - a.x1) * (a.y2 - a.y1) <= 0 THEN 0.0
    |      ELSE greatest(least(a.x2, b.x2) - greatest(a.x1, b.x1), 0)
    |         * greatest(least(a.y2, b.y2) - greatest(a.y1, b.y1), 0)
    |         / ((a.x2 - a.x1) * (a.y2 - a.y1)) END AS kinc
    |  FROM ordd a JOIN ordd b ON a.seq = b.seq AND a.frame = b.frame AND a.ord < b.ord
    |),
    |flags AS (
    |  SELECT seq, frame, i, j,
    |    ((cink >= 0.5 AND (kept_high OR NOT cur_high))
    |      OR (cink < 0.5 AND kinc >= 0.5 AND NOT cur_high)) AS blk,
    |    ((cink >= 0.5 AND cur_high AND NOT kept_high)
    |      OR (cink < 0.5 AND kinc >= 0.5 AND cur_high)) AS rmv
    |  FROM pairc WHERE cink >= 0.5 OR kinc >= 0.5
    |),
    |g AS MATERIALIZED (
    |  SELECT o.seq, o.frame, count(*) AS n,
    |    list(o.id ORDER BY o.ord) AS ids,
    |    list(o.score ORDER BY o.ord) AS ss,
    |    list(coalesce(f.bs, []) ORDER BY o.ord) AS bss,
    |    list(coalesce(f.rs, []) ORDER BY o.ord) AS rss
    |  FROM ordd o LEFT JOIN (
    |    SELECT seq, frame, i,
    |      list(j) FILTER (blk) AS bs,
    |      list(j) FILTER (rmv) AS rs
    |    FROM flags GROUP BY seq, frame, i
    |  ) f ON f.seq = o.seq AND f.frame = o.frame AND f.i = o.ord
    |  GROUP BY o.seq, o.frame
    |),
    |step(seq, frame, i, kept) AS (
    |  SELECT seq, frame, 1, [CAST(1 AS INT)] FROM g
    |  UNION ALL
    |  SELECT t.seq, t.frame, t.i + 1,
    |    CASE WHEN len(t.bi) = 0
    |      THEN list_append(list_filter(t.kept, k -> NOT (list_contains(t.ri, k))), CAST(t.i + 1 AS INT))
    |      ELSE list_filter(t.kept, k -> NOT (list_contains(t.ri, k) AND k < t.p)) END
    |  FROM (
    |    SELECT s.seq, s.frame, s.i, s.kept, g.n,
    |      list_intersect(s.kept, g.bss[s.i + 1]) AS bi,
    |      list_intersect(s.kept, g.rss[s.i + 1]) AS ri,
    |      coalesce(list_min(list_intersect(s.kept, g.bss[s.i + 1])), 2147483647) AS p
    |    FROM step s JOIN g ON g.seq = s.seq AND g.frame = s.frame
    |    WHERE s.i < g.n
    |  ) t
    |),
    |final AS (
    |  SELECT s.seq AS fseq, s.frame AS fframe, unnest(s.kept) AS k
    |  FROM step s JOIN g ON g.seq = s.seq AND g.frame = s.frame
    |  WHERE s.i = g.n
    |)
    |SELECT f.fseq AS seq, f.fframe AS frame, g.ids[f.k] AS id, g.ss[f.k] AS score
    |FROM final f JOIN g ON g.seq = f.fseq AND g.frame = f.fframe""".stripMargin

  /** BASELINE.md anchor derivation ("1000 frames × 50 objects" ≈ 50k gt
    * rows from lineitem). SHARED TEXT: Spark runs it via spark.sql
    * (nested subqueries — see Derived for why not WITH) and the oracle
    * embeds the same text as gt/tracks CTEs.
    */
  def anchorSql(jitter: Boolean): String =
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
       |WHERE rn = 1${if (jitter) " AND (l_orderkey + l_suppkey) % 9 <> 0" else ""}""".stripMargin

  val defs: Seq[Q] = Seq(

    // O5 — greedy NMS kernel per (seq, frame), kept rows oracle-checked
    // against the recursive-CTE replay of the same greedy scan.
    Q("k01_nms",
      (s, d) => {
        Nms.nms(detBoxes(s, d), iouThreshold = 0.5).toDF()
          .select(col("seq"), col("frame").cast("int").as("frame"),
            col("id"), col("score"))
      }, Some(nmsOracle)),

    // O6 — nested-detection removal kernel (containment + confidence
    // precedence matrix + eviction), kept rows oracle-checked.
    Q("k02_nested_removal",
      (s, d) => {
        Nms.removeNested(detBoxes(s, d), nmsThreshold = 0.5).toDF()
          .select(col("seq"), col("frame").cast("int").as("frame"),
            col("id"), col("score"))
      }, Some(nestedOracle)),

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
    // (src/utils/eval.py:685-689); bench records ours. Oracle = the full
    // m02 metric CTE chain over the SAME anchor derivation text.
    Q("m11_eval_anchor",
      (s, d) => {
        graft.Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
        // Cache both derived relations: metrics fans them into several
        // aggregation branches, and each branch would otherwise repeat
        // the 600k-row lineitem scan + dedup window. CacheManager
        // dedupes by canonicalized plan, so repeat calls reuse the
        // same two entries (no per-call growth).
        val m = graft.operators.MotEval.metrics(
          s.sql(anchorSql(jitter = false)).cache(),
          s.sql(anchorSql(jitter = true)).cache(), 0.3)
        m.select(col("seq"),
          col("Dets").cast("long").as("Dets"),
          col("GT_Dets").cast("long").as("GT_Dets"),
          col("IDs").cast("long").as("IDs"),
          col("GT_IDs").cast("long").as("GT_IDs"),
          col("CLR_TP").cast("long").as("CLR_TP"),
          col("CLR_FN").cast("long").as("CLR_FN"),
          round(col("CLR_Re"), 9).as("CLR_Re"),
          round(col("LocA"), 9).as("LocA"),
          col("IDSW").cast("long").as("IDSW"),
          col("Frag").cast("long").as("Frag"),
          col("MT").cast("long").as("MT"),
          col("PT").cast("long").as("PT"),
          col("ML").cast("long").as("ML"),
          col("IDTP").cast("long").as("IDTP"),
          col("IDFN").cast("long").as("IDFN"),
          col("IDFP").cast("long").as("IDFP"),
          round(col("IDF1"), 9).as("IDF1"))
      },
      Some(s"""WITH gt AS (
        |${anchorSql(jitter = false)}
        |),
        |tracks AS (
        |${anchorSql(jitter = true)}
        |),
        |${MotQ.metricsBody}
        |${MotQ.metricsSelect(rounded = true)}""".stripMargin)),

    // M8 — multimodal featurize: binary payloads (document text bytes as
    // stand-in media) through the batched stub decoder. The stub's
    // byte-fold is deterministic, so the first feature component is
    // oracle-checked end-to-end: b0 = (first_byte * 31) % 256 (all docs
    // start with an ASCII byte, so DuckDB's ascii() sees the same value).
    Q("k06_multimodal",
      (s, d) => {
        val media = graft.Tables.documents(s, d).select(
          concat(lit("doc://"), col("doc_id")).as("path"),
          lit("image").as("modality"),
          col("text").cast("binary").as("content"))
        Multimodal.featurize(media, dim = 16, batchSize = 32).toDF()
          .select(col("path"), col("modality"),
            round(element_at(col("feature"), 1) * 255).cast("long").as("b0"),
            size(col("feature")).cast("long").as("dim"))
      },
      Some("""SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS path,
        |  'image' AS modality,
        |  CAST((ascii(text) * 31) % 256 AS BIGINT) AS b0,
        |  CAST(16 AS BIGINT) AS dim
        |FROM documents""".stripMargin)),

    // M8 — video frame sampling: every stride-th byte offset stands in
    // for a decoded frame (deterministic stub, Multimodal.sampleFrames).
    // The per-frame byte offset f·max(1, len/nFrames) is replayed in
    // SQL (documents are pure ASCII, so byte offset == char offset);
    // out-of-range offsets produce the stub's all-zero feature.
    Q("k07_frame_sample",
      (s, d) => {
        val media = graft.Tables.documents(s, d).select(
          concat(lit("doc://"), col("doc_id")).as("path"),
          col("text").cast("binary").as("content"))
        Multimodal.sampleFrames(media, nFrames = 4, dim = 8).toDF()
          .select(col("path"), col("frameIdx").cast("long").as("frameIdx"),
            round(element_at(col("feature"), 1) * 255).cast("long").as("b0"),
            size(col("feature")).cast("long").as("dim"))
      },
      Some("""SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS path,
        |  f.f AS frameIdx,
        |  CASE WHEN f.f * greatest(1, length(text) // 4) + 1 > length(text) THEN 0
        |    ELSE CAST((ascii(substr(text, CAST(f.f * greatest(1, length(text) // 4) + 1 AS INT), 1)) * 31) % 256 AS BIGINT) END AS b0,
        |  CAST(8 AS BIGINT) AS dim
        |FROM documents, range(4) f(f)""".stripMargin))
  )
}
