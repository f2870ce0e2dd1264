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

  /** The similarity cascade of `Tracker.similarity` under
    * `useKalman=false` (predicted == lastBbox, so the Kalman and
    * Euclidean distance terms coincide), as SQL text over two struct
    * refs carrying (x, y, w, h, e1, e2). Gates return NULL (the
    * kernel's NaN); every arithmetic step mirrors the Scala
    * double-precision order of operations exactly, so threshold
    * comparisons and argmax decisions are bit-identical.
    */
  private def k08Sim(t: String, d: String): String = {
    val sizeS = s"(CASE WHEN $t.w * $t.h = 0.0 OR $d.w * $d.h = 0.0 THEN 0.0 " +
      s"ELSE least($t.w * $t.h, $d.w * $d.h) / greatest($t.w * $t.h, $d.w * $d.h) END)"
    val appS = s"(CASE WHEN $t.e1 * $t.e1 + $t.e2 * $t.e2 = 0.0 " +
      s"OR $d.e1 * $d.e1 + $d.e2 * $d.e2 = 0.0 THEN 0.5 " +
      s"ELSE (($t.e1 * $d.e1 + $t.e2 * $d.e2) / " +
      s"(sqrt($t.e1 * $t.e1 + $t.e2 * $t.e2) * sqrt($d.e1 * $d.e1 + $d.e2 * $d.e2)) + 1.0) / 2.0 END)"
    val dist = s"sqrt((($t.x + $t.w / 2) - ($d.x + $d.w / 2)) * (($t.x + $t.w / 2) - ($d.x + $d.w / 2)) " +
      s"+ (($t.y + $t.h / 2) - ($d.y + $d.h / 2)) * (($t.y + $t.h / 2) - ($d.y + $d.h / 2)))"
    s"(CASE WHEN $sizeS < 0.3143 * (1 - 0.3) THEN NULL " +
      s"WHEN $appS < 0.4764 * (1 - 0.3) THEN NULL " +
      s"ELSE (($appS - 0.4764) / (1.0 - 0.4764) * 0.2 " +
      s"+ (1 - $dist / 99.18) * 0.2 + (1 - $dist / 99.18) * 0.5 " +
      s"+ ($sizeS - 0.3143) / (1.0 - 0.3143) * 0.1) / (0.2 + 0.2 + 0.5 + 0.1) END)"
  }

  /** T1/T4/T5/J3/F7/F8 oracle — a full recursive-CTE replay of the
    * no-Kalman tracker (`useKalman=false, useSpatialIndex=false,
    * minTrackLength=2`), parameterized over the per-frame MATCHER so
    * both matching policies are covered:
    *
    *  - MUTUAL-BEST (k08, `bidirectional=true`): declarative per frame —
    *    track-best = first det index attaining the max gated similarity
    *    (strict `>` from 0.0 ⇒ max, first-wins), det-best among
    *    track-best pairs = first track index (buffer order = ascending
    *    creation order) attaining the max.
    *  - GLOBAL GREEDY (k09, `bidirectional=false`, reference
    *    src/tracking.py:1037-1133): ALL non-gated pairs — including
    *    non-positive similarities, the kernel's matchGreedy has no
    *    `> 0` floor — sorted (sim desc, track idx, det idx) exactly as
    *    the kernel's stable sort over (track, det) build order, then
    *    folded one-to-one with `list_reduce` (each element arrives
    *    pre-assigned as {mt:[ti], md:[dj], out:[pair]}; the fold keeps
    *    an element only when neither side is taken — the greedy scan).
    *
    * The recursion only carries the evolving track list — struct arrays
    * updated with indexed list lambdas — plus the next-track-id counter,
    * and emits each frame's matched/created rows at its own iteration.
    * Validated row-identical against an independent python port at
    * sf0.001 and sf0.01. Reference semantics: src/tracking.py:764-854
    * (step), 983-1011 (mutual best), 1037-1133 (greedy).
    */
  private def trackOracle(greedy: Boolean): String = {
    val simTD = k08Sim("t", "d")
    // the aged-tracks source both matchers read (already stripped of
    // margins — embedded verbatim inside the template below)
    val agedSrc =
      """(
        |          SELECT s.seq, f.fidx, f.frameIdx, s.nid, f.ds,
        |            list_transform(s.tks, t ->
        |              {'tid': t.tid, 'x': t.x, 'y': t.y, 'w': t.w, 'h': t.h,
        |               'e1': t.e1, 'e2': t.e2, 'did': t.did, 'tsu': t.tsu + 1}) AS aged
        |          FROM step s JOIN fr2 f ON f.seq = s.seq AND f.fidx = s.fidx + 1
        |        )""".stripMargin
    // layers between `aged` and the frame update: produce `mt`, a list
    // of {ti, dj} matched index pairs (1-based track/det positions)
    val matchLayers =
      if (!greedy)
        s"""      SELECT seq, fidx, frameIdx, nid, ds, aged,
      |        list_filter(tb, q ->
      |          q.ti = list_min(list_transform(
      |            list_filter(tb, r -> r.dj = q.dj AND r.s =
      |              list_max(list_transform(list_filter(tb, u -> u.dj = q.dj), u -> u.s))),
      |            r -> r.ti))) AS mt
      |      FROM (
      |        SELECT seq, fidx, frameIdx, nid, ds, aged,
      |          list_filter(
      |            list_transform(aged, (t, ti) ->
      |              {'ti': ti,
      |               'dj': list_position(
      |                 list_transform(ds, d -> $simTD),
      |                 list_max(list_filter(list_transform(ds, d -> $simTD),
      |                                      v -> v IS NOT NULL AND v > 0.0))),
      |               's': list_max(list_filter(list_transform(ds, d -> $simTD),
      |                                         v -> v IS NOT NULL AND v > 0.0))}),
      |            q -> q.dj IS NOT NULL) AS tb
      |        FROM AGED_SRC
      |      )""".stripMargin
      else
        // the greedy fold accumulates STRINGS, not lists: DuckDB 1.0's
        // list_reduce silently drops list-valued accumulator state
        // after two iterations (verified minimal repro), so taken
        // track/det sets ride as '|id|' tokens and matches as a
        // 'ti:dj;' run, parsed back to index structs after the fold
        s"""      SELECT seq, fidx, frameIdx, nid, ds, aged,
      |        CASE WHEN len(allp) = 0 THEN CAST([] AS STRUCT(ti INT, dj INT)[])
      |          ELSE list_transform(
      |            list_filter(string_split(list_reduce(
      |              list_transform(list_sort(allp), p ->
      |                {'mt': '|' || CAST(p.ti AS VARCHAR) || '|',
      |                 'md': '|' || CAST(p.dj AS VARCHAR) || '|',
      |                 'out': CAST(p.ti AS VARCHAR) || ':' || CAST(p.dj AS VARCHAR) || ';'}),
      |              (a, e) -> CASE WHEN contains(a.mt, e.mt) OR contains(a.md, e.md) THEN a
      |                ELSE {'mt': a.mt || e.mt, 'md': a.md || e.md,
      |                      'out': a.out || e.out} END).out, ';'), x -> len(x) > 0),
      |            x -> {'ti': CAST(string_split(x, ':')[1] AS INT),
      |                  'dj': CAST(string_split(x, ':')[2] AS INT)}) END AS mt
      |      FROM (
      |        SELECT seq, fidx, frameIdx, nid, ds, aged,
      |          list_filter(
      |            flatten(list_transform(aged, (t, ti) ->
      |              list_transform(ds, (d, dj) ->
      |                {'k': -($simTD), 'ti': CAST(ti AS INT), 'dj': CAST(dj AS INT)}))),
      |            p -> p.k IS NOT NULL) AS allp
      |        FROM AGED_SRC
      |      )""".stripMargin
    s"""WITH RECURSIVE ${Derived.gtCtes},
      |din AS (
      |  SELECT g.seq, g.frameIdx, g.id, g.x, g.y, g.w, g.h,
      |         CAST(e.embedding[1] AS DOUBLE) AS e1,
      |         CAST(e.embedding[2] AS DOUBLE) AS e2
      |  FROM gt g JOIN embeddings e ON e.vec_id = (g.id * 7 + g.frameIdx) % 500
      |),
      |fr2 AS MATERIALIZED (
      |  SELECT seq, frameIdx, ds,
      |    CAST(row_number() OVER (PARTITION BY seq ORDER BY frameIdx) AS INT) AS fidx
      |  FROM (
      |    SELECT seq, frameIdx,
      |      list({'id': id, 'x': x, 'y': y, 'w': w, 'h': h, 'e1': e1, 'e2': e2} ORDER BY id) AS ds
      |    FROM din GROUP BY seq, frameIdx)
      |),
      |step(seq, fidx, frameIdx, tks, nid, emit) AS (
      |  SELECT seq, 0, -1,
      |    CAST([] AS STRUCT(tid INT, x DOUBLE, y DOUBLE, w DOUBLE, h DOUBLE,
      |                      e1 DOUBLE, e2 DOUBLE, did INT, tsu INT)[]),
      |    1,
      |    CAST([] AS STRUCT(tid INT, did INT, x DOUBLE, y DOUBLE, w DOUBLE, h DOUBLE)[])
      |  FROM (SELECT DISTINCT seq FROM din)
      |  UNION ALL
      |  SELECT seq, fidx, frameIdx,
      |    list_concat(kept, created) AS tks,
      |    nid + len(created) AS nid,
      |    list_transform(
      |      list_filter(list_concat(kept, created), t -> t.tsu = 0),
      |      t -> {'tid': t.tid, 'did': t.did, 'x': t.x, 'y': t.y, 'w': t.w, 'h': t.h}) AS emit
      |  FROM (
      |    SELECT seq, fidx, frameIdx, nid, ds, mt,
      |      list_transform(
      |        list_filter(
      |          list_transform(aged, (t, i) -> {'t': t,
      |            'mdj': list_min(list_transform(list_filter(mt, m -> m.ti = i), m -> m.dj))}),
      |          p -> p.mdj IS NOT NULL OR p.t.tsu <= 3),
      |        p -> CASE WHEN p.mdj IS NOT NULL
      |          THEN {'tid': p.t.tid, 'x': ds[p.mdj].x, 'y': ds[p.mdj].y,
      |                'w': ds[p.mdj].w, 'h': ds[p.mdj].h,
      |                'e1': ds[p.mdj].e1, 'e2': ds[p.mdj].e2,
      |                'did': ds[p.mdj].id, 'tsu': 0}
      |          ELSE p.t END) AS kept,
      |      list_transform(
      |        list_filter(
      |          list_transform(ds, (d, i) -> {'d': d, 'i': i}),
      |          p -> len(list_filter(mt, m -> m.dj = p.i)) = 0),
      |        (p, j) -> {'tid': nid + j - 1, 'x': p.d.x, 'y': p.d.y,
      |              'w': p.d.w, 'h': p.d.h, 'e1': p.d.e1,
      |              'e2': p.d.e2, 'did': p.d.id, 'tsu': 0}) AS created
      |    FROM (
${matchLayers.replace("AGED_SRC", agedSrc)}
      |    )
      |  )
      |)
      |SELECT seq, frameIdx AS frame, u.tid AS trackId, u.did AS detId,
      |       u.x AS x, u.y AS y, u.w AS w, u.h AS h
      |FROM (SELECT seq, frameIdx, unnest(emit) AS u FROM step WHERE fidx > 0)
      |QUALIFY count(*) OVER (PARTITION BY seq, trackId) >= 2""".stripMargin
  }

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

    // T1/T4/T5/J3/F7/F8 — no-Kalman tracker, FULLY oracle-checked: the
    // recursive-CTE replay above reproduces every emitted row (frame
    // step, mutual-best matching, lifecycle, matched-only emission,
    // min-length filter). The embedding is sliced to 2 dims so the
    // appearance cosine is exact shared-text arithmetic on both sides.
    Q("k08_track_nokalman",
      (s, d) => {
        import s.implicits._
        val in = Derived.table(s, d, "gt_emb")
          .select(col("seq"),
            format_string("%06d", col("frameIdx")).as("frame"),
            col("id"), col("x"), col("y"), col("w"), col("h"),
            lit(1.0).as("conf"),
            slice(col("emb"), 1, 2).as("emb"))
          .as[TrackerIn]
        Tracker.track(in, TrackerConfig(useKalman = false,
            useSpatialIndex = false, minTrackLength = 2))
          .toDF()
          .select(col("seq"), col("frame").cast("int").as("frame"),
            col("trackId"), col("detId"),
            col("x"), col("y"), col("w"), col("h"))
      }, Some(trackOracle(greedy = false))),

    // J4/T1/T4/T5/F7/F8 — the GLOBAL-GREEDY matcher (bidirectional=
    // false), fully oracle-checked like k08: same recursive replay,
    // with the per-frame matcher swapped for the sorted-pair greedy
    // fold. Together k08+k09 oracle both matching policies; only the
    // Kalman-state variants (k03/k04/k05) remain rows-only (covered by
    // ScalaTest goldens + tools/tracker_oracle.py instead).
    Q("k09_track_greedy_nokalman",
      (s, d) => {
        import s.implicits._
        val in = Derived.table(s, d, "gt_emb")
          .select(col("seq"),
            format_string("%06d", col("frameIdx")).as("frame"),
            col("id"), col("x"), col("y"), col("w"), col("h"),
            lit(1.0).as("conf"),
            slice(col("emb"), 1, 2).as("emb"))
          .as[TrackerIn]
        Tracker.track(in, TrackerConfig(useKalman = false,
            useSpatialIndex = false, bidirectional = false, minTrackLength = 2))
          .toDF()
          .select(col("seq"), col("frame").cast("int").as("frame"),
            col("trackId"), col("detId"),
            col("x"), col("y"), col("w"), col("h"))
      }, Some(trackOracle(greedy = true))),

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
