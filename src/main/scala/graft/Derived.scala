package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic MOT-shaped tables derived from the driver's synthetic
  * TPC-H tables (TESTDATA.md), used as inputs for the MOT-domain
  * operator queries so they can be DuckDB-oracle-checked.
  *
  * THE DERIVATION IS SHARED SQL TEXT: the same CTE body runs on Spark
  * (via `spark.sql` over temp views) and inside the oracle SQL strings —
  * so the inputs are bit-identical by construction and the comparison
  * exercises ONLY the operator under test (the Scala library vs the
  * hand-written DuckDB equivalent).
  *
  * Shape: 2 sequences × 120 frames, ~30 stable object identities per
  * sequence; tracks are ground truth with deterministic jitter, ~1/9 of
  * rows dropped (misses) and ~1/13 identity-switched — so every CLEAR /
  * Identity metric is exercised with non-trivial values.
  */
object Derived {

  /** CTE text defining gt + tracks from `lineitem`. Valid in both Spark
    * SQL and DuckDB (ANSI subset: %, ||, CASE, CAST, row_number).
    */
  /** gt-only prefix (used Spark-side to materialize gt once; tracks and
    * gt_emb then derive from the CACHED gt instead of re-scanning
    * lineitem — semantics unchanged, the CTE text is identical).
    */
  val gtCtes: String =
    """gt_raw AS (
      |  SELECT 's' || CAST(l_orderkey % 2 AS STRING) AS seq,
      |         CAST(l_orderkey % 120 AS INT) AS frameIdx,
      |         CAST(l_partkey % 30 AS INT) AS id,
      |         CAST((l_partkey * 37) % 800 AS DOUBLE) AS x,
      |         CAST((l_suppkey * 53) % 800 AS DOUBLE) AS y,
      |         CAST(20 + (l_partkey % 40) AS DOUBLE) AS w,
      |         CAST(20 + (l_suppkey % 40) AS DOUBLE) AS h,
      |         l_orderkey, l_linenumber, l_suppkey, l_partkey
      |  FROM lineitem
      |),
      |gt AS (
      |  SELECT seq, frameIdx, id, x, y, w, h, l_orderkey, l_linenumber, l_suppkey, l_partkey FROM (
      |    SELECT *, row_number() OVER (PARTITION BY seq, frameIdx, id ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey) AS rn
      |    FROM gt_raw) t WHERE rn = 1
      |)""".stripMargin

  /** tracks, derived from gt (jitter + drops + id switches + dedup). */
  val trackCtes: String =
    """tr_raw AS (
      |  SELECT seq, frameIdx,
      |         CAST(CASE WHEN (l_orderkey + l_partkey) % 13 = 0 THEN (l_partkey % 30) + 100 ELSE l_partkey % 30 END AS INT) AS id,
      |         x + CAST(l_orderkey % 7 AS DOUBLE) - 3.0 AS x,
      |         y + CAST(l_suppkey % 7 AS DOUBLE) - 3.0 AS y,
      |         w, h,
      |         CAST(50 + l_orderkey % 50 AS DOUBLE) / 100.0 AS conf,
      |         l_orderkey, l_linenumber, l_partkey, l_suppkey
      |  FROM gt
      |  WHERE (l_orderkey + l_suppkey) % 9 <> 0
      |),
      |tracks AS (
      |  SELECT seq, frameIdx, id, x, y, w, h, conf FROM (
      |    SELECT *, row_number() OVER (PARTITION BY seq, frameIdx, id ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey) AS rn2
      |    FROM tr_raw) t WHERE rn2 = 1
      |)""".stripMargin

  /** Full chain — the oracle-side text (DuckDB recomputes everything). */
  val motCtes: String = s"$gtCtes,\n$trackCtes"

  /** Embedding-carrying GT: joins a deterministic vec per object
    * identity (object k → embeddings.vec_id = k).
    */
  val motEmbCte: String =
    """gt_emb AS (
      |  SELECT g.*, e.embedding AS emb
      |  FROM gt g JOIN embeddings e ON e.vec_id = (g.id * 7 + g.frameIdx) % 500
      |)""".stripMargin

  /** Overlap-heavy detection boxes for the suppression kernels: several
    * detections per frame cluster around shared anchor points with
    * varied extents, so NMS/nested-removal decisions are non-trivial.
    */
  val detCte: String =
    """dets AS (
      |  SELECT 's' || CAST(l_orderkey % 2 AS STRING) AS seq,
      |         CAST(l_orderkey % 60 AS INT) AS frame,
      |         CAST(row_number() OVER (PARTITION BY l_orderkey % 2, l_orderkey % 60 ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey) AS INT) AS id,
      |         CAST((l_partkey % 12) * 60 + (l_suppkey % 9) AS DOUBLE) AS x1,
      |         CAST((l_suppkey % 12) * 60 + (l_partkey % 9) AS DOUBLE) AS y1,
      |         CAST((l_partkey % 12) * 60 + (l_suppkey % 9) + 30 + (l_linenumber * 9) AS DOUBLE) AS x2,
      |         CAST((l_suppkey % 12) * 60 + (l_partkey % 9) + 30 + ((l_partkey + l_linenumber) % 5) * 11 AS DOUBLE) AS y2,
      |         CAST(5 + l_orderkey % 97 AS DOUBLE) / 100.0 AS score
      |  FROM lineitem WHERE l_orderkey % 5 = 0
      |)""".stripMargin

  private def registerBase(spark: SparkSession, dir: String): Unit =
    Tables.names.foreach { n =>
      Tables.load(spark, dir, n).createOrReplaceTempView(n)
    }

  // The derived tables saturate at ~3.6k rows regardless of scale factor
  // (the dedup keeps one row per (seq, frame, id)), but deriving them
  // scans + windows the full lineitem each time. Materialize once per
  // (session, dir) — SURVEY §4 P6 (materialized intermediate): every
  // MOT-operator query then starts from a tiny in-memory relation.
  private val cache = scala.collection.concurrent.TrieMap.empty[(org.apache.spark.SparkContext, String, String), DataFrame]

  /** On-disk artifact directory for a derived table — the same
    * cross-session posture as TextQ.bandArtifact: gt/tracks/gt_emb/dets
    * are DETERMINISTIC functions of the source data, and in production
    * they are the engine's INPUT tables, materialized once and read
    * from storage by every job (the reference reads its MOT gt/track
    * CSVs from disk — reference src/utils/io, SURVEY §2.1 S1) — not
    * re-derived by each query from a 600k-row fact scan. Keyed by the
    * source files' (length, mtime) so a regenerated testdata dir
    * invalidates the artifact instead of serving stale rows; `_SUCCESS`
    * gates readiness (a torn write is rewritten, never read).
    */
  /** Builds (once per source-data generation) and returns the artifact
    * path for a derived table. Exposed so Bench can pre-touch the
    * once-per-generation build OUTSIDE the timed region — build cost
    * is data maintenance, not query cost.
    */
  def artifact(spark: SparkSession, dir: String, name: String): String =
    // One artifact KIND per table, NOT one kind with sub = name: `sub`
    // is ArtifactStore's params/layout tag, and its staleness GC
    // deletes sibling subs on every build (only one sub value may
    // exist per kind at a code version). The four derived tables are
    // COEXISTING datasets — under the sub layout, resolving any one of
    // them with a missing _SUCCESS deleted the other three, so every
    // bench query whose table had been GC'd re-derived a 600k-row
    // artifact inside its timed region (measured round 22: m06 cold
    // 7.3 s vs 0.7 s steady; f01 2.25 s vs 0.8 s — the r21 "first-touch
    // floor" was largely this churn, not JIT).
    sources.ArtifactStore.resolve(spark, s"graft_derived_$name",
      Seq("lineitem.parquet", "embeddings.parquet").map(new java.io.File(dir, _))) { adir =>
      derive(spark, dir, name).write.mode("overwrite").parquet(adir)
    }

  /** Session view of a derived table: a memoized cached FileScan of
    * [[artifact]] (building it first if this data generation was never
    * derived). Bench isolation drops the memo, so each timed query pays
    * the steady-state parquet probe — never the lineitem re-derivation.
    * Keyed by (session, dir, name): a DataFrame is bound to its context,
    * so a restarted session must not see a stopped session's entry.
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    // evict only entries whose owning context actually stopped, so the
    // map (and the stopped sessions' object graphs) can't grow across
    // restarts in one JVM — while two live sessions coexist untouched
    cache.keys.filter(_._1.isStopped).foreach(cache.remove)
    cache.getOrElseUpdate((spark.sparkContext, dir, name), {
      val df = spark.read.parquet(artifact(spark, dir, name))
      val cached = df.cache()
      cached.count() // force materialization so timings measure operators
      cached
    })
  }

  /** Raw recompute of a derived table via the shared CTE text — used
    * only to build the on-disk artifact. gt derives from lineitem;
    * tracks/gt_emb derive from the gt ARTIFACT read DIRECTLY from its
    * path (never via the session memo: a live session whose memo still
    * holds a previous generation's gt must not persist those stale
    * rows under the NEW generation's tag) — same text, and the
    * artifact is bit-identical to the derivation by construction.
    */
  private def derive(spark: SparkSession, dir: String, name: String): DataFrame = {
    registerBase(spark, dir)
    // Spark-side SQL uses NESTED SUBQUERIES, not WITH: Spark 4.1's
    // InlineCTE/DeduplicateRelations crashes (UnresolvedException /
    // NoSuchElementException) when a plan containing CTE nodes is
    // duplicated into a self-join — which every MOT operator query
    // does. The nested form lowers to the identical plan. The oracle
    // strings keep the CTE text (DuckDB is fine with it).
    name match {
        case "gt" => spark.sql(
          s"""SELECT seq, frameIdx, id, x, y, w, h, l_orderkey, l_linenumber, l_suppkey, l_partkey FROM (
             |  SELECT *, row_number() OVER (PARTITION BY seq, frameIdx, id ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey) AS rn
             |  FROM (
             |    SELECT 's' || CAST(l_orderkey % 2 AS STRING) AS seq,
             |           CAST(l_orderkey % 120 AS INT) AS frameIdx,
             |           CAST(l_partkey % 30 AS INT) AS id,
             |           CAST((l_partkey * 37) % 800 AS DOUBLE) AS x,
             |           CAST((l_suppkey * 53) % 800 AS DOUBLE) AS y,
             |           CAST(20 + (l_partkey % 40) AS DOUBLE) AS w,
             |           CAST(20 + (l_suppkey % 40) AS DOUBLE) AS h,
             |           l_orderkey, l_linenumber, l_suppkey, l_partkey
             |    FROM lineitem) gt_raw) t WHERE rn = 1""".stripMargin)
        case "tracks" =>
          spark.read.parquet(artifact(spark, dir, "gt")).createOrReplaceTempView("gt")
          spark.sql(
            s"""SELECT seq, frameIdx, id, x, y, w, h, conf FROM (
               |  SELECT *, row_number() OVER (PARTITION BY seq, frameIdx, id ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey) AS rn2
               |  FROM (
               |    SELECT seq, frameIdx,
               |           CAST(CASE WHEN (l_orderkey + l_partkey) % 13 = 0 THEN (l_partkey % 30) + 100 ELSE l_partkey % 30 END AS INT) AS id,
               |           x + CAST(l_orderkey % 7 AS DOUBLE) - 3.0 AS x,
               |           y + CAST(l_suppkey % 7 AS DOUBLE) - 3.0 AS y,
               |           w, h,
               |           CAST(50 + l_orderkey % 50 AS DOUBLE) / 100.0 AS conf,
               |           l_orderkey, l_linenumber, l_partkey, l_suppkey
               |    FROM gt
               |    WHERE (l_orderkey + l_suppkey) % 9 <> 0) tr_raw) t WHERE rn2 = 1""".stripMargin)
        case "gt_emb" =>
          spark.read.parquet(artifact(spark, dir, "gt")).createOrReplaceTempView("gt")
          spark.sql("""SELECT g.*, e.embedding AS emb
            |FROM gt g JOIN embeddings e ON e.vec_id = (g.id * 7 + g.frameIdx) % 500""".stripMargin)
        case "dets" => spark.sql(
          s"""SELECT 's' || CAST(l_orderkey % 2 AS STRING) AS seq,
             |       CAST(l_orderkey % 60 AS INT) AS frame,
             |       CAST(row_number() OVER (PARTITION BY l_orderkey % 2, l_orderkey % 60 ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey) AS INT) AS id,
             |       CAST((l_partkey % 12) * 60 + (l_suppkey % 9) AS DOUBLE) AS x1,
             |       CAST((l_suppkey % 12) * 60 + (l_partkey % 9) AS DOUBLE) AS y1,
             |       CAST((l_partkey % 12) * 60 + (l_suppkey % 9) + 30 + (l_linenumber * 9) AS DOUBLE) AS x2,
             |       CAST((l_suppkey % 12) * 60 + (l_partkey % 9) + 30 + ((l_partkey + l_linenumber) % 5) * 11 AS DOUBLE) AS y2,
             |       CAST(5 + l_orderkey % 97 AS DOUBLE) / 100.0 AS score
             |FROM lineitem WHERE l_orderkey % 5 = 0""".stripMargin)
    }
  }

  /** Drop this session's memoized derived tables and unpersist their
    * cached data — the bench isolation hook (see
    * `TextQ.resetMaterializations`): each timed query then pays its own
    * first-touch materialization, so per-query numbers don't depend on
    * which neighbor ran first.
    */
  def reset(spark: SparkSession): Unit =
    cache.keys.filter(_._1 == spark.sparkContext).foreach { k =>
      cache.remove(k).foreach(_.unpersist())
    }
}
