package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.config.Configs

/** The reference's CLI surface as one Spark entrypoint — the command a
  * user of `run_pipeline.py <mode> cfg=... key=value...` (reference
  * src/run_pipeline.py + helpers.parse_cli_args) switches to:
  *
  * {{{
  *   sbt "runMain graft.Run track    cfg=cfgs/track.yaml dataset=/data/seq1 max_age=7"
  *   sbt "runMain graft.Run eval     cfg=cfgs/eval.yaml  dataset=/data/seq1"
  *   sbt "runMain graft.Run features cfg=cfgs/track.yaml dataset=/data/seq1"
  *   sbt "runMain graft.Run dedup-maintain data=/data/corpus"   // refresh signature store
  * }}}
  *
  * The cfg YAML is parsed (S12), CLI `key=value` overrides merge with
  * full dotted-path validation (a typo fails loudly), and the typed
  * config drives the Pipelines composition. Dataset layout follows the
  * reference convention: `<dataset>/det.txt`, `<dataset>/gt.txt`,
  * `<dataset>/embeddings.parquet` (frame, id, vector: array<float>);
  * outputs land beside them (`track.txt`, `eval.txt`).
  */
object Run {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: graft.Run <track|eval|features|visualize> cfg=<yaml> [key=value ...]" +
        " | graft.Run dedup-maintain data=<dir> [cap=<n>]" +
        " | graft.Run ann-maintain data=<dir>")
    val spark = LocalSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      logLevel = "WARN")
    try println(run(spark, args.head, args.toSeq.tail))
    finally spark.stop()
  }

  /** Dispatch on a provided session (separated from main so tests drive
    * the full CLI path without tearing down the shared test context).
    * Returns the text a CLI user sees.
    */
  def run(spark: SparkSession, mode: String, kvArgs: Seq[String]): String = {
    val (cfgFile, overrides) = Configs.parseOverrides(kvArgs)
    // lazy: dedup-maintain takes data=<dir>, no cfg YAML
    lazy val file = cfgFile.getOrElse(
      throw new IllegalArgumentException("pass cfg=<yaml file>"))
    lazy val text = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(file)), "UTF-8")
    // config type comes from the FILENAME (the reference's dispatch), so
    // a mode/config mismatch (visualize cfg=track.yaml) must say so
    // instead of surfacing as a ClassCastException deep in the pipeline
    def loadAs[T <: AnyRef](implicit ct: scala.reflect.ClassTag[T]): T =
      Configs.load(file, text, overrides) match {
        case c: T => c
        case other => throw new IllegalArgumentException(
          s"mode '$mode' needs a ${ct.runtimeClass.getSimpleName} but $file " +
            s"loaded as ${other.getClass.getSimpleName} — pass the matching cfg=")
      }
    mode match {
      case "track" =>
        val c = loadAs[Configs.TrackRunConfig]
        Pipelines.track(spark, s"${c.dataset}/det.txt",
          embeddings(spark, c.dataset), s"${c.dataset}/track.txt", c.tracker)
        s"track: wrote ${c.dataset}/track.txt"
      case "eval" =>
        val c = loadAs[Configs.EvalRunConfig]
        val (perSeq, combined) = Pipelines.eval(spark,
          s"${c.dataset}/gt.txt", s"${c.dataset}/track.txt",
          s"${c.dataset}/eval.txt", c.iouThreshold)
        Pipelines.formatMetricTables(perSeq, combined)
      case "features" =>
        // the reference's get_gt_thresholds mode: GT-derived matching
        // thresholds from the same track config (SURVEY §3 entry 4)
        val c = loadAs[Configs.TrackRunConfig]
        val row = Pipelines.gtThresholds(spark, s"${c.dataset}/gt.txt",
          embeddings(spark, c.dataset)).collect().head
        row.schema.fieldNames.zip(row.toSeq)
          .map { case (k, v) => s"$k: $v" }.mkString("\n")
      case "visualize" =>
        val c = loadAs[Configs.VisualizeRunConfig]
        // reference annotation-source → file mapping (visualize.py:385)
        val ann = c.annotationSource match {
          case "ground_truth" => "gt.txt"
          case "detections"   => "det.txt"
          case "eval"         => "eval.txt"
          case _              => "track.txt"
        }
        val outDir = s"${c.dataset}/visualizations/${c.annotationSource}"
        val vidDir = s"${c.dataset}/visualizations/videos"
        val (nImg, nVid) = Pipelines.visualize(spark, s"${c.dataset}/$ann",
          s"${c.dataset}/images", outDir, vidDir, c.drawIds, c.drawBoxes,
          c.startIndex, c.seqLengthLimit, c.fps)
        s"visualize: $nImg annotated frames in $outDir, $nVid-frame video in $vidDir"
      case "dedup-maintain" =>
        // the corpus-maintenance job the dedup artifact posture
        // documents: (re)build the persisted signature store for a
        // documents dir — band signatures, gram fingerprints, corpus
        // cluster labels — so a scheduled run after each data drop
        // keeps the ingest shapes (d09/d15/d17/st6) probing current
        // artifacts instead of lazily building them inside a query.
        // Idempotent: a generation that is already on disk (length+
        // mtime key, _SUCCESS-gated) is left untouched, stale
        // generations are GC'd by the store.
        val dir = dataDirArg(mode, kvArgs, overrides, cfgFile,
          "documents.parquet", extraKeys = Set("cap"))
        // the guard cap the report measures against — D05MaxBucket (the
        // catalog's audit/ingest cap) unless overridden; the override
        // affects the REPORT only, never the stored artifacts or any
        // catalog query (raw token like data=, so it can't be mangled
        // by YAML scalar inference)
        val cap = kvArgs.collectFirst {
          case a if a.startsWith("cap=") =>
            val raw = a.substring("cap=".length)
            try raw.toInt catch {
              case _: NumberFormatException =>
                throw new IllegalArgumentException(
                  s"cap= must be a positive integer, got cap=$raw")
            }
        }.getOrElse(graft.queries.TextQ.D05MaxBucket)
        require(cap >= 1, s"cap must be >= 1, got $cap")
        // drop session memos first: after a mid-session source
        // regeneration the memoized band/gram relations still hold the
        // OLD generation in cache — building the new cluster artifact
        // through them would silently derive gen-N+1 labels from gen-N
        // signatures. Maintenance must rebuild from current storage.
        graft.queries.TextQ.resetMaterializations(spark)
        val band = graft.queries.TextQ.bandArtifact(spark, dir)
        val gram = graft.queries.TextQ.gramArtifact(spark, dir)
        val clusters = graft.queries.TextQ.clusterArtifact(spark, dir)
        val simhash = graft.queries.TextQ.simhashArtifact(spark, dir)
        val dsir = graft.queries.TextQ.dsirArtifact(spark, dir)
        val clf = graft.queries.TextQ.clfArtifact(spark, dir)
        val decontam = graft.queries.TextQ.decontamArtifact(spark, dir)
        // BUCKET-GUARD REPORT (the ann-maintain triad, dedup side —
        // VERDICT r18 #1): the capped tiers' truncation metric finally
        // gets a reader, and the deliberately-UNCAPPED clustering
        // clique (d07/d17/st7 — a cap there would silently split true
        // duplicate clusters) gets its mega-bucket early warning. All
        // four numbers ride ONE observe pass over the freshly built
        // band artifact's PRECOMPUTED bucket_rank column (a single
        // scan — maintenance-time cost, never probe-time), through the
        // SAME Observation-parameterized guard the composable call
        // sites use (Dedup.bandsKeptByRank — this CLI is its first
        // production Observation caller):
        //   max_bucket       — the largest (band, band_sig) bucket; the
        //                      d07 clique is quadratic in this.
        //   overflow_buckets — buckets past the cap (ranks are
        //                      consecutive per bucket, so rank == cap+1
        //                      marks each overflowing bucket exactly
        //                      once).
        //   truncated_doc_slots / doc_slots — the capped tiers' exact
        //                      truncation at this cap.
        val bands = graft.queries.TextQ.bandSigs(spark, dir)
        val guardObs = org.apache.spark.sql.Observation("graft_dedup_maintain_guard")
        graft.operators.Dedup.bandsKeptByRank(bands, "bucket_rank", cap,
          Some(guardObs), extraMetrics = Seq(
            coalesce(max(col("bucket_rank")), lit(0)).as("max_bucket"),
            coalesce(sum(when(col("bucket_rank") === cap + 1, 1L)
              .otherwise(0L)), lit(0L)).as("overflow_buckets")))
          .write.format("noop").mode("overwrite").save()
        val guard = guardObs.get
        val maxBucket = guard("max_bucket").asInstanceOf[Int]
        val overflow = guard("overflow_buckets").asInstanceOf[Long]
        val truncated = guard("truncated_doc_slots").asInstanceOf[Long]
        val docSlots = guard("doc_slots").asInstanceOf[Long]
        // the actionable recommendation (the rebalance= pattern): any
        // overflowing bucket means the capped audit/ingest tiers are
        // already truncating there — and since round 20 the engine
        // EXECUTES the route: the routed hybrid probe
        // (Dedup.minhashCandidatesAgainstRouted, catalog row
        // d26_routed_dedup) dispatches overflowing buckets through the
        // linear star branch and closes the under-merge window by
        // construction, so the recommendation names the executor
        val route = if (truncated > 0L)
          "routed_hybrid(d26_routed_dedup)" else "no"
        // PER-BUCKET detail (VERDICT r19 #2): the operator needs WHERE,
        // not just THAT — the top-3 overflowing (band:band_sig:size)
        // keys, derived from the artifact's precomputed bucket_rank
        // (max rank in a bucket IS its size, and restricting to
        // rank > cap rows keeps exactly the overflowing buckets'
        // maxima). A bounded maintenance-time collect (<= 3 rows),
        // paid only when something overflowed; values space-free per
        // the report's kv-parsing rule.
        val topOverflow = if (overflow == 0L) "none"
          else graft.operators.Dedup.topOverflowingBuckets(bands, "bucket_rank", cap, 3)
            .map { case (b, sig, n) => s"$b:$sig:$n" }.mkString(",")
        // compaction report (VERDICT r19 #5): the builders compact
        // their flat scan copies PRE-PUBLISH (no reader can observe
        // the swap — Compaction.compactInPlace's safety contract) and
        // record the result beside _SUCCESS; the CLI reads the stable
        // per-generation records, so idempotent re-runs report
        // identically. "none" = generation predates the record.
        val compacted = Seq(
          "band" -> band, "gram" -> gram, "clusters" -> clusters,
          "simhash" -> simhash)
          .map { case (k, p) =>
            s"$k:${graft.sources.Compaction.compactionReportOf(spark, p)}" }
          .mkString(",")
        s"dedup-maintain: band=$band gram=$gram clusters=$clusters " +
          s"simhash=$simhash dsir=$dsir clf=$clf decontam=$decontam " +
          s"cap=$cap max_bucket=$maxBucket overflow_buckets=$overflow " +
          s"truncated_doc_slots=$truncated doc_slots=$docSlots route=$route " +
          s"top_overflow=$topOverflow compacted=$compacted"
      case "ann-maintain" =>
        // the EMBEDDING-side maintenance job: (re)build the
        // cell-partitioned IVF+PQ code table AND the semantic-dedup
        // state (frozen centroid model + corpus group labels) for an
        // embeddings dir — same idempotent generation-keyed posture as
        // dedup-maintain; the serving probes (s09/st8) partition-prune
        // the index, the semantic ingest (d21) star-merges into the
        // state.
        val dir = dataDirArg(mode, kvArgs, overrides, cfgFile,
          "embeddings.parquet")
        val index = graft.queries.TextQ.annArtifact(spark, dir)
        val sem = graft.queries.TextQ.semArtifact(spark, dir)
        val corpus = graft.queries.TextQ.annCorpusArtifact(spark, dir)
        // delta growth check (VERDICT r16 #6): the corpus index covers
        // the non-batch slice only; the batch slice is the un-indexed
        // delta the s12/st11 probes union in. Past the fold-in ratio
        // the delta erodes the main tier's partition pruning — the fix
        // is this very command after widening the corpus slice (a
        // rebuild folds the delta in by construction on the next
        // generation). One cheap count per side; both are columnar
        // row-group counts, not scans.
        val emb = graft.Tables.embeddings(spark, dir)
        val deltaRows = emb.filter(graft.queries.TextQ.SemBatchPred).count()
        val mainRows = emb.filter(!graft.queries.TextQ.SemBatchPred).count()
        val ratio = if (mainRows == 0L) Double.PositiveInfinity
          else deltaRows.toDouble / mainRows.toDouble
        val fold = if (ratio > graft.queries.TextQ.AnnDeltaFoldRatio)
          "recommended" else "no"
        // cell-balance report: the skew signal the trained mode exists
        // to fix — a hot cell concentrates every probe's rerank join.
        // One scan of the freshly built code table (maintenance-time
        // cost, never probe-time); ideal balance is 1/nlist.
        // refresh first: this JVM may hold a cached FileIndex for the
        // same path from a read that predates a rebuild
        spark.catalog.refreshByPath(index)
        val cellSizes = spark.read.parquet(index)
          .groupBy("cell").count().collect().map(_.getLong(1))
        // nearly unreachable (the artifact build's seed draw needs
        // >= codebookSize rows), but an empty index must say so
        // instead of throwing an opaque empty.max (ADVICE r17)
        if (cellSizes.isEmpty)
          f"ann-maintain: index=$index sem=$sem corpus=$corpus " +
            f"delta_main_ratio=$ratio%.4f fold_in=$fold " +
            "max_cell_frac=NaN rebalance=no(empty_index)"
        else {
          val maxCellFrac = cellSizes.max.toDouble / cellSizes.sum.toDouble
          // recommendation threshold (the fold_in pattern): ideal is
          // 1/nlist, and measured on the skew fixtures (PLANS.md
          // "Cell balance", round 18) even genuinely clustered
          // corpora sit at 2.5-3.5x ideal under either mode — so the
          // 4/nlist bar only trips on DEGENERATE concentration (a
          // seed draw that collapsed most of the corpus into one
          // cell, e.g. the PlanShapeSpec hot-cell store at 7.9x).
          // The lloyd mode is the first lever: training measurably
          // flattens the histogram on skewed corpora (0.423 -> 0.360
          // on the 90%-one-cluster fixture) and fixes the recall the
          // skew costs (MoG recall@5 at nprobe=1: 0.610 -> 0.890)
          val rebalance =
            if (maxCellFrac > 4.0 / graft.queries.TextQ.AnnNlist)
              "recommended(GRAFT_ANN_TRAIN=lloyd)" else "no"
          // recall sweep (the FAISS autotune posture): measure THIS
          // generation's recall@5 at each nprobe against a brute-force
          // ground-truth pass over a deterministic query sample, and
          // suggest the cheapest nprobe clearing the target — the
          // quality leg of the report triad (fold_in growth,
          // rebalance skew, recall). Honest cost (ADVICE r18): the
          // float store is read by the GT pass AND by each swept
          // nprobe's exact-rerank tail — 1 + |nprobes| passes, served
          // from one persisted slim projection inside recallSweep —
          // the priced cost of measured-not-assumed index quality,
          // paid at maintenance time, never per probe.
          import org.apache.spark.sql.functions.col
          val SimS = graft.operators.SimilaritySearch
          val model = SimS.ivfPqModel(emb,
            graft.queries.TextQ.AnnNlist, graft.queries.TextQ.AnnM,
            graft.queries.TextQ.AnnCb)
          // the power-of-2 ladder, always closed by nlist itself so
          // the fallback suggestion is a measured setting even if
          // nlist is not a power of 2
          val nprobes = (Seq.iterate(1, 32)(_ * 2)
            .takeWhile(_ < graft.queries.TextQ.AnnNlist) :+
            graft.queries.TextQ.AnnNlist).distinct
          val sweep = SimS.recallSweep(emb,
            cells => spark.read.parquet(index)
              .where(col("cell").isin(cells: _*))
              .select(col("vec_id"), col("cell"), col("codes")),
            model, k = 5, refine = 20, nprobes = nprobes, sampleN = 32)
          val recallStr = sweep
            .map { case (np, r) => f"recall_np$np=$r%.3f" }.mkString(" ")
          val suggested = sweep.collectFirst {
            case (np, r) if r >= SimS.AnnRecallTarget => np
          }.getOrElse(graft.queries.TextQ.AnnNlist)
          // close the autotune loop (VERDICT r18 #3): the suggestion is
          // stored INTO this index generation as a sidecar, and serving
          // callers that pass no explicit nprobe (TextQ.resolveNprobe)
          // pick it up — the sweep informs the engine, not just a human
          graft.queries.TextQ.writeSuggestedNprobe(spark, index, suggested)
          // the sem store's compact state/ copy carries the build-time
          // compaction record (dedup-maintain's compacted= pattern);
          // the index tiers are cell-partitioned — one file per
          // partition directory by construction, nothing to compact
          val compacted =
            s"sem:${graft.sources.Compaction.compactionReportOf(spark, sem)}"
          f"ann-maintain: index=$index sem=$sem corpus=$corpus " +
            f"delta_main_ratio=$ratio%.4f fold_in=$fold " +
            f"max_cell_frac=$maxCellFrac%.4f rebalance=$rebalance " +
            f"$recallStr suggested_nprobe=$suggested compacted=$compacted"
        }
      case other =>
        throw new IllegalArgumentException(
          s"unknown mode: $other (track|eval|features|visualize|dedup-maintain|ann-maintain)")
    }
  }

  /** Shared `data=<dir>` extraction for the maintenance modes. Takes
    * the RAW token, not the Yaml-inferred scalar: a numeric-looking
    * dir name (data=007) must stay a path, not become Long 7
    * round-tripped to "7". A stray key or a cfg= must abort (the same
    * fail-loudly posture as the config modes' override validation).
    */
  private def dataDirArg(mode: String, kvArgs: Seq[String],
                         overrides: Map[String, Any],
                         cfgFile: Option[String], table: String,
                         extraKeys: Set[String] = Set.empty): String = {
    val dir = kvArgs.collectFirst {
      case a if a.startsWith("data=") => a.substring("data=".length)
    }.getOrElse(throw new IllegalArgumentException(
      s"pass data=<dir containing $table>"))
    val stray = (overrides.keySet - "data" -- extraKeys) ++ cfgFile.map(_ => "cfg")
    if (stray.nonEmpty) throw new IllegalArgumentException(
      s"$mode takes only data=<dir>" +
        (if (extraKeys.nonEmpty) extraKeys.mkString(" [", "=, ", "=]") else "") +
        s"; got: ${stray.mkString(", ")}")
    dir
  }

  // spark.read fails loudly with the path in the message if the store
  // is missing — tracking REQUIRES embeddings (the appearance gate
  // filters every pair whose embedding is null, reference F10)
  private def embeddings(spark: SparkSession, dataset: String) =
    spark.read.parquet(s"$dataset/embeddings.parquet")
}
