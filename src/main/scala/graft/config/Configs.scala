package graft.config

import graft.operators.TrackerConfig

/** Typed config loading + CLI overrides (SURVEY §2.1 S12; reference
  * `parse_cli_args`/`load_config`, src/utils/helpers.py:36-286).
  *
  * Pipeline: YAML text → Map → apply `key=value` overrides (type-
  * inferred: int → float → bool → string) → typed case class picked by
  * config-file name substring (embed/detect/track/eval/visualize — the
  * reference's dispatch). Overrides replace YAML values wholesale;
  * `dataset` is required after merging, `cfg=` names the file itself.
  */
object Configs {

  /** Run-level tracking config: data selection + the kernel's
    * TrackerConfig (cfgs/track.yaml keys; reference
    * IcebergTrackingConfig, src/tracking.py:60-150).
    */
  final case class TrackRunConfig(
      dataset: String,
      seqStartIndex: Int = 0,
      seqLengthLimit: Option[Int] = None,
      getGtThresholds: Boolean = false,
      gtThresholds: String = "",
      tracker: TrackerConfig = TrackerConfig())

  /** cfgs/eval.yaml (reference EvalConfig, src/utils/eval.py). */
  final case class EvalRunConfig(dataset: String, iouThreshold: Double = 0.5)

  /** cfgs/visualize.yaml — drives the S15/S14 render sinks
    * (sinks/Render.scala; reference VisualizationConfig + dispatch,
    * src/utils/visualize.py:157-180). `draw_contours`/`draw_masks`
    * require the SAM model (M5, out of engine scope) and are rejected
    * when true rather than silently ignored.
    */
  final case class VisualizeRunConfig(
      dataset: String,
      annotationSource: String = "tracking",
      startIndex: Int = 0,
      seqLengthLimit: Option[Int] = None,
      showImages: Boolean = false,
      drawIds: Boolean = true,
      drawBoxes: Boolean = true,
      fps: Int = 7)

  /** cfgs/detect.yaml — the engine-side inference/postprocess knobs
    * (model-training keys are carried verbatim in `extras` for a user
    * porting reference workflows; the engine consumes the filter
    * cascade + tiling parameters).
    */
  final case class DetectRunConfig(
      dataset: String,
      confidenceThreshold: Double = 0.1,
      scales: Seq[Double] = Seq(0.5, 1.0),
      windowSize: (Int, Int) = (1536, 1536),
      overlap: Double = 0.35,
      postprocess: Boolean = true,
      edgeTolerance: Int = 0,
      maskRatioThreshold: Double = 0.1,
      filterMaskedRegions: Boolean = true,
      minIcebergSize: Double = 100.0,
      boxNmsThresh: Double = 0.5,
      extras: Map[String, Any] = Map.empty)

  /** Parse `key=value` override args (reference helpers.py:120-132):
    * tokens without '=' are ignored, `cfg=` is extracted separately.
    * Returns (cfgFile, overrides).
    */
  def parseOverrides(args: Seq[String]): (Option[String], Map[String, Any]) = {
    val kvs = args.collect {
      case a if a.contains('=') =>
        val Array(k, v) = a.split("=", 2)
        k -> Yaml.inferScalar(v)
    }.toMap
    (kvs.get("cfg").map(_.toString), kvs - "cfg")
  }

  /** Dotted override paths merge into nested maps (OmegaConf dotlist
    * semantics, reference helpers.py:120-132): `thresholds.distance=50`
    * reaches the nested thresholds map instead of creating a useless
    * top-level "thresholds.distance" key.
    */
  private def applyOverride(m: Map[String, Any], key: String, v: Any): Map[String, Any] =
    key.split("\\.", 2) match {
      case Array(k) => m + (k -> v)
      case Array(k, rest) =>
        val child = m.get(k) match {
          case Some(c: Map[_, _]) => c.asInstanceOf[Map[String, Any]]
          case _ => Map.empty[String, Any]
        }
        m + (k -> applyOverride(child, rest, v))
    }

  /** YAML text + overrides → merged map; fails when `dataset` is
    * missing/null after the merge (reference helpers.py:263-271).
    */
  def merged(yamlText: String, overrides: Map[String, Any]): Map[String, Any] = {
    val m = overrides.foldLeft(Yaml.parse(yamlText)) {
      case (acc, (k, v)) => applyOverride(acc, k, v)
    }
    val ds = m.get("dataset").orNull
    require(ds != null && ds.toString.nonEmpty,
      "Dataset path not specified: set `dataset:` in the config file or pass dataset=<path>")
    m
  }

  // FULL leaf paths, dotted for nested maps: a nested-key typo
  // (thresholds.distancee=50) must fail exactly like a top-level one —
  // it would otherwise merge into the nested map, never be read, and
  // the run would proceed mis-configured while looking configured.
  private val trackKeys = Set("dataset", "seq_start_index", "seq_length_limit",
    "get_gt_thresholds", "gt_thresholds", "threshold_tolerance",
    "thresholds.appearance", "thresholds.distance", "thresholds.size",
    "weight_appearance", "weight_euclidean_distance", "weight_kalman_distance",
    "weight_size", "max_age", "min_iceberg_id_count", "min_iceberg_size",
    "use_kalman", "bidirectional_matching", "use_spatial_index",
    "process_noise", "measurement_noise")
  private val evalKeys = Set("dataset", "iou_threshold")
  private val visualizeKeys = Set("dataset", "annotation_source", "start_index",
    "seq_length_limit", "show_images", "draw_ids", "draw_boxes",
    "draw_contours", "draw_masks", "fps")

  /** A typo'd override (maxage=7 for max_age, thresholds.distancee=50)
    * would otherwise merge, never be read, and the run would proceed
    * mis-configured while looking configured — fail loudly instead.
    * The WHOLE dotted path is matched against the known leaf paths
    * (first-segment-only matching let nested typos through). YAML
    * files themselves may carry extra keys (users port reference
    * configs verbatim); only the CLI override keys are validated.
    * detect configs accept any key by design (`extras` carries
    * model-training knobs).
    */
  private def checkOverrideKeys(known: Set[String], typ: String,
                                overrides: Map[String, Any]): Unit = {
    val unknown = overrides.keys.filterNot(known.contains)
    require(unknown.isEmpty,
      s"unknown override key(s) for $typ config: ${unknown.mkString(", ")} " +
        s"(known: ${known.toSeq.sorted.mkString(", ")})")
  }

  /** Filename-substring dispatch (reference helpers.py:273-286). */
  def load(cfgFile: String, yamlText: String,
           overrides: Map[String, Any] = Map.empty): Any = {
    val name = cfgFile.toLowerCase
    if (name.contains("track")) {
      checkOverrideKeys(trackKeys, "track", overrides)
      trackConfig(merged(yamlText, overrides))
    }
    else if (name.contains("eval")) {
      checkOverrideKeys(evalKeys, "eval", overrides)
      evalConfig(merged(yamlText, overrides))
    }
    else if (name.contains("detect")) detectConfig(merged(yamlText, overrides))
    else if (name.contains("visualize")) {
      checkOverrideKeys(visualizeKeys, "visualize", overrides)
      visualizeConfig(merged(yamlText, overrides))
    }
    else throw new IllegalArgumentException(
      s"Unknown config type: $cfgFile (engine-side types: track, eval, detect, " +
        "visualize; embed configs drive model training, which is out of engine " +
        "scope per SURVEY §2)")
  }

  def trackConfig(m: Map[String, Any]): TrackRunConfig = {
    val thr = m.get("thresholds") match {
      case Some(t: Map[_, _]) => t.asInstanceOf[Map[String, Any]]
      case _ => Map.empty[String, Any]
    }
    val base = TrackerConfig()
    TrackRunConfig(
      dataset = str(m, "dataset"),
      seqStartIndex = int(m, "seq_start_index", 0),
      seqLengthLimit = m.get("seq_length_limit").flatMap(v =>
        Option(v).map(x => num(x).toInt)),
      getGtThresholds = bool(m, "get_gt_thresholds", false),
      gtThresholds = m.get("gt_thresholds").flatMap(Option(_)).map(_.toString).getOrElse(""),
      tracker = base.copy(
        thresholdAppearance = dbl(thr, "appearance", base.thresholdAppearance),
        thresholdDistance = dbl(thr, "distance", base.thresholdDistance),
        thresholdSize = dbl(thr, "size", base.thresholdSize),
        tolerance = dbl(m, "threshold_tolerance", base.tolerance),
        wAppearance = dbl(m, "weight_appearance", base.wAppearance),
        wEuclidean = dbl(m, "weight_euclidean_distance", base.wEuclidean),
        wKalman = dbl(m, "weight_kalman_distance", base.wKalman),
        wSize = dbl(m, "weight_size", base.wSize),
        maxAge = int(m, "max_age", base.maxAge),
        minTrackLength = int(m, "min_iceberg_id_count", base.minTrackLength),
        minIcebergSize = dbl(m, "min_iceberg_size", base.minIcebergSize),
        useKalman = bool(m, "use_kalman", base.useKalman),
        bidirectional = bool(m, "bidirectional_matching", base.bidirectional),
        useSpatialIndex = bool(m, "use_spatial_index", base.useSpatialIndex),
        processNoise = dbl(m, "process_noise", base.processNoise),
        measurementNoise = dbl(m, "measurement_noise", base.measurementNoise)))
  }

  def evalConfig(m: Map[String, Any]): EvalRunConfig =
    EvalRunConfig(str(m, "dataset"), dbl(m, "iou_threshold", 0.5))

  def visualizeConfig(m: Map[String, Any]): VisualizeRunConfig = {
    val src = m.get("annotation_source").flatMap(Option(_))
      .map(_.toString).getOrElse("tracking")
    val valid = Seq("ground_truth", "detections", "tracking", "eval")
    require(valid.contains(src),
      s"Invalid annotation source: $src. Must be one of: ${valid.mkString(", ")}")
    require(!bool(m, "draw_contours", false) && !bool(m, "draw_masks", false),
      "draw_contours/draw_masks need the SAM segmentation model (M5), which " +
        "is out of engine scope per SURVEY §2 — render boxes/ids instead")
    // a validated-then-ignored knob is the silent-misconfiguration mode
    // this loader exists to prevent: no interactive display engine-side
    require(!bool(m, "show_images", false),
      "show_images: the engine has no interactive display (reference " +
        "plt.show) — annotated frames are exported as files instead")
    VisualizeRunConfig(
      dataset = str(m, "dataset"),
      annotationSource = src,
      startIndex = int(m, "start_index", 0),
      seqLengthLimit = m.get("seq_length_limit").flatMap(v =>
        Option(v).map(x => num(x).toInt)),
      showImages = bool(m, "show_images", false),
      drawIds = bool(m, "draw_ids", true),
      drawBoxes = bool(m, "draw_boxes", true),
      fps = int(m, "fps", 7))
  }

  def detectConfig(m: Map[String, Any]): DetectRunConfig = {
    val known = Set("dataset", "confidence_threshold", "scales", "window_size",
      "overlap", "postprocess", "edge_tolerance", "mask_ratio_threshold",
      "filter_masked_regions", "min_iceberg_size", "box_nms_thresh")
    DetectRunConfig(
      dataset = str(m, "dataset"),
      confidenceThreshold = dbl(m, "confidence_threshold", 0.1),
      // list from YAML, "a,b" string or single number from a CLI
      // override; any other shape fails loudly — silently falling back
      // to the defaults would drop BOTH the YAML value and the override
      scales = m.get("scales").flatMap(Option(_)) match {
        case None => Seq(0.5, 1.0)
        case Some(l: List[_]) => l.map(num)
        case Some(v: String) => v.split(",").toSeq.map(x => num(x.trim))
        case Some(v) => Seq(num(v))
      },
      windowSize = m.get("window_size").flatMap(Option(_)) match {
        case None => (1536, 1536)
        case Some(List(w, h)) => (num(w).toInt, num(h).toInt)
        case Some(v: String) if v.contains(',') =>
          val Array(w, h) = v.split(",", 2)
          (num(w.trim).toInt, num(h.trim).toInt)
        case Some(v) => throw new IllegalArgumentException(
          s"window_size must be [w, h] or a 'w,h' override, got: $v")
      },
      overlap = dbl(m, "overlap", 0.35),
      postprocess = bool(m, "postprocess", true),
      edgeTolerance = int(m, "edge_tolerance", 0),
      maskRatioThreshold = dbl(m, "mask_ratio_threshold", 0.1),
      filterMaskedRegions = bool(m, "filter_masked_regions", true),
      minIcebergSize = dbl(m, "min_iceberg_size", 100.0),
      boxNmsThresh = dbl(m, "box_nms_thresh", 0.5),
      extras = m.view.filterKeys(k => !known.contains(k)).toMap)
  }

  // ---- field coercion: YAML scalars arrive as Long/Double/Boolean/String ----
  private def num(v: Any): Double = v match {
    case l: Long => l.toDouble
    case d: Double => d
    case i: Int => i.toDouble
    case s: String => s.toDouble
    case other => throw new IllegalArgumentException(s"expected number, got $other")
  }
  private def dbl(m: Map[String, Any], k: String, d: Double): Double =
    m.get(k).flatMap(Option(_)).map(num).getOrElse(d)
  private def int(m: Map[String, Any], k: String, d: Int): Int =
    m.get(k).flatMap(Option(_)).map(num(_).toInt).getOrElse(d)
  private def bool(m: Map[String, Any], k: String, d: Boolean): Boolean =
    m.get(k).flatMap(Option(_)).map {
      case b: Boolean => b
      case s: String => s.toLowerCase == "true"
      case other => throw new IllegalArgumentException(s"expected bool, got $other")
    }.getOrElse(d)
  private def str(m: Map[String, Any], k: String): String =
    m.get(k).flatMap(Option(_)).map(_.toString).getOrElse(
      throw new IllegalArgumentException(s"missing required key: $k"))
}
