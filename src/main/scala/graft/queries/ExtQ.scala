package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Derived, Tables}
import graft.operators.DetectFilters

/** Extended coverage queries: detection filter cascade (F1–F6), the
  * integral-image mask filter checked against a brute-force pixel-count
  * oracle, rank-based AUC (A17), combined metrics (A6), seeded sampling
  * (O10), MOT CSV round-trip (S1/S4/E9/O2), and an oracle-checked
  * Structured Streaming window aggregation.
  */
object ExtQ {

  /** Deterministic 240×240 checkerboard land mask (40px squares):
    * masked(r,c) = ((r/40)+(c/40)) even. Same formula in the oracle.
    */
  val MaskN = 240
  lazy val mask: Array[Array[Boolean]] =
    Array.tabulate(MaskN, MaskN)((r, c) => ((r / 40) + (c / 40)) % 2 == 0)
  lazy val maskIntegral: Array[Long] = DetectFilters.integralImage(mask)

  val defs: Seq[Q] = Seq(

    // F1/F2/F4 — the cascade predicates on the derived corner-format
    // detections (mask-free portion; F5 is f02).
    Q("f01_filter_cascade",
      (s, d) => {
        val dets = Derived.table(s, d, "dets")
        DetectFilters.cascade(dets, col("score"),
            col("x1"), col("y1"), col("x2"), col("y2"),
            lit(800), lit(800),
            confThreshold = 0.25, minSize = 900.0, edgeTol = 8.0)
          .groupBy("seq").agg(count(lit(1)).as("n_kept"),
            (sum(round(col("score") * 100).cast("long")).cast("double") / 100.0)
              .as("score_sum"))
      },
      Some(s"""WITH ${Derived.detCte}
        |SELECT seq, count(*) AS n_kept,
        |  CAST(CAST(sum(CAST(ROUND(score * 100) AS BIGINT)) AS BIGINT) AS DOUBLE) / 100.0 AS score_sum
        |FROM dets
        |WHERE score >= 0.25
        |  AND (x2 - x1) * (y2 - y1) >= 900.0
        |  AND NOT (x1 <= 8.0 OR y1 <= 8.0 OR x2 >= 800 - 8.0 OR y2 >= 800 - 8.0)
        |GROUP BY seq""".stripMargin)),

    // F5 — integral-image mask stats vs BRUTE-FORCE pixel counting in
    // the oracle: proves the O(1) prefix-sum lookups equal the
    // reference's O(box-area) submask count (src/detection.py:1086-1116).
    Q("f02_mask_filter",
      (s, d) => {
        val dets = Derived.table(s, d, "dets").filter(col("frame") === 0)
        val stats = DetectFilters.maskStats(
          col("x1"), col("y1"), col("x2"), col("y2"),
          maskIntegral, MaskN, MaskN, lit(MaskN), lit(MaskN))
        dets.withColumn("ms", stats)
          .filter(!col("ms.degenerate"))
          .select(col("seq"), col("id"),
            col("ms.maskedCnt").as("masked_cnt"),
            col("ms.total").as("total_px"))
      },
      Some(s"""WITH ${Derived.detCte},
        |clamped AS (
        |  SELECT seq, id,
        |    greatest(0, least(greatest(0, CAST(x1 AS INT)), ${MaskN - 1})) AS l,
        |    greatest(0, least(greatest(0, CAST(y1 AS INT)), ${MaskN - 1})) AS t,
        |    least(CAST(x2 AS INT), $MaskN) AS r0,
        |    least(CAST(y2 AS INT), $MaskN) AS b0,
        |    CAST(x1 AS INT) AS xi1, CAST(y1 AS INT) AS yi1,
        |    CAST(x2 AS INT) AS xi2, CAST(y2 AS INT) AS yi2
        |  FROM dets WHERE frame = 0
        |),
        |boxes AS (
        |  SELECT seq, id, l, t,
        |    greatest(l + 1, r0) AS r, greatest(t + 1, b0) AS b
        |  FROM clamped
        |  WHERE NOT (least(xi2, $MaskN) <= greatest(0, xi1) OR least(yi2, $MaskN) <= greatest(0, yi1))
        |)
        |SELECT bx.seq, bx.id,
        |  CAST((SELECT count(*) FROM range($MaskN) rr(r), range($MaskN) cc(c)
        |        WHERE rr.r >= bx.t AND rr.r < bx.b AND cc.c >= bx.l AND cc.c < bx.r
        |          AND ((rr.r // 40) + (cc.c // 40)) % 2 = 0) AS BIGINT) AS masked_cnt,
        |  CAST((bx.r - bx.l) * (bx.b - bx.t) AS BIGINT) AS total_px
        |FROM boxes bx""".stripMargin)),

    // A17 — rank-based ROC-AUC (Mann-Whitney) over (score, label):
    // label = embeddings.label >= 5, score = first embedding component.
    Q("a01_auc",
      (s, d) => {
        val e = Tables.embeddings(s, d)
          .withColumn("pos", (col("label") >= 5).cast("int"))
          .withColumn("score", element_at(col("embedding"), 1).cast("double"))
        val ranked = e.withColumn("rnk",
          row_number().over(Window.orderBy(col("score").asc, col("vec_id").asc))
            .cast("long"))
        ranked.agg(
          sum("pos").cast("long").as("n_pos"),
          (count(lit(1)) - sum("pos")).cast("long").as("n_neg"),
          round(
            (sum(col("pos") * col("rnk")).cast("double") -
              (sum("pos").cast("double") * (sum("pos").cast("double") + 1.0)) / 2.0) /
              (sum("pos").cast("double") *
                (count(lit(1)) - sum("pos")).cast("double")), 9).as("auc"))
      },
      Some("""WITH ranked AS (
        |  SELECT CASE WHEN label >= 5 THEN 1 ELSE 0 END AS pos,
        |    row_number() OVER (ORDER BY CAST(embedding[1] AS DOUBLE) ASC, vec_id ASC) AS rnk
        |  FROM embeddings
        |)
        |SELECT CAST(sum(pos) AS BIGINT) AS n_pos,
        |  CAST(count(*) - sum(pos) AS BIGINT) AS n_neg,
        |  ROUND((CAST(sum(pos * rnk) AS DOUBLE) - (CAST(sum(pos) AS DOUBLE) * (CAST(sum(pos) AS DOUBLE) + 1.0)) / 2.0)
        |    / (CAST(sum(pos) AS DOUBLE) * CAST(count(*) - sum(pos) AS DOUBLE)), 9) AS auc
        |FROM ranked""".stripMargin)),

    // O10 — seeded deterministic sample via md5-ordered row_number.
    Q("o01_seeded_sample",
      (s, d) => {
        val o = Tables.orders(s, d)
        val w = Window.orderBy(md5(col("o_orderkey").cast("string")), col("o_orderkey"))
        o.withColumn("rn", row_number().over(w)).filter(col("rn") <= 100)
          .select(col("o_orderkey"), col("o_orderpriority"))
      },
      Some("""SELECT o_orderkey, o_orderpriority FROM (
        |  SELECT *, row_number() OVER (ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 100""".stripMargin)),

    // A6 — COMBINED metrics row (combine_metrics): sums + recomputed
    // ratios + TP-weighted LocA across the two derived sequences.
    Q("m09_combined_metrics",
      (s, d) => {
        val gt = Derived.table(s, d, "gt")
        val tr = Derived.table(s, d, "tracks")
        val per = graft.operators.MotEval.metrics(gt, tr, 0.3)
        graft.operators.MotEval.combine(per)
          .select(col("seq"),
            col("CLR_TP").cast("long").as("CLR_TP"),
            col("CLR_FN").cast("long").as("CLR_FN"),
            col("IDSW").cast("long").as("IDSW"),
            col("Frag").cast("long").as("Frag"),
            col("IDTP").cast("long").as("IDTP"),
            round(col("CLR_Re"), 9).as("CLR_Re"),
            round(col("LocA"), 9).as("LocA"),
            round(col("IDF1"), 9).as("IDF1"))
      },
      Some {
        // per-seq CTE chain = m02's oracle with UNROUNDED ratios, then A6.
        val body = MotQ.metricsCtes + "\n" + MotQ.metricsSelect(rounded = false)
        // hoist the WITH: wrap the whole per-seq query as a subselect
        s"""SELECT 'COMBINED' AS seq,
           |  CAST(sum(CLR_TP) AS BIGINT) AS CLR_TP,
           |  CAST(sum(CLR_FN) AS BIGINT) AS CLR_FN,
           |  CAST(sum(IDSW) AS BIGINT) AS IDSW,
           |  CAST(sum(Frag) AS BIGINT) AS Frag,
           |  CAST(sum(IDTP) AS BIGINT) AS IDTP,
           |  ROUND(CASE WHEN sum(GT_Dets) > 0 THEN CAST(sum(CLR_TP) AS DOUBLE) / sum(GT_Dets) ELSE 0.0 END, 9) AS CLR_Re,
           |  ROUND(CASE WHEN sum(CLR_TP) > 0 THEN sum(LocA * CLR_TP) / sum(CLR_TP) ELSE 0.0 END, 9) AS LocA,
           |  ROUND(CASE WHEN 2 * sum(IDTP) + sum(IDFN) + sum(IDFP) > 0
           |    THEN 2.0 * sum(IDTP) / (2 * sum(IDTP) + sum(IDFN) + sum(IDFP)) ELSE 0.0 END, 9) AS IDF1
           |FROM (
           |$body
           |) per_seq""".stripMargin
      }),

    // S1/S4/E9/O2 — MOT CSV round-trip: write the derived tracks in the
    // 10-column MOT layout (zero-padded frames, (id, frame) sort), read
    // back with the schema'd reader, aggregate. Oracle aggregates the
    // source relation directly — equality proves the round-trip is
    // lossless.
    Q("s03_mot_roundtrip",
      (s, d) => {
        val tmp = s"/tmp/graft_mot_rt_${d.replaceAll("[^a-zA-Z0-9]", "_")}"
        val tracks = Derived.table(s, d, "tracks")
          .select(format_string("%06d", col("frameIdx")).as("frame"),
            col("id"), col("x"), col("y"), col("w"), col("h"), col("conf"))
        graft.mot.MotCsv.write(tracks, tmp)
        val back = graft.mot.MotCsv.read(s, tmp)
        back.agg(
          count(lit(1)).as("n_rows"),
          countDistinct("id").as("n_ids"),
          sum(round(col("conf") * 100).cast("long")).as("conf_cents"),
          sum(col("x")).as("sum_x"),
          min("frame").as("min_frame"))
      },
      Some(s"""WITH ${Derived.motCtes}
        |SELECT count(*) AS n_rows, count(DISTINCT id) AS n_ids,
        |  CAST(sum(CAST(ROUND(conf * 100) AS BIGINT)) AS BIGINT) AS conf_cents,
        |  sum(x) AS sum_x,
        |  lpad(CAST(min(frameIdx) AS VARCHAR), 6, '0') AS min_frame
        |FROM tracks""".stripMargin)),

    // M7 — real Structured Streaming: file source → event-time tumbling
    // window (watermarked) → memory sink, Trigger.AvailableNow. The
    // oracle is the batch equivalent — exact agreement because the
    // stream drains completely.
    Q("st1_stream_window",
      (s, d) => {
        val schema = Tables.events(s, d).schema
        val name = "st1_counts_" + math.abs(d.hashCode).toString
        val stream = s.readStream.schema(schema)
          .option("pathGlobFilter", "events.parquet").parquet(d)
          .withColumn("et", expr("timestamp_micros(ts div 1000)"))
          .withWatermark("et", "1 hour")
          .groupBy(window(col("et"), "1 hour")).count()
        val q = stream.writeStream.format("memory").queryName(name)
          .outputMode("complete")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.table(name)
          .select(unix_millis(col("window.start")).as("hour_ms"),
            col("count").as("n_events"))
      },
      Some("""SELECT epoch_ms(date_trunc('hour', ts)) AS hour_ms, count(*) AS n_events
        |FROM events GROUP BY 1""".stripMargin))
  )
}
