package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.SparkSession
import graft.operators.{Tracker, TrackerConfig, TrackerIn}

/** Fixture runner for the independent Python tracker oracle
  * (tools/tracker_oracle.py): reads its detections + embeddings,
  * runs the Scala kernel with reference defaults, writes a
  * comparable CSV.
  */
object TrackOracle {
  def main(args: Array[String]): Unit = {
    val fix = if (args.nonEmpty) args(0) else "/tmp/trk_fixture"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // embs.json: {"frame_id": [floats...]}
    val raw = Files.readString(Paths.get(s"$fix/embs.json"))
    val embs: Map[String, Array[Float]] = raw.stripPrefix("{").stripSuffix("}")
      .split("\\],\\s*\"").map { chunk =>
        val cleaned = chunk.replaceAll("[\"{}\\]]", "")
        val Array(k, vs) = cleaned.split(":\\s*\\[", 2)
        k.trim -> vs.split(",").map(_.trim.toFloat)
      }.toMap

    val dets = Files.readAllLines(Paths.get(s"$fix/det.csv")).asScala.map { line =>
      val p = line.split(",")
      TrackerIn("seq0", p(0), p(1).toInt, p(2).toDouble, p(3).toDouble,
        p(4).toDouble, p(5).toDouble, p(6).toDouble,
        embs.getOrElse(s"${p(0)}_${p(1)}", null))
    }.toSeq

    def run(cfg: TrackerConfig, file: String): Unit = {
      val out = Tracker.track(spark.createDataset(dets), cfg)
        .collect().sortBy(r => (r.frame, r.trackId))
      val lines = out.map(r =>
        s"${r.frame},${r.trackId},${r.x},${r.y},${r.w},${r.h},${r.conf}")
      Files.writeString(Paths.get(s"$fix/$file"), lines.mkString("", "\n", "\n"))
      println(s"wrote ${out.length} rows to $file")
    }
    run(TrackerConfig(), "scala_out.csv")
    run(TrackerConfig(bidirectional = false), "scala_out_greedy.csv")
    spark.stop()
  }
}
