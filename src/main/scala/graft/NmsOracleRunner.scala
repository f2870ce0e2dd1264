package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.SparkSession
import graft.operators.{DetBox, Nms}

/** Fixture runner for tools/nms_oracle.py. */
object NmsOracleRunner {
  def main(args: Array[String]): Unit = {
    val fix = if (args.nonEmpty) args(0) else "/tmp/nms_fixture"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val boxes = Files.readAllLines(Paths.get(s"$fix/boxes.csv")).asScala.map { l =>
      val p = l.split(",")
      DetBox("s", p(0), p(1).toInt, p(2).toDouble, p(3).toDouble,
        p(4).toDouble, p(5).toDouble, p(6).toDouble)
    }.toSeq
    val ds = spark.createDataset(boxes)
    def dump(rows: Array[DetBox], file: String): Unit =
      Files.writeString(Paths.get(s"$fix/$file"),
        rows.sortBy(r => (r.frame.toInt, r.id))
          .map(r => s"${r.frame},${r.id}").mkString("", "\n", "\n"))
    dump(Nms.nms(ds, 0.5).collect(), "scala_nms.csv")
    dump(Nms.removeNested(ds, 0.5).collect(), "scala_nested.csv")
    println("dumped")
    spark.stop()
  }
}
