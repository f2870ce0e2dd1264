package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Table-maintenance jobs over parquet directories (the BASELINE.json
  * north-star approach: "Spark DataFrame read/write + compaction jobs" —
  * the storage/table format itself is external, no Iceberg jars ship in
  * this environment).
  *
  * At 100 TB the dominant small-table pathology is the small-files
  * problem: thousands of kilobyte parquet files per partition from
  * streaming/micro-batch writers. `compact` rewrites a directory to a
  * target in-file size using the actual observed bytes-per-row, and
  * `manifest` exposes the file-level metadata a table format would
  * track (per-file rows/bytes) as a DataFrame for monitoring and
  * compaction triggers.
  */
object Compaction {

  final case class FileMeta(path: String, bytes: Long)

  /** File-level manifest of a parquet directory. Listed through the
    * Hadoop `FileSystem` resolved from the path's own scheme, so the
    * same code walks local dirs in tests and HDFS/S3A prefixes where a
    * 100 TB table actually lives (a `java.io.File` walk would silently
    * return empty on any non-local URI).
    */
  def manifest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files =
      if (!fs.exists(path)) Seq.empty[FileMeta]
      else fs.listStatus(path).toSeq
        .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
        // full URI string, scheme + authority included: a manifest row
        // from s3a://bucket/tbl must stay resolvable as-is (the bare
        // URI *path* would silently re-resolve against the default FS)
        .map(st => FileMeta(st.getPath.toString, st.getLen))
    spark.createDataset(files).toDF()
  }

  /** Rewrite `inDir` into `outDir` targeting `targetFileBytes` per
    * output file. File count is derived from observed on-disk size —
    * repartition(n) gives size-balanced round-robin output files.
    * Returns (inputFiles, outputFiles).
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              targetFileBytes: Long = 128L * 1024 * 1024): (Long, Long) = {
    val inFiles = manifest(spark, inDir)
    val totalBytes = inFiles.agg(sum("bytes")).collect().head.getLong(0)
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    spark.read.parquet(inDir).repartition(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(outDir)
    (inFiles.count(), manifest(spark, outDir).count())
  }

  /** Small-file ratio — the compaction trigger a table format's
    * metadata layer would evaluate.
    */
  def smallFileStats(spark: SparkSession, dir: String, smallBytes: Long): DataFrame = {
    manifest(spark, dir).agg(
      count(lit(1)).as("n_files"),
      sum(when(col("bytes") < smallBytes, 1).otherwise(0)).as("n_small"),
      sum("bytes").as("total_bytes"))
  }
}
