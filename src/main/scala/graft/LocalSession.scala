package graft

import org.apache.spark.sql.SparkSession

/** One place for the local-session bootstrap shared by every runnable
  * main (Bench / Verify / Prof / Anchor): master threads == shuffle
  * partitions (sized to the machine, not Spark's 200 default),
  * TIMESTAMP(NANOS) parquet reads, UTC, extensions registered. Keeping
  * it single-sourced means a new required flag lands everywhere at once.
  */
object LocalSession {
  def build(cpus: String, logLevel: String = "WARN"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftExtensions.register(spark)
    spark.sparkContext.setLogLevel(logLevel)
    spark
  }
}
