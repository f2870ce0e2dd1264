package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table catalog over a driver-provided scale-factor directory.
  *
  * Analogous (in the path-convention-discovery sense only) to the
  * reference's `get_sequences` (src/utils/helpers.py:575-662), which
  * maps sequence directories to image/gt/det/embedding file paths; here
  * the namespace is one parquet file per table name. All reads are plain
  * `spark.read.parquet` so Catalyst gets full predicate pushdown /
  * column pruning into the scan — at 100 TB these tables would be
  * partitioned directories instead of single files and the same code
  * holds (parquet directory scans, partition pruning included).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame     = load(s, d, "events")

  /** events with a BIGINT epoch-millis column `ms`. The driver's parquet
    * carries TIMESTAMP(NANOS), which Spark only reads as a raw
    * nanosecond LONG (`spark.sql.legacy.parquet.nanosAsLong`) — derive
    * ms with integer division so the value matches DuckDB's
    * `epoch_ms(ts)` exactly.
    */
  def eventsMs(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    e.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        e.withColumn("ms", org.apache.spark.sql.functions.expr("ts div 1000000"))
      case _ =>
        e.withColumn("ms", org.apache.spark.sql.functions.unix_millis(
          org.apache.spark.sql.functions.col("ts")))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
