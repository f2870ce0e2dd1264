package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_millis, unix_millis}
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

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

  /** Event-time column (`TimestampType`, microsecond precision) for the
    * events table's `ts`, tolerant to every physical encoding the driver
    * has shipped:
    *   - `LongType` — legacy TIMESTAMP(NANOS) parquet, which Spark reads
    *     as a raw nanosecond LONG under
    *     `spark.sql.legacy.parquet.nanosAsLong`;
    *   - `TimestampNTZType` — `timestamp[us]` parquet with no UTC
    *     adjustment flag. The session clock is pinned UTC
    *     (LocalSession), so the NTZ→LTZ cast is value-preserving and
    *     matches DuckDB's `epoch_ms` on the same naive timestamps;
    *   - `TimestampType` — `timestamp[us]` with UTC adjustment.
    */
  def eventTime(t: DataType): Column = t match {
    case LongType         => expr("timestamp_micros(ts div 1000)")
    case TimestampNTZType => col("ts").cast(TimestampType)
    case _                => col("ts")
  }

  /** [[eventTime]] floored to millisecond precision — for queries whose
    * DuckDB oracle works on `epoch_ms(ts)` values, where a
    * micro-precision boundary decision would diverge between engines.
    */
  def eventTimeMs(t: DataType): Column = t match {
    case LongType => expr("timestamp_millis(ts div 1000000)")
    case t2       => timestamp_millis(unix_millis(eventTime(t2)))
  }

  /** events with a BIGINT epoch-millis column `ms`, matching DuckDB's
    * `epoch_ms(ts)` exactly for every encoding [[eventTime]] handles.
    */
  def withMs(e: DataFrame): DataFrame =
    e.schema("ts").dataType match {
      case LongType => e.withColumn("ms", expr("ts div 1000000"))
      case t        => e.withColumn("ms", unix_millis(eventTime(t)))
    }

  def eventsMs(s: SparkSession, d: String): DataFrame = withMs(events(s, d))
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
