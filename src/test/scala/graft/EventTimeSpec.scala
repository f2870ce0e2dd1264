package graft

import java.time.{Instant, LocalDateTime, ZoneOffset}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The driver has shipped the events table's `ts` under three physical
  * parquet encodings across rounds: TIMESTAMP(NANOS) (read as a raw
  * LONG under `nanosAsLong`), `timestamp[us]` without the UTC flag
  * (read as TIMESTAMP_NTZ), and `timestamp[us]` with it (TIMESTAMP).
  * `Tables.eventTime` / `eventTimeMs` / `withMs` must agree bit-for-bit
  * across all three under the UTC-pinned session.
  */
class EventTimeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  // epoch-microsecond instants incl. a sub-millisecond remainder (…456 µs)
  // so ms truncation is exercised, and one pre-2000 / one recent value.
  private val micros = Seq(0L, 946_684_800_000_000L, 1_700_000_000_123_456L)

  private def dfOf(t: DataType): org.apache.spark.sql.DataFrame = {
    val rows = micros.map { us =>
      val v: Any = t match {
        case LongType         => us * 1000L // nanos
        case TimestampNTZType => LocalDateTime.ofEpochSecond(
          us / 1_000_000L, (us % 1_000_000L).toInt * 1000, ZoneOffset.UTC)
        case _                => Instant.ofEpochSecond(
          us / 1_000_000L, (us % 1_000_000L) * 1000L)
      }
      Row(v)
    }
    spark.createDataFrame(rows.asJava, StructType(Seq(StructField("ts", t))))
  }

  private val encodings = Seq(LongType, TimestampType, TimestampNTZType)

  test("withMs yields identical epoch-ms for all three ts encodings") {
    val expected = micros.map(_ / 1000L)
    for (t <- encodings) {
      val ms = Tables.withMs(dfOf(t)).select("ms").collect().map(_.getLong(0)).toSeq
      assert(ms == expected, s"encoding $t")
    }
  }

  test("eventTime preserves microseconds and agrees across encodings") {
    for (t <- encodings) {
      val us = dfOf(t)
        .select(unix_micros(Tables.eventTime(t)).as("us"))
        .collect().map(_.getLong(0)).toSeq
      assert(us == micros, s"encoding $t")
    }
  }

  test("eventTimeMs floors to millisecond precision identically") {
    val expected = micros.map(us => (us / 1000L) * 1000L)
    for (t <- encodings) {
      val us = dfOf(t)
        .select(unix_micros(Tables.eventTimeMs(t)).as("us"))
        .collect().map(_.getLong(0)).toSeq
      assert(us == expected, s"encoding $t")
    }
  }
}
