package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.RangeRank

/** RangeRank (distributed global rank without a single-partition
  * window) must be BIT-IDENTICAL to `row_number() OVER (ORDER BY …)`
  * — including NULL ordering and running sums — on every input shape:
  * spread scores (multi-bucket path), constant scores (one-bucket
  * degenerate), NULL scores, all-NULL and empty inputs.
  */
class RangeRankSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def referenceRank(df: org.apache.spark.sql.DataFrame,
                            descending: Boolean): org.apache.spark.sql.DataFrame = {
    val order = if (descending) Seq(col("score").desc, col("id").asc)
      else Seq(col("score").asc, col("id").asc)
    val w = Window.orderBy(order: _*)
    df.withColumn("rnk_ref", row_number().over(w).cast("long"))
      .withColumn("cum_ref",
        sum("v").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("long"))
  }

  private def check(df: org.apache.spark.sql.DataFrame, descending: Boolean,
                    nb: Int = 8): Unit = {
    val got = RangeRank.withGlobalRank(df, col("score"), col("id"),
      descending, "rnk", cum = Some((col("v"), "cum")), nb = nb)
    val joined = referenceRank(df, descending)
      .join(got.select("id", "rnk", "cum"), Seq("id"))
    val bad = joined.filter(col("rnk") =!= col("rnk_ref") ||
      col("cum") =!= col("cum_ref"))
    assert(bad.isEmpty, s"mismatches: ${bad.collect().mkString(", ")}")
    assert(got.count() == df.count(), "RangeRank dropped rows")
  }

  private def mkDf(rows: Seq[(Long, java.lang.Double, Int)]) =
    rows.toDF("id", "score", "v").repartition(7)

  test("multi-bucket path matches global window (asc + desc)") {
    val rows = (1L to 500L).map(i =>
      (i, java.lang.Double.valueOf((i * 37 % 101).toDouble), (i % 3).toInt))
    check(mkDf(rows), descending = false)
    check(mkDf(rows), descending = true)
  }

  test("ties across the score range keep deterministic tie-break") {
    val rows = (1L to 300L).map(i =>
      (i, java.lang.Double.valueOf((i % 5).toDouble), 1))
    check(mkDf(rows), descending = false)
    check(mkDf(rows), descending = true)
  }

  test("constant score collapses to one bucket but still ranks") {
    val rows = (1L to 50L).map(i => (i, java.lang.Double.valueOf(7.0), 1))
    check(mkDf(rows), descending = false)
  }

  test("NULL scores ranked like the global window, not dropped") {
    val rows: Seq[(Long, java.lang.Double, Int)] =
      (1L to 100L).map(i => (i, java.lang.Double.valueOf((i % 11).toDouble), 1)) ++
        Seq((101L, null: java.lang.Double, 1), (102L, null: java.lang.Double, 1))
    check(mkDf(rows), descending = false) // nulls-first asc
    check(mkDf(rows), descending = true)  // nulls-last desc
  }

  test("all-NULL input ranks by tie column") {
    val rows = (1L to 20L).map(i => (i, null: java.lang.Double, 1))
    check(mkDf(rows), descending = false)
  }

  test("NULL cum values: later buckets still carry earlier sums forward") {
    // v is NULL for the entire low-score range: those buckets' sums are
    // NULL-aggregates and must contribute 0 to later buckets' offsets
    // (not poison them to NULL). Reference = global window semantics,
    // except the all-NULL PREFIX rows themselves, where SQL sum() is
    // NULL and RangeRank deliberately yields 0 (documented coalesce).
    val rows = (1L to 200L).map { i =>
      val v: java.lang.Long = if (i <= 100) null else java.lang.Long.valueOf(i)
      (i, java.lang.Double.valueOf(i.toDouble), v)
    }
    val df = rows.toDF("id", "score", "v").repartition(7)
    val got = RangeRank.withGlobalRank(df, col("score"), col("id"),
      descending = false, "rnk", cum = Some((col("v"), "cum")), nb = 8)
    val w = Window.orderBy(col("score").asc, col("id").asc)
    val ref = df.withColumn("cum_ref",
      sum("v").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"))
    val joined = ref.join(got.select("id", "cum"), Seq("id"))
    // non-prefix rows (id > 100): exact match with the global window
    val bad = joined.filter(col("id") > 100 && col("cum") =!= col("cum_ref"))
    assert(bad.isEmpty, s"mismatches: ${bad.collect().mkString(", ")}")
    // all-NULL prefix: 0, never NULL (getAs would have unboxed garbage)
    val prefix = got.filter(col("id") <= 100).select("cum").collect()
    assert(prefix.forall(r => !r.isNullAt(0) && r.getLong(0) == 0L))
  }

  test("bucket count never changes values: nb=1, 32, 256 and auto agree") {
    // nb only affects partitioning; ranks/sums must be identical at any
    // bucket count — including nb=1 (the degenerate global window) and
    // nb far above the row count (mostly-empty buckets).
    val rows = (1L to 400L).map(i =>
      (i, java.lang.Double.valueOf((i * 53 % 89).toDouble), (i % 5).toInt))
    check(mkDf(rows), descending = false, nb = 1)
    check(mkDf(rows), descending = false, nb = 32)
    check(mkDf(rows), descending = false, nb = 256)
    check(mkDf(rows), descending = true, nb = 256)
    // default (nb <= 0) resolves to max(32, defaultParallelism)
    check(mkDf(rows), descending = false, nb = 0)
  }

  test("empty input returns empty with the rank columns present") {
    val df = mkDf(Seq.empty)
    val got = RangeRank.withGlobalRank(df, col("score"), col("id"),
      descending = false, "rnk", cum = Some((col("v"), "cum")))
    assert(got.count() == 0)
    assert(got.columns.contains("rnk") && got.columns.contains("cum"))
  }

  test("plan has no single-partition exchange feeding a window") {
    val rows = (1L to 200L).map(i =>
      (i, java.lang.Double.valueOf((i % 13).toDouble), 1))
    val got = RangeRank.withGlobalRank(mkDf(rows), col("score"), col("id"),
      descending = false, "rnk")
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"RangeRank plan routes rows through one partition:\n$plan")
  }
}
