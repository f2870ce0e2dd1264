package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking without a single-partition window.
  *
  * `row_number() OVER (ORDER BY …)` (and global running sums) route
  * every row through ONE task — the classic 100 TB scale-killer. This
  * helper computes the identical values with a range-partitioned plan:
  *
  *  1. bucket rows by `width_bucket` over the [min, max] score range
  *     (order-preserving: every row in bucket i sorts before every row
  *     in bucket i+1, because the bucket is a function of the score);
  *  2. run the window PER BUCKET (parallel, AQE-coalesced);
  *  3. collect the tiny per-bucket (count, partial-sum) table — ≤ `nb`
  *     rows, a bounded model-artifact collect like IVF's centroids —
  *     prefix-sum it on the driver, and broadcast-join the offsets back.
  *
  * rank = within-bucket row_number + #rows in earlier buckets; the
  * running sum gets the same treatment. Values are bit-identical to the
  * global-window form (same total order, same tie-break), so oracle SQL
  * written against `row_number() OVER (ORDER BY …)` still hash-matches.
  *
  * Degenerate skew (all scores equal) collapses to one bucket — i.e. the
  * global window this replaces — but any spread re-parallelizes; `nb`
  * defaults to the context's parallelism (min 32) so the rank stage
  * scales with the cluster instead of capping at a constant.
  */
object RangeRank {

  /** Adds global-order `rnkName` (LongType row_number over
    * `scoreCol [asc|desc], tieCol asc`) and, when `cum` is given,
    * a global running sum of `cum._1` named `cum._2` (inclusive of the
    * current row, matching `ROWS UNBOUNDED PRECEDING AND CURRENT ROW`).
    *
    * `nb <= 0` (the default) resolves to max(32, defaultParallelism):
    * a fixed 32 caps the rank stage at 32-way parallelism on a
    * 1000-executor cluster, while tracking the context's parallelism
    * keeps every core busy at any size. The bucket count only affects
    * the PARTITIONING, never the values — ranks are bit-identical at
    * any nb (RangeRankSpec asserts 1/32/256 agree).
    */
  def withGlobalRank(df: DataFrame, scoreCol: Column, tieCol: Column,
                     descending: Boolean, rnkName: String,
                     cum: Option[(Column, String)] = None,
                     nb: Int = 0): DataFrame = {
    val nBuckets =
      if (nb > 0) nb
      else math.max(32, df.sparkSession.sparkContext.defaultParallelism)
    val bounds = df.agg(min(scoreCol).cast("double"), max(scoreCol).cast("double")).head()
    // min==NULL means empty input OR every score NULL; either way all
    // rows (if any) land in the NULL bucket below and rank by tieCol.
    val (lo, hi) =
      if (bounds.isNullAt(0)) (0.0, 0.0)
      else (bounds.getDouble(0), bounds.getDouble(1))
    // width_bucket returns BIGINT — cast to int so both branches (and
    // the driver-side getAs[Int]) agree on IntegerType.
    val nonNullBkt =
      if (lo == hi) lit(1)
      else least(greatest(call_function("width_bucket",
        scoreCol.cast("double"), lit(lo), lit(hi), lit(nBuckets)), lit(1)), lit(nBuckets))
        .cast("int")
    // NULL scores go to bucket 0, which sorts FIRST under ascending
    // bucket order and LAST under descending — exactly where Spark's
    // default null ordering (asc nulls-first / desc nulls-last) puts
    // them in the global-window form this replicates. Without this,
    // NULL rows get a NULL bucket and vanish in the offset inner join.
    val bkt = when(scoreCol.isNull, lit(0)).otherwise(nonNullBkt)
    val sumExpr = cum.map(_._1).getOrElse(lit(0))
    val tagged = df.withColumn("__bkt", bkt)
    // ≤ nb rows: the only data that ever leaves the executors
    // coalesce: a bucket whose cum values are ALL NULL aggregates to a
    // NULL sum — it must contribute 0 to later buckets' offsets, not
    // poison them (and not silently unbox to 0 only on the driver).
    val perBucket = tagged.groupBy("__bkt")
      .agg(count(lit(1)).as("__cnt"),
        coalesce(sum(sumExpr).cast("long"), lit(0L)).as("__sum"))
      .collect()
      .map(r => (r.getAs[Int]("__bkt"), r.getAs[Long]("__cnt"), r.getAs[Long]("__sum")))
      .sortBy(r => if (descending) -r._1 else r._1)
    val offsets = perBucket
      .scanLeft((0, 0L, 0L)) { case ((_, co, so), (b, c, s)) => (b, co + c, so + s) }
      .sliding(2).collect { case Array((_, co, so), (b, _, _)) => (b, co, so) }
      .toSeq
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = broadcast(offsets.toDF("__bkt", "__cnt_off", "__sum_off"))
    val order = if (descending) Seq(scoreCol.desc, tieCol.asc)
      else Seq(scoreCol.asc, tieCol.asc)
    val w = Window.partitionBy("__bkt").orderBy(order: _*)
    val ranked = tagged.join(offDf, Seq("__bkt"))
      .withColumn(rnkName,
        (row_number().over(w).cast("long") + col("__cnt_off")).cast("long"))
    // coalesce: with NULL cum values, `sum() OVER` is NULL until the
    // first non-NULL row — the global-window form carries EARLIER
    // BUCKETS' sums forward through those rows, so the per-bucket form
    // must yield __sum_off there, not NULL.
    val withCum = cum.fold(ranked) { case (c, name) =>
      ranked.withColumn(name,
        (coalesce(
          sum(c).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("long"), lit(0L)) + col("__sum_off")).cast("long"))
    }
    withCum.drop("__bkt", "__cnt_off", "__sum_off")
  }
}
