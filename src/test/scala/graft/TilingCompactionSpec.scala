package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Tiling
import graft.sources.Compaction

/** P10 tiling generator + compaction maintenance jobs. */
class TilingCompactionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("tileOrigins: full coverage with edge snapping, duplicates preserved") {
    // 1000x1000, window 512, overlap 0.35 -> step 332: offsets 0,332,664,996
    // 996+512>1000 snaps to 488; 664+512>1000 snaps to 488 too (duplicate)
    val t = Tiling.tileOrigins(1000, 1000, 512, 512, 0.35)
    val ys = t.map(_._2).distinct.sorted
    assert(ys == Seq(0, 332, 488))
    assert(t.size == 16) // 4x4 offsets incl. duplicated snapped edge
    // every pixel covered
    assert(t.exists { case (x, y) => x <= 488 && y <= 488 })
  }

  test("tiles: plan generator matches pure generator") {
    import spark.implicits._
    val imgs = Seq((1, 1000, 700), (2, 400, 400)).toDF("img_id", "h", "w")
    val out = Tiling.tiles(imgs, "h", "w", 512, 512, 0.35)
      .select("img_id", "tile_x", "tile_y", "direct")
      .collect().groupBy(_.getInt(0))
    val expected1 = Tiling.tileOrigins(1000, 700, 512, 512, 0.35)
    assert(out(1).length == expected1.size)
    assert(out(1).map(r => (r.getInt(1), r.getInt(2))).sorted.toSeq == expected1.sorted)
    assert(out(1).forall(!_.getBoolean(3)))
    // small image: one direct tile at origin
    assert(out(2).map(r => (r.getInt(1), r.getInt(2), r.getBoolean(3))).toSeq
      == Seq((0, 0, true)))
  }

  test("compaction: many small files -> few size-targeted files, data preserved") {
    import spark.implicits._
    val in = Files.createTempDirectory("compact_in").toString
    val out = Files.createTempDirectory("compact_out").toString
    spark.range(10000).toDF("id").repartition(40).write.mode("overwrite").parquet(in)
    val (nIn, nOut) = Compaction.compact(spark, in, out, targetFileBytes = 64 * 1024)
    assert(nIn == 40)
    assert(nOut < nIn)
    assert(spark.read.parquet(out).count() == 10000)
    val stats = Compaction.smallFileStats(spark, in, 16 * 1024).collect().head
    assert(stats.getLong(0) == 40)
  }
}
