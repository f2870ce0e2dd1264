package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SimilaritySearch

/** The broadcast-native centroid path (expressions.CentroidScores) vs
  * the literal-struct path: bit-identical values, correct tie-breaks,
  * and — the point of the native path — whole-stage codegen intact at
  * k far past the literal path's expression-tree cliff.
  */
class CentroidScoresSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def synth(n: Int, dims: Int = 16): org.apache.spark.sql.DataFrame = {
    val rng = new scala.util.Random(7)
    val rows = (0 until n).map { i =>
      // id 3 all-zero (norm-0 guard), id 40 duplicates id 10 (exact-tie
      // cosine 1.0 against any centroid they share)
      val v = if (i == 3) Array.fill(dims)(0f)
        else Array.fill(dims)(rng.nextFloat() * 2 - 1)
      (i.toLong, v)
    }
    val withDup = rows.map { case (i, v) =>
      if (i == 40L) (i, rows(10)._2.clone()) else (i, v)
    }
    withDup.toDF("vec_id", "embedding")
  }

  private def forcing[T](path: String)(f: => T): T = {
    val prev = SimilaritySearch.centroidPathOverride
    SimilaritySearch.centroidPathOverride = Some(path)
    try f finally SimilaritySearch.centroidPathOverride = prev
  }

  private def collectAssign(emb: org.apache.spark.sql.DataFrame, k: Int,
                            iters: Int): Seq[(Long, Int, Double)] =
    SimilaritySearch.kmeansAssign(emb, k, iters)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq.sortBy(_._1)

  test("kmeansAssign: literal and native paths are bit-identical (incl. zero vec + dup)") {
    val emb = synth(80)
    for (iters <- Seq(1, 3)) {
      val lit = forcing("literal") { collectAssign(emb, 8, iters) }
      val nat = forcing("native") { collectAssign(emb, 8, iters) }
      assert(lit == nat, s"paths diverge at iters=$iters")
    }
  }

  test("ivfTopK: literal and native paths produce identical results") {
    val emb = synth(80)
    def run() = SimilaritySearch.ivfTopK(emb, col("vec_id") < 6, k = 4,
        nlist = 6, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSeq.sortBy(t => (t._1, t._4))
    assert(forcing("literal")(run()) == forcing("native")(run()))
  }

  test("ivfPqTopK: literal and native paths produce identical results") {
    val emb = synth(80)
    def run() = SimilaritySearch.ivfPqTopK(emb, col("vec_id") < 6, k = 4,
        nlist = 6, nprobe = 3, m = 4, codebookSize = 8, refine = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSeq.sortBy(t => (t._1, t._4))
    assert(forcing("literal")(run()) == forcing("native")(run()))
  }

  test("argmax ties break to the lowest cid on both paths") {
    // centroids 0 and 1 are IDENTICAL vectors: every row's cosine to
    // them is exactly equal, so the winner must always be cid 0 (never
    // 1) under either path
    val dims = 8
    val base = Array.tabulate(dims)(i => 0.1f * (i + 1))
    val rng = new scala.util.Random(11)
    val rows = Seq((0L, base.clone()), (1L, base.clone())) ++
      (2 until 40).map(i => (i.toLong, Array.fill(dims)(rng.nextFloat() - 0.5f)))
    val emb = rows.toDF("vec_id", "embedding")
    for (path <- Seq("literal", "native")) {
      val won = forcing(path) {
        // seeding="first" pins the twin vectors (ids 0 and 1) as the
        // two centroids — the tie property under test is the argmax
        // path's, independent of the default hash seed draw
        SimilaritySearch.kmeansAssign(emb, k = 2, iters = 1, seeding = "first")
          .collect().map(_.getInt(1)).toSet
      }
      assert(!won.contains(1), s"$path path let the higher-cid twin win: $won")
    }
  }

  test("native round9 matches Spark round(_, 9) on halfway ties and extremes") {
    val vals = Seq(0.1234567885, -0.1234567885, 0.9999999995, -0.9999999995,
      0.0000000005, -0.0000000005, 1.0, -1.0, 0.0, 0.5678913245, 1e-12, -1e-12)
    val sparkSide = vals.toDF("x").select(round(col("x"), 9)).collect().map(_.getDouble(0))
    val nativeSide = vals.map(graft.expressions.CentroidExprBase.round9)
    assert(sparkSide.toSeq == nativeSide)
  }

  test("assignment stays whole-stage codegen'd at k=256") {
    // the reason the native path exists: at k=256 the literal path's
    // 256-struct expression tree is already past sane codegen size,
    // the native expression is one constant-size loop — assert the
    // Project carrying graft_cell_argmax sits INSIDE a codegen stage
    // (executedPlan marks codegen'd operators with a `*(n)` prefix)
    // parquet-backed input (a LocalRelation would be constant-folded
    // into a LocalTableScan and show no plan at all)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = SimilaritySearch.kmeansAssign(emb, k = 256, iters = 1)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("graft_cell_argmax"), s"k=256 must use the native expression:\n$plan")
    val lines = plan.linesIterator.filter(_.contains("graft_cell_argmax")).toSeq
    assert(lines.nonEmpty && lines.forall(_.trim.matches("""^[+\-:\s]*\*\(\d+\).*""")),
      s"graft_cell_argmax must be inside WholeStageCodegen:\n${lines.mkString("\n")}")
    // and it actually runs: every row assigned, cid in range
    val rowsOut = out.collect()
    assert(rowsOut.length == 500)
    assert(rowsOut.forall(r => r.getInt(1) >= 0 && r.getInt(1) < 256))
  }

  test("native path accepts array<double> vectors like the literal path") {
    val emb = synth(60).select(col("vec_id"),
      col("embedding").cast("array<double>").as("embedding"))
    val lit = forcing("literal") { collectAssign(emb, 4, 2) }
    val nat = forcing("native") { collectAssign(emb, 4, 2) }
    assert(lit == nat)
  }
}
