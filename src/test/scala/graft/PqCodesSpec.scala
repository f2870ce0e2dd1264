package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SimilaritySearch

/** The broadcast-native PQ encode/LUT path (expressions.PqEncode /
  * PqLuts) vs the literal m×codebookSize tree: bit-identical values,
  * correct tie-breaks, and — the point of the native path — whole-stage
  * codegen intact at FAISS-typical m=16/codebookSize=256, far past the
  * literal tree's 4096-term cliff.
  */
class PqCodesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def synth(n: Int, dims: Int = 16): org.apache.spark.sql.DataFrame = {
    val rng = new scala.util.Random(13)
    val rows = (0 until n).map { i =>
      // id 3 all-zero; id 40 duplicates id 10 (exact-tie candidates)
      val v = if (i == 3) Array.fill(dims)(0f)
        else Array.fill(dims)(rng.nextFloat() * 2 - 1)
      (i.toLong, v)
    }
    rows.map { case (i, v) => if (i == 40L) (i, rows(10)._2.clone()) else (i, v) }
      .toDF("vec_id", "embedding")
  }

  private def forcing[T](path: String)(f: => T): T = {
    val prev = SimilaritySearch.pqPathOverride
    SimilaritySearch.pqPathOverride = Some(path)
    try f finally SimilaritySearch.pqPathOverride = prev
  }

  private def topk(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSeq.sortBy(t => (t._1, t._4))

  test("ivfPqTopK: literal and native PQ paths are bit-identical") {
    val emb = synth(80)
    def run() = topk(SimilaritySearch.ivfPqTopK(emb, col("vec_id") < 6, k = 4,
      nlist = 6, nprobe = 3, m = 4, codebookSize = 8, refine = 12))
    assert(forcing("literal")(run()) == forcing("native")(run()))
  }

  test("ivfRPqTopK: literal and native PQ paths are bit-identical") {
    val emb = synth(80)
    def run() = topk(SimilaritySearch.ivfRPqTopK(emb, col("vec_id") < 6, k = 4,
      nlist = 6, nprobe = 3, m = 4, codebookSize = 8, refine = 12))
    assert(forcing("literal")(run()) == forcing("native")(run()))
  }

  test("graft_pq_encode: argmin ties break to the LOWEST code id") {
    // codebook entries 0 and 1 identical in every subspace: the argmin
    // distance to them is exactly equal for every row, so code 1 must
    // never win
    val cbDup: Seq[Seq[Seq[Float]]] = Seq(
      Seq(Seq(0.5f, -0.25f), Seq(0.5f, -0.25f), Seq(0.1f, 0.9f)),
      Seq(Seq(-0.3f, 0.7f), Seq(-0.3f, 0.7f), Seq(0.4f, 0.2f)))
    val df = synth(30, dims = 4)
    val codes = df.select(
      call_function("graft_pq_encode", col("embedding"), typedLit(cbDup)).as("c"))
      .collect().map(_.getSeq[Int](0))
    assert(codes.forall(c => c.forall(_ != 1)),
      s"higher-id twin entry won a tie: ${codes.filter(_.contains(1)).take(3).mkString(";")}")
    assert(codes.forall(_.length == 2))
  }

  test("graft_pq_luts values equal graft_dotq of the explicit slices") {
    val cbT: Seq[Seq[Seq[Float]]] = Seq(
      Seq(Seq(0.5f, -0.25f), Seq(0.1f, 0.9f)),
      Seq(Seq(-0.3f, 0.7f), Seq(0.4f, 0.2f)))
    val df = synth(25, dims = 4)
    val nat = df.select(
      call_function("graft_pq_luts", col("embedding"), typedLit(cbT)).as("l"))
      .collect().map(_.getSeq[scala.collection.Seq[Long]](0).map(_.toSeq).toSeq)
    val ref = df.select(array((0 until 2).map { mi =>
        array((0 until 2).map { ki =>
          call_function("graft_dotq", slice(col("embedding"), mi * 2 + 1, 2),
            typedLit(cbT(mi)(ki)))
        }: _*)
      }: _*).as("l"))
      .collect().map(_.getSeq[scala.collection.Seq[Long]](0).map(_.toSeq).toSeq)
    assert(nat.toSeq == ref.toSeq)
  }

  test("native encode/LUT accept array<double> vectors (the residual shape)") {
    val emb = synth(40, dims = 8)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val cbD: Seq[Seq[Seq[Double]]] = Seq(
      Seq(Seq(0.25, -0.5, 0.125, 0.0), Seq(-0.75, 0.3, 0.6, -0.2)),
      Seq(Seq(0.1, 0.9, -0.4, 0.05), Seq(0.33, -0.66, 0.99, 0.11)))
    val out = emb.select(
      call_function("graft_pq_encode", col("embedding"), typedLit(cbD)).as("c"),
      call_function("graft_pq_luts", col("embedding"), typedLit(cbD)).as("l"))
      .collect()
    assert(out.forall(_.getSeq[Int](0).length == 2))
    assert(out.forall(_.getSeq[scala.collection.Seq[Long]](1).forall(_.length == 2)))
  }

  test("short vectors truncate like slice + graft_dotq (literal parity)") {
    // 5-dim vectors against sub=2, m=3: subspace 2 sees only element 4
    val rows = Seq((0L, Array(0.1f, -0.2f, 0.3f, -0.4f, 0.5f)),
      (1L, Array(1.0f, 1.0f, 1.0f, 1.0f, 1.0f)))
    val df = rows.toDF("vec_id", "embedding")
    val cbT: Seq[Seq[Seq[Float]]] = Seq(
      Seq(Seq(0.5f, -0.25f), Seq(0.1f, 0.9f)),
      Seq(Seq(-0.3f, 0.7f), Seq(0.4f, 0.2f)),
      Seq(Seq(0.8f, -0.1f), Seq(-0.6f, 0.5f)))
    val nat = df.select(
      call_function("graft_pq_luts", col("embedding"), typedLit(cbT)).as("l"))
      .collect().map(_.getSeq[scala.collection.Seq[Long]](0).map(_.toSeq).toSeq)
    val ref = df.select(array((0 until 3).map { mi =>
        array((0 until 2).map { ki =>
          call_function("graft_dotq", slice(col("embedding"), mi * 2 + 1, 2),
            typedLit(cbT(mi)(ki)))
        }: _*)
      }: _*).as("l"))
      .collect().map(_.getSeq[scala.collection.Seq[Long]](0).map(_.toSeq).toSeq)
    assert(nat.toSeq == ref.toSeq)
  }

  test("encode stays whole-stage codegen'd at m=16/codebookSize=256") {
    // the reason the native path exists: the literal tree at
    // m=16/cbSize=256 is 4096 struct terms — past the codegen cliff;
    // the native expression is one constant-size nested loop. Assert
    // the Project carrying graft_pq_encode sits INSIDE a codegen stage
    // on a parquet-backed plan (a LocalRelation would constant-fold).
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val model = SimilaritySearch.ivfPqModel(emb, nlist = 8, m = 16, codebookSize = 256)
    val out = SimilaritySearch.ivfPqEncode(emb, model)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("graft_pq_encode"), s"must use the native expression:\n$plan")
    val lines = plan.linesIterator.filter(_.contains("graft_pq_encode")).toSeq
    assert(lines.nonEmpty && lines.forall(_.trim.matches("""^[+\-:\s]*\*\(\d+\).*""")),
      s"graft_pq_encode must be inside WholeStageCodegen:\n${lines.mkString("\n")}")
    // and it actually runs: every row coded, every code in range
    val rowsOut = out.collect()
    assert(rowsOut.length == 500)
    assert(rowsOut.forall { r =>
      val c = r.getSeq[Int](2)
      c.length == 16 && c.forall(k => k >= 0 && k < 256)
    })
  }
}
