package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** The Bloom-prefilter decontamination tier (d23) vs the exact
  * broadcast form (d10): identical answers at any sketch size (false
  * positives die in the verify join), a map-side might_contain
  * predicate actually in the plan, and sane empty-eval behavior.
  */
class BloomDecontamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select("doc_id", "source", "n_contaminated_grams", "contaminated")
      .collect().map(_.toString).sorted.toSeq

  test("bloom tier answers bit-identically to the exact broadcast tier") {
    val train = docs.filter(col("source") =!= "src19")
    val eval_ = docs.filter(col("source") === "src19")
    val exact = rowsOf(TextAnalysis.decontaminate(train, eval_, n = 5))
    val bloom = rowsOf(TextAnalysis.decontaminateBloom(train, eval_, n = 5,
      estimatedItems = 50000L, numBits = 500000L))
    assert(bloom == exact)
  }

  test("a deliberately tiny sketch (near-100% fpp) still answers exactly") {
    // the sketch only gates how much reaches the verify join — with 64
    // bits nearly every gram passes the prefilter and the verify join
    // does all the work; the answer must not change
    val train = docs.filter(col("source") =!= "src19")
    val eval_ = docs.filter(col("source") === "src19")
    val exact = rowsOf(TextAnalysis.decontaminate(train, eval_, n = 5))
    val tiny = rowsOf(TextAnalysis.decontaminateBloom(train, eval_, n = 5,
      estimatedItems = 10L, numBits = 64L))
    assert(tiny == exact)
  }

  test("the prefilter predicate is in the plan, upstream of the verify join") {
    val train = docs.filter(col("source") =!= "src19")
    val eval_ = docs.filter(col("source") === "src19")
    val plan = TextAnalysis.decontaminateBloom(train, eval_, n = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"bloom prefilter must appear in the physical plan:\n${plan.take(3000)}")
  }

  test("empty eval set: nothing contaminated, no crash on the null sketch") {
    val train = docs.filter(col("source") =!= "src19")
    val out = TextAnalysis.decontaminateBloom(train, docs.limit(0), n = 5)
      .collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getAs[Long]("n_contaminated_grams") == 0L &&
      !r.getAs[Boolean]("contaminated")))
  }

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select("train_doc_id", "eval_doc_id", "n_shared_grams")
      .collect().map(_.toString).sorted.toSeq

  test("provenance bloom tier (d24) matches the exact pair table, even near-100% fpp") {
    val train = docs.filter(col("source") =!= "src19")
    val eval_ = docs.filter(col("source") === "src19")
    val exact = pairsOf(TextAnalysis.decontaminationProvenance(train, eval_, n = 5))
    assert(exact.nonEmpty, "fixture must produce contaminated pairs")
    val bloom = pairsOf(TextAnalysis.decontaminationProvenanceBloom(
      train, eval_, n = 5, estimatedItems = 50000L, numBits = 500000L))
    val tiny = pairsOf(TextAnalysis.decontaminationProvenanceBloom(
      train, eval_, n = 5, estimatedItems = 10L, numBits = 64L))
    assert(bloom == exact)
    assert(tiny == exact)
  }

  test("provenance bloom: prefilter in the plan; empty eval set yields an empty pair table") {
    val train = docs.filter(col("source") =!= "src19")
    val eval_ = docs.filter(col("source") === "src19")
    val plan = TextAnalysis.decontaminationProvenanceBloom(train, eval_, n = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"bloom prefilter must appear in the physical plan:\n${plan.take(3000)}")
    val out = TextAnalysis.decontaminationProvenanceBloom(train, docs.limit(0), n = 5)
    assert(out.columns.toSeq ==
      Seq("train_doc_id", "eval_doc_id", "n_shared_grams"))
    assert(out.collect().isEmpty)
  }
}
