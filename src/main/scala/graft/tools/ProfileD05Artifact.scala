package graft.tools

import org.apache.spark.sql.functions._
import graft.LocalSession
import graft.operators.Dedup
import graft.queries.TextQ

/** Stage-by-stage breakdown of the ARTIFACT-BACKED d05 path (the shape
  * the bench times): band artifact read -> rank guard -> bucket
  * self-join -> distinct -> size prune -> gram joins -> inter/jaccard.
  * Counts each stage so a candidate-volume blow-up is visible directly.
  * Run: sbt "runMain graft.tools.ProfileD05Artifact".
  */
object ProfileD05Artifact {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = LocalSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.range(1000000).selectExpr("sum(id % 7)").collect()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[profile] $name%-34s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val banded = spark.read.parquet(s"${TextQ.bandArtifact(spark, sfDir)}/full")
    t("band rows")(System.err.println("  rows=" + banded.count()))
    val kept = Dedup.bandsKeptByRank(banded, "bucket_rank", TextQ.D05MaxBucket,
      metricName = "g1")
    // bucket histogram: top bucket sizes
    val hist = banded.groupBy("band", "band_sig").count()
      .orderBy(desc("count")).limit(10).collect()
    System.err.println("  top buckets: " + hist.map(_.getLong(2)).mkString(","))
    val a = kept.select(col("band"), col("band_sig"), col("doc_id").as("doc_a"))
    val b = kept.select(col("band"), col("band_sig"), col("doc_id").as("doc_b"))
    val raw = a.join(b, Seq("band", "band_sig"))
      .filter(col("doc_a") < col("doc_b"))
    t("raw clique pairs (pre-distinct)")(System.err.println("  rows=" + raw.count()))
    val cands = raw.select("doc_a", "doc_b").distinct()
    t("distinct candidates")(System.err.println("  rows=" + cands.count()))
    val sets = spark.read.parquet(TextQ.gramArtifact(spark, sfDir))
    val sizes = sets.select(col("doc_id"), size(col("grams")).as("sz"))
    val pruned = cands
      .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sz_a")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("sz_b")), Seq("doc_b"))
      .filter(least(col("sz_a"), col("sz_b")).cast("double") >=
        greatest(col("sz_a"), col("sz_b")) * 0.5)
      .select("doc_a", "doc_b")
    t("size-pruned candidates")(System.err.println("  rows=" + pruned.count()))
    val verified = Dedup.jaccardPairsFromSets(sets, cands, minJaccard = 0.5)
    t("verified pairs (full verify)")(System.err.println("  rows=" + verified.count()))
    t("verified pairs AGAIN (warm)")(verified.count())
    spark.stop()
  }
}
