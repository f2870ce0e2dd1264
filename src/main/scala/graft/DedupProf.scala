package graft

import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the d05 dedup pipeline (temporary). */
object DedupProf {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = LocalSession.build("32", logLevel = "ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime; val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, d)
    println("n_docs=" + docs.count())
    time("tokenize+count") {
      docs.select(explode(graft.functions.Text.distinctTokens(col("text")))).count()
    }
    time("minhash 8") { operators.Dedup.minhashSignatures(docs, 8).count() }
    time("minhash 16") { operators.Dedup.minhashSignatures(docs, 16).count() }
    println("cands(8,2)=" + time("cands 8/2") {
      operators.Dedup.minhashCandidates(docs, 8, 2).count() })
    println("cands(16,2)=" + time("cands 16/2") {
      operators.Dedup.minhashCandidates(docs, 16, 2).count() })
    val cands = operators.Dedup.minhashCandidates(docs, 16, 2)
    time("verify minJ=0.5") {
      operators.Dedup.jaccardPairs(docs, cands, 1, "text", 0.5).count() }
    spark.stop()
  }
}
