package graft.tools

import graft.LocalSession
import org.apache.spark.sql.functions._
import graft.operators.SimilaritySearch

/** codebookSize-sweep for the PQ encode paths (round-16 verdict item
  * 1): per-row encode cost vs codebook size for the literal
  * m×codebookSize struct tree and the broadcast-native
  * graft_pq_encode, on a replicated corpus. The native path must stay
  * ~flat per (row·m·cbSize·sub) unit as cbSize grows 16→256 at m=16;
  * the literal path is expected to fall off the same codegen cliff the
  * centroid sweep measured (its term count is m·cbSize — 4096 structs
  * at FAISS-typical m=16/cbSize=256). Results recorded in PLANS.md.
  *
  * Run: sbt "runMain graft.tools.ProfilePq"
  */
object ProfilePq {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = LocalSession.build("32", logLevel = "ERROR")
    val emb = s.read.parquet(s"$d/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    // replicate ×16 so the scan is compute-bound at the biggest config
    val corpus = emb
      .withColumn("rep", explode(lit((0 until 16).toArray)))
      .select(col("vec_id"), col("embedding")).persist()
    val n = corpus.count()
    println(s"[pq-sweep] corpus rows: $n")

    val m = 16
    def time(path: String, cbSize: Int, reps: Int): Double = {
      val model = SimilaritySearch.ivfPqModel(emb, nlist = 8, m = m,
        codebookSize = cbSize)
      SimilaritySearch.pqPathOverride = Some(path)
      try {
        var best = Double.MaxValue
        for (_ <- 1 to reps) {
          val t0 = System.nanoTime()
          SimilaritySearch.ivfPqEncode(corpus, model)
            .agg(sum(element_at(col("codes"), 1))).collect()
          best = math.min(best, (System.nanoTime() - t0) / 1e9)
        }
        best
      } finally SimilaritySearch.pqPathOverride = None
    }

    for (cbSize <- Seq(16, 64, 256)) {
      val nat = time("native", cbSize, reps = 3)
      // the literal tree at m·cbSize = 4096 terms is the documented
      // cliff — measure it once, don't soak in it
      val lit = if (cbSize <= 64) time("literal", cbSize, reps = 2)
        else time("literal", cbSize, reps = 1)
      val natPer = nat / (n.toDouble * m * cbSize) * 1e9
      val litPer = lit / (n.toDouble * m * cbSize) * 1e9
      println(f"[pq-sweep] m=$m cb=$cbSize%4d native=$nat%7.2f s ($natPer%6.4f ns/row·m·cb)" +
        f"  literal=$lit%7.2f s ($litPer%6.4f ns/row·m·cb)")
    }
    s.stop()
  }
}
