package graft.tools

import graft.LocalSession
import org.apache.spark.sql.functions._
import graft.operators.SimilaritySearch

/** k-sweep for the centroid-assignment paths (round-15 verdict item 1):
  * per-row assignment cost vs k for the literal-struct argmax and the
  * broadcast-native graft_cell_argmax, on a replicated corpus. The
  * native path must stay ~flat per (row·k·dim) unit as k grows 8→1024;
  * the literal path is expected to degrade (interpreted fallback /
  * codegen pressure) past a few dozen centroids — the measurement
  * behind making the native path unconditional (it won at every k in
  * the sweep, so there is no auto threshold — literal survives only
  * as the forced cross-check). Results recorded in PLANS.md.
  *
  * Run: sbt "runMain graft.tools.ProfileCentroid"
  */
object ProfileCentroid {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = LocalSession.build("32", logLevel = "ERROR")
    val emb = s.read.parquet(s"$d/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    // replicate 2000 rows ×64 → 128k rows so the scan is compute-bound
    val corpus = emb
      .withColumn("rep", explode(lit((0 until 64).toArray)))
      .select(col("vec_id"), col("embedding")).persist()
    val n = corpus.count()
    println(s"[centroid-sweep] corpus rows: $n")

    def centsOf(k: Int): Array[(Int, Array[Float])] = emb
      .filter(col("vec_id") < k)
      .select(col("vec_id").cast("int"), col("embedding").cast("array<float>"))
      .collect().map(r => (r.getInt(0), r.getSeq[Float](1).toArray)).sortBy(_._1)

    def time(path: String, k: Int, reps: Int): Double = {
      val cents = centsOf(k)
      SimilaritySearch.centroidPathOverride = Some(path)
      try {
        var best = Double.MaxValue
        for (_ <- 1 to reps) {
          val t0 = System.nanoTime()
          corpus.select(SimilaritySearch.cellBest(col("embedding"), cents)
              .getField("cid").as("cid"))
            .agg(sum(col("cid"))).collect()
          best = math.min(best, (System.nanoTime() - t0) / 1e9)
        }
        best
      } finally SimilaritySearch.centroidPathOverride = None
    }

    for (k <- Seq(8, 32, 64, 256, 1024)) {
      val nat = time("native", k, reps = 3)
      // the literal path past 64 is the documented cliff (interpreted
      // k-struct tree) — measure it once, don't soak in it
      val lit = if (k <= 64) time("literal", k, reps = 2)
        else if (k == 256) time("literal", k, reps = 1)
        else Double.NaN
      val natPer = nat / (n.toDouble * k) * 1e9
      val litPer = lit / (n.toDouble * k) * 1e9
      println(f"[centroid-sweep] k=$k%5d native=$nat%7.2f s ($natPer%6.3f ns/row·k)" +
        (if (!lit.isNaN) f"  literal=$lit%7.2f s ($litPer%6.3f ns/row·k)" else "  literal=skipped"))
    }
    s.stop()
  }
}
