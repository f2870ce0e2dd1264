package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{Text, Vectors}

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`) — scale extension (SURVEY §7.2 M8).
  *
  * Two tiers:
  *   - `bruteForceTopK` — exact cosine top-k; the correctness baseline.
  *     Queries × corpus is a broadcast nested-loop: fine when the query
  *     set is small (the usual ANN-serving shape), wrong for all-pairs.
  *   - `lshTopK` — random-hyperplane LSH: corpus and queries bucketed by
  *     sign-bit signature; candidates share a bucket, then exact rerank.
  *     The all-pairs cost collapses to per-bucket joins. Hyperplanes are
  *     derived from MD5 of (plane, dim) — deterministic on any engine,
  *     no RNG state to ship.
  */
object SimilaritySearch {

  /** Exact cosine top-k per query. `queries`/`corpus` need (`idCol`,
    * `vecCol`). Keep |queries| modest — the plan broadcasts it.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("c_vec"))
    val pairs = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cosine", Vectors.cosine(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    pairs.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("query_id"), col("corpus_id"), col("cosine"), col("rn").as("rank"))
  }

  /** Deterministic pseudo-random hyperplane coefficient in [-0.5, 0.5):
    * first 4 MD5 hex digits of "p{plane}_d{dim}" scaled. Computed ONCE
    * driver-side (coefficients are row-independent) and shipped as a
    * literal double array; identical formula in the DuckDB oracle.
    */
  def planeCoefs(plane: Int, dims: Int): Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(dims) { d =>
      val hex = md.digest(s"p${plane}_d$d".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val v = hex.take(4).foldLeft(0)((acc, c) => acc * 16 + Integer.parseInt(c.toString, 16))
      v.toDouble / 65536.0 - 0.5
    }
  }

  /** Sign-bit LSH signature: bit b = 1 iff dotQ(vec, plane_b) > 0.
    * Quantized native dot (graft_dotq over float×double arrays) —
    * codegen'd, shuffle-order deterministic, oracle-parity by
    * construction.
    */
  def lshSignature(df: DataFrame, numPlanes: Int, dims: Int = 64,
                   vecCol: String = "embedding"): DataFrame = {
    val sig = (0 until numPlanes).map { p =>
      val dotq = Vectors.dotQNative(col(vecCol), lit(planeCoefs(p, dims)))
      when(dotq > 0L, lit(1L << p)).otherwise(0L)
    }.reduce(_ + _)
    df.withColumn("lsh_bucket", sig)
  }

  /** ANN via LSH buckets + exact rerank. Multi-probe is the `numTables`
    * axis (vary the plane seed offset) — omitted here; one table with
    * `numPlanes` bits already demonstrates the scale path.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, numPlanes: Int,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = lshSignature(queries, numPlanes, vecCol = vecCol)
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"), col("lsh_bucket"))
    val c = lshSignature(corpus, numPlanes, vecCol = vecCol)
      .select(col(idCol).as("corpus_id"), col(vecCol).as("c_vec"), col("lsh_bucket"))
    val pairs = q.join(c, Seq("lsh_bucket"))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cosine", Vectors.cosine(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    pairs.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("query_id"), col("corpus_id"), col("cosine"), col("rn").as("rank"))
  }
}
