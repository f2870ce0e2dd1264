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
    * first 4 MD5 hex digits of "p{plane}_d{dim}" scaled. Portable to any
    * engine with md5 (the DuckDB oracle included).
    */
  private def planeCoef(plane: Int, dim: org.apache.spark.sql.Column) = {
    val h = Text.md5s(concat(lit(s"p${plane}_d"), dim.cast("string")))
    (Text.hexDigit(substring(h, 1, 1)) * 4096 +
      Text.hexDigit(substring(h, 2, 1)) * 256 +
      Text.hexDigit(substring(h, 3, 1)) * 16 +
      Text.hexDigit(substring(h, 4, 1))).cast("double") / 65536.0 - 0.5
  }

  /** Sign-bit LSH signature: bit b = 1 iff dot(vec, plane_b) > 0. */
  def lshSignature(df: DataFrame, numPlanes: Int,
                   vecCol: String = "embedding"): DataFrame = {
    val sig = (0 until numPlanes).map { p =>
      val dot = aggregate(
        zip_with(col(vecCol),
          transform(sequence(lit(0), size(col(vecCol)) - 1), d => planeCoef(p, d)),
          (x, coef) => x.cast("double") * coef),
        lit(0.0), (acc, v) => acc + v)
      when(dot > 0.0, lit(1L << p)).otherwise(0L)
    }.reduce(_ + _)
    df.withColumn("lsh_bucket", sig)
  }

  /** ANN via LSH buckets + exact rerank. Multi-probe is the `numTables`
    * axis (vary the plane seed offset) — omitted here; one table with
    * `numPlanes` bits already demonstrates the scale path.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, numPlanes: Int,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = lshSignature(queries, numPlanes, vecCol)
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"), col("lsh_bucket"))
    val c = lshSignature(corpus, numPlanes, vecCol)
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
