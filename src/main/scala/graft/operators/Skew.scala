package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation: salted join (SURVEY "salting for skew"). For a hot
  * key whose fan-in would overload one reducer, the fact side gets a
  * deterministic salt in [0, n) and the (small) dim side is exploded to
  * every salt — the hot key's rows spread over n reducers, results are
  * identical to the plain join. AQE's skew-join handles sort-merge
  * cases automatically; salting is the explicit form that also works
  * for aggregations and non-AQE paths.
  */
object Skew {

  /** Equi-join `fact ⋈ dim` on `key`, salted `n` ways. The salt is
    * derived deterministically from fact columns (`saltExpr`), so
    * results are reproducible run-to-run.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, n: Int,
                 saltExpr: org.apache.spark.sql.Column): DataFrame = {
    val salted = fact.withColumn("__salt", pmod(saltExpr, lit(n)).cast("int"))
    val explodedDim = dim.withColumn("__salt",
      explode(array((0 until n).map(lit): _*)))
    salted.join(explodedDim, Seq(key, "__salt")).drop("__salt")
  }
}
