package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every catalog query on
  * `SPARK_GRAFT_SF_DIR`, prints ONE JSON line.
  *
  * Queries run in sorted-name order after a generic JVM/codegen warmup,
  * so per-query numbers are comparable across rounds (the first query
  * otherwise absorbs session startup).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = LocalSession.build(cpus)
    // Warm the JVM, codegen, and shuffle machinery outside the timings.
    spark.range(1000000).selectExpr("sum(id % 7)").collect()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // A swallowed failure must not masquerade as a fast success:
      // record per-query ok and surface failures in an "errors" list.
      val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
