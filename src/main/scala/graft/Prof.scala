package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query wall-time profiler: runs each named query twice
  * (cold, warm) on SPARK_GRAFT_SF_DIR so operator cost can be separated
  * from one-time derived-table materialization and codegen.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = LocalSession.build(cpus, logLevel = "ERROR")
    spark.range(1000000).selectExpr("sum(id % 7)").collect()
    for (name <- args) {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime(); fn(spark, sfDir).count()
      val cold = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime(); fn(spark, sfDir).count()
      val warm = (System.nanoTime() - t1) / 1e9
      println(f"[prof] $name%-28s cold=$cold%6.2f warm=$warm%6.2f")
    }
    spark.stop()
  }
}
