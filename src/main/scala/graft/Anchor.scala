package graft
object Anchor {
  def main(args: Array[String]): Unit = {
    val spark = LocalSession.build("32", logLevel = "ERROR")
    // warm-up: session + codegen + file scan
    SparkEntry.queries("m11_eval_anchor")(spark, "/root/testdata/sf0.1").collect()
    val t0 = System.nanoTime()
    val rows = SparkEntry.queries("m11_eval_anchor")(spark, "/root/testdata/sf0.1").collect()
    println(f"anchor metrics (warm) in ${(System.nanoTime()-t0)/1e9}%.2f s; CLR_TP=${rows.head.getLong(5)}")
    spark.stop()
  }
}
