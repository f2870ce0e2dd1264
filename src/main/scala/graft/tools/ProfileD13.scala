package graft.tools

import graft.{LocalSession, Tables}
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Times d13's stages at a given SF to find what dominates.
  * Run: `runMain graft.tools.ProfileD13 [sfDir]`.
  */
object ProfileD13 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = LocalSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "ERROR")
    spark.range(1000000).selectExpr("sum(id % 7)").collect()
    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  -> $r")
      r
    }
    val docs = Tables.documents(spark, dir)
    import graft.functions.Text
    val toks = Text.tokens(col("text"))
    // the anti-pattern: shingling over the raw tokenize EXPRESSION
    // re-tokenizes ~n× per gram position (what d13 shipped with)
    time("grams, inline tokenize")(
      docs.filter(col("source") =!= "src19").filter(size(toks) >= 5)
        .select(explode(array_distinct(Text.shingles(toks, 5))).as("gram")).count())
    // the fix: materialize the token array, shingle over the column
    time("grams, materialized toks")(
      docs.filter(col("source") =!= "src19").filter(size(toks) >= 5)
        .withColumn("__toks", toks)
        .select(explode(array_distinct(Text.shingles(col("__toks"), 5))).as("gram")).count())
    for (r <- 1 to 2)
      time(s"d13 full r$r")(TextAnalysis.decontaminationProvenance(
        docs.filter(col("source") =!= "src19"),
        docs.filter(col("source") === "src19"), n = 5).count())
    for (r <- 1 to 2)
      time(s"d10 full r$r")(TextAnalysis.decontaminate(
        docs.filter(col("source") =!= "src19"),
        docs.filter(col("source") === "src19"), n = 5).count())
    spark.stop()
  }
}
