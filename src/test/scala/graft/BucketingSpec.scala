package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Bucketed co-located join (SURVEY "bucketing for co-located joins"):
  * both sides pre-bucketed on the join key ⇒ the join plans WITHOUT a
  * shuffle exchange on either side.
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("join of two tables bucketed on the key has no shuffle") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS b_fact")
    spark.sql("DROP TABLE IF EXISTS b_dim")
    spark.range(10000).select(col("id"), (col("id") % 100).as("k"),
        (col("id") * 2).as("v"))
      .write.bucketBy(8, "k").sortBy("k").saveAsTable("b_fact")
    spark.range(100).select(col("id").as("k"), concat(lit("dim_"), col("id")).as("name"))
      .write.bucketBy(8, "k").saveAsTable("b_dim")
    // disable broadcast so the co-located path is what gets planned
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_fact").join(spark.table("b_dim"), "k")
      val physical = joined.queryExecution.executedPlan.toString
      assert(!physical.contains("Exchange hashpartitioning"),
        s"expected bucket-co-located join without shuffle:\n$physical")
      assert(joined.count() == 10000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }
}
