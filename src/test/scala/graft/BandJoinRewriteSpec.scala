package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Matching

/** The band-join optimizer rule: same results as the explicit cell-key
  * plan AND the naive theta join, with the rewrite visibly firing
  * (Generate node in the optimized plan).
  */
class BandJoinRewriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def pts(n: Int, salt: Int) = {
    import spark.implicits._
    (0 until n).map(i =>
      ("s" + (i % 2), i, ((i * 37 + salt) % 500).toDouble, ((i * 53 + salt * 7) % 500).toDouble))
      .toDF("seq", "id", "cx", "cy")
  }

  test("distanceJoin == bandJoin == naive theta join") {
    val left = pts(120, 1)
    val right = pts(150, 9)
    val viaRule = Matching.distanceJoin(left, right, Seq("seq"), 80.0)
      .select("seq", "l_id", "r_id").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    val viaBuilder = Matching.bandJoin(left, right, Seq("seq"), 80.0, cellSize = 80.0)
      .select("seq", "l_id", "r_id").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    val l = left.withColumnRenamed("id", "l_id")
      .withColumnRenamed("cx", "l_cx").withColumnRenamed("cy", "l_cy")
    val r = right.withColumnRenamed("id", "r_id")
      .withColumnRenamed("cx", "r_cx").withColumnRenamed("cy", "r_cy")
    val naive = l.join(r, Seq("seq"))
      .filter(sqrt(pow(col("l_cx") - col("r_cx"), 2) +
        pow(col("l_cy") - col("r_cy"), 2)) <= 80.0)
      .select("seq", "l_id", "r_id").collect()
      .map(x => (x.getString(0), x.getInt(1), x.getInt(2))).toSet
    assert(naive.nonEmpty)
    assert(viaRule == naive)
    assert(viaBuilder == naive)
  }

  test("the rewrite fires: optimized plan gains the explode Generate") {
    val left = pts(50, 1)
    val right = pts(50, 9)
    val plan = Matching.distanceJoin(left, right, Seq("seq"), 80.0)
      .queryExecution.optimizedPlan
    assert(plan.toString.contains("Generate explode"),
      s"expected Generate in:\n$plan")
    // and the marker predicate is gone (replaced by its expanded form)
    assert(!plan.toString.contains("graft_dist_le"), "marker must be rewritten away")
  }
}
