package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** Simhash hamming-ball tiers vs BRUTE FORCE: the masked-chunk
  * pigeonhole (d14 16-bit, d16 64-bit) must emit exactly the pairs a
  * quadratic scan of the fingerprints finds at hamming 1..3 — a chunk
  * split that missed a bit range, a mask that leaked the sign fill, or
  * a dropped candidate bucket all change the pair set. Runs on the
  * sf0.001 documents corpus (driver-shaped data, small enough for the
  * n² reference scan on the driver).
  */
class SimhashSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  private def bruteBall(fps: Map[Long, Long], maxHamming: Int): Set[(Long, Long, Long)] = {
    val ids = fps.keys.toArray.sorted
    val out = Set.newBuilder[(Long, Long, Long)]
    for {
      i <- ids.indices
      j <- (i + 1) until ids.length
      h = java.lang.Long.bitCount(fps(ids(i)) ^ fps(ids(j)))
      if h >= 1 && h <= maxHamming
    } out += ((ids(i), ids(j), h.toLong))
    out.result()
  }

  private def canon(rows: Array[org.apache.spark.sql.Row]): Set[(Long, Long, Long)] =
    rows.map { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      (math.min(a, b), math.max(a, b), r.getLong(2))
    }.toSet

  test("simhash64BallPairs == brute-force hamming scan of simhash64 fingerprints") {
    val docs = Tables.documents(spark, dir)
    val fps = Dedup.simhash64(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps.nonEmpty)
    // the 64-bit fingerprints genuinely use the upper half (a silent
    // 16-bit truncation would pass the pair comparison vacuously)
    assert(fps.values.exists(fp => (fp >>> 32) != 0L && (fp >>> 32) != 0xFFFFFFFFL),
      "no fingerprint uses bits 32..63 — width regression?")
    val got = canon(Dedup.simhash64BallPairs(docs, maxHamming = 3).collect())
    assert(got == bruteBall(fps, 3))
  }

  test("simhash64BallPairsAgainst == brute-force cross scan (hamming 0 included)") {
    // the incremental tier: src0 batch vs rest-of-corpus, every cross
    // pair within hamming <= 3 — INCLUDING distance 0 (an exact
    // fingerprint hit is the ingest gate's most important signal,
    // unlike the symmetric tiers where equality is its own report)
    val docs = Tables.documents(spark, dir)
    val sh = Dedup.simhash64(docs)
      .join(docs.select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("source")), Seq("doc_id"))
    val n = sh.filter(org.apache.spark.sql.functions.col("source") === "src0")
    val c = sh.filter(org.apache.spark.sql.functions.col("source") =!= "src0")
    val fpN = n.select("doc_id", "simhash64").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val fpC = c.select("doc_id", "simhash64").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(fpN.nonEmpty && fpC.nonEmpty)
    val want = (for {
      (da, fa) <- fpN
      (db, fb) <- fpC
      h = java.lang.Long.bitCount(fa ^ fb)
      if h <= 3
    } yield (da, db, h.toLong)).toSet
    val got = Dedup.simhash64BallPairsAgainst(n, c, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("simhashBallPairs (16-bit) == brute-force hamming scan") {
    val docs = Tables.documents(spark, dir)
    val fps = Dedup.simhash(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = canon(Dedup.simhashBallPairs(docs, maxHamming = 3).collect())
    assert(got == bruteBall(fps, 3))
  }

  test("native graft_simhash64 == relational md5 bit-vote reference (both widths)") {
    // the one-pass native expression replaced the explode → nibble →
    // 64-sum-votes plan; rebuild that original plan here and require
    // bit-identical fingerprints on the real corpus, plus the derived
    // 16-bit tier (= top 16 bits) and the zero-token NULL droppage
    import org.apache.spark.sql.functions._
    import graft.functions.Text
    val docs = Tables.documents(spark, dir)
    val toks = docs.select(col("doc_id"),
      explode(Text.tokens(col("text"))).as("tok"))
      .withColumn("h", Text.md5s(col("tok")))
    val withNibs = toks.select(col("doc_id") +: (0 until 16).map(i =>
      Text.hexDigit(substring(col("h"), i + 1, 1)).as(s"n$i")): _*)
    val bitVotes = (0 until 64).map { b =>
      val nib = 15 - b / 4
      val p = b % 4
      sum(when(shiftright(col(s"n$nib"), p).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"v$b")
    }
    val votes = withNibs.groupBy("doc_id").agg(bitVotes.head, bitVotes.tail: _*)
    val low = (0 until 63).map(b =>
      when(col(s"v$b") > 0, lit(1L << b)).otherwise(0L)).reduce(_ + _)
    val sign = when(col("v63") > 0, lit(Long.MinValue)).otherwise(lit(0L))
    val ref = votes.withColumn("simhash64", low + sign)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("simhash64")).toMap
    val native = Dedup.simhash64(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == ref)
    val native16 = Dedup.simhash(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native16 == ref.map { case (k, v) => k -> (v >>> 48) })
    // zero-token docs vanish (NULL-filtered), matching the inner explode
    import spark.implicits._
    val edge = Seq((1L, "hello world"), (2L, "   "), (3L, ""))
      .toDF("doc_id", "text")
    assert(Dedup.simhash64(edge).collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(Dedup.simhash(edge).collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("simhash64 sign-bit assembly: negative fingerprints appear and round-trip the chunk join") {
    // ~half of all 64-bit fingerprints should set bit 63 (negative as a
    // signed long); the masked-chunk extraction must not let the
    // arithmetic-shift sign fill corrupt chunk keys — covered by the
    // parity tests above, but assert the negative population exists so
    // that coverage is not vacuous.
    val docs = Tables.documents(spark, dir)
    val fps = Dedup.simhash64(docs).collect().map(_.getLong(1))
    assert(fps.exists(_ < 0), "no negative fingerprint — sign-bit path untested")
    assert(fps.exists(_ >= 0))
  }
}
