package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{Geometry, Text, Vectors}

/** Unit + property tests for the scalar expression library (SURVEY §2.7
  * E1–E14 edge cases and determinism guarantees).
  */
class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def eval1(c: org.apache.spark.sql.Column): Any =
    spark.range(1).select(c.as("v")).collect().head.get(0)

  test("E6 iou: exact overlap, disjoint, zero-union") {
    assert(eval1(Geometry.iou(lit(0.0), lit(0.0), lit(10.0), lit(10.0),
      lit(0.0), lit(0.0), lit(10.0), lit(10.0))) == 1.0)
    assert(eval1(Geometry.iou(lit(0.0), lit(0.0), lit(10.0), lit(10.0),
      lit(20.0), lit(20.0), lit(10.0), lit(10.0))) == 0.0)
    assert(eval1(Geometry.iou(lit(0.0), lit(0.0), lit(0.0), lit(0.0),
      lit(0.0), lit(0.0), lit(0.0), lit(0.0))) == 0.0)
    // partial: 90/110
    val v = eval1(Geometry.iou(lit(0.0), lit(0.0), lit(10.0), lit(10.0),
      lit(1.0), lit(0.0), lit(10.0), lit(10.0))).asInstanceOf[Double]
    assert(math.abs(v - 90.0 / 110.0) < 1e-12)
  }

  test("E2 size similarity: symmetry and zero-area guard") {
    val a = eval1(Geometry.sizeSim(lit(10.0), lit(10.0), lit(20.0), lit(20.0)))
    val b = eval1(Geometry.sizeSim(lit(20.0), lit(20.0), lit(10.0), lit(10.0)))
    assert(a == b && a == 0.25)
    assert(eval1(Geometry.sizeSim(lit(0.0), lit(10.0), lit(5.0), lit(5.0))) == 0.0)
  }

  test("E5 min-max normalize is UNCLAMPED (goes negative past hi)") {
    val v = eval1(lit(1.0) - Geometry.minMaxNorm(lit(150.0), lit(0.0), lit(100.0)))
    assert(v == -0.5)
    assert(eval1(Geometry.minMaxNorm(lit(5.0), lit(3.0), lit(3.0))) == 0.0)
  }

  test("E7 containment is directional: fraction of FIRST box inside second") {
    // small (10,10,20,20) fully inside big (0,0,100,100)
    assert(eval1(Geometry.containmentRatio(lit(10.0), lit(10.0), lit(20.0), lit(20.0),
      lit(0.0), lit(0.0), lit(100.0), lit(100.0))) == 1.0)
    // big's fraction inside small = 400/10000
    assert(eval1(Geometry.containmentRatio(lit(0.0), lit(0.0), lit(100.0), lit(100.0),
      lit(10.0), lit(10.0), lit(20.0), lit(20.0))) == 0.04)
  }

  test("E9 frame zero-pad: numeric padded, non-numeric passthrough") {
    val padded = Seq(("7"), ("frame_a")).toDF("f")
      .select(Geometry.framePad(col("f"))).as[String].collect()
    assert(padded.toSeq == Seq("000007", "frame_a"))
  }

  test("E3 cosine: orthogonal, parallel, zero-norm guard; Q-variant matches") {
    val df = Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(1.0f, 2.0f), Array(2.0f, 4.0f)),
      (Array(0.0f, 0.0f), Array(1.0f, 1.0f))).toDF("a", "b")
    val out = df.select(Vectors.cosine(col("a"), col("b")).as("c"),
      Vectors.cosineQ(col("a"), col("b")).as("cq")).collect()
    assert(out(0).getDouble(0) == 0.0)
    assert(math.abs(out(1).getDouble(0) - 1.0) < 1e-9)
    assert(out(2).getDouble(0) == 0.0)
    out.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-6))
  }

  test("kernel-side appearanceSim matches column cosine within 1e-9") {
    val a = Array.tabulate(16)(i => (math.sin(i + 1) * 3).toFloat)
    val b = Array.tabulate(16)(i => (math.cos(i * 2) * 2).toFloat)
    val kernel = graft.operators.Tracker.appearanceSim(a, b)
    val df = Seq((a, b)).toDF("a", "b")
    val col0 = df.select((Vectors.cosine(col("a"), col("b")) + 1.0) / 2.0).collect().head.getDouble(0)
    assert(math.abs(kernel - col0) < 1e-9)
  }

  test("minhash invariant under token duplication; fingerprint canonical") {
    val df = Seq(("the quick fox the fox"), ("fox the quick")).toDF("t")
      .select(Text.fingerprint(col("t")).as("fp")).as[String].collect()
    assert(df(0) == df(1)) // same distinct-token set -> same fingerprint
  }

  test("hash16 stays in [0, 65535]") {
    val vals = Seq("a", "b", "zz", "table", "小").toDF("t")
      .select(Text.hash16(col("t"))).collect().map(_.getInt(0))
    assert(vals.forall(v => v >= 0 && v <= 65535))
  }

  test("native graft_dotq (codegen Expression) == composable dotQ") {
    val rng = new scala.util.Random(7)
    val rows = Seq.fill(50)((
      Array.fill(64)(rng.nextFloat() * 2 - 1),
      Array.fill(64)(rng.nextFloat() * 2 - 1)))
    val df = rows.toDF("a", "b")
    val out = df.select(
      Vectors.dotQ(col("a"), col("b")).as("hof"),
      Vectors.dotQNative(col("a"), col("b")).as("native"),
      Vectors.cosineQ(col("a"), col("b")).as("cq"),
      Vectors.cosineQNative(col("a"), col("b")).as("cqn")).collect()
    out.foreach { r =>
      assert(r.getLong(0) == r.getLong(1), s"${r.getLong(0)} vs ${r.getLong(1)}")
      assert(r.getDouble(2) == r.getDouble(3))
    }
  }

  test("graft_inter_size (sorted two-pointer merge) == size(array_intersect)") {
    val rng = new scala.util.Random(11)
    val vocab = (0 until 40).map(i => s"tok$i")
    val rows = Seq.fill(100)((
      rng.shuffle(vocab).take(rng.nextInt(vocab.size) + 1).toArray,
      rng.shuffle(vocab).take(rng.nextInt(vocab.size) + 1).toArray))
    val df = rows.toDF("a", "b")
      .select(sort_array(array_distinct(col("a"))).as("a"),
        sort_array(array_distinct(col("b"))).as("b"))
    val out = df.select(
      call_function("graft_inter_size", col("a"), col("b")).as("merge"),
      size(array_intersect(col("a"), col("b"))).as("builtin")).collect()
    out.foreach(r => assert(r.getInt(0) == r.getInt(1), s"$r"))
  }

  test("graft_inter_size skips null elements instead of crashing (SQL surface)") {
    val r = spark.sql(
      "SELECT graft_inter_size(array(CAST(NULL AS STRING), 'a', 'b'), array('a', CAST(NULL AS STRING)))")
      .head().getInt(0)
    assert(r == 1)
  }

  test("graft_inter_size long-array fast path == size(array_intersect)") {
    // the hot verify path: grams fingerprinted to 64-bit hashes
    val rng = new scala.util.Random(13)
    val vocab = (0 until 40).map(i => s"tok$i")
    val rows = Seq.fill(100)((
      rng.shuffle(vocab).take(rng.nextInt(vocab.size) + 1).toArray,
      rng.shuffle(vocab).take(rng.nextInt(vocab.size) + 1).toArray))
    val df = rows.toDF("a", "b")
      .select(sort_array(transform(array_distinct(col("a")), g => xxhash64(g))).as("a"),
        sort_array(transform(array_distinct(col("b")), g => xxhash64(g))).as("b"))
    val out = df.select(
      call_function("graft_inter_size", col("a"), col("b")).as("merge"),
      size(array_intersect(col("a"), col("b"))).as("builtin")).collect()
    out.foreach(r => assert(r.getInt(0) == r.getInt(1), s"$r"))
    // mixed element types rejected at analysis, not silently miscounted
    intercept[org.apache.spark.sql.AnalysisException] {
      rows.toDF("a", "b")
        .select(sort_array(transform(col("a"), g => xxhash64(g))).as("a"),
          sort_array(col("b")).as("b"))
        .select(call_function("graft_inter_size", col("a"), col("b"))).collect()
    }
  }

  test("graft_repstats: hand-checked gram counts, short inputs, null elements (SQL surface)") {
    // "a a a a": 3 2-grams all "a a" -> [3,3,3]; 2 3-grams "a a a" -> [2,2,2]
    val r = spark.sql(
      """SELECT graft_repstats(array('a','a','a','a'), 2) AS g2,
        |       graft_repstats(array('a','a','a','a'), 3) AS g3,
        |       graft_repstats(array('x'), 2) AS short,
        |       graft_repstats(array(CAST(NULL AS STRING), 'a'), 2) AS withnull,
        |       graft_repstats(array('p','q','r'), 2) AS uniq""".stripMargin).head()
    assert(r.getSeq[Long](0) == Seq(3L, 3L, 3L))
    assert(r.getSeq[Long](1) == Seq(2L, 2L, 2L))
    assert(r.getSeq[Long](2) == Seq(0L, 0L, 0L))
    assert(r.getSeq[Long](3) == Seq(1L, 1L, 0L)) // null hashes as '' — one gram, no dup
    assert(r.getSeq[Long](4) == Seq(2L, 1L, 0L))
  }

  test("graft_bandsigs == relational lambda banding reference on real docs") {
    // Dedup.bandSignatures now routes through the native expression, so
    // the reference here is the ORIGINAL relational construction
    // (per-seed array_min over a md5 transform, sorted "seed:mh"
    // elements, band md5) rebuilt inline — the native one-pass kernel
    // must reproduce it bit-for-bit on the real corpus.
    import graft.functions.Text
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val numHashes = 16
    val bands = 2
    val rowsPerBand = numHashes / bands
    val sigs = docs
      .withColumn("__mh_toks", Text.distinctTokens(col("text")))
      .filter(size(col("__mh_toks")) > 0)
      .select(col("doc_id") +: (0 until numHashes).map(s =>
        array_min(transform(col("__mh_toks"),
          t => Text.md5s(concat(lit(s"s${s}_"), t)))).as(s"mh$s")): _*)
    val bandStructs = (0 until bands).map { band =>
      val elems = (band * rowsPerBand until (band + 1) * rowsPerBand)
        .map(s => concat_ws(":", lit(s), col(s"mh$s")))
      struct(lit(band).as("band"),
        md5(concat_ws("|", sort_array(array(elems: _*)))).as("band_sig"))
    }
    val table = sigs
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band"), col("bs.band_sig"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val perRow = graft.operators.Dedup.bandSignatures(docs, numHashes, bands, "text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(perRow == table)
  }

  test("bandSignatures drops token-less docs like the minhash form did") {
    // the native path filters size(tokens) > 0 — a zero-token doc has
    // no minhash, so it must produce NO band rows (the old relational
    // form dropped it via the same filter inside minhashSignatures)
    val docs = Seq((1L, "a b"), (2L, "   "), (3L, ""))
      .toDF("doc_id", "text")
    val got = graft.operators.Dedup.bandSignatures(docs, 4, 2, "text")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L))
  }

  test("graft_bandsigs: empty token set is deterministic and bands divide check fails loudly") {
    val a = spark.sql("SELECT graft_bandsigs(array('x'), 16, 2) AS s").head().getSeq[String](0)
    assert(a.length == 2 && a.forall(_.length == 32))
    val e = spark.sql("SELECT graft_bandsigs(CAST(array() AS ARRAY<STRING>), 4, 2) AS s")
      .head().getSeq[String](0)
    assert(e.length == 2 && e.forall(_.length == 32))
    intercept[Exception] {
      spark.sql("SELECT graft_bandsigs(array('x'), 16, 3)").head()
    }
  }

  test("graft_dotq rounds half AWAY FROM ZERO on negative ties (matches Spark round + DuckDB)") {
    // Find a double d where d * 1e12 lands EXACTLY on n + 0.5, so the
    // tie rule is actually exercised (Math.round would give -n here;
    // half-away-from-zero gives -(n+1), matching Spark/DuckDB ROUND).
    val tie = (1 to 100000).iterator
      .map(n => (n, (n + 0.5) / 1e12))
      .find { case (n, d) => d * 1.0 * 1e12 == n + 0.5 }
    assert(tie.nonEmpty, "no exact x.5 quantized product found in search range")
    val (n, d) = tie.get
    val df = Seq((Array(-d), Array(1.0))).toDF("a", "b")
    val out = df.select(
      Vectors.dotQ(col("a"), col("b")).as("hof"),
      Vectors.dotQNative(col("a"), col("b")).as("native")).collect().head
    assert(out.getLong(0) == -(n + 1L), s"composable gave ${out.getLong(0)}")
    assert(out.getLong(1) == -(n + 1L), s"native gave ${out.getLong(1)}")
  }

  test("weightedScore: reference formula (weighted mean over sum of weights)") {
    val v = eval1(Geometry.weightedScore(Seq(
      (lit(1.0), 0.2), (lit(0.5), 0.2), (lit(0.8), 0.5), (lit(0.0), 0.1))))
      .asInstanceOf[Double]
    assert(math.abs(v - (1.0 * 0.2 + 0.5 * 0.2 + 0.8 * 0.5 + 0.0 * 0.1) / 1.0) < 1e-12)
  }
}
