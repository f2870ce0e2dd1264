package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Observation
import graft.operators.Dedup

/** The d05 audit tier's per-bucket blow-up guard
  * (Dedup.minhashCandidatesFromBandsCapped): a pathological band
  * bucket produces CAPPED output plus a nonzero, observable
  * truncation metric — never a silent quadratic blow-up — while any
  * bucket under the cap is bit-identical to the unguarded form (the
  * d05 catalog-hash-invariance claim in miniature).
  */
class DedupGuardSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** 100 docs colliding in ONE band bucket (the pathological cluster)
    * plus a 3-doc and a 2-doc healthy bucket.
    */
  private def banded = (
    (0 until 100).map(i => (0, "sigBIG", i.toLong)) ++
      Seq((1, "sigA", 200L), (1, "sigA", 201L), (1, "sigA", 202L),
        (2, "sigB", 300L), (2, "sigB", 301L))
  ).toDF("band", "band_sig", "doc_id")

  test("pathological bucket: pairs capped, truncation metric nonzero and exact") {
    val obs = Observation("d05_guard_patho")
    val pairs = Dedup.minhashCandidatesFromBandsCapped(banded,
        maxDocsPerBucket = 10, observation = Some(obs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the big bucket contributes C(10,2)=45 pairs from its 10 smallest
    // doc_ids; the healthy buckets contribute C(3,2)+C(2,2)=3+1 intact
    val bigKept = (0L until 10L)
    val expected =
      (for (a <- bigKept; b <- bigKept if a < b) yield (a, b)).toSet ++
        Set((200L, 201L), (200L, 202L), (201L, 202L), (300L, 301L))
    assert(pairs == expected)
    val m = obs.get
    assert(m("truncated_doc_slots") == 90L,
      s"expected 90 truncated doc slots, got ${m("truncated_doc_slots")}")
    assert(m("doc_slots") == 105L)
  }

  test("buckets under the cap: capped form is bit-identical to the unguarded form") {
    val obs = Observation("d05_guard_clean")
    val capped = Dedup.minhashCandidatesFromBandsCapped(banded,
        maxDocsPerBucket = 4096, observation = Some(obs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = Dedup.minhashCandidatesFromBands(banded)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == uncapped)
    assert(obs.get("truncated_doc_slots") == 0L,
      "cap above every bucket must truncate nothing")
    // the unguarded big bucket really is quadratic — the thing the
    // guard exists to bound: C(100,2) + 3 + 1
    assert(uncapped.size == 4954)
  }
}
