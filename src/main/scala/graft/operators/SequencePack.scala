package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: concatenate the corpus in a
  * deterministic document order and split it into fixed `seqLen`-token
  * training sequences (the GPT concat-and-split shape — documents may
  * span a boundary; the trainer masks attention across the seam).
  *
  * The only global state is the running token count, computed with
  * [[RangeRank]]'s bucketed prefix sum: per-bucket partial sums plus a
  * broadcast offset table — never a single-partition window. Everything
  * after the cumsum is per-row integer arithmetic in codegen:
  *
  *   seq_first  = (cum_before) DIV seqLen     — first sequence touched
  *   seq_last   = (cum_end - 1) DIV seqLen    — last sequence touched
  *   seq_offset = cum_before MOD seqLen       — position in seq_first
  *
  * so the assignment is a pure function of the data (rerun-stable on
  * any partitioning/cluster size, like stratifiedSampleByHash), and a
  * writer can route each doc to its shard(s) with an equi-partition on
  * seq_first. Long arithmetic is exact to 2^63 tokens — no FP division.
  */
object SequencePack {

  /** Adds `cum_tokens` (inclusive running sum of `tokenCol` in
    * `tieCol`-ascending order), `seq_first`, `seq_last`, `seq_offset`.
    * A zero-token doc sits at the boundary it falls on
    * (seq_last = seq_first).
    */
  def packConcat(docs: DataFrame, tokenCol: Column, tieCol: Column,
                 seqLen: Int, nb: Int = 0): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val withCum = RangeRank.withGlobalRank(
      docs.withColumn("__ntok", tokenCol.cast("long")),
      tieCol, tieCol, descending = false, "__rnk",
      cum = Some((col("__ntok"), "cum_tokens")), nb = nb)
    val before = col("cum_tokens") - col("__ntok")
    withCum
      .withColumn("seq_first", expr(s"(cum_tokens - __ntok) DIV $seqLen"))
      .withColumn("seq_last",
        when(col("__ntok") > 0, expr(s"(cum_tokens - 1) DIV $seqLen"))
          .otherwise(expr(s"(cum_tokens - __ntok) DIV $seqLen")))
      .withColumn("seq_offset", (before % seqLen).cast("long"))
      .drop("__rnk", "__ntok")
  }
}
