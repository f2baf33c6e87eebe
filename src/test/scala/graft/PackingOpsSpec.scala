package graft

import org.apache.spark.sql.functions._

import graft.operators.PackingOps

/** Sequence-packing invariants: starts are the exact prefix sums of token
  * counts in id order, the result is independent of the range width used by
  * the two-level scan, and long documents spill rather than split.
  */
class PackingOpsSpec extends SparkSuite {
  import spark.implicits._

  // (doc_id, n_tokens) with a long doc (id 3) that overflows the budget
  private val docs = Seq(
    (0L, 100L), (1L, 50L), (2L, 80L), (3L, 500L), (4L, 10L),
    (10L, 60L), (11L, 200L), (20L, 30L), (21L, 40L), (22L, 70L))
    .toDF("doc_id", "n_tokens")

  private def pack(rangeSize: Long) =
    PackingOps.packSequences(docs, "doc_id", col("n_tokens"),
      budget = 256, rangeSize = rangeSize)
      .select("doc_id", "n_tokens", "start", "seq_id")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)

  test("starts are prefix sums in doc_id order; seq_id = start div budget") {
    val got = pack(rangeSize = 4)
    val expected = docs.as[(Long, Long)].collect().sortBy(_._1)
      .scanLeft((0L, 0L, 0L)) { case ((_, _, acc), (id, n)) => (id, n, acc + n) }
      .drop(1)
      .map { case (id, n, cumIncl) => (id, n, cumIncl - n, (cumIncl - n) / 256) }
    assert(got.toSeq === expected.toSeq)
  }

  test("result is independent of the range width") {
    val fine = pack(rangeSize = 2)
    val coarse = pack(rangeSize = 1000)
    assert(fine.toSeq === coarse.toSeq)
  }

  test("a doc longer than the budget spills; the next doc starts later") {
    val byId = pack(rangeSize = 4).map(r => r._1 -> r).toMap
    // doc 3 starts at 230 (seq 0) and runs 500 tokens past the budget
    assert(byId(3L)._3 === 230L && byId(3L)._4 === 0L)
    // doc 4 starts at 730 -> seq 2: the spilled tokens are not re-packed
    assert(byId(4L)._3 === 730L && byId(4L)._4 === 2L)
  }

  test("packChunks: every sequence carries exactly the budget except the last") {
    val perSeq = PackingOps.packChunks(docs, "doc_id", col("n_tokens"),
      budget = 256, rangeSize = 4)
      .groupBy("seq_id").agg(sum("tokens_in_seq").as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perSeq === Map(0L -> 256L, 1L -> 256L, 2L -> 256L, 3L -> 256L, 4L -> 116L))
  }

  test("packChunks splits a boundary-crossing doc across its sequences") {
    val doc3 = PackingOps.packChunks(docs, "doc_id", col("n_tokens"),
      budget = 256, rangeSize = 4)
      .filter(col("doc_id") === 3)
      .select("seq_id", "tokens_in_seq")
      .as[(Long, Long)].collect().sortBy(_._1)
    // 500 tokens starting at offset 230 cover seqs 0..2 as 26 + 256 + 218
    assert(doc3.toSeq === Seq((0L, 26L), (1L, 256L), (2L, 218L)))
  }

  test("zero-token docs landing exactly on a budget boundary join the NEXT sequence") {
    // token counts 256|0|10|0|246|7: doc 1 (zero tokens) sits exactly on the
    // 1·budget cut, doc 3 (zero tokens) falls mid-sequence, and doc 5 starts
    // exactly at 2·budget once doc 4 fills sequence 1 to the brim.
    val z = Seq((0L, 256L), (1L, 0L), (2L, 10L), (3L, 0L), (4L, 246L), (5L, 7L))
      .toDF("doc_id", "n_tokens")
    val rows = PackingOps.packSequences(z, "doc_id", col("n_tokens"),
      budget = 256, rangeSize = 2)
      .select("doc_id", "start", "seq_id")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.toSeq === Seq(
      (0L, 0L, 0L),   // fills sequence 0 exactly
      (1L, 256L, 1L), // zero tokens ON the boundary -> next sequence
      (2L, 256L, 1L), // shares the zero-token doc's start
      (3L, 266L, 1L), // zero tokens mid-sequence stays in place
      (4L, 266L, 1L),
      (5L, 512L, 2L))) // non-zero doc on the boundary also opens the next
    // token-exact chunks drop the zero-token docs but conserve every token
    val chunks = PackingOps.packChunks(z, "doc_id", col("n_tokens"),
      budget = 256, rangeSize = 2)
    assert(chunks.filter(col("doc_id").isin(1L, 3L)).count() === 0)
    assert(chunks.agg(sum("tokens_in_seq")).as[Long].head() === 519L)
  }

  test("slidingChunks: clamped final window, full coverage, short docs whole") {
    val d = Seq((1L, 25L), (2L, 5L), (3L, 10L), (4L, 11L), (5L, 0L))
      .toDF("doc_id", "t_in")
    val got = PackingOps.slidingChunks(d, "doc_id", col("t_in"),
      window = 10, stride = 6)
      .select("doc_id", "chunk_idx", "start", "chunk_len").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    // t=25: ceil((25-10)/6)+1 = 4 chunks at 0,6,12 and the clamp 15
    assert(got(1L).map(c => (c._3, c._4)).toSet ===
      Set((0L, 10L), (6L, 10L), (12L, 10L), (15L, 10L)))
    // short doc: one whole-doc chunk; exact-fit doc: one full window
    assert(got(2L).map(c => (c._3, c._4)).toSeq === Seq((0L, 5L)))
    assert(got(3L).map(c => (c._3, c._4)).toSeq === Seq((0L, 10L)))
    // t=11: two windows, the second starting at the clamp t-window = 1
    assert(got(4L).map(c => (c._3, c._4)).toSet === Set((0L, 10L), (1L, 10L)))
    // empty docs emit nothing
    assert(!got.contains(5L))
  }

  test("sequences partition the docs: every doc in exactly one sequence") {
    val profile = PackingOps.packSequences(docs, "doc_id", col("n_tokens"),
      budget = 256, rangeSize = 4)
      .groupBy("seq_id").agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("n_tokens"))
    assert(profile.agg(sum("n_docs")).as[Long].head() === 10L)
    assert(profile.agg(sum("n_tokens")).as[Long].head() === 1140L)
  }
}
