package graft.similarity

import graft.{SparkEntry, SparkFixture}
import org.scalatest.funsuite.AnyFunSuite

/** Pins q_rag_assemble's suppress-then-pack RULE on engineered candidate
  * frames (the oracle gates the end-to-end composition on the shipped
  * corpus; this spec gates the rule itself, independent of data):
  * the one-pass ANY-higher-candidate suppression semantics — including
  * the case that distinguishes it from a greedy kept-only chain — and
  * the running-sum prefix packing cut. */
class RagAssembleSpec extends AnyFunSuite with SparkFixture {

  private val dir = "/root/testdata/sf0.001"

  private def cands(rows: Seq[(Long, Double, Seq[String], Long)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "rrf", "toks", "n_tokens")
  }

  private def assembledIds(rows: Seq[(Long, Double, Seq[String], Long)],
                           budget: Long = 600L): Seq[Long] =
    Similarity.assembleContext(cands(rows), budget = budget)
      .collect().map(_.getLong(0)).toSeq

  test("a near-duplicate of a higher-ranked candidate is suppressed; " +
    "a just-below-threshold overlap survives") {
    // engineer EXACT tau: B ⊂ A with one token dropped -> |A∩B|=9,
    // |A∪B|=10, jaccard 0.9 — suppression is >= tau, the boundary case.
    val a = (1 to 10).map(i => s"t$i")
    val dupB = a.take(9) // jaccard = 9/10 = 0.9 -> suppressed (>= tau)
    val farC = a.take(8) ++ Seq("x1", "x2", "x3", "x4") // 8/14 ≈ 0.57 < 0.9
    val out = assembledIds(Seq(
      (1L, 0.9, a, 10L),
      (2L, 0.8, dupB, 9L),
      (3L, 0.7, farC, 12L)))
    assert(out == Seq(1L, 3L), s"got $out")
  }

  test("one-pass rule: a near-dup of a SUPPRESSED candidate is also " +
    "suppressed (any-higher-candidate, not greedy kept-only)") {
    // B is a near-dup of A (suppressed). C is a near-dup of B but NOT of
    // A. Greedy kept-only would KEEP C (its only >=tau partner was
    // dropped); the one-pass join rule suppresses C because B still
    // outranks it as a CANDIDATE.
    val a = (1 to 20).map(i => s"a$i")
    val b = a.take(19) :+ "b0" // jacc(A,B) = 19/21 ≈ 0.905 >= 0.9
    // C: shares 19 of B's tokens (drop one 'a', keep 'b0', add 'c0'):
    // jacc(B,C) = 19/21 >= 0.9; jacc(A,C) = 18/22 ≈ 0.818 < 0.9
    val c = a.take(18) ++ Seq("b0", "c0")
    val out = assembledIds(Seq(
      (1L, 0.9, a, 5L),
      (2L, 0.8, b, 5L),
      (3L, 0.7, c, 5L)))
    assert(out == Seq(1L), s"got $out")
  }

  test("packing is the running-sum prefix cut: the first doc past the " +
    "budget is cut AND so is everything ranked below it, even if it fits") {
    val t = Seq("u1", "u2") // no overlaps anywhere near tau
    val out = assembledIds(Seq(
      (1L, 0.9, Seq("a1", "a2"), 300L),
      (2L, 0.8, Seq("b1", "b2"), 250L), // cum 550 <= 600 kept
      (3L, 0.7, Seq("c1", "c2"), 100L), // cum 650 > 600 cut
      (4L, 0.6, t, 10L)), // would fit alone — prefix rule cuts it
      budget = 600L)
    assert(out == Seq(1L, 2L), s"got $out")
  }

  test("tie on rrf breaks by smaller doc_id as the higher rank") {
    val a = (1 to 10).map(i => s"t$i")
    val out = assembledIds(Seq(
      (7L, 0.5, a, 5L),
      (4L, 0.5, a.take(9), 5L))) // jacc = 0.9; 4 outranks 7? No: tie ->
    // smaller doc_id (4) is HIGHER, so 7 is the suppressed one only if
    // jacc(4,7) >= 0.9 — it is (9/10). Output: just 4.
    assert(out == Seq(4L), s"got $out")
  }

  test("end-to-end on the shipped corpus: budget respected, rank order " +
    "monotone, cum_tokens is the exact running sum") {
    val rows = SparkEntry.queries("q_rag_assemble")(spark, dir).collect()
    assert(rows.nonEmpty)
    var cum = 0L
    var lastRrf = Double.MaxValue
    rows.foreach { r =>
      val rrf = r.getDouble(r.fieldIndex("rrf"))
      cum += r.getLong(r.fieldIndex("n_tokens"))
      assert(r.getLong(r.fieldIndex("cum_tokens")) == cum)
      assert(rrf <= lastRrf)
      lastRrf = rrf
    }
    assert(cum <= 600L)
  }
}
