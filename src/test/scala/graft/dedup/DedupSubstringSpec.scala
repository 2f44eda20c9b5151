package graft.dedup

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** Pins `dedup_substring` (window-level exact span dedup): hand-counted
  * window arithmetic on a constructed corpus, the <W-token drop
  * boundary, and the degenerate-corpus regime that explains why this
  * operator needs NO hot cap (count-only aggregation — duplication is
  * reported per window, never enumerated per pair). */
class DedupSubstringSpec extends AnyFunSuite with SparkFixture {

  private def run(rows: Seq[(Long, String)], w: Int) = {
    import spark.implicits._
    Dedup.substringDedup(rows.toDF("doc_id", "text"), w)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_windows"), r.getAs[Long]("n_dup_windows"),
          r.getAs[Double]("dup_ratio"))))
      .toMap
  }

  test("shared span is counted at every position it covers, in both docs") {
    // W=3. Docs 1 and 2 share the 4-token span "c d e f" => the two
    // 3-token windows (c d e) and (d e f) are duplicated; everything
    // else is unique. Doc 3 is disjoint.
    val got = run(Seq(
      (1L, "a b c d e f g"), // windows: abc bcd cde def efg  (5)
      (2L, "x y c d e f z"), // windows: xyc ycd cde def efz  (5)
      (3L, "p q r s t")      // windows: pqr qrs rst          (3)
    ), w = 3)
    assert(got == Map(
      1L -> ((5L, 2L, 0.4)),
      2L -> ((5L, 2L, 0.4)),
      3L -> ((3L, 0L, 0.0))))
  }

  test("a WITHIN-doc repeat also counts as duplication") {
    // "a b a b a" at W=2: windows ab / ba / ab / ba — all four
    // positions hold a window occurring twice in the corpus
    val got = run(Seq((1L, "a b a b a")), w = 2)
    assert(got == Map(1L -> ((4L, 4L, 1.0))))
  }

  test("docs shorter than the window are dropped; exactly-W docs keep one window") {
    val got = run(Seq(
      (1L, "a b"),      // 2 tokens < W=3: no windows, no output row
      (2L, "a b c")     // exactly W: one window
    ), w = 3)
    assert(got == Map(2L -> ((1L, 0L, 0.0))))
  }

  test("degenerate corpus (10k identical docs) is count-linear, not pair-quadratic") {
    import spark.implicits._
    // 10k identical 25-token docs: every window occurs 10k times. A
    // pair-enumerating design would materialize ~10^8 pairs per window
    // position; the count-only aggregate reports dup_ratio 1.0 per doc
    // in one pass. No cap needed — hot windows ARE the signal.
    val text = (1 to 25).map(i => s"tok$i").mkString(" ")
    val docs = spark.range(10000).selectExpr("id AS doc_id", s"'$text' AS text")
    val res = Dedup.substringDedup(docs, Dedup.SubstringWindow)
    val agg = res.selectExpr("count(*) AS n", "min(dup_ratio) AS mn", "max(dup_ratio) AS mx")
      .collect()(0)
    assert(agg.getLong(0) == 10000L)
    assert(agg.getDouble(1) == 1.0 && agg.getDouble(2) == 1.0)
  }
}
