package graft.dedup

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the two sides of dedup_incremental's hot-band cap (the skew
  * guard at Dedup.incrementalDedup). The driver's oracle is UNCAPPED
  * brute force — DuckDB cannot reproduce the minhash band keys — so the
  * gate is only equivalent while the cap never fires on the gated
  * corpus. Test 1 asserts that inertness loudly on every shipped SF the
  * gate runs at; test 2 builds the degenerate band the cap exists for
  * and pins the capped semantics (hot-band-only pairs dropped, cold-band
  * pairs untouched) against the uncapped run.
  */
class DedupIncrementalCapSpec extends AnyFunSuite with SparkFixture {

  test("hot-band cap is inert on every gated corpus SF") {
    // sf0.01 is the correctness gate's SF; sf0.1 is the bench SF — the
    // cap must be inert at BOTH for engine/oracle equivalence to hold
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val maxBand = Dedup.incrementalBandCounts(
          graft.operators.Tables(spark, sf).documents)
        .agg(max(col("c"))).collect()(0).getLong(0)
      assert(maxBand <= Dedup.IncrementalHotBandCap,
        s"$sf: hottest band has $maxBand base docs > cap " +
          s"${Dedup.IncrementalHotBandCap} — the uncapped oracle is no " +
          "longer equivalent to the engine")
    }
  }

  test("synthetic degenerate band: cap drops hot-band-only pairs, keeps cold pairs") {
    import spark.implicits._
    val hotText = "alpha beta gamma delta epsilon zeta"
    val coldText = "one two three four five six"
    // 9 identical hot base docs (every band key count = 9), 3 identical
    // cold base docs (count = 3); delta ids are the multiples of 7
    val base = (1L to 10L).filter(_ % 7 != 0).map(id => (id, hotText)) ++
      Seq((20L, coldText), (22L, coldText), (23L, coldText))
    val delta = Seq((7L, hotText), (14L, coldText))
    val docs = (base ++ delta).toDF("doc_id", "text")

    def pairs(cap: Long) = Dedup.incrementalDedup(docs, hotBandCap = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val capped = pairs(5L)
    val uncapped = pairs(Long.MaxValue)

    // cold band (3 <= 5) survives the cap: identical docs, jaccard 1
    val coldPairs = Set((14L, 20L), (14L, 22L), (14L, 23L))
    assert(coldPairs.subsetOf(capped), s"cold pairs missing from capped run: $capped")
    assert(coldPairs.subsetOf(uncapped))

    // hot delta 7's only shared bands have 9 > 5 base docs: the capped
    // engine misses all 9 true duplicates the uncapped run finds — the
    // exact failure mode the inertness test above guards the gate against
    assert(!capped.exists(_._1 == 7L), s"capped run should drop hot-band pairs: $capped")
    assert(uncapped.count(_._1 == 7L) == 9)
  }
}
