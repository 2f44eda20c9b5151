package graft.textfn

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Pins the BPE tokenizer (graft.textfn.Bpe) behind `text_tokens_bpe`:
  * the rank-priority production encoder must agree bit-for-bit with the
  * in-training-order reference formulation, training must reproduce the
  * classic toy merge sequence and be deterministic, and encoding must
  * be lossless — the invariants the query's driver-visible gates lean
  * on (bad-word filter, structural envelope, corpus-ratio collapse).
  */
class BpeSpec extends AnyFunSuite {

  private val params = Gen.Parameters.default
  private def sample[A](g: Gen[A], seed: Long, fallback: A): A =
    g.apply(params, Seed(seed)).getOrElse(fallback)

  // words biased toward merge-heavy territory: tiny alphabet so trained
  // pairs actually occur, with occasional longer runs ("aaaa" overlap
  // resolution) and rare unicode to exercise the char→symbol split
  private val wordGen: Gen[String] = Gen.chooseNum(1, 12).flatMap { n =>
    Gen.listOfN(n, Gen.frequency(
      8 -> Gen.oneOf('a', 'b', 'c', 'd', 'e'),
      1 -> Gen.const('a'),
      1 -> Gen.choose(0xE000.toChar, 0xF000.toChar)
    )).map(_.mkString)
  }

  test("training reproduces the classic toy-corpus merge sequence") {
    // Sennrich's worked example shape: the most frequent adjacent pair
    // wins each round, ties break lexicographically
    val freq = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val merges = Bpe.train(freq, nMerges = 4)
    // round 1: (e,s) 9 beats (s,t) 9 lexicographically; then (es,t) 9;
    // then (l,o) 7; then (lo,w) 7
    assert(merges == Vector(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
    assert(Bpe.encode("lowest", merges.zipWithIndex.toMap).toSeq ==
      Seq("low", "est"))
    // "newest": n,e,w + est — 'e','w' never merged (ne pair count 6 lost
    // to es/st 9 and lo/ow 7 within the 4-merge budget)
    assert(Bpe.encode("newest", merges.zipWithIndex.toMap).toSeq ==
      Seq("n", "e", "w", "est"))
  }

  test("training stops at pairs below count 2 and is deterministic") {
    val freq = Seq("ab" -> 1L, "cd" -> 1L)
    // every pair occurs once — memorizing one word is refused
    assert(Bpe.train(freq, nMerges = 10).isEmpty)
    val big = (0 until 300).map(i => sample(wordGen, 7000L + i, "ab") -> (1L + i % 9))
    assert(Bpe.train(big, 64) == Bpe.train(big, 64))
  }

  test("rank-priority encode == in-training-order reference encode") {
    val corpus = (0 until 400).map(i => sample(wordGen, 100L + i, "abc") -> (1L + i % 7))
    val merges = Bpe.train(corpus, nMerges = 48)
    assert(merges.nonEmpty, "trained merges must be non-trivial for this pin to bite")
    val ranks = merges.zipWithIndex.toMap
    for (i <- 0 until 500) {
      val w = sample(wordGen, 5000L + i, "aab")
      val fast = Bpe.encode(w, ranks).toSeq
      val ref = Bpe.encodeInOrder(w, merges).toSeq
      assert(fast == ref, s"word '$w': rank-priority $fast != in-order $ref")
    }
  }

  test("encoding is lossless and inside the structural envelope") {
    val corpus = (0 until 200).map(i => sample(wordGen, 300L + i, "abc") -> 3L)
    val ranks = Bpe.train(corpus, nMerges = 32).zipWithIndex.toMap
    for (i <- 0 until 300) {
      val w = sample(wordGen, 9000L + i, "aa")
      val enc = Bpe.encode(w, ranks)
      assert(enc.mkString == w)
      assert(enc.length >= 1 && enc.length <= w.length)
    }
  }

  test("overlap occurrences merge leftmost-first in both encoders") {
    val merges = Vector(("a", "a"))
    val ranks = merges.zipWithIndex.toMap
    assert(Bpe.encode("aaa", ranks).toSeq == Seq("aa", "a"))
    assert(Bpe.encodeInOrder("aaa", merges).toSeq == Seq("aa", "a"))
    assert(Bpe.encode("aaaa", ranks).toSeq == Seq("aa", "aa"))
    // a merge creating a new symbol feeds later-ranked merges only
    val m2 = Vector(("a", "a"), ("aa", "aa"))
    assert(Bpe.encode("aaaa", m2.zipWithIndex.toMap).toSeq == Seq("aaaa"))
  }
}
