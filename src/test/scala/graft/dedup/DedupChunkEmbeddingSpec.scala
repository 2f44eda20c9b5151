package graft.dedup

import graft.SparkFixture
import graft.similarity.VectorOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins `dedup_chunk_embedding` (the §2.4/§2.5 bridge): bag-of-token
  * chunk vectors through recall-1 angular blocking, gated against a
  * brute-force all-pairs reference, plus the semantics that
  * differentiate it from the exact-span tier (token-order invariance),
  * the zero-vector drop, the cross-doc-only filter, and the loud
  * chunk-id packing contract.
  */
class DedupChunkEmbeddingSpec extends AnyFunSuite with SparkFixture {

  private def docsDf(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  /** Engine output via the shared query body (blocking built fresh,
    * released after). */
  private def run(rows: Seq[(Long, String)]): Seq[(Long, Long, Long, Long, Double)] = {
    val b = AngularBlocking.buildBlocking(Dedup.chunkVectors(docsDf(rows)))
    try Dedup.chunkEmbeddingPairs(b).collect().toSeq.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    finally AngularBlocking.releaseBlocking(b)
  }

  /** Brute-force reference: every chunk pair, exact cosine via the
    * shared kernel, same decode/filters as the operator. */
  private def brute(rows: Seq[(Long, String)]): Set[(Long, Long, Long, Long, Double)] = {
    val vecs = Dedup.chunkVectors(docsDf(rows))
    val a = vecs.select(col("vec_id").as("va"), col("embedding").as("ea"))
    val bb = vecs.select(col("vec_id").as("vb"), col("embedding").as("eb"))
    VectorOps.cosineKernel(a.join(bb, col("va") < col("vb")), "ea", "eb")
      .filter(col("cosine") >= Dedup.ChunkCosTau)
      .selectExpr(s"va DIV ${Dedup.ChunkIdxCap} AS doc_a",
        s"pmod(va, ${Dedup.ChunkIdxCap}) AS chunk_a",
        s"vb DIV ${Dedup.ChunkIdxCap} AS doc_b",
        s"pmod(vb, ${Dedup.ChunkIdxCap}) AS chunk_b", "cosine")
      .filter(col("doc_a") =!= col("doc_b"))
      .collect().toSet.map((r: org.apache.spark.sql.Row) =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
  }

  private def tokens(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  test("an aligned shared W-token span surfaces as a cosine-1 cross-doc pair") {
    val span = tokens("shared", Dedup.ChunkW)
    val got = run(Seq(
      (1L, span + " " + tokens("one", Dedup.ChunkW)),   // chunk 0 = span
      (2L, tokens("two", Dedup.ChunkW) + " " + span),   // chunk 1 = span
      (3L, tokens("three", 2 * Dedup.ChunkW))))         // disjoint
    assert(got.contains((1L, 0L, 2L, 1L, 1.0)),
      s"expected the planted (1,0)x(2,1) exact pair in $got")
    assert(!got.exists(p => p._1 == 3L || p._3 == 3L))
  }

  test("a REORDERED shared span still scores 1.0 — the bag semantics the exact-span tier cannot see") {
    val span = (1 to Dedup.ChunkW).map(i => s"w$i")
    val got = run(Seq(
      (1L, span.mkString(" ")),
      (2L, span.reverse.mkString(" "))))
    assert(got == Seq((1L, 0L, 2L, 0L, 1.0)))
    // and the exact-span tier indeed misses it: no shared W-token window
    val sub = Dedup.substringDedup(docsDf(Seq(
      (1L, span.mkString(" ")), (2L, span.reverse.mkString(" ")))), w = Dedup.ChunkW)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(sub == Map(1L -> 0L, 2L -> 0L))
  }

  test("blocked output matches brute force exactly on a mixed corpus") {
    val rnd = new scala.util.Random(11L)
    // 40 docs over a 40-token vocabulary (the synthetic corpus' own
    // shape), 16-64 tokens each, with planted near-dup spans: enough
    // collisions that the tau band is populated
    val vocab = (1 to 40).map(i => s"v$i")
    val base = (1 to 30).map { d =>
      val n = Dedup.ChunkW + rnd.nextInt(49)
      (d.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val planted = (31 to 40).map { d =>
      // copy a base doc's text with one token swapped — chunk vectors a
      // hamming step apart, cosine just under/over tau depending on dims
      val (_, srcText) = base(rnd.nextInt(base.size))
      val toks = srcText.split(" ").toSeq
      val i = rnd.nextInt(toks.size)
      (d.toLong, toks.updated(i, vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val corpus = base ++ planted
    val got = run(corpus).toSet
    val want = brute(corpus)
    assert(want.nonEmpty, "gate corpus produced no qualifying pairs — weaken it")
    assert(got == want)
  }

  test("all-zero chunk vectors (full sign cancellation) are dropped, not NaN'd through the tau filter") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def dimSign(t: String): (Int, Long) = {
      val h = Dedup.md5Lower64(md, t)
      ((h & (Dedup.ChunkDims - 1)).toInt, (h >>> 6) & 1L)
    }
    // search the token space for a (+, -) pair on the same dim
    val cands = (1 to 5000).map(i => s"z$i")
    val byDim = cands.groupBy(t => dimSign(t)._1)
    val (tPlus, tMinus) = byDim.values.flatMap { ts =>
      val plus = ts.find(dimSign(_)._2 == 0L)
      val minus = ts.find(dimSign(_)._2 == 1L)
      plus.zip(minus)
    }.head
    val zeroChunk = Seq.fill(Dedup.ChunkW / 2)(Seq(tPlus, tMinus)).flatten.mkString(" ")
    val vecs = Dedup.chunkVectors(docsDf(Seq((1L, zeroChunk), (2L, zeroChunk))))
    assert(vecs.count() == 0L, "cancelling chunks must not emit vectors")
    assert(run(Seq((1L, zeroChunk), (2L, zeroChunk))).isEmpty)
  }

  test("same-doc repeated chunks are not reported; cross-doc sharing of the same chunk is") {
    val span = tokens("rep", Dedup.ChunkW)
    val got = run(Seq(
      (1L, span + " " + span), // chunks 0 and 1 identical WITHIN doc 1
      (2L, span)))             // the same chunk in another doc
    assert(got.forall(p => p._1 != p._3))
    assert(got.toSet == Set((1L, 0L, 2L, 0L, 1.0), (1L, 1L, 2L, 0L, 1.0)))
  }

  test("sub-width docs carry no chunks; the trailing partial chunk is not embedded") {
    val vecs = Dedup.chunkVectors(docsDf(Seq(
      (1L, tokens("a", Dedup.ChunkW - 1)),       // < W: nothing
      (2L, tokens("b", Dedup.ChunkW + 3)))))     // one full chunk, 3-token tail dropped
      .collect()
    assert(vecs.map(_.getLong(0)).toSeq == Seq(2L * Dedup.ChunkIdxCap))
  }

  test("the chunk-id packing cap fails loudly instead of aliasing") {
    val huge = tokens("t", (Dedup.ChunkIdxCap.toInt + 1) * Dedup.ChunkW)
    val ex = intercept[Throwable] {
      Dedup.chunkVectors(docsDf(Seq((1L, huge)))).count()
    }
    val chain = Iterator.iterate(ex)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain.exists(c => Option(c.getMessage).exists(_.contains("ChunkIdxCap"))),
      s"expected the loud packing-cap message in ${chain.map(_.getMessage)}")
  }
}
