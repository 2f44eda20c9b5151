package graft.streaming

import graft.SparkFixture
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming sparse-retrieval loop ([[StreamSparseTopK]]): every
  * micro-batch folds into the persisted postings index under the frozen
  * stats, the standing query re-probes, and the published top-k (a)
  * equals the reference batch lifecycle (build + manual appends +
  * probe), (b) admits a streamed doc that outranks the base corpus
  * immediately, (c) never rescores already-published docs, and (d) is
  * idempotent under last-batch replay — with and without compaction. */
class StreamSparseTopKSpec extends AnyFunSuite with SparkFixture {

  private val dir = "/root/testdata/sf0.001"
  private val Terms = Seq("spark", "merge", "vector")
  private val K = 20

  private def baseDocs = graft.operators.Tables(spark, dir).documents
    .select(col("doc_id"), col("text")).filter(col("doc_id") % 7 =!= 0)

  private def collectK(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
    df.select(col("doc_id"), col("score")).collect()
      .map(r => (r.getAs[Long]("doc_id"),
        java.lang.Double.doubleToLongBits(r.getAs[Double]("score")))).toSeq

  test("streamed batches grow the index; published top-k matches the reference lifecycle") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_sstk").toString
    val idx = s"$tmp/idx"
    val out = s"$tmp/out"
    try {
      graft.textfn.TermIndex.build(spark, baseDocs, idx)
      // batch 1: a doc saturated with the standing query's terms and a
      // tiny dl — it MUST outrank every base doc; batch 2: a filler doc
      // with none of the terms (must never appear in the top-k)
      val b1 = Seq((900001L, "spark merge vector spark merge vector"))
      val b2 = Seq((900002L, "unrelated filler words only"))
      val input = MemoryStream[(Long, String)]
      val q = input.toDF().toDF("doc_id", "text").writeStream
        .foreachBatch(StreamSparseTopK.sink(idx, out, Terms, K))
        .start()
      try {
        input.addData(b1); q.processAllAvailable()
        input.addData(b2); q.processAllAvailable()
      } finally q.stop()

      val all = StreamSparseTopK.results(spark, out)
      val afterB1 = collectK(all.filter(col("batch_id") === 0))
      val afterB2 = collectK(all.filter(col("batch_id") === 1))
      // the term-stuffed arrival took rank 1 the moment it landed
      assert(afterB1.head._1 == 900001L,
        s"streamed doc did not enter the top-k: ${afterB1.take(3)}")
      assert(!afterB1.exists(_._1 == 900002L) && !afterB2.exists(_._1 == 900002L))
      // frozen stats: batch 2 (no matching terms) changes NOTHING —
      // published docs never rescore, they can only be outranked
      assert(afterB2 == afterB1)
      // reference lifecycle: fresh build over the same base + the same
      // appends, probed once — bit-identical to the published feed
      val refIdx = s"$tmp/ref"
      graft.textfn.TermIndex.build(spark, baseDocs, refIdx)
      graft.textfn.TermIndex.append(spark, b1.toDF("doc_id", "text"), refIdx)
      graft.textfn.TermIndex.append(spark, b2.toDF("doc_id", "text"), refIdx)
      val ref = collectK(graft.textfn.TermIndex.probe(spark, refIdx, Terms, K))
      assert(afterB2 == ref)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("last-batch replay is idempotent, with and without compaction") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_sstk2").toString
    try {
      for ((compactEvery, tag) <- Seq((0, "plain"), (1, "compacting"))) {
        val idx = s"$tmp/idx_$tag"
        val out = s"$tmp/out_$tag"
        graft.textfn.TermIndex.build(spark, baseDocs, idx)
        val b1 = Seq((900001L, "spark merge vector spark")).toDF("doc_id", "text")
        val sink = StreamSparseTopK.sink(idx, out, Terms, K,
          compactEvery = compactEvery)
        sink(b1, 0L)
        val first = collectK(StreamSparseTopK.results(spark, out)
          .filter(col("batch_id") === 0))
        sink(b1, 0L) // crash-past-append redelivery
        val replayed = collectK(StreamSparseTopK.results(spark, out)
          .filter(col("batch_id") === 0))
        assert(replayed == first, s"$tag: replay changed the published top-k")
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }
}
