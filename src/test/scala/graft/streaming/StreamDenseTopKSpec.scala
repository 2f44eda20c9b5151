package graft.streaming

import graft.SparkFixture
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming dense-retrieval loop ([[StreamDenseTopK]]): every
  * micro-batch appends into the persisted vector index under the frozen
  * coarse quantizer, the standing query vectors re-probe, and the
  * published top-k (a) equals the reference batch lifecycle (buildIvf +
  * manual appends + probeIvf), (b) admits a streamed vector that
  * outranks the base corpus immediately, (c) is unchanged by an
  * irrelevant batch, (d) is idempotent under last-batch replay — with
  * and without compaction — and (e) refuses non-negative standing query
  * ids loudly (the probeIvf self-exclusion blind spot). */
class StreamDenseTopKSpec extends AnyFunSuite with SparkFixture {

  private val dir = "/root/testdata/sf0.001"
  private val K = 5
  private val NProbe = 4

  private def embeddings = graft.operators.Tables(spark, dir).embeddings
    .select(col("vec_id"), col("embedding"))

  private def baseVectors = embeddings.filter(col("vec_id") =!= 0L)

  private def queryEmb: Array[Float] = embeddings
    .filter(col("vec_id") === 0L).collect().head
    .getSeq[Float](1).toArray

  private def collectK(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
    df.select(col("vec_id"), col("cosine")).orderBy(col("rk")).collect()
      .map(r => (r.getAs[Long]("vec_id"),
        java.lang.Double.doubleToLongBits(r.getAs[Double]("cosine")))).toSeq

  test("streamed batches grow the index; published top-k matches the reference lifecycle") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_sdtk").toString
    val idx = s"$tmp/idx"
    val out = s"$tmp/out"
    try {
      graft.similarity.VectorIndex.buildIvf(spark, baseVectors, idx, nCells = 16)
      val q = queryEmb
      val queries = Seq((-1L, q))
      // batch 1: the query vector itself (cosine 1.0 — must take rank 1
      // the moment it lands, and it lands in the FIRST probed cell by
      // construction); batch 2: its negation (cosine -1.0 — must never
      // appear in the top-k, and published results must not move)
      val b1 = Seq((900001L, q.toSeq))
      val b2 = Seq((900002L, q.map(-_).toSeq))
      val input = MemoryStream[(Long, Seq[Float])]
      val stream = input.toDF().toDF("vec_id", "embedding").writeStream
        .foreachBatch(StreamDenseTopK.sink(idx, out, queries, K, NProbe))
        .start()
      try {
        input.addData(b1); stream.processAllAvailable()
        input.addData(b2); stream.processAllAvailable()
      } finally stream.stop()

      val all = StreamDenseTopK.results(spark, out)
      val afterB1 = collectK(all.filter(col("batch_id") === 0))
      val afterB2 = collectK(all.filter(col("batch_id") === 1))
      assert(afterB1.head._1 == 900001L,
        s"streamed vector did not take rank 1: ${afterB1.take(3)}")
      assert(!afterB1.exists(_._1 == 900002L) && !afterB2.exists(_._1 == 900002L))
      // frozen quantizer: the anti-aligned arrival changes NOTHING —
      // published vectors leave the top-k only by being outranked
      assert(afterB2 == afterB1)
      // reference lifecycle: fresh build over the same base + the same
      // appends, probed once — bit-identical to the published feed
      val refIdx = s"$tmp/ref"
      graft.similarity.VectorIndex.buildIvf(spark, baseVectors, refIdx, nCells = 16)
      graft.similarity.VectorIndex.append(spark,
        b1.toDF("vec_id", "embedding"), refIdx)
      graft.similarity.VectorIndex.append(spark,
        b2.toDF("vec_id", "embedding"), refIdx)
      val qdf = Seq((-1L, q.toSeq)).toDF("query_id", "embedding")
      val ref = collectK(graft.similarity.VectorIndex
        .probeIvf(spark, refIdx, qdf, K, NProbe))
      assert(afterB2 == ref)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("last-batch replay is idempotent, with and without compaction") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_sdtk2").toString
    try {
      val q = queryEmb
      for ((compactEvery, tag) <- Seq((0, "plain"), (1, "compacting"))) {
        val idx = s"$tmp/idx_$tag"
        val out = s"$tmp/out_$tag"
        graft.similarity.VectorIndex.buildIvf(spark, baseVectors, idx, nCells = 16)
        val b1 = Seq((900001L, q.toSeq)).toDF("vec_id", "embedding")
        val sink = StreamDenseTopK.sink(idx, out, Seq((-1L, q)), K, NProbe,
          compactEvery = compactEvery)
        sink(b1, 0L)
        val first = collectK(StreamDenseTopK.results(spark, out)
          .filter(col("batch_id") === 0))
        sink(b1, 0L) // crash-past-append redelivery
        val replayed = collectK(StreamDenseTopK.results(spark, out)
          .filter(col("batch_id") === 0))
        assert(replayed == first, s"$tag: replay changed the published top-k")
        assert(first.head._1 == 900001L)
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("non-negative standing query ids are refused loudly") {
    val e = intercept[IllegalArgumentException] {
      StreamDenseTopK.sink("/nowhere", "/nowhere", Seq((7L, queryEmb)))
    }
    assert(e.getMessage.contains("negative"), e.getMessage)
  }
}
