package graft.streaming

import graft.SparkFixture
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming SEMANTIC ingest loop ([[StreamVectorDedup]]): every
  * micro-batch of embeddings probes the persisted IVF index against
  * base corpus + all earlier batches (never against itself), folds
  * itself in under the frozen quantizer, and re-delivery of the last
  * batch — the only replay serialized micro-batches can produce — is
  * idempotent even though the crash may land between the output write
  * and the index append (the StreamNearDedup contract, semantic axis).
  */
class StreamVectorDedupSpec extends AnyFunSuite with SparkFixture {

  private val dir = "/root/testdata/sf0.001"

  test("each batch probes base + earlier batches; last-batch replay is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val tau = 0.99
    val e = graft.operators.Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_svd").toString
    val idx = s"$tmp/idx"
    val out = s"$tmp/out"
    try {
      graft.similarity.VectorIndex.buildIvf(spark, e, idx, nCells = 8)
      // streamed arrivals are EXACT COPIES of base vectors under fresh
      // ids: cosine(copy, original) clears τ = 0.99 while this random
      // corpus pairs nothing else that high, so the expected pair set
      // is fully determined by construction
      val src = e.filter(col("vec_id") < 10).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1)
      val b1 = (0 until 5).map(i => (100000L + src(i)._1, src(i)._2))
      // batch 2 copies base 5..9 AND batch 1's first arrival (via the
      // same underlying vector) — the latter pairs against BOTH base 1
      // and 100001, proving batch 1 was folded into the index
      val b2 = (5 until 10).map(i => (100000L + src(i)._1, src(i)._2)) :+
        (200000L, src(1)._2)
      val input = MemoryStream[(Long, Seq[Float])]
      val stream = input.toDF().toDF("vec_id", "embedding")
      // exhaustive probing + ample k: the expectation is then exact set
      // identity, not a recall statement
      val q = stream.writeStream
        .foreachBatch(StreamVectorDedup.sink(idx, out, tau = tau, k = 50, nprobe = 8))
        .start()
      try {
        input.addData(b1); q.processAllAvailable()
        input.addData(b2); q.processAllAvailable()
      } finally q.stop()

      def pairSet(): Set[(Long, Long)] = StreamVectorDedup.pairs(spark, out)
        .collect().map(r => (r.getAs[Long]("new_id"), r.getAs[Long]("base_id"))).toSet
      val expected: Set[(Long, Long)] =
        (0 until 5).map(i => (100000L + src(i)._1, src(i)._1)).toSet ++
        (5 until 10).map(i => (100000L + src(i)._1, src(i)._1)).toSet ++
        Set((200000L, src(1)._1), (200000L, 100000L + src(1)._1))
      val got = pairSet()
      assert(got == expected, s"got $got\nexpected $expected")
      // every reported cosine clears the threshold
      StreamVectorDedup.pairs(spark, out).collect()
        .foreach(r => assert(r.getAs[Double]("cosine") >= tau))

      // at-least-once: re-deliver the LAST batch with its own id — its
      // vectors are already in the index; the in-probe own-id exclusion
      // and the duplicate-membership guard must rewrite identical output
      StreamVectorDedup.sink(idx, out, tau = tau, k = 50, nprobe = 8)(
        b2.toDF("vec_id", "embedding"), 1L)
      assert(pairSet() == expected, "replay changed the reported pairs")

      // the CROWDING replay (review finding r13): at k = 1, a replayed
      // batch containing two copies of the same base vector must still
      // report each copy's base original — were own ids filtered AFTER
      // the rank cut, the already-appended batchmate (also cosine 1.0,
      // and id-ordered ahead) would occupy the single slot and the
      // genuine base pair would vanish from the replayed output
      val idx2 = s"$tmp/idx2"
      val out2 = s"$tmp/out2"
      graft.similarity.VectorIndex.buildIvf(spark, e, idx2, nCells = 8)
      val crowd = Seq((300000L, src(2)._2), (300001L, src(2)._2))
      def runCrowd(): Unit =
        StreamVectorDedup.sink(idx2, out2, tau = tau, k = 1, nprobe = 8)(
          crowd.toDF("vec_id", "embedding"), 0L)
      runCrowd() // first delivery
      val firstPairs = StreamVectorDedup.pairs(spark, out2)
        .collect().map(r => (r.getAs[Long]("new_id"), r.getAs[Long]("base_id"))).toSet
      assert(firstPairs == Set((300000L, src(2)._1), (300001L, src(2)._1)),
        s"unexpected first-delivery pairs: $firstPairs")
      runCrowd() // crash-past-append replay: batch already in the index
      val replayPairs = StreamVectorDedup.pairs(spark, out2)
        .collect().map(r => (r.getAs[Long]("new_id"), r.getAs[Long]("base_id"))).toSet
      assert(replayPairs == firstPairs,
        s"crowding replay lost a base pair: $replayPairs vs $firstPairs")

      // COMPACTION: the replayed index holds duplicate postings of the
      // crowd batch; folding the generation must flip the commit, drop
      // the duplicates, and leave probes IDENTICAL — a fresh delivery
      // after compaction still pairs against everything
      val gen0 = graft.similarity.VectorIndex.currentGen(idx2)
      val before = spark.read.parquet(
        graft.similarity.VectorIndex.vectorsPath(idx2)).count()
      graft.similarity.VectorIndex.compact(spark, idx2)
      assert(graft.similarity.VectorIndex.currentGen(idx2) == gen0 + 1,
        "commit record did not flip")
      val after = spark.read.parquet(
        graft.similarity.VectorIndex.vectorsPath(idx2))
      assert(after.count() < before, "replayed duplicates survived compaction")
      assert(after.select("vec_id").distinct().count() == after.count(),
        "compaction left duplicate vec_ids")
      StreamVectorDedup.sink(idx2, out2, tau = tau, k = 1, nprobe = 8)(
        Seq((400000L, src(3)._2)).toDF("vec_id", "embedding"), 2L)
      val post = StreamVectorDedup.pairs(spark, out2)
        .filter(col("new_id") === 400000L)
        .collect().map(r => r.getAs[Long]("base_id")).toSet
      assert(post == Set(src(3)._1),
        s"post-compaction probe diverged: $post")

      // the SINK-DRIVEN trigger (review finding r13: only the manual
      // compact call was pinned): one more delivery with
      // compactEvery = 1 must probe (pairs correct), append, then fold
      // — the generation advances, and the deferred-reap sweep at the
      // start of that fold deletes the generations left stale above
      val genNow = graft.similarity.VectorIndex.currentGen(idx2)
      StreamVectorDedup.sink(idx2, out2, tau = tau, k = 1, nprobe = 8,
        compactEvery = 1)(
        Seq((500000L, src(4)._2)).toDF("vec_id", "embedding"), 3L)
      assert(graft.similarity.VectorIndex.currentGen(idx2) == genNow + 1,
        "sink-driven compactEvery did not fold the generation")
      assert(!new java.io.File(s"$idx2/gen=$gen0").exists,
        "stale generation survived the next compaction's reap sweep")
      val post5 = StreamVectorDedup.pairs(spark, out2)
        .filter(col("new_id") === 500000L)
        .collect().map(r => r.getAs[Long]("base_id")).toSet
      assert(post5 == Set(src(4)._1), s"sink-triggered fold broke the probe: $post5")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }
}
