package graft.streaming

import graft.SparkFixture
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The combined RAG ingest loop ([[StreamRagIngest]]): each micro-batch
  * lands in BOTH retrieval legs and is made visible by ONE snapshot
  * publish — every resolved snapshot is a consistent cross-index cut
  * (the batch's doc is in both legs or neither), pinned versions stay
  * bit-stable while the stream moves on (including across compaction),
  * retired versions fail loudly, and a crash-past-append replay
  * publishes a version whose pinned probes are bit-identical. */
class StreamRagIngestSpec extends AnyFunSuite with SparkFixture {

  private val dir = "/root/testdata/sf0.001"
  private val Terms = Seq("spark", "merge", "vector")

  private def docs = graft.operators.Tables(spark, dir).documents
    .select(col("doc_id"), col("text")).filter(col("doc_id") % 7 =!= 0)

  private def vecs = graft.operators.Tables(spark, dir).embeddings
    .select(col("vec_id"), col("embedding")).filter(col("vec_id") =!= 0L)

  private def queryEmb: Array[Float] = graft.operators.Tables(spark, dir)
    .embeddings.filter(col("vec_id") === 0L).collect().head
    .getSeq[Float](1).toArray

  private def queryDf = {
    import spark.implicits._
    Seq((-1L, queryEmb.toSeq)).toDF("query_id", "embedding")
  }

  private def sparseBits(leg: graft.operators.ServingSnapshot.Leg): Seq[(Long, Long)] =
    graft.textfn.TermIndex.probePinned(spark, leg, Terms, 20)
      .select(col("doc_id"), col("score")).collect()
      .map(r => (r.getLong(0), java.lang.Double.doubleToLongBits(r.getDouble(1)))).toSeq

  private def denseBits(leg: graft.operators.ServingSnapshot.Leg): Seq[(Long, Long)] =
    graft.similarity.VectorIndex.probeIvfPinned(spark, leg, queryDf, 5, 4)
      .select(col("vec_id"), col("cosine")).orderBy(col("rk")).collect()
      .map(r => (r.getLong(0), java.lang.Double.doubleToLongBits(r.getDouble(1)))).toSeq

  private def buildBase(termDir: String, vecDir: String): Unit = {
    graft.textfn.TermIndex.build(spark, docs, termDir)
    graft.similarity.VectorIndex.buildIvf(spark, vecs, vecDir, nCells = 16)
  }

  test("every published snapshot is a consistent cross-index cut; pinned " +
    "versions are bit-stable as the stream moves on, across compaction") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_srag").toString
    val (term, vec, snap) = (s"$tmp/term", s"$tmp/vec", s"$tmp/snap")
    try {
      buildBase(term, vec)
      val q = queryEmb
      // batch 1: a doc engineered to take rank 1 on BOTH legs; batch 2:
      // irrelevant on both
      val b1 = Seq((900001L, "spark merge vector spark", q.toSeq))
      val b2 = Seq((900002L, "unrelated filler words", q.map(-_).toSeq))
      val input = MemoryStream[(Long, String, Seq[Float])]
      val stream = input.toDF().toDF("doc_id", "text", "embedding").writeStream
        .foreachBatch(StreamRagIngest.sink(term, vec, snap,
          keepSnapshots = 2, compactEvery = 1))
        .start()
      try {
        input.addData(b1); stream.processAllAvailable()
        val s1 = graft.operators.ServingSnapshot.resolve(snap)
        val sparse1 = sparseBits(s1.legs("sparse"))
        val dense1 = denseBits(s1.legs("dense"))
        // the consistent cut: batch 1's doc is in BOTH legs
        assert(sparse1.exists(_._1 == 900001L), s"sparse leg missing the doc: $sparse1")
        assert(dense1.head._1 == 900001L, s"dense leg missing the vector: $dense1")

        input.addData(b2); stream.processAllAvailable()
        // the stream moved on (appends + compaction behind it) — the
        // pinned v1 reader still serves its published world, bit for bit
        assert(sparseBits(s1.legs("sparse")) == sparse1)
        assert(denseBits(s1.legs("dense")) == dense1)
        val s2 = graft.operators.ServingSnapshot.resolve(snap)
        assert(s2.version > s1.version)
        // batch 2 is irrelevant to the standing probes on both legs —
        // but it must be IN both legs of the new cut (consistency, not
        // ranking): its tokens and vector exist in the pinned file sets
        assert(!sparseBits(s2.legs("sparse")).exists(_._1 == 900002L))
        assert(!denseBits(s2.legs("dense")).exists(_._1 == 900002L))
        val fillerHits = graft.textfn.TermIndex.probePinned(
          spark, s2.legs("sparse"), Seq("filler"), 5)
          .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
        assert(fillerHits == Seq(900002L), s"got $fillerHits")
      } finally stream.stop()
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("a crash-past-append replay publishes a snapshot whose pinned " +
    "probes are bit-identical; retirement keeps the newest versions only") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_srag2").toString
    val (term, vec, snap) = (s"$tmp/term", s"$tmp/vec", s"$tmp/snap")
    try {
      buildBase(term, vec)
      val q = queryEmb
      val b = Seq((900001L, "spark merge vector spark", q.toSeq))
        .toDF("doc_id", "text", "embedding")
      val sink = StreamRagIngest.sink(term, vec, snap, keepSnapshots = 2)
      sink(b, 0L)
      val v1 = graft.operators.ServingSnapshot.resolve(snap)
      val first = (sparseBits(v1.legs("sparse")), denseBits(v1.legs("dense")))
      sink(b, 0L) // crash-past-append redelivery
      val v2 = graft.operators.ServingSnapshot.resolve(snap)
      assert(v2.version == v1.version + 1)
      val replayed = (sparseBits(v2.legs("sparse")), denseBits(v2.legs("dense")))
      assert(replayed == first, "replayed publish diverged from the original")
      // keepSnapshots = 2: both live; a third batch retires the first
      sink(b, 1L)
      val e = intercept[IllegalArgumentException] {
        graft.operators.ServingSnapshot.resolveAt(snap, v1.version)
      }
      assert(e.getMessage.contains("retired"), e.getMessage)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }
}
