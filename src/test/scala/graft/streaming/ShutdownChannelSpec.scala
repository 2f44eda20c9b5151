package graft.streaming

import graft.SparkFixture
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Pins the graceful-shutdown plumbing: the marker file trips the
  * channel and stops a bound live query; the interrupted stream's
  * durable state RESUMES to exactly an uninterrupted run's result
  * (the replay-proven-sink property the shutdown story rests on);
  * trip-then-register runs the callback immediately (no lost wakeup);
  * double-trip is a no-op. */
class ShutdownChannelSpec extends AnyFunSuite with SparkFixture {

  test("trip is idempotent and never loses a late registration") {
    val ch = new ShutdownChannel
    val hits = new java.util.concurrent.atomic.AtomicInteger
    ch.onShutdown(() => { hits.incrementAndGet(); () })
    assert(!ch.isShutdownRequested && hits.get() == 0)
    ch.requestShutdown()
    ch.requestShutdown() // double-trip: each callback still runs once
    assert(ch.isShutdownRequested && hits.get() == 1)
    // the CV predicate-check: registering AFTER the signal fires now
    ch.onShutdown(() => { hits.incrementAndGet(); () })
    assert(hits.get() == 2)
  }

  test("a marker file stops a bound live query; the sink resumes to the uninterrupted result") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_shutdown").toString
    try {
      def triples(ids: Range) =
        ids.map(i => (s"s$i", "knows", s"o${i % 5}", i.toLong))
          .toDF("subject", "predicate", "object", "ts_us")
      def edges(sink: ParquetGraphSink) = {
        val (_, e) = sink.graph(spark)
        e.collect().map(_.toString).toSet
      }

      // uninterrupted reference: both batches through one sink
      val refSink = new ParquetGraphSink(s"$root/ref")
      refSink.merge(triples(0 until 40), 0L)
      refSink.merge(triples(40 until 80), 1L)
      val want = edges(refSink)

      // live stream bound to a marker-tripped channel
      val sink = new ParquetGraphSink(s"$root/table")
      val input = MemoryStream[(String, String, String, Long)]
      val q = input.toDF().toDF("subject", "predicate", "object", "ts_us")
        .writeStream.foreachBatch(sink.merge _).start()
      val marker = s"$root/_SHUTDOWN"
      val ch = ShutdownChannel.listenForMarker(marker, pollMs = 50L)
      ch.bind(q)
      try {
        input.addData(triples(0 until 40).collect().toSeq
          .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3))))
        q.processAllAvailable()
        // the operational signal: touch the marker (through the same
        // FS seam the indexes use), the channel stops the query
        graft.operators.IndexFs.createMarker(marker)
        q.awaitTermination(30000L)
        assert(!q.isActive, "marker did not stop the bound query")
        assert(ch.isShutdownRequested)
      } finally if (q.isActive) q.stop()

      // restart: a fresh query on the same durable sink delivers the
      // remaining batch — final graph equals the uninterrupted run
      val input2 = MemoryStream[(String, String, String, Long)]
      val q2 = input2.toDF().toDF("subject", "predicate", "object", "ts_us")
        .writeStream.foreachBatch(
          (b: org.apache.spark.sql.DataFrame, id: Long) => sink.merge(b, id + 1L))
        .start()
      try {
        input2.addData(triples(40 until 80).collect().toSeq
          .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3))))
        q2.processAllAvailable()
      } finally q2.stop()
      assert(edges(sink) == want,
        "resumed stream diverged from the uninterrupted run")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    }
  }
}
