package graft.streaming

import graft.SparkFixture
import graft.avro.{AvroCodec, AvroQueries}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ParquetGraphSinkSpec extends AnyFunSuite with SparkFixture {

  private val dir = "/root/testdata/sf0.001"

  test("durable sink: streamed graph == batch graph, replays and restarts don't double-count") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val tablePath = java.nio.file.Files.createTempDirectory("graft_sink").toString
    try {
      val triples = graft.graph.TripleStore.triplesFromEvents(
        graft.operators.Tables(spark, dir).events)
      val framed = AvroCodec.encode(triples, AvroQueries.SpoSchemaJson, 2,
        passthrough = Seq("ts_us")).collect()
      val input = MemoryStream[(Long, Array[Byte])]
      val decoded = AvroStream.decode(
        input.toDF().toDF("ts_us", "value"), "value", AvroQueries.SpoSchemaJson,
        passthrough = Seq("ts_us"))
        .filter(col("err").isNull)
      val sink = new ParquetGraphSink(tablePath)
      val q = decoded.writeStream.foreachBatch(sink.merge _).start()
      try {
        val (first, second) = framed.splitAt(framed.length / 2)
        input.addData(first.map(r => (r.getLong(0), r.getAs[Array[Byte]]("value"))).toSeq)
        q.processAllAvailable()
        input.addData(second.map(r => (r.getLong(0), r.getAs[Array[Byte]]("value"))).toSeq)
        q.processAllAvailable()
      } finally q.stop()
      assert(sink.appliedBatchIds.size >= 2)

      val (objs, edges) = sink.graph(spark)
      val batchObjs = graft.SparkEntry.queries("spo_objects")(spark, dir).collect().toSeq
      val batchEdges = graft.SparkEntry.queries("spo_relationships")(spark, dir).collect().toSeq
      assert(objs.orderBy("object_id").collect().toSeq == batchObjs)
      assert(edges.orderBy("source_id", "target_id", "predicate").collect().toSeq == batchEdges)

      // at-least-once replay within the same sink instance: re-deliver an
      // applied batch (same id, same rows) — must be a pure no-op
      val lastId = sink.appliedBatchIds.max
      // materialized (not a live read of the directory merge overwrites)
      val replayRows = spark.read.option("basePath", s"$tablePath/triples")
        .parquet(s"$tablePath/triples/batch_id=$lastId")
        .select("subject", "predicate", "object", "ts_us")
        .collect().toSeq
        .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
        .toDF("subject", "predicate", "object", "ts_us")
      sink.merge(replayRows, lastId)

      // restart: a FRESH sink instance on the same path (no in-memory
      // state carried over) replays the last batch again
      val restarted = new ParquetGraphSink(tablePath)
      restarted.merge(replayRows, lastId)
      assert(restarted.appliedBatchIds == sink.appliedBatchIds)

      val (objs2, edges2) = restarted.graph(spark)
      assert(objs2.orderBy("object_id").collect().toSeq == batchObjs)
      assert(edges2.orderBy("source_id", "target_id", "predicate").collect().toSeq == batchEdges,
        "replay after restart double-counted edges")

      // crash between data write and marker: simulate by deleting the
      // marker and re-merging — the batch directory is overwritten, not
      // appended, so weights stay exact
      java.nio.file.Files.delete(java.nio.file.Paths.get(tablePath, "_applied", lastId.toString))
      val crashRecovered = new ParquetGraphSink(tablePath)
      crashRecovered.merge(replayRows, lastId)
      val (_, edges3) = crashRecovered.graph(spark)
      assert(edges3.orderBy("source_id", "target_id", "predicate").collect().toSeq == batchEdges,
        "re-merge after lost marker double-counted edges")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tablePath))
    }
  }

  test("compaction folds batches into a base generation; graph unchanged through crashes") {
    import spark.implicits._
    val tablePath = java.nio.file.Files.createTempDirectory("graft_sink_c").toString
    def triples(ids: Range) =
      ids.map(i => (s"s$i", "knows", s"o${i % 7}", i.toLong))
        .toDF("subject", "predicate", "object", "ts_us")
    def edgeSet(sink: ParquetGraphSink) = {
      val (_, edges) = sink.graph(spark)
      edges.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
    }
    try {
      val sink = new ParquetGraphSink(tablePath)
      sink.merge(triples(0 until 40), 0L)
      sink.merge(triples(40 until 80), 1L)
      sink.merge(triples(80 until 120), 2L)
      val before = edgeSet(sink)

      sink.compact(spark)
      assert(edgeSet(sink) == before, "compaction changed the graph")
      assert(sink.appliedBatchIds.isEmpty, "folded batches still listed")
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(tablePath, "triples", "batch_id=0")), "folded data not reaped")

      // replay of a folded batch (its marker is gone): the commit record
      // must refuse it — no batch dir reappears, graph unchanged
      sink.merge(triples(0 until 40), 1L)
      assert(edgeSet(sink) == before, "replay of folded batch double-counted")

      // new batch after compaction reads base + unfolded batch together
      sink.merge(triples(120 until 150), 3L)
      val withNew = edgeSet(sink)
      assert(withNew != before)

      // crash AFTER commit, BEFORE cleanup: a stale folded leftover
      // (batch dir + marker with id <= through) must stay invisible and
      // get reaped by the next compact
      val staleDir = java.nio.file.Paths.get(tablePath, "triples", "batch_id=2")
      triples(0 until 5).write.mode("overwrite").parquet(staleDir.toString)
      java.nio.file.Files.createFile(
        java.nio.file.Paths.get(tablePath, "_applied", "2"))
      assert(edgeSet(sink) == withNew, "stale folded leftovers leaked into the graph")

      // second compaction (fresh instance = restart): folds batch 3,
      // reaps the stale leftovers, graph unchanged
      val restarted = new ParquetGraphSink(tablePath)
      restarted.compact(spark)
      assert(edgeSet(restarted) == withNew, "second compaction changed the graph")
      assert(!java.nio.file.Files.exists(staleDir), "stale leftover survived cleanup")
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(tablePath, "base", "gen=1")), "old generation survived")

      // crash BEFORE commit: a partial next-generation directory exists
      // but the commit still points at gen 2 — readers unaffected, and
      // a no-op compact (nothing newly applied) leaves the graph intact
      triples(0 until 3).write.mode("overwrite")
        .parquet(s"$tablePath/base/gen=3")
      assert(edgeSet(restarted) == withNew, "uncommitted generation leaked")
      restarted.compact(spark)
      assert(edgeSet(restarted) == withNew)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tablePath))
    }
  }
}
