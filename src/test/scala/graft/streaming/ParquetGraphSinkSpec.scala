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
}
