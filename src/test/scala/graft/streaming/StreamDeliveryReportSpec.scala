package graft.streaming

import graft.SparkFixture
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins `StreamDeliveryReport`: a single-batch feed of the REAL
  * CsvProducer frames equals the batch `produce_delivery_report`
  * aggregate row-for-row; a split feed converges to the same final
  * report (counters are order-independent sums); high-water offsets
  * are monotone per partition; and serializer failures (sub-frame
  * payloads) reach no column. */
class StreamDeliveryReportSpec extends AnyFunSuite with SparkFixture {

  import StreamDeliveryReport._

  private val dir = "/root/testdata/sf0.001"

  /** (key, frame bytes) of every frame the batch QueryDef produces —
    * the stream consumes the same produce path's output. */
  private def producedMsgs(): Seq[Msg] = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sdr").toString
    try {
      graft.operators.Tables(spark, dir).events
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        .coalesce(1)
        .write.option("header", "true").mode("overwrite").csv(s"$tmp/events_csv")
      val cfg = graft.config.PipelineConfig.parseYaml(graft.avro.AvroQueries.ConfigYaml)
      graft.avro.CsvProducer.produce(spark, s"$tmp/events_csv", cfg,
        graft.avro.AvroQueries.Topic, new graft.avro.SchemaRegistry)
        .select(col("key"), length(col("value")).cast("long").as("n_bytes"))
        .collect().map(r => Msg(r.getString(0), r.getLong(1))).toSeq
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  private def batchReport(): Map[Int, (Long, Long, Long, Long, String)] =
    graft.SparkEntry.queries("produce_delivery_report")(spark, dir)
      .collect().map(r => r.getAs[Int]("partition") ->
        ((r.getAs[Long]("n_produced"), r.getAs[Long]("n_delivered"),
          r.getAs[Long]("n_failed"), r.getAs[Long]("max_offset"),
          r.getAs[String]("err_reason")))).toMap

  private def run(name: String, batches: Seq[Seq[Msg]]): Seq[Seq[Report]] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Msg]
    val q = reports(input.toDS()).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      val out = Seq.newBuilder[Seq[Report]]
      var prev = 0
      batches.foreach { b =>
        input.addData(b); q.processAllAvailable()
        val all = spark.table(name).as[Report].collect().toSeq
        out += all.drop(prev)
        prev = all.size
      }
      out.result()
    } finally q.stop()
  }

  private def asMap(rs: Seq[Report]): Map[Int, (Long, Long, Long, Long, String)] =
    rs.map(r => r.partition ->
      ((r.n_produced, r.n_delivered, r.n_failed, r.max_offset, r.err_reason))).toMap

  test("one-batch feed equals the batch produce_delivery_report aggregate") {
    val msgs = producedMsgs()
    val want = batchReport()
    assert(want.nonEmpty && want.values.map(_._1).sum == msgs.length,
      "fixture drift: stream input and batch query produce different frame counts")
    val got = asMap(run("sdr_eq", Seq(msgs)).head)
    assert(got == want)
  }

  test("split feed converges to the single-feed report; high-water is monotone") {
    val msgs = producedMsgs()
    val (a, b) = msgs.splitAt(msgs.length / 2)
    val batches = run("sdr_split", Seq(a, b))
    // final cumulative rows (the last report per partition) must equal
    // the batch aggregate — counters are order-independent sums
    val finalByPart = (batches.head ++ batches(1))
      .groupBy(_.partition).map { case (p, rs) =>
        p -> rs.maxBy(_.n_produced)
      }
    assert(asMap(finalByPart.values.toSeq) == batchReport())
    // high-water offsets never regress across batches
    batches.head.foreach { first =>
      batches(1).find(_.partition == first.partition).foreach { second =>
        assert(second.max_offset >= first.max_offset,
          s"partition ${first.partition} high-water regressed")
      }
    }
  }

  test("serializer failures (sub-frame payloads) reach no column") {
    val good = Seq(Msg("1", 40L), Msg("9", 40L))  // partitions 1 and 1? 9%8=1
    val bad = Seq(Msg("1", 5L), Msg("2", 0L))     // header-only / empty
    val got = asMap(run("sdr_bad", Seq(good ++ bad)).head)
    assert(got.keySet == Set(1))
    assert(got(1) == ((2L, 2L, 0L, 1L, "NONE")))
  }

  test("the offline partition fails every message with the leader error") {
    // keys 7 and 15 both route to partition 7 (the offline leader)
    val msgs = Seq(Msg("7", 40L), Msg("15", 40L), Msg("0", 40L))
    val got = asMap(run("sdr_off", Seq(msgs)).head)
    assert(got(7) == ((2L, 0L, 2L, -1L, "LEADER_NOT_AVAILABLE")))
    assert(got(0) == ((1L, 1L, 0L, 0L, "NONE")))
  }
}
