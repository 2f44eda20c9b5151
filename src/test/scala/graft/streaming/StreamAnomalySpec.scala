package graft.streaming

import graft.{SparkEntry, SparkFixture}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Pins `StreamAnomaly`: a single-batch feed reproduces the batch
  * operator bit-for-bit (exact integer moments → identical double
  * chain), and cross-batch rows are judged on their own batch's
  * cumulative moments. */
class StreamAnomalySpec extends AnyFunSuite with SparkFixture {

  import StreamAnomaly._

  private def run(name: String, batches: Seq[Seq[Ev]]): Seq[Hit] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Ev]
    val q = anomalies(input.toDS()).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      spark.table(name).as[Hit].collect().toSeq.sortBy(_.event_id)
    } finally q.stop()
  }

  test("single-batch feed equals the batch operator bit-for-bit on real events") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val evs = graft.operators.Tables(spark, dir).events
      .select(col("event_id"), col("event_type"), col("value")).collect()
      .map(r => Ev(r.getLong(0), r.getString(1), cents(r.getDouble(2)))).toSeq
    val streamed = run("sanom_whole", Seq(evs))
      .map(h => (h.event_id, h.event_type, h.value, h.z))
    val batch = SparkEntry.queries("q_events_anomaly")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("cross-batch: rows are judged on their own batch's cumulative moments") {
    val base1 = (1L to 30L).map(i => Ev(i, "spiky", 100L))
    val spike = Ev(99L, "spiky", 50000L)
    val base2 = (101L to 130L).map(i => Ev(i, "spiky", 100L))
    val got = run("sanom_split", Seq(base1 :+ spike, base2))
    // the spike flags in its own batch; the later quiet batch adds no
    // flags (its rows sit at the mean of the cumulative distribution)
    assert(got.map(_.event_id) == Seq(99L), s"got $got")
    assert(!got.head.z.isNaN && !got.head.z.isInfinite && got.head.z > 3.0)
    // degenerate prefix: a constant-only first batch emits nothing
    val quiet = run("sanom_quiet", Seq((1L to 5L).map(i => Ev(i, "const", 100L))))
    assert(quiet.isEmpty)
  }
}
