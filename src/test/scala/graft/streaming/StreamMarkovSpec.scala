package graft.streaming

import graft.SparkFixture
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[StreamMarkov]]: live transition rows with the last event carried
  * in state. Pins (1) a one-batch feed's aggregated counts EXACTLY
  * equal to batch `q_events_markov`'s on the same events, (2)
  * split-feed ≡ single-feed — the transition straddling the batch
  * boundary is preserved by the state, the property a per-batch window
  * cannot have. */
class StreamMarkovSpec extends AnyFunSuite with SparkFixture {

  import StreamMarkov._

  private val dir = "/root/testdata/sf0.001"

  private def run(name: String, batches: Seq[Seq[Ev]]): Seq[Trans] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Ev]
    val q = transitions(input.toDS()).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      spark.table(name).as[Trans].collect().toSeq
    } finally q.stop()
  }

  private def counts(ts: Seq[Trans]): Map[(String, String), Long] =
    ts.groupBy(t => (t.from_type, t.to_type)).view.mapValues(_.size.toLong).toMap

  private def eventRows(): Seq[Ev] =
    graft.operators.Tables(spark, dir).events
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => Ev(r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(e => (e.ts_us, e.event_id))

  test("one-batch feed aggregates to exactly the batch q_events_markov counts") {
    val got = counts(run("smk_eq", Seq(eventRows())))
    val batch = graft.SparkEntry.queries("q_events_markov")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == batch, s"stream counts diverged: ${got.toSeq.sorted} vs ${batch.toSeq.sorted}")
  }

  test("split-feed equals single-feed: the boundary transition is not lost") {
    val evs = eventRows()
    val whole = counts(run("smk_w", Seq(evs)))
    // split at an arbitrary point in the global event-time order: every
    // user whose events straddle the cut exercises the carried state
    val (a, b) = evs.splitAt(evs.length / 2)
    val split = counts(run("smk_s", Seq(a, b)))
    assert(split == whole, "batch boundary dropped or duplicated transitions")
    // sanity: the cut actually straddles users (otherwise this test is vacuous)
    val usersA = a.map(_.user_id).toSet
    val usersB = b.map(_.user_id).toSet
    assert((usersA & usersB).nonEmpty, "degenerate split: no user straddles the cut")
  }

  test("out-of-order delivery refuses loudly instead of silently diverging from batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Ev]
    val q = transitions(input.toDS()).writeStream
      .format("memory").queryName("smk_ooo").outputMode("append").start()
    try {
      input.addData(Seq(Ev(1L, 1000L, 10L, "view"), Ev(1L, 2000L, 11L, "click")))
      q.processAllAvailable()
      // a LATE event for user 1, earlier than the carried (2000, 11)
      input.addData(Seq(Ev(1L, 1500L, 12L, "purchase")))
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(ex).exists(_.contains("out-of-order delivery")),
        s"expected the loud ordering refusal, got: ${messages(ex).mkString(" | ")}")
    } finally q.stop()
  }
}
