package graft.operators

import graft.{SparkEntry, SparkFixture}
import org.scalatest.funsuite.AnyFunSuite

/** `q_range_window` value semantics beyond the oracle hash: the RANGE
  * frame must equal the brute-force definition — for every event, the
  * same user's events with ts in [t - 1h, t] — including peer rows at
  * identical timestamps, which a ROWS frame would get wrong.
  */
class RangeWindowSpec extends AnyFunSuite with SparkFixture {

  private val dir = "/root/testdata/sf0.001"

  test("RANGE frame equals the brute-force preceding-hour scan") {
    val got = SparkEntry.queries("q_range_window")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getDouble(4))).toMap
    val evs = Tables(spark, dir).events
      .selectExpr("event_id", "user_id", "unix_micros(ts) AS ts_us", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(evs.nonEmpty && got.size == evs.length)
    val byUser = evs.groupBy(_._2)
    evs.foreach { case (id, user, ts, _) =>
      val frame = byUser(user).filter(e => e._3 >= ts - 3600000000L && e._3 <= ts)
      val wantN = frame.length.toLong
      // decimal(18,2) accumulation: sum cents exactly, divide once
      val wantSpend = frame.map(e => math.rint(e._4 * 100).toLong).sum / 100.0
      val (n, spend) = got(id)
      assert(n == wantN, s"event $id: n_1h $n != $wantN")
      assert(math.abs(spend - wantSpend) < 1e-9, s"event $id: spend_1h $spend != $wantSpend")
    }
  }
}
