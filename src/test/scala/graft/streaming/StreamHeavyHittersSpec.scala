package graft.streaming

import graft.SparkFixture
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Pins `StreamHeavyHitters`: a split feed folds to the same sharded
  * summaries as a single batch, the candidate union never misses a true
  * heavy hitter, and estimates respect the Misra-Gries error envelope. */
class StreamHeavyHittersSpec extends AnyFunSuite with SparkFixture {

  import StreamHeavyHitters._

  private val Slots = 8
  private val Shards = 4

  // 250 "hot" occurrences diluted by 1000 one-off fillers — the same
  // adversarial mix as the batch kernel's spec, here split mid-stream
  private def tokens: Seq[Tok] = {
    val words = new scala.util.Random(11).shuffle(
      Seq.fill(250)("hot") ++ (0 until 1000).map(i => s"f$i"))
    words.zipWithIndex.map { case (w, i) => Tok(i.toLong, w) }
  }

  /** Run the stream with the given batch splits; return the LATEST
    * summary snapshot per shard (each touched shard re-emits its full
    * summary per batch; latest = max substream_n for that shard). */
  private def run(name: String, batches: Seq[Seq[Tok]]): Map[Int, Set[(String, Long, Long)]] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Tok]
    val q = candidates(input.toDS(), Slots, Shards).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      val rows = spark.table(name).as[Summary].collect()
      rows.groupBy(_.shard).map { case (g, rs) =>
        val latest = rs.map(_.substream_n).max
        g -> rs.filter(_.substream_n == latest)
          .map(s => (s.tok, s.est, s.substream_n)).toSet
      }
    } finally q.stop()
  }

  test("split feed == single-batch feed; candidates superset the exact heavy hitters; MG envelope holds") {
    val toks = tokens
    val whole = run("shh_whole", Seq(toks))
    val split = run("shh_split", Seq(toks.take(300), toks.slice(300, 700), toks.drop(700)))
    assert(whole == split, "sharded summaries diverge when the feed is split across batches")

    val exact = toks.groupBy(_.tok).view.mapValues(_.size.toLong).toMap
    val n = toks.size.toDouble
    val hh = exact.collect { case (t, c) if c > n / Slots => t }.toSet
    assert(hh == Set("hot"), s"test setup: expected one engineered HH, got $hh")
    val candidates = whole.values.flatten.collect { case (t, _, _) if t != null => t }.toSet
    assert(hh.subsetOf(candidates), s"missed heavy hitters: ${hh -- candidates}")

    // per-shard substream sizes from the markers must sum to the feed
    val markers = whole.values.flatten.collect { case (t, _, sn) if t == null => sn }
    assert(markers.sum == toks.size.toLong, s"shard totals $markers don't cover the feed")

    // MG envelope per survivor: never overcount, undershoot <= n_g/(slots+1)
    whole.foreach { case (g, rs) =>
      val nG = rs.collectFirst { case (null, _, sn) => sn }.get
      rs.foreach {
        case (null, _, _) => ()
        case (t, est, _) =>
          val truth = exact(t)
          assert(est <= truth, s"shard $g: $t estimated $est over true $truth")
          assert(truth - est <= nG.toDouble / (Slots + 1) + 1e-9,
            s"shard $g: $t undershoots past the MG bound")
      }
    }
  }
}
