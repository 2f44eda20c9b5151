package graft.streaming

import graft.SparkFixture
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Pins `StreamDrift`: a one-batch feed against a baseline equals the
  * batch `docs_drift_lang` EXACTLY on the corpus whose base snapshot is
  * that baseline, PSI is cumulative and monotone-responsive across
  * batches when the mix shifts, and state stays lang-vocabulary-sized.
  */
class StreamDriftSpec extends AnyFunSuite with SparkFixture {

  import StreamDrift._

  private def run(name: String, baseline: Map[String, Map[String, Long]],
                  batches: Seq[Seq[DocLang]]): Seq[Seq[Drift]] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[DocLang]
    val q = drift(input.toDS(), baseline).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      val out = Seq.newBuilder[Seq[Drift]]
      var prev = 0L
      batches.foreach { b =>
        input.addData(b); q.processAllAvailable()
        val all = spark.table(name).as[Drift].collect().toSeq
        out += all.drop(prev.toInt)
        prev = all.size.toLong
      }
      out.result()
    } finally q.stop()
  }

  test("one-batch feed equals batch docs_drift_lang exactly") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    // corpus: base snapshot (doc_id % 7 != 0) IS the baseline; the new
    // snapshot (doc_id % 7 == 0) IS the streamed batch — the batch
    // operator and the stream then compute the SAME quantity
    val langs3 = Array("en", "de", "fr")
    val docs = (0L until 84L).map(i =>
      (i, "s0", langs3((i % 3).toInt))) ++ (100L until 184L).map { i =>
      (i, "s1", if (i % 7 == 0) "zz" else langs3((i % 2).toInt))
    }
    val df = docs.toDF("doc_id", "source", "lang")
      .withColumn("text", lit("x")).withColumn("n_chars", lit(1L))
    val batchOut = graft.pipeline.CorpusOps.docsDriftLang(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getDouble(4), r.getBoolean(5))))
      .toMap
    val baseline = docs.filter(_._1 % 7 != 0).groupBy(_._2).map { case (src, ds) =>
      src -> ds.groupBy(_._3).map { case (l, xs) => l -> xs.size.toLong }
    }
    val streamed = docs.filter(_._1 % 7 == 0).map(d => DocLang(d._2, d._3))
    val got = run("sdrift_eq", baseline, Seq(streamed)).head
      .map(d => d.source -> ((d.n_seen, d.psi, d.drifted))).toMap
    assert(got.keySet == batchOut.keySet)
    got.foreach { case (src, (n, psi, flag)) =>
      val (bn, bpsi, bflag) = batchOut(src)
      assert(n == bn, s"$src n_seen $n vs batch n_new $bn")
      assert(psi == bpsi, s"$src psi $psi vs batch $bpsi — chains diverged")
      assert(flag == bflag)
    }
    // the engineered shift is actually separated
    assert(!got("s0")._3 && got("s1")._3)
  }

  test("cross-batch: cumulative counts, drift appears when the mix shifts") {
    val baseline = Map("s" -> Map("en" -> 50L, "de" -> 50L))
    // batch 1 matches the baseline mix; batch 2 is all-new-language
    val b1 = (1 to 10).map(i => DocLang("s", if (i % 2 == 0) "en" else "de"))
    val b2 = (1 to 30).map(_ => DocLang("s", "zz"))
    val Seq(r1, r2) = run("sdrift_x", baseline, Seq(b1, b2))
    assert(r1.size == 1 && r2.size == 1)
    assert(r1.head.n_seen == 10L && r2.head.n_seen == 40L, "counts not cumulative")
    assert(!r1.head.drifted, s"matching mix flagged: ${r1.head.psi}")
    assert(r2.head.drifted && r2.head.psi > r1.head.psi + 0.5,
      s"shift not caught: ${r1.head.psi} -> ${r2.head.psi}")
  }

  test("psiOf is zero on identical distributions and symmetric-positive otherwise") {
    val a = Map("en" -> 30L, "de" -> 60L, "fr" -> 10L)
    assert(psiOf(a, a) == 0.0)
    val b = Map("en" -> 60L, "de" -> 30L, "fr" -> 10L)
    assert(psiOf(a, b) > 0.0 && psiOf(b, a) > 0.0)
    // unseen-category handling: smoothing keeps it finite and positive
    val c = Map("zz" -> 100L)
    assert(psiOf(a, c) > 1.0 && !psiOf(a, c).isInfinite)
  }

  // ---- numeric (length) axis ----

  private def runLen(name: String, baseline: Map[String, LenBaseline],
                     batches: Seq[Seq[DocLen]],
                     bins: Int = graft.pipeline.CorpusOps.DriftBins): Seq[Seq[LenDrift]] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[DocLen]
    val q = driftLen(input.toDS(), baseline, bins).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      val out = Seq.newBuilder[Seq[LenDrift]]
      var prev = 0L
      batches.foreach { b =>
        input.addData(b); q.processAllAvailable()
        val all = spark.table(name).as[LenDrift].collect().toSeq
        out += all.drop(prev.toInt)
        prev = all.size.toLong
      }
      out.result()
    } finally q.stop()
  }

  test("one-batch length feed equals batch docs_drift exactly on a baseline-binned corpus") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    // the batch operator bins on the COMBINED snapshot's min/max; the
    // stream bins on the frozen BASELINE support — the two coincide
    // exactly when the base snapshot holds each source's extreme rows,
    // so both sources pin their min (5) and max (95) on base doc_ids
    // (1, 2 and 101, 102 — none ≡ 0 mod 7)
    val docs: Seq[(Long, String, Long)] =
      // s0: new docs match the base length mix (both mid-range)
      Seq((1L, "s0", 5L), (2L, "s0", 95L)) ++
        (3L until 84L).map(i => (i, "s0", 10L + (i * 3) % 80)) ++
      // s1: base is mid-range, new docs (ids ≡ 0 mod 7) are all at the
      // top of the SAME support — a pure length shift, no new support
      Seq((101L, "s1", 5L), (102L, "s1", 95L)) ++
        (103L until 184L).map(i =>
          (i, "s1", if (i % 7 == 0) 90L else 20L + (i * 3) % 30))
    val df = docs.toDF("doc_id", "source", "n_chars")
      .withColumn("text", lit("x")).withColumn("lang", lit("en"))
    val batchOut = graft.pipeline.CorpusOps.docsDrift(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getDouble(3), r.getBoolean(4))))
      .toMap
    val baseDf = docs.filter(_._1 % 7 != 0).toDF("doc_id", "source", "n_chars")
    val baseline = lenBaselineOf(baseDf)
    assert(baseline("s0").vmin == 5L && baseline("s0").vmax == 95L)
    val streamed = docs.filter(_._1 % 7 == 0).map(d => DocLen(d._2, d._3))
    val got = runLen("sdriftlen_eq", baseline, Seq(streamed)).head
      .map(d => d.source -> ((d.n_seen, d.psi, d.drifted))).toMap
    assert(got.keySet == batchOut.keySet)
    got.foreach { case (src, (n, psi, flag)) =>
      val (bn, bpsi, bflag) = batchOut(src)
      assert(n == bn, s"$src n_seen $n vs batch n_new $bn")
      assert(psi == bpsi, s"$src psi $psi vs batch $bpsi — chains diverged")
      assert(flag == bflag)
    }
    // the engineered shift is actually separated
    assert(!got("s0")._3 && got("s1")._3)
  }

  test("length axis: cumulative across batches, out-of-support mass clamps to edge bins") {
    // clamping unit rule first: below-support -> bin 0, above -> last
    assert(binOf(10L, 50L, 5, 3L) == 0 && binOf(10L, 50L, 5, 500L) == 4)
    assert(binOf(10L, 50L, 5, 10L) == 0 && binOf(10L, 50L, 5, 49L) == 4)
    assert(binOf(7L, 7L, 5, 123L) == 0, "degenerate support must bin everything at 0")
    // baseline: uniform mid-range lengths over [0, 100)
    val base = lenBaselineOf(
      {
        import spark.implicits._
        (0L until 100L).map(i => ("s", i)).toDF("source", "n_chars")
      })
    // batch 1 mirrors the uniform mix; batch 2 arrives far above support
    val b1 = (0 until 20).map(i => DocLen("s", i * 5L))
    val b2 = (1 to 40).map(_ => DocLen("s", 100000L))
    val Seq(r1, r2) = runLen("sdriftlen_x", base, Seq(b1, b2))
    assert(r1.size == 1 && r2.size == 1)
    assert(r1.head.n_seen == 20L && r2.head.n_seen == 60L, "counts not cumulative")
    assert(!r1.head.drifted, s"matching mix flagged: ${r1.head.psi}")
    assert(r2.head.drifted && r2.head.psi > r1.head.psi + 0.5,
      s"out-of-support surge not caught: ${r1.head.psi} -> ${r2.head.psi}")
    // a caller-supplied bin count that disagrees with the frozen grid
    // must be IGNORED for baseline-present sources — the grid size is
    // the baseline's own counts.length (review finding r13: a free
    // bins argument could index past the state array or silently drop
    // PSI terms)
    val Seq(m1) = runLen("sdriftlen_m", base, Seq(b1), bins = 3)
    assert(m1.head.psi == r1.head.psi,
      s"mismatched bins argument changed a frozen-grid source's PSI: ${m1.head.psi} vs ${r1.head.psi}")
  }
}
