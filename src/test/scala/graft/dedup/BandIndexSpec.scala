package graft.dedup

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted minhash band index: build-once/probe-many over
  * parquet, posting shards as parquet partitions. Pins (1) probe ≡ the
  * inline incremental query on the same base/delta split, (2) the
  * partition-pruned posting scan, (3) deterministic rebuilds. */
class BandIndexSpec extends AnyFunSuite with SparkFixture {

  private val dir = "/root/testdata/sf0.001"

  private def docs = graft.operators.Tables(spark, dir).documents
  private def base = docs.filter(col("doc_id") % 7 =!= 0)
  private def delta = docs.filter(col("doc_id") % 7 === 0)

  private def withIndex[A](f: String => A): A = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_bandidx").toString
    try {
      BandIndex.build(spark, base, tmp)
      f(tmp)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  private def asMap(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Double] =
    df.collect().map(r => (r.getAs[Long]("delta_id"), r.getAs[Long]("base_id")) ->
      r.getAs[Double]("jaccard")).toMap

  test("probing the index reproduces the inline incremental query exactly") {
    withIndex { idx =>
      val got = asMap(BandIndex.probe(spark, idx, delta))
      val ref = asMap(Dedup.incrementalDedup(docs))
      assert(ref.nonEmpty, "degenerate fixture: inline query found no pairs")
      assert(got == ref)
    }
  }

  test("the posting scan is partition-pruned to the delta's shards") {
    withIndex { idx =>
      // a single-doc delta touches ≤64 bands → ≤64 shards, but the point
      // is the MECHANISM: the scan must carry a partition filter on
      // shard, pruning at planning time rather than filtering rows
      val one = delta.orderBy(col("doc_id")).limit(1)
      val df = BandIndex.probe(spark, idx, one)
      df.count()
      val leaves = df.queryExecution.executedPlan.collectLeaves().map(_.toString)
      val scan = leaves.find(_.contains("bands")).getOrElse(leaves.mkString("\n"))
      assert(scan.contains("PartitionFilters:") && scan.contains("shard"),
        scan.take(800))
    }
  }

  test("hot-band cap is replay-invariant: probe after a crash-after-append replay equals first delivery") {
    import spark.implicits._
    // identical texts: the delta doc shares ALL 64 bands with every
    // base doc, and each shared band has exactly |base| = 3 postings.
    // With cap = 3 every band sits AT the cap on first delivery; after
    // a crash-after-append replay the batch's own postings would push
    // every band to 4 > cap and silently drop all pairs — unless the
    // probe excludes the batch's own doc_ids from the cap counts.
    val text = "alpha beta gamma delta epsilon zeta"
    val base = Seq((1L, text), (2L, text), (3L, text)).toDF("doc_id", "text")
    val delta = Seq((10L, text)).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft_bandidx_replay").toString
    try {
      BandIndex.build(spark, base, tmp)
      def probe() = asMap(BandIndex.probeFeats(spark, tmp,
        Dedup.shingleFeatures(delta, withSig = true, withSim = false),
        tau = 0.9, hotBandCap = 3L, nShards = 64))
      val first = probe()
      assert(first == Map((10L, 1L) -> 1.0, (10L, 2L) -> 1.0, (10L, 3L) -> 1.0))
      BandIndex.append(spark, delta, tmp) // crash window: appended, output not yet re-read
      assert(probe() == first)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("a compacted index probes identically, folds replayed duplicates, and keeps pruning") {
    withIndex { idx =>
      // grow the index the way the streaming sink does, with a replayed
      // (duplicate) append — compaction must fold the duplicates
      val d = delta
      BandIndex.append(spark, d, idx)
      BandIndex.append(spark, d, idx) // crash-after-append replay
      val before = asMap(BandIndex.probe(spark, idx, d))
      val genBefore = BandIndex.currentGen(idx)
      def files(p: String) =
        org.apache.commons.io.FileUtils.listFiles(new java.io.File(p),
          Array("parquet"), true).size
      val filesBefore = files(idx)
      BandIndex.compact(spark, idx)
      assert(BandIndex.currentGen(idx) == genBefore + 1)
      assert(!new java.io.File(s"$idx/gen=$genBefore").exists,
        "old generation not reaped")
      assert(files(idx) < filesBefore,
        s"compaction did not reduce file count (${files(idx)} vs $filesBefore)")
      // duplicates folded: every (band_key, doc_id) posting is unique
      val postings = spark.read.parquet(BandIndex.bandsPath(idx))
      assert(postings.count() ==
        postings.select(col("band_key"), col("doc_id")).distinct().count())
      // probe output identical through the flip
      assert(asMap(BandIndex.probe(spark, idx, d)) == before)
      // and the posting scan is still partition-pruned
      val df = BandIndex.probe(spark, idx, d.orderBy(col("doc_id")).limit(1))
      df.count()
      val leaves = df.queryExecution.executedPlan.collectLeaves().map(_.toString)
      val scan = leaves.find(_.contains("bands")).getOrElse(leaves.mkString("\n"))
      assert(scan.contains("PartitionFilters:") && scan.contains("shard"),
        scan.take(800))
    }
  }

  test("streaming sink with periodic compaction reports the same pairs") {
    import spark.implicits._
    val text = (1 to 30).map(i => s"w$i").mkString(" ")
    val mk = (ids: Seq[Long]) => ids.map(id => (id, text)).toDF("doc_id", "text")
    def runStream(compactEvery: Int): Map[Long, Set[(Long, Long)]] = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_snd_cmp").toString
      try {
        BandIndex.build(spark, mk(Seq(1L, 2L)), s"$tmp/idx")
        val sink = graft.streaming.StreamNearDedup.sink(
          s"$tmp/idx", s"$tmp/out", compactEvery = compactEvery)
        sink(mk(Seq(10L)), 0L)
        sink(mk(Seq(11L)), 1L)
        sink(mk(Seq(12L)), 2L)
        graft.streaming.StreamNearDedup.pairs(spark, s"$tmp/out")
          .collect()
          // batch_id is a partition-directory column: discovery types it int
          .groupBy(_.getAs[Number]("batch_id").longValue)
          .map { case (b, rs) => b ->
            rs.map(r => (r.getAs[Long]("delta_id"), r.getAs[Long]("base_id"))).toSet }
      } finally {
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
      }
    }
    val without = runStream(compactEvery = 0)
    val withCmp = runStream(compactEvery = 1)
    assert(without.nonEmpty && without.values.exists(_.nonEmpty))
    assert(withCmp == without)
  }

  test("rebuilding the index is deterministic") {
    withIndex { a =>
      withIndex { b =>
        def postings(p: String) =
          spark.read.parquet(BandIndex.bandsPath(p))
            .select(col("band_key"), col("doc_id"), col("shard"))
            .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
        assert(postings(a) == postings(b))
        assert(postings(a).nonEmpty)
      }
    }
  }
}
