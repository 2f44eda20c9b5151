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

  test("rebuilding the index is deterministic") {
    withIndex { a =>
      withIndex { b =>
        def postings(p: String) =
          spark.read.parquet(s"$p/bands")
            .select(col("band_key"), col("doc_id"), col("shard"))
            .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
        assert(postings(a) == postings(b))
        assert(postings(a).nonEmpty)
      }
    }
  }
}
