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
