package graft.pipeline

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CorpusExportSpec extends AnyFunSuite with SparkFixture {

  private val dir = "/root/testdata/sf0.001"

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_export").toString

  private def cleanup(d: String): Unit =
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d))

  test("export partitions the corpus losslessly and the manifest verifies") {
    val docs = graft.operators.Tables(spark, dir).documents
    val out = tmp()
    try {
      val m = CorpusExport.writeShards(docs, out, nShards = 8)
      // totals match the corpus
      assert(m.nDocs == docs.count())
      assert(m.nShards == 8 && m.shards.map(_.nDocs).sum == m.nDocs)
      // read-back is EXACTLY the corpus (set equality over all content)
      val back = spark.read.parquet(s"$out/shards")
        .select("doc_id", "text", "lang", "source")
        .collect().map(_.toSeq).toSet
      val orig = docs.select("doc_id", "text", "lang", "source")
        .collect().map(_.toSeq).toSet
      assert(back == orig)
      // the persisted manifest passes its own integrity check
      assert(CorpusExport.verify(spark, out))
      // ... and fails it when a shard is tampered with
      val shard0 = new java.io.File(s"$out/shards")
        .listFiles().filter(_.getName.startsWith("shard=")).head
      org.apache.commons.io.FileUtils.deleteDirectory(shard0)
      assert(!CorpusExport.verify(spark, out))
    } finally cleanup(out)
  }

  test("re-export is byte-identical and shard assignment is identity-stable") {
    val docs = graft.operators.Tables(spark, dir).documents
    val (out1, out2, outGrown) = (tmp(), tmp(), tmp())
    try {
      val m1 = CorpusExport.writeShards(docs, out1, nShards = 8)
      val m2 = CorpusExport.writeShards(docs, out2, nShards = 8)
      assert(m1 == m2, "same corpus must export to an identical manifest")
      val bytes1 = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(out1, "_manifest.json"))
      val bytes2 = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(out2, "_manifest.json"))
      assert(java.util.Arrays.equals(bytes1, bytes2))
      // identity-stability: exporting a GROWN corpus (new ids appended)
      // never moves an existing doc to a different shard
      val grown = docs.unionByName(
        docs.withColumn("doc_id", col("doc_id") + lit(1000000L)))
      CorpusExport.writeShards(grown, outGrown, nShards = 8)
      def shardOf(d: String): Map[Long, Int] =
        spark.read.parquet(s"$d/shards").select("doc_id", "shard")
          .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val before = shardOf(out1)
      val after = shardOf(outGrown)
      before.foreach { case (id, sh) =>
        assert(after(id) == sh, s"doc $id moved shard $sh -> ${after(id)}")
      }
      // hash balance: with 50 docs over 8 shards expect no empty shard
      // monopoly — loose sanity bound, not a distribution test
      val sizes = m1.shards.map(_.nDocs)
      assert(sizes.count(_ > 0) >= 6, s"degenerate shard balance: $sizes")
    } finally { cleanup(out1); cleanup(out2); cleanup(outGrown) }
  }
}
