package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** THE SEAM PROOF for the persisted-index tier's Hadoop `FileSystem`
  * port (VERDICT r15 item 1): every persisted component — Generations,
  * TermIndex, VectorIndex, BandIndex, ParquetGraphSink, Bpe vocab,
  * CorpusExport manifest — runs its FULL lifecycle over
  * `graftfs://...` paths, a scheme `java.io.File` cannot address (the
  * test filesystem is RawLocalFileSystem re-registered under a fake
  * scheme, so any leftover java.io/java.nio path handling fails
  * loudly instead of silently reading an empty directory). Results are
  * pinned against the same component driven over a plain local path —
  * builds are deterministic (spec-pinned per component), so the two
  * must agree bit-for-bit. Session-staged TEMP indexes
  * (createTempDirectory) stay deliberately local: they are JVM-scratch
  * reaped at shutdown, not serving artifacts.
  */
class HadoopFsIndexSpec extends AnyFunSuite with SparkFixture {

  private val dir = "/root/testdata/sf0.001"

  private def registerScheme(): Unit =
    spark.sparkContext.hadoopConfiguration.set("fs.graftfs.impl",
      classOf[graft.testfs.GraftTestFileSystem].getName)

  /** A fresh local temp dir addressed through the fake scheme. */
  private def withSchemePath[A](f: String => A): A = {
    registerScheme()
    val tmp = java.nio.file.Files.createTempDirectory("graft_fsx").toString
    try f(s"graftfs://$tmp")
    finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }

  private def docs = graft.operators.Tables(spark, dir).documents
    .select(col("doc_id"), col("text"))

  test("Generations: marker commits and reaping work over a non-file scheme") {
    withSchemePath { root =>
      val d = s"$root/idx"
      assert(Generations.currentGen(d) == 0L, "fresh dir must read gen 0")
      Generations.flip(d, 1L)
      assert(Generations.currentGen(d) == 1L)
      Generations.flip(d, 2L)
      assert(Generations.currentGen(d) == 2L)
      // older marker swept by the flip — at most the current one remains
      val markers = IndexFs.list(d).map(_.getPath.getName)
        .filter(_.startsWith("_commit.gen="))
      assert(markers.toSeq == Seq("_commit.gen=2"))
      // reap sweeps stale generation DIRECTORIES, keeps the committed one
      spark.range(1).write.mode("overwrite").parquet(s"$d/gen=1/data")
      spark.range(1).write.mode("overwrite").parquet(s"$d/gen=2/data")
      Generations.reapOthers(d, 2L)
      assert(!IndexFs.exists(s"$d/gen=1"), "stale generation survived reap")
      assert(IndexFs.exists(s"$d/gen=2/data"), "committed generation reaped")
    }
  }

  test("TermIndex: build/probe/append/compact lifecycle over a non-file scheme") {
    withSchemePath { root =>
      val remote = s"$root/ti"
      val base = docs.filter(col("doc_id") % 7 =!= 0)
      val delta = docs.filter(col("doc_id") % 7 === 0)
      graft.textfn.TermIndex.build(spark, base, remote)
      def scores(idx: String) = graft.textfn.TermIndex
        .probe(spark, idx, graft.textfn.TextQueries.Bm25Terms, 20)
        .collect().map(r => (r.getAs[Long]("doc_id"),
          java.lang.Double.doubleToLongBits(r.getAs[Double]("score")))).toSeq
      // bit-identical to the same deterministic build on a local path
      val local = java.nio.file.Files.createTempDirectory("graft_ti_loc").toString
      try {
        graft.textfn.TermIndex.build(spark, base, local)
        assert(scores(remote) == scores(local),
          "scheme-served probe diverged from the local-served probe")
      } finally {
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(local))
      }
      graft.textfn.TermIndex.append(spark, delta, remote)
      graft.textfn.TermIndex.append(spark, delta, remote) // replay
      val before = scores(remote)
      val gen0 = graft.textfn.TermIndex.currentGen(remote)
      graft.textfn.TermIndex.compact(spark, remote)
      assert(graft.textfn.TermIndex.currentGen(remote) == gen0 + 1,
        "compact did not fold over the scheme")
      assert(scores(remote) == before, "compaction changed probe scores")
    }
  }

  test("VectorIndex: buildIvf/probe/append/compact lifecycle over a non-file scheme") {
    withSchemePath { root =>
      val remote = s"$root/ivf"
      val e = graft.operators.Tables(spark, dir).embeddings
      val base = e.filter(col("vec_id") % 5 =!= 0)
      val delta = e.filter(col("vec_id") % 5 === 0)
        .select(col("vec_id"), col("embedding"))
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding"))
      graft.similarity.VectorIndex.buildIvf(spark, base, remote, 8)
      def topk(idx: String) = graft.similarity.VectorIndex
        .probeIvf(spark, idx, queries, 5, nprobe = 8)
        .collect().map(_.toString).toSeq
      val local = java.nio.file.Files.createTempDirectory("graft_ivf_loc").toString
      try {
        graft.similarity.VectorIndex.buildIvf(spark, base, local, 8)
        assert(topk(remote) == topk(local))
      } finally {
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(local))
      }
      graft.similarity.VectorIndex.append(spark, delta, remote)
      graft.similarity.VectorIndex.append(spark, delta, remote) // replay
      val before = topk(remote)
      val gen0 = graft.similarity.VectorIndex.currentGen(remote)
      graft.similarity.VectorIndex.compact(spark, remote)
      assert(graft.similarity.VectorIndex.currentGen(remote) == gen0 + 1)
      assert(topk(remote) == before, "compaction changed probe results")
    }
  }

  test("BandIndex: build/probe/append/compact lifecycle over a non-file scheme") {
    withSchemePath { root =>
      val remote = s"$root/band"
      val all = graft.operators.Tables(spark, dir).documents
      val base = all.filter(col("doc_id") % 7 =!= 0)
      val delta = all.filter(col("doc_id") % 7 === 0)
      graft.dedup.BandIndex.build(spark, base, remote)
      def pairs(idx: String) = graft.dedup.BandIndex.probe(spark, idx, delta)
        .collect().map(_.toString).toSeq
      val inline = graft.dedup.Dedup.incrementalDedup(all)
        .collect().map(_.toString).toSeq
      assert(inline.nonEmpty, "degenerate fixture")
      assert(pairs(remote).sorted == inline.sorted,
        "scheme-served probe diverged from the inline incremental query")
      graft.dedup.BandIndex.append(spark, delta, remote)
      graft.dedup.BandIndex.append(spark, delta, remote) // replay
      val gen0 = graft.dedup.BandIndex.currentGen(remote)
      graft.dedup.BandIndex.compact(spark, remote)
      assert(graft.dedup.BandIndex.currentGen(remote) == gen0 + 1)
      assert(!IndexFs.exists(s"$remote/gen=$gen0"),
        "BandIndex's eager reap left the old generation")
    }
  }

  test("ParquetGraphSink: merge/compact/replay lifecycle over a non-file scheme") {
    import spark.implicits._
    withSchemePath { root =>
      val table = s"$root/sink"
      def triples(ids: Range) =
        ids.map(i => (s"s$i", "knows", s"o${i % 7}", i.toLong))
          .toDF("subject", "predicate", "object", "ts_us")
      def edgeSet(sink: graft.streaming.ParquetGraphSink) = {
        val (_, edges) = sink.graph(spark)
        edges.collect().map(_.toString).toSet
      }
      val sink = new graft.streaming.ParquetGraphSink(table)
      sink.merge(triples(0 until 40), 0L)
      sink.merge(triples(40 until 80), 1L)
      val before = edgeSet(sink)
      sink.compact(spark)
      assert(edgeSet(sink) == before, "compaction changed the graph")
      assert(sink.appliedBatchIds.isEmpty, "folded batches still listed")
      assert(!IndexFs.exists(s"$table/triples/batch_id=0"),
        "folded batch directory not reaped")
      // replay of a folded batch: the commit record must refuse it
      sink.merge(triples(0 until 40), 1L)
      assert(edgeSet(sink) == before, "replay of folded batch double-counted")
      // a RESTARTED sink (no in-memory state) reads the same commit
      val restarted = new graft.streaming.ParquetGraphSink(table)
      restarted.merge(triples(80 until 100), 2L)
      assert(edgeSet(restarted) != before)
      restarted.compact(spark)
      assert(restarted.appliedBatchIds.isEmpty)
    }
  }

  test("Bpe vocab and CorpusExport manifest round-trip over a non-file scheme") {
    withSchemePath { root =>
      val merges = Vector(("a", "b"), ("ab", "c"), ("x", "y"))
      graft.textfn.Bpe.save(spark, merges, s"$root/vocab")
      assert(graft.textfn.Bpe.load(spark, s"$root/vocab") == merges)
      val m = graft.pipeline.CorpusExport.writeShards(
        graft.operators.Tables(spark, dir).documents, s"$root/corpus", 4)
      assert(m.nShards == 4)
      assert(graft.pipeline.CorpusExport.verify(spark, s"$root/corpus"),
        "manifest verify failed over the scheme")
    }
  }

  test("ServingSnapshot: publish/resolve/pinned-probe/retire lifecycle " +
    "over a non-file scheme") {
    withSchemePath { root =>
      import spark.implicits._
      val term = s"$root/term"
      val snap = s"$root/snap"
      graft.textfn.TermIndex.build(spark, docs.filter(col("doc_id") % 7 =!= 0), term)
      val v1 = ServingSnapshot.publish(snap, Map("sparse" -> term))
      val s1 = ServingSnapshot.resolveAt(snap, v1)
      assert(s1.legs("sparse").files.nonEmpty &&
        s1.legs("sparse").files.forall(_.startsWith("postings/")))
      def bits(df: org.apache.spark.sql.DataFrame) =
        df.select(col("doc_id"), col("score")).collect()
          .map(r => (r.getLong(0),
            java.lang.Double.doubleToLongBits(r.getDouble(1)))).toSeq
      val pinned1 = bits(graft.textfn.TermIndex.probePinned(
        spark, s1.legs("sparse"), graft.textfn.TextQueries.Bm25Terms, 20))
      assert(pinned1 == bits(graft.textfn.TermIndex.probe(
        spark, term, graft.textfn.TextQueries.Bm25Terms, 20)))
      // append lands inside the live generation — the pinned view is
      // immutable anyway, over the scheme
      graft.textfn.TermIndex.append(spark,
        Seq((900001L, "spark merge vector spark")).toDF("doc_id", "text"), term)
      assert(bits(graft.textfn.TermIndex.probePinned(
        spark, s1.legs("sparse"), graft.textfn.TextQueries.Bm25Terms, 20)) == pinned1)
      assert(ServingSnapshot.protectedGens(snap, term) == Set(0L))
      ServingSnapshot.retire(snap, keepLatest = 1)
      assert(ServingSnapshot.currentVersion(snap) == v1,
        "retire(1) must keep the newest version")
    }
  }
}
