package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The cross-index atomic-publish layer ([[ServingSnapshot]]): a
  * published version pins BOTH retrieval legs' exact data-file sets in
  * one manifest (no torn cross-index read), a pinned reader serves
  * bit-identical results across later APPENDS — the case a bare
  * generation pin cannot survive, since appends land new files inside
  * the live generation — and across compactions (the
  * protected-generation retention seam); retirement frees the pinned
  * generation for the next sweep, after which the stale reader fails
  * LOUDLY naming the cause; a duplicate publish of the same version is
  * refused. */
class ServingSnapshotSpec extends AnyFunSuite with SparkFixture {

  private val dir = "/root/testdata/sf0.001"
  private val Terms = Seq("spark", "merge", "vector")
  private val K = 10

  private def docs = Tables(spark, dir).documents
    .select(col("doc_id"), col("text")).filter(col("doc_id") % 5 =!= 0)

  private def vecs = Tables(spark, dir).embeddings
    .select(col("vec_id"), col("embedding")).filter(col("vec_id") =!= 0L)

  private def queryDf = {
    import spark.implicits._
    val q = Tables(spark, dir).embeddings
      .filter(col("vec_id") === 0L).collect().head.getSeq[Float](1)
    Seq((-1L, q)).toDF("query_id", "embedding")
  }

  private def sparseBits(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
    df.select(col("doc_id"), col("score")).collect()
      .map(r => (r.getLong(0), java.lang.Double.doubleToLongBits(r.getDouble(1)))).toSeq

  private def denseBits(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
    df.select(col("vec_id"), col("cosine")).orderBy(col("rk")).collect()
      .map(r => (r.getLong(0), java.lang.Double.doubleToLongBits(r.getDouble(1)))).toSeq

  test("a pinned reader is bit-stable across appends and compactions; " +
    "retire + sweep fails it loudly; fresh resolves see one consistent cut") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_snap").toString
    val term = s"$tmp/term"
    val vec = s"$tmp/vec"
    val snap = s"$tmp/snap"
    try {
      graft.textfn.TermIndex.build(spark, docs, term)
      graft.similarity.VectorIndex.buildIvf(spark, vecs, vec, nCells = 16)

      val v1 = ServingSnapshot.publish(snap, Map("sparse" -> term, "dense" -> vec))
      assert(v1 == 1L)
      val s1 = ServingSnapshot.resolveAt(snap, v1)
      val sparse1 = sparseBits(graft.textfn.TermIndex.probePinned(
        spark, s1.legs("sparse"), Terms, K))
      val dense1 = denseBits(graft.similarity.VectorIndex.probeIvfPinned(
        spark, s1.legs("dense"), queryDf, 5, 4))

      // ingest moves on: appends land INSIDE the live generation — the
      // case that breaks a bare generation pin. A doc engineered to take
      // rank 1 arrives on both legs...
      graft.textfn.TermIndex.append(spark,
        Seq((900001L, "spark merge vector spark")).toDF("doc_id", "text"), term)
      graft.similarity.VectorIndex.append(spark,
        queryDf.select(lit(900001L).as("vec_id"), col("embedding")), vec)
      // ...and the HEAD probe sees it immediately
      assert(sparseBits(graft.textfn.TermIndex.probe(spark, term, Terms, K))
        .exists(_._1 == 900001L))
      // ...but the pinned v1 reader still serves EXACTLY its published
      // world, bit for bit — the appended files are not in its manifest
      assert(sparseBits(graft.textfn.TermIndex.probePinned(
        spark, s1.legs("sparse"), Terms, K)) == sparse1)
      assert(denseBits(graft.similarity.VectorIndex.probeIvfPinned(
        spark, s1.legs("dense"), queryDf, 5, 4)) == dense1)

      // compaction folds to generation 1; v1's pinned generation 0
      // survives the sweep because the ingest loop protects live
      // snapshots' generations
      graft.textfn.TermIndex.compact(spark, term,
        protect = ServingSnapshot.protectedGens(snap, term))
      graft.similarity.VectorIndex.compact(spark, vec,
        protect = ServingSnapshot.protectedGens(snap, vec))
      assert(graft.textfn.TermIndex.currentGen(term) == 1L)
      assert(sparseBits(graft.textfn.TermIndex.probePinned(
        spark, s1.legs("sparse"), Terms, K)) == sparse1)
      assert(denseBits(graft.similarity.VectorIndex.probeIvfPinned(
        spark, s1.legs("dense"), queryDf, 5, 4)) == dense1)

      // a second compact cycle (append to make it fold) runs the sweep
      // again with v1 STILL live — generation 0 must still be protected
      graft.textfn.TermIndex.append(spark,
        Seq((900002L, "spark spark")).toDF("doc_id", "text"), term)
      graft.textfn.TermIndex.compact(spark, term,
        protect = ServingSnapshot.protectedGens(snap, term))
      assert(sparseBits(graft.textfn.TermIndex.probePinned(
        spark, s1.legs("sparse"), Terms, K)) == sparse1)

      // publish v2: a fresh resolve sees the post-ingest world on BOTH
      // legs — one consistent cut, never sparse-new/dense-old
      val v2 = ServingSnapshot.publish(snap, Map("sparse" -> term, "dense" -> vec))
      val s2 = ServingSnapshot.resolveAt(snap, v2)
      assert(ServingSnapshot.resolve(snap).version == v2)
      val sparse2 = sparseBits(graft.textfn.TermIndex.probePinned(
        spark, s2.legs("sparse"), Terms, K))
      val dense2 = denseBits(graft.similarity.VectorIndex.probeIvfPinned(
        spark, s2.legs("dense"), queryDf, 5, 4))
      assert(sparse2.exists(_._1 == 900001L), "v2 must see the appended doc")
      assert(dense2.exists(_._1 == 900001L), "v2 must see the appended vector")
      assert(!sparse1.exists(_._1 == 900001L))

      // retire v1; the NEXT sweep (no longer protecting generation 0)
      // reaps it, and the stale v1 reader fails with the cause named —
      // never silently-empty results
      ServingSnapshot.retire(snap, keepLatest = 1)
      assert(!ServingSnapshot.protectedGens(snap, term).contains(0L))
      graft.textfn.TermIndex.append(spark,
        Seq((900003L, "merge merge")).toDF("doc_id", "text"), term)
      graft.similarity.VectorIndex.append(spark,
        queryDf.select(lit(900003L).as("vec_id"), col("embedding")), vec)
      graft.textfn.TermIndex.compact(spark, term,
        protect = ServingSnapshot.protectedGens(snap, term))
      graft.similarity.VectorIndex.compact(spark, vec,
        protect = ServingSnapshot.protectedGens(snap, vec))
      val eTerm = intercept[IllegalArgumentException] {
        graft.textfn.TermIndex.probePinned(spark, s1.legs("sparse"), Terms, K)
      }
      assert(eTerm.getMessage.contains("re-resolve"), eTerm.getMessage)
      val eVec = intercept[IllegalArgumentException] {
        graft.similarity.VectorIndex.probeIvfPinned(
          spark, s1.legs("dense"), queryDf, 5, 4)
      }
      assert(eVec.getMessage.contains("re-resolve"), eVec.getMessage)
      // the retired manifest itself resolves loudly
      val eSnap = intercept[IllegalArgumentException] {
        ServingSnapshot.resolveAt(snap, v1)
      }
      assert(eSnap.getMessage.contains("retired"), eSnap.getMessage)
      // the v2 reader (still live, pinned at generation 1) is untouched
      assert(sparseBits(graft.textfn.TermIndex.probePinned(
        spark, s2.legs("sparse"), Terms, K)) == sparse2)
      assert(denseBits(graft.similarity.VectorIndex.probeIvfPinned(
        spark, s2.legs("dense"), queryDf, 5, 4)) == dense2)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("BandIndex joins the snapshot tier: the pinned dedup probe is the " +
    "audit shape — bit-stable across appends and a protected compaction, " +
    "wrong-leg manifests refused loudly") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_snapband").toString
    val band = s"$tmp/band"
    val snap = s"$tmp/snap"
    try {
      val base = docs.filter(col("doc_id") % 7 =!= 0)
      val delta = docs.filter(col("doc_id") % 7 === 0)
      graft.dedup.BandIndex.build(spark, base, band)
      ServingSnapshot.publish(snap, Map("dedup" -> band))
      val leg = ServingSnapshot.resolve(snap).legs("dedup")
      def bits(df: org.apache.spark.sql.DataFrame) =
        df.select(col("delta_id"), col("base_id"), col("jaccard")).collect()
          .map(r => (r.getLong(0), r.getLong(1),
            java.lang.Double.doubleToLongBits(r.getDouble(2)))).toSet
      val pinned1 = bits(graft.dedup.BandIndex.probePinned(spark, leg, delta))
      // pinned ≡ head probe while nothing has moved
      assert(pinned1 == bits(graft.dedup.BandIndex.probe(spark, band, delta)))
      assert(pinned1.nonEmpty, "audit probe found no pairs — vacuous test")
      // ingest moves on: the delta itself is appended, then a compaction
      // folds with the pinned generation PROTECTED (BandIndex reaps
      // eagerly, unlike the deferred-reap siblings — protection is
      // load-bearing on the FIRST compact here)
      graft.dedup.BandIndex.append(spark, delta, band)
      graft.dedup.BandIndex.compact(spark, band,
        protect = ServingSnapshot.protectedGens(snap, band))
      assert(graft.dedup.BandIndex.currentGen(band) == 1L)
      assert(bits(graft.dedup.BandIndex.probePinned(spark, leg, delta)) == pinned1,
        "pinned audit probe moved after append + compaction")
      // wrong-leg manifest refused loudly
      val term = s"$tmp/term"
      graft.textfn.TermIndex.build(spark, docs, term)
      ServingSnapshot.publish(s"$tmp/snap2", Map("sparse" -> term))
      val wrongLeg = ServingSnapshot.resolve(s"$tmp/snap2").legs("sparse")
      val e = intercept[IllegalArgumentException] {
        graft.dedup.BandIndex.probePinned(spark, wrongLeg, delta)
      }
      assert(e.getMessage.contains("not a BandIndex"), e.getMessage)
      // LEAK regression (review finding r16): the generation protected
      // above must be reclaimed by the FIRST sweep after retirement —
      // BandIndex reaps eagerly and used to delete only the gen it just
      // folded, so a once-protected generation leaked forever
      ServingSnapshot.publish(snap, Map("dedup" -> band)) // pins gen 1
      ServingSnapshot.retire(snap, keepLatest = 1)        // frees gen 0
      graft.dedup.BandIndex.append(spark,
        delta.limit(5).select((col("doc_id") + 800000000L).as("doc_id"),
          col("text")), band)
      graft.dedup.BandIndex.compact(spark, band,
        protect = ServingSnapshot.protectedGens(snap, band))
      assert(!IndexFs.exists(s"$band/gen=0"),
        "retired generation 0 survived the first post-retirement sweep")
      val eGone = intercept[IllegalArgumentException] {
        graft.dedup.BandIndex.probePinned(spark, leg, delta)
      }
      assert(eGone.getMessage.contains("re-resolve"), eGone.getMessage)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("probeMipsPinned serves the MIPS leg off a snapshot: exhaustive " +
    "pinned probe equals the live exhaustive probe bit-for-bit") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_snapmips").toString
    val vec = s"$tmp/vec"
    val snap = s"$tmp/snap"
    try {
      graft.similarity.VectorIndex.buildMips(spark, vecs, vec, nCells = 16)
      ServingSnapshot.publish(snap, Map("mips" -> vec))
      val leg = ServingSnapshot.resolve(snap).legs("mips")
      def bits(df: org.apache.spark.sql.DataFrame) =
        df.select(col("vec_id"), col("dot")).orderBy(col("rk")).collect()
          .map(r => (r.getLong(0),
            java.lang.Double.doubleToLongBits(r.getDouble(1)))).toSeq
      val live = bits(graft.similarity.VectorIndex
        .probeMips(spark, vec, queryDf, 5, nprobe = 16))
      val pinned = bits(graft.similarity.VectorIndex
        .probeMipsPinned(spark, leg, queryDf, 5, nprobe = 16))
      assert(pinned == live && pinned.nonEmpty)
      // IVF and MIPS legs both pin vectors/ — the mips_m2 marker is the
      // dispatcher (review finding r16): probing a MIPS leg as plain
      // IVF would silently select cells in the wrong space
      val eIvf = intercept[IllegalArgumentException] {
        graft.similarity.VectorIndex.probeIvfPinned(spark, leg, queryDf, 5, 4)
      }
      assert(eIvf.getMessage.contains("probeMipsPinned"), eIvf.getMessage)
      val ivfDir = s"$tmp/ivf"
      graft.similarity.VectorIndex.buildIvf(spark, vecs, ivfDir, nCells = 16)
      ServingSnapshot.publish(s"$tmp/snapIvf", Map("dense" -> ivfDir))
      val ivfLeg = ServingSnapshot.resolve(s"$tmp/snapIvf").legs("dense")
      val eMips = intercept[IllegalArgumentException] {
        graft.similarity.VectorIndex.probeMipsPinned(spark, ivfLeg, queryDf, 5, 4)
      }
      assert(eMips.getMessage.contains("probeIvfPinned"), eMips.getMessage)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("the pinned probe keeps the partition-pruned scan: basePath over " +
    "the manifest's file list preserves shard-directory inference") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_snap3").toString
    val term = s"$tmp/term"
    val snap = s"$tmp/snap"
    try {
      graft.textfn.TermIndex.build(spark, docs, term)
      ServingSnapshot.publish(snap, Map("sparse" -> term))
      val leg = ServingSnapshot.resolve(snap).legs("sparse")
      // the batch face rides the same pinned relation: pinned batch ≡
      // live batch bit-for-bit on the immutable index
      val queries = Seq(0L -> Terms, 1L -> Seq("join", "hash"))
      def batchBits(df: org.apache.spark.sql.DataFrame) =
        df.select(col("qid"), col("doc_id"), col("score")).collect()
          .map(r => (r.getLong(0), r.getLong(1),
            java.lang.Double.doubleToLongBits(r.getDouble(2)))).toSet
      assert(batchBits(graft.textfn.TermIndex.probeBatchPinned(
          spark, leg, queries, 5)) ==
        batchBits(graft.textfn.TermIndex.probeBatch(spark, term, queries, 5)))
      // the plan probe must be ALL-SPARSE for a lazy scan-backed plan
      // (r17: high-df queries take the impact branch, which
      // materializes its proven cut — ImpactProbeSpec pins that
      // branch's pruning); 'dup' is the corpus's one rare term
      val df = graft.textfn.TermIndex.probePinned(spark, leg, Seq("dup"), K)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("postings"),
        s"no postings scan in the pinned probe plan: ${plan.take(600)}")
      assert(plan.contains("PartitionFilters") && plan.contains("shard"),
        s"pinned postings scan not partition-pruned: ${plan.take(600)}")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("the graph store joins the snapshot: one manifest pins retrieval " +
    "AND graph context at one instant; pinned graph bit-stable across " +
    "merges + protected compaction; unfolded batches refused") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_snapg").toString
    val (table, term, snap) = (s"$tmp/graph", s"$tmp/term", s"$tmp/snap")
    try {
      val triples = graft.graph.TripleStore.triplesFromEvents(
        Tables(spark, dir).events)
        .select(col("subject"), col("predicate"), col("object"), col("ts_us"))
      val (b1, b2) = {
        val rows = triples.collect().toSeq
          .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
        rows.splitAt(rows.length / 2)
      }
      def df(rows: Seq[(String, String, String, Long)]) =
        rows.toDF("subject", "predicate", "object", "ts_us")
      val sink = new graft.streaming.ParquetGraphSink(table)
      sink.merge(df(b1), 0L)
      // unfolded batches cannot be pinned — refuse loudly
      val eUnfolded = intercept[IllegalArgumentException] { sink.leg() }
      assert(eUnfolded.getMessage.contains("compact"), eUnfolded.getMessage)
      sink.compact(spark)
      // the knowledge-graph RAG cut: retrieval + graph in ONE manifest
      graft.textfn.TermIndex.build(spark, docs, term)
      ServingSnapshot.publishLegs(snap, Map(
        "graph" -> sink.leg(),
        "sparse" -> ServingSnapshot.legOf(term)))
      val s1 = ServingSnapshot.resolve(snap)
      def graphBits(legArg: ServingSnapshot.Leg) = {
        val (objs, edges) = sink.graphPinned(spark, legArg)
        (objs.collect().map(_.toSeq).toSet, edges.collect().map(_.toSeq).toSet)
      }
      val pinned1 = graphBits(s1.legs("graph"))
      val (lo, le) = sink.graph(spark)
      assert(pinned1 == (lo.collect().map(_.toSeq).toSet,
        le.collect().map(_.toSeq).toSet))
      // the stream moves on: merge + protected compact; the pinned graph
      // is the publish-time graph, not the grown one
      sink.merge(df(b2), 1L)
      sink.compact(spark,
        protect = ServingSnapshot.protectedGens(snap, s"$table/base"))
      assert(graphBits(s1.legs("graph")) == pinned1,
        "pinned graph moved after merge + compaction")
      // wrong-leg: the sparse leg pins subdirectory files
      val eWrong = intercept[IllegalArgumentException] {
        sink.graphPinned(spark, s1.legs("sparse"))
      }
      assert(eWrong.getMessage.contains("not a graph base leg"), eWrong.getMessage)
      // retire + next compact reaps; the stale pinned read fails loudly
      ServingSnapshot.publishLegs(snap, Map("graph" -> sink.leg()))
      ServingSnapshot.retire(snap, keepLatest = 1)
      sink.merge(df(b1.take(3)).select(col("subject"),
        concat(col("predicate"), lit("_x")).as("predicate"),
        col("object"), col("ts_us")), 2L)
      sink.compact(spark,
        protect = ServingSnapshot.protectedGens(snap, s"$table/base"))
      val eGone = intercept[IllegalArgumentException] {
        sink.graphPinned(spark, s1.legs("graph"))
      }
      assert(eGone.getMessage.contains("re-resolve"), eGone.getMessage)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("verify() is the integrity primitive: intact snapshot -> empty; " +
    "a deleted pinned file is named up front, metadata-only") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_snapv").toString
    val term = s"$tmp/term"
    val snap = s"$tmp/snap"
    try {
      graft.textfn.TermIndex.build(spark, docs, term)
      ServingSnapshot.publish(snap, Map("sparse" -> term))
      val snapshot = ServingSnapshot.resolve(snap)
      assert(ServingSnapshot.verify(snapshot).isEmpty)
      // someone deletes data out from under the manifest
      val leg = snapshot.legs("sparse")
      val victim = s"${leg.dir}/gen=${leg.gen}/${leg.files.head}"
      IndexFs.delete(victim)
      val missing = ServingSnapshot.verify(snapshot)
      assert(missing == Seq(victim), s"got $missing")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("a racing reader across a publish flip sees old or new wholly — " +
    "and a duplicate publish of the same version is refused") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_snap2").toString
    val term = s"$tmp/term"
    val snap = s"$tmp/snap"
    try {
      graft.textfn.TermIndex.build(spark, docs, term)
      ServingSnapshot.publish(snap, Map("sparse" -> term))
      // simulate the losing side of a concurrent double-publish: the
      // version-2 marker already exists when our create runs
      val line = s"sparse\t$term\t0\tpostings/placeholder.parquet"
      IndexFs.createMarker(s"$snap/_snap.v=2", s"$line\n#complete n=1")
      intercept[Exception] {
        IndexFs.createMarker(s"$snap/_snap.v=2", "other", overwrite = false)
      }
      // a reader listing mid-flip parses {1} or {1,2} and takes max —
      // resolveAt of whichever version it picked returns that version's
      // FULL manifest (content is write-once), never a blend
      val got = ServingSnapshot.resolve(snap)
      assert(got.version == 2L && got.legs.keySet == Set("sparse"))
      assert(got.legs("sparse").files == Seq("postings/placeholder.parquet"))
      // TORN/IN-FLIGHT manifest (review finding r16): on HDFS/local,
      // create() exposes an EMPTY file before the content lands — a
      // footer-less manifest must not be served. resolve() falls back
      // to the newest COMPLETE version; resolveAt names the cause; and
      // the in-flight version still owns its number (publish allocates
      // PAST it, never onto it)
      IndexFs.createMarker(s"$snap/_snap.v=3", "")
      assert(ServingSnapshot.resolve(snap).version == 2L,
        "resolve served an in-flight manifest")
      val eInflight = intercept[IllegalArgumentException] {
        ServingSnapshot.resolveAt(snap, 3L)
      }
      assert(eInflight.getMessage.contains("incomplete"), eInflight.getMessage)
      assert(ServingSnapshot.currentVersion(snap) == 3L)
      // a stray non-numeric _snap.v=* file breaks nothing
      IndexFs.createMarker(s"$snap/_snap.v=2.bak", "junk")
      assert(ServingSnapshot.resolve(snap).version == 2L)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }
}
