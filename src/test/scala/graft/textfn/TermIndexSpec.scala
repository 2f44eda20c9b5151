package graft.textfn

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted sparse (BM25) index — the VectorIndexSpec discipline
  * applied to the postings tier. Pins (1) probe ≡ the inline
  * `text_bm25` census BIT-FOR-BIT (doubleToLongBits on every score),
  * (2) the partition-pruned probe plan, (3) the frozen-stats growth
  * contract: base docs' scores never move under append, appends are
  * replay-invariant, compact folds duplicates and preserves the probe,
  * (4) deterministic rebuilds. */
class TermIndexSpec extends AnyFunSuite with SparkFixture {

  private val dir = "/root/testdata/sf0.001"
  private val K = 20

  private def docs = graft.operators.Tables(spark, dir).documents
    .select(col("doc_id"), col("text"))

  private def collectScores(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
    df.collect().map(r => (r.getAs[Long]("doc_id"),
      java.lang.Double.doubleToLongBits(r.getAs[Double]("score")))).toSeq

  private def withIndex[A](d: org.apache.spark.sql.DataFrame)(f: String => A): A = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_ti").toString
    try {
      TermIndex.build(spark, d, tmp)
      f(tmp)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("probe equals the inline text_bm25 top-20 bit-for-bit") {
    // the equality contract needs >= K docs containing >= 1 query term
    // (the probe ranks matching docs only); assert it holds here so a
    // future testdata change fails loudly instead of masking the pin
    val matching = docs.filter(
      TextQueries.Bm25Terms.map(t =>
        array_contains(split(lower(col("text")), " "), t)).reduce(_ || _))
      .count()
    assert(matching >= K, s"corpus has only $matching matching docs")
    val inline = collectScores(TextQueries.bm25Top20(spark, dir))
    withIndex(docs) { idx =>
      val probed = collectScores(
        TermIndex.probe(spark, idx, TextQueries.Bm25Terms, K))
      assert(probed == inline)
    }
  }

  test("the probe scan is partition-pruned to the queried terms' shards") {
    // the query must be ALL-SPARSE for a lazy scan-backed plan: the
    // shipped corpus's standing terms are all high-df (~77%), so since
    // r17 they take the impact-bucket branch, which materializes its
    // proven cut driver-side (ImpactProbeSpec pins that branch's own
    // pruning). 'dup' is the corpus's one rare term (df ≈ 5%).
    withIndex(docs) { idx =>
      val df = TermIndex.probe(spark, idx, Seq("dup"), K)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      val scanLine = plan.linesIterator.find(_.contains("postings")).getOrElse(
        fail(s"no postings scan in the probe plan: ${plan.take(600)}"))
      assert(plan.contains("PartitionFilters") && scanLine.contains("postings"),
        s"postings scan not partition-pruned: ${plan.take(600)}")
      assert(plan.contains("shard"), s"no shard pruning: ${plan.take(600)}")
    }
  }

  test("frozen stats: base docs' scores never move when the corpus grows") {
    // base/delta on the house split; the delta ids are new arrivals
    val base = docs.filter(col("doc_id") % 7 =!= 0)
    val delta = docs.filter(col("doc_id") % 7 === 0)
    withIndex(base) { idx =>
      val before = collectScores(
        TermIndex.probe(spark, idx, TextQueries.Bm25Terms, 1000))
        .filter { case (id, _) => id % 7 != 0 }.toMap
      TermIndex.append(spark, delta, idx)
      val after = collectScores(
        TermIndex.probe(spark, idx, TextQueries.Bm25Terms, 1000))
      // every base doc's score is bit-identical to its pre-append score
      after.filter { case (id, _) => id % 7 != 0 }.foreach { case (id, s) =>
        assert(before(id) == s, s"base doc $id rescored under append")
      }
      // appended docs joined the candidate set (delta matches exist at
      // this corpus density), scored under the FROZEN base stats
      assert(after.exists { case (id, _) => id % 7 == 0 })
    }
  }

  test("append is replay-invariant and compact folds the duplicates") {
    val base = docs.filter(col("doc_id") % 7 =!= 0)
    val delta = docs.filter(col("doc_id") % 7 === 0)
    withIndex(base) { idx =>
      TermIndex.append(spark, delta, idx)
      val once = collectScores(
        TermIndex.probe(spark, idx, TextQueries.Bm25Terms, K))
      TermIndex.append(spark, delta, idx) // at-least-once replay
      val twice = collectScores(
        TermIndex.probe(spark, idx, TextQueries.Bm25Terms, K))
      assert(twice == once, "replayed append changed the probe")
      val gen0 = TermIndex.currentGen(idx)
      TermIndex.compact(spark, idx)
      assert(TermIndex.currentGen(idx) == gen0 + 1, "compact did not fold")
      val compacted = collectScores(
        TermIndex.probe(spark, idx, TextQueries.Bm25Terms, K))
      assert(compacted == once, "compact changed the probe")
      // folded generation holds exactly the distinct postings
      val rows = spark.read.parquet(TermIndex.postingsPath(idx))
      assert(rows.count() == rows.distinct().count(),
        "compacted generation still holds duplicate postings")
      // nothing to fold now -> no-op (no new generation)
      TermIndex.compact(spark, idx)
      assert(TermIndex.currentGen(idx) == gen0 + 1,
        "compact of a folded index was not a no-op")
    }
  }

  test("compact folds appends that land ONLY in leaves empty at build: " +
    "the persisted leaf census catches the fresh single-file leaf the " +
    "pre-r18 >1-file heuristic missed (ADVICE r17)") {
    import spark.implicits._
    // every build posting sits at its term's ceiling (identical tf/dl
    // per term → c = max_impact → bucket 0), so build populates ONLY
    // ib=0 leaves; the appended doc's lower-contribution postings land
    // in ib>0 leaves that did NOT exist at build, one file each
    val base = (0L until 10L)
      .map(i => (i, s"w w w f$i")).toDF("doc_id", "text")
    withIndex(base) { idx =>
      TermIndex.append(spark,
        Seq((100L, "w g0 g1 g2 g3 g4 g5 g6")).toDF("doc_id", "text"), idx)
      val before = collectScores(TermIndex.probe(spark, idx, Seq("w"), 11))
      assert(before.exists(_._1 == 100L), "appended doc missing from probe")
      TermIndex.compact(spark, idx)
      assert(TermIndex.currentGen(idx) == 1L,
        "compact no-opped on an append that only created NEW leaves")
      assert(collectScores(TermIndex.probe(spark, idx, Seq("w"), 11)) == before,
        "compact changed the probe")
      // steady state: the folded generation's census matches -> no-op
      TermIndex.compact(spark, idx)
      assert(TermIndex.currentGen(idx) == 1L,
        "compact of a freshly folded index was not a no-op")
    }
  }

  test("pre-impact (pre-r17) index layout: append writes the legacy shape " +
    "and keeps the index readable; compact refuses loudly with a rebuild " +
    "instruction (ADVICE r17)") {
    import spark.implicits._
    val d = (0L until 12L).map(i => (i, s"w w x$i y$i")).toDF("doc_id", "text")
    val legacy = java.nio.file.Files.createTempDirectory("graft_ti_legacy").toString
    try {
      // forge the pre-r17 layout from a modern build: postings without
      // the ib level, terms without max_impact/ib_counts
      val modern = java.nio.file.Files.createTempDirectory("graft_ti_mod").toString
      try {
        TermIndex.build(spark, d, modern)
        spark.read.parquet(TermIndex.postingsPath(modern))
          .select(col("term"), col("doc_id"), col("tf"), col("dl"), col("shard"))
          .repartition(col("shard"))
          .write.partitionBy("shard").parquet(s"$legacy/gen=0/postings")
        spark.read.parquet(s"$modern/terms")
          .select(col("term"), col("shard"), col("df"))
          .repartition(col("shard"))
          .write.partitionBy("shard").parquet(s"$legacy/terms")
        spark.read.parquet(s"$modern/stats").write.parquet(s"$legacy/stats")
      } finally {
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(modern))
      }
      val before = collectScores(TermIndex.probe(spark, legacy, Seq("w"), 12))
      // pre-r18, append threw an AnalysisException selecting max_impact;
      // it must now write the LEGACY layout (no ib column) so the
      // generation stays structurally homogeneous and readable
      TermIndex.append(spark,
        Seq((200L, "w z0 z1 z2")).toDF("doc_id", "text"), legacy)
      val after = collectScores(TermIndex.probe(spark, legacy, Seq("w"), 13))
      assert(after.exists(_._1 == 200L),
        "legacy append's postings invisible to the probe")
      assert(before.forall(after.contains),
        "legacy append rescored existing docs")
      // compact cannot fold what it cannot read `ib` from — loud, named
      val e = intercept[IllegalStateException] {
        TermIndex.compact(spark, legacy)
      }
      assert(e.getMessage.contains("pre-impact") &&
        e.getMessage.contains("Rebuild"), e.getMessage)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(legacy))
    }
  }

  test("adversarial corpus: probe ≡ inline census bit-for-bit beyond the shipped data") {
    // edges the shipped corpus never exercises: empty text (dl = 1 via
    // [""]), term-stuffed short docs, one extreme-dl doc diluting its
    // single hit, repeated terms, docs sharing no query term
    import spark.implicits._
    val rows: Seq[(Long, String)] =
      (0L until 25L).map(i => i -> s"spark merge filler$i vector spark") ++
      Seq(
        100L -> "",
        101L -> "spark spark spark spark",
        102L -> (("pad " * 5000) + "spark"),
        103L -> "merge",
        104L -> "nothing shared here at all",
        105L -> "vector vector merge spark vector")
    val tmpData = java.nio.file.Files.createTempDirectory("graft_ti_adv").toString
    try {
      rows.toDF("doc_id", "text").write.mode("overwrite")
        .parquet(s"$tmpData/documents.parquet")
      val inline = collectScores(TextQueries.bm25Top20(spark, tmpData))
      // ≥ 20 docs with rounded-positive scores — the equality precondition
      assert(inline.count { case (_, bits) =>
        java.lang.Double.longBitsToDouble(bits) > 0.0 } >= K)
      withIndex(spark.read.parquet(s"$tmpData/documents.parquet")
        .select(col("doc_id"), col("text"))) { idx =>
        val probed = collectScores(
          TermIndex.probe(spark, idx, TextQueries.Bm25Terms, K))
        assert(probed == inline)
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmpData))
    }
  }

  test("rebuild is deterministic: postings, terms, and stats byte-identical") {
    def fingerprint(idx: String): (Seq[String], Seq[String], (Double, Double)) = (
      spark.read.parquet(TermIndex.postingsPath(idx))
        .select(col("term"), col("doc_id"), col("tf"), col("dl"), col("shard"))
        .collect().map(_.toString).toSeq.sorted,
      spark.read.parquet(s"$idx/terms").collect().map(_.toString).toSeq.sorted,
      TermIndex.loadStats(spark, idx))
    val a = withIndex(docs)(fingerprint)
    val b = withIndex(docs)(fingerprint)
    assert(a == b)
  }

  test("max-score pruning: a stopword-class term engages the pruned branch, result bit-identical") {
    import spark.implicits._
    // every doc gains a universal token → df("the") = n_docs, the
    // dense class by any threshold. The sparse partner must actually BE
    // sparse: the shipped corpus's standing terms are Zipf-head tokens
    // (df ≈ 0.77·n — themselves dense at the 0.5 threshold, which is
    // why the standing QueryDefs take the exhaustive path unchanged);
    // `dup` is the corpus's one rare term (df = 25 of 500 here).
    val stopworded = docs.withColumn("text",
      when(col("text").isNotNull, concat(col("text"), lit(" the"))))
    withIndex(stopworded) { idx =>
      val terms = Seq("dup", "the")
      val prunedBefore = TermIndex.maxScorePruned.get()
      val got = collectScores(TermIndex.probe(spark, idx, terms, K))
      assert(TermIndex.maxScorePruned.get() == prunedBefore + 1,
        "dense+sparse query did not take the max-score branch")
      val want = collectScores(TermIndex.probeRelExhaustive(spark,
        spark.read.parquet(TermIndex.postingsPath(idx)),
        spark.read.parquet(s"$idx/terms"),
        TermIndex.loadStats(spark, idx), terms, K, TermIndex.DefaultShards))
      assert(got == want, "pruned branch diverged from the exhaustive probe")
    }
  }

  test("max-score pruning falls back when dense terms genuinely decide the ranking") {
    import spark.implicits._
    // 30 docs: 10 long docs carry the sparse term `rare` (contribution
    // ~0.63 each), 18 short docs carry only the dense term `mid`
    // (df = 0.6·n > the 0.5 threshold; contribution ~0.81 — the TRUE
    // top-5 is dense-only docs the candidate generator cannot see).
    // The k-th candidate (0.63) does NOT clear the dense ceiling
    // (2.2·idf ≈ 1.14), so the proof fails and the probe must fall
    // back to the exhaustive path — a silent prune here would return
    // the wrong five documents.
    val rows =
      (0 until 10).map(i => (i.toLong,
        ("rare" +: (0 until 49).map(j => s"f${i}_$j")).mkString(" "))) ++
      (10 until 28).map(i => (i.toLong, "mid pad")) ++
      (28 until 30).map(i => (i.toLong, "pad pad"))
    val d = rows.toDF("doc_id", "text")
    withIndex(d) { idx =>
      val fellBackBefore = TermIndex.maxScoreFellBack.get()
      val got = TermIndex.probe(spark, idx, Seq("rare", "mid"), 5).collect()
      assert(TermIndex.maxScoreFellBack.get() == fellBackBefore + 1,
        "unprovable prune did not fall back")
      val topIds = got.map(_.getAs[Long]("doc_id")).toSet
      assert(topIds.forall(id => id >= 10 && id < 28),
        s"true top-5 is the dense-only docs; got $topIds")
      val want = TermIndex.probeRelExhaustive(spark,
        spark.read.parquet(TermIndex.postingsPath(idx)),
        spark.read.parquet(s"$idx/terms"),
        TermIndex.loadStats(spark, idx), Seq("rare", "mid"), 5,
        TermIndex.DefaultShards).collect()
      assert(got.map(_.toString).toSeq == want.map(_.toString).toSeq)
    }
  }

  test("max-score pruning falls back when there are fewer than k candidates") {
    import spark.implicits._
    val rows =
      (0 until 3).map(i => (i.toLong, s"rare doc_$i")) ++
      (3 until 20).map(i => (i.toLong, "the the"))
    val d = rows.toDF("doc_id", "text")
    withIndex(d) { idx =>
      val fellBackBefore = TermIndex.maxScoreFellBack.get()
      // df("the") = 17/20 > 0.5 → dense; only 3 candidate docs < k=10
      val got = TermIndex.probe(spark, idx, Seq("rare", "the"), 10).collect()
      assert(TermIndex.maxScoreFellBack.get() == fellBackBefore + 1)
      val want = TermIndex.probeRelExhaustive(spark,
        spark.read.parquet(TermIndex.postingsPath(idx)),
        spark.read.parquet(s"$idx/terms"),
        TermIndex.loadStats(spark, idx), Seq("rare", "the"), 10,
        TermIndex.DefaultShards).collect()
      assert(got.map(_.toString).toSeq == want.map(_.toString).toSeq)
    }
  }

  test("batch max-score: a mixed stopword query prunes, the whole batch stays exact") {
    import spark.implicits._
    val stopworded = docs.withColumn("text",
      when(col("text").isNotNull, concat(col("text"), lit(" the"))))
    withIndex(stopworded) { idx =>
      // q0 mixed (rare sparse + universal dense), q1 all-dense
      // (Zipf-head standing terms — unrestricted by construction)
      val batch = Seq(0L -> Seq("dup", "the"), 1L -> Seq("spark", "merge"))
      val prunedBefore = TermIndex.maxScoreBatchPruned.get()
      val got = TermIndex.probeBatch(spark, idx, batch, 5)
        .collect().map(_.toString).toSeq
      assert(TermIndex.maxScoreBatchPruned.get() == prunedBefore + 1,
        "mixed batch did not take the max-score branch")
      val want = TermIndex.probeBatchRel(spark,
        spark.read.parquet(TermIndex.postingsPath(idx)),
        spark.read.parquet(s"$idx/terms"), TermIndex.loadStats(spark, idx),
        batch, 5, TermIndex.DefaultShards, pruneMaxScore = false)
        .collect().map(_.toString).toSeq
      assert(got == want, "pruned batch diverged from the exhaustive batch")
    }
  }

  test("batch max-score falls back when a dense term genuinely decides a query's ranking") {
    import spark.implicits._
    // the single-probe adversarial corpus: true top-5 for (rare, mid)
    // is dense-only docs the candidate generator cannot see
    val rows =
      (0 until 10).map(i => (i.toLong,
        ("rare" +: (0 until 49).map(j => s"f${i}_$j")).mkString(" "))) ++
      (10 until 28).map(i => (i.toLong, "mid pad")) ++
      (28 until 30).map(i => (i.toLong, "pad pad"))
    withIndex(rows.toDF("doc_id", "text")) { idx =>
      val batch = Seq(0L -> Seq("rare", "mid"))
      val fellBackBefore = TermIndex.maxScoreBatchFellBack.get()
      val got = TermIndex.probeBatch(spark, idx, batch, 5).collect()
      assert(TermIndex.maxScoreBatchFellBack.get() == fellBackBefore + 1,
        "unprovable batch prune did not fall back")
      val topIds = got.map(_.getAs[Long]("doc_id")).toSet
      assert(topIds.forall(id => id >= 10 && id < 28),
        s"true top-5 is the dense-only docs; got $topIds")
      val want = TermIndex.probeBatchRel(spark,
        spark.read.parquet(TermIndex.postingsPath(idx)),
        spark.read.parquet(s"$idx/terms"), TermIndex.loadStats(spark, idx),
        batch, 5, TermIndex.DefaultShards, pruneMaxScore = false)
        .collect().map(_.toString).toSeq
      assert(got.map(_.toString).toSeq == want)
    }
  }

  test("batch probe agrees with the single-query probe to the rounding quantum") {
    withIndex(docs) { idx =>
      // the batch path 6dp-rounds each per-term contribution BEFORE the
      // (order-independent) decimal sum, the single path left-folds raw
      // doubles then rounds once — scores agree within m half-quanta
      // (2e-6 for the 3-term query). Membership at the rank-20 BOUNDARY
      // is therefore corpus-dependent (a near-tie at rank 20 can
      // legitimately flip between the two rounding schemes — ADVICE
      // r15), so the assertion is the real contract, not exact keySet
      // equality: batch members must be boundary-legitimate under the
      // single path, and docs CLEARLY above the batch boundary must be
      // batch members.
      val singleRows = TermIndex.probe(spark, idx, TextQueries.Bm25Terms, 25)
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score"))
      val single25 = singleRows.toMap
      val s20 = singleRows(math.min(19, singleRows.length - 1))._2
      val batch = TermIndex.probeBatch(spark, idx,
        Seq(7L -> TextQueries.Bm25Terms), 20)
        .collect()
      assert(batch.forall(_.getAs[Long]("qid") == 7L))
      val b = batch.map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
      val b20 = b.values.min
      b.foreach { case (id, s) =>
        assert(single25.contains(id),
          s"batch doc $id is not in the single path's top-25")
        assert(math.abs(s - single25(id)) <= 2e-6, s"doc $id: $s vs ${single25(id)}")
        assert(single25(id) >= s20 - 2e-6,
          s"batch doc $id scores ${single25(id)} — below the single boundary $s20")
      }
      singleRows.take(20).foreach { case (id, s) =>
        if (s > b20 + 2e-6)
          assert(b.contains(id),
            s"doc $id scores $s, clearly above the batch boundary $b20, but is absent")
      }
    }
  }

  test("batch probe is replay-invariant (duplicate postings never double-count)") {
    val base = docs.filter(col("doc_id") % 7 =!= 0)
    val delta = docs.filter(col("doc_id") % 7 === 0)
    val q = Seq(0L -> Seq("spark", "merge"), 1L -> Seq("vector"))
    withIndex(base) { idx =>
      TermIndex.append(spark, delta, idx)
      val once = TermIndex.probeBatch(spark, idx, q, 10).collect().map(_.toString).toSeq
      TermIndex.append(spark, delta, idx) // at-least-once replay
      val twice = TermIndex.probeBatch(spark, idx, q, 10).collect().map(_.toString).toSeq
      assert(twice == once, "replayed append changed batch-probe scores")
    }
  }

  test("a query term unseen at build time keeps frozen df = 0 and still scores") {
    withIndex(docs) { idx =>
      // "spark" present + a term no doc contains: result must equal the
      // single-term probe (the unseen term contributes +0.0 to every
      // candidate), not crash or shift scores
      val mixed = collectScores(TermIndex.probe(spark, idx,
        Seq("spark", "zz_no_such_term_zz"), K))
      val alone = collectScores(TermIndex.probe(spark, idx, Seq("spark"), K))
      assert(mixed == alone)
    }
  }
}
