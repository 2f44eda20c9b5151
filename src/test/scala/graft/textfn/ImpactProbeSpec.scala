package graft.textfn

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The ALL-DENSE impact-bucket probe (r17, VERDICT r16 item 1): a
  * stopword-only query has no sparse anchor, so the r16 max-score
  * split routed it exhaustive — corpus-scale aggregate state by
  * construction. The index now persists a per-term impact ceiling
  * (max_impact beside df) and partitions postings by impact bucket;
  * the probe reads the top bucket(s), scores those candidates EXACTLY,
  * and keeps the cut only when the k-th candidate provably clears the
  * unread buckets' bound sum — pruned ≡ exhaustive bit-for-bit, with
  * escalation and a loud-counted fallback when the proof cannot hold.
  * Corpora below are ENGINEERED onto specific buckets through the
  * closed-form assignment (ib = floor(8·(1 − c/max)) over tf and dl),
  * so each test pins one branch deterministically. */
class ImpactProbeSpec extends AnyFunSuite with SparkFixture {

  private val K = 10

  /** doc i: tf copies of "the" + unique filler up to `dl` tokens —
    * every doc matches the stopword; filler terms have df = 1 and are
    * never queried. */
  private def corpus(specs: Seq[(Int, Int)]) = {
    import spark.implicits._
    specs.zipWithIndex.map { case ((tf, dl), i) =>
      require(dl > tf)
      val toks = Seq.fill(tf)("the") ++
        (0 until (dl - tf)).map(j => s"f${i}x$j")
      (i.toLong, toks.mkString(" "))
    }.toDF("doc_id", "text")
  }

  private def bits(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
    df.select(col("doc_id"), col("score")).collect()
      .map(r => (r.getLong(0), java.lang.Double.doubleToLongBits(r.getDouble(1)))).toSeq

  private def withIndex[A](docs: org.apache.spark.sql.DataFrame)(f: String => A): A = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_impact").toString
    try { TermIndex.build(spark, docs, tmp); f(tmp) }
    finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }

  private def exhaustive(dir: String, terms: Seq[String], k: Int) =
    TermIndex.probeRelExhaustive(spark,
      spark.read.parquet(TermIndex.postingsPath(dir)),
      spark.read.parquet(s"$dir/terms"),
      TermIndex.loadStats(spark, dir), terms, k, TermIndex.DefaultShards)

  private def counters() =
    (TermIndex.impactPruned.get(), TermIndex.impactEscalated.get(),
      TermIndex.impactFellBack.get())

  test("proof engages at the top bucket: pruned ≡ exhaustive bit-for-bit " +
    "and the candidate read is ib-partition-pruned") {
    // 15 docs at the ceiling (tf 5, dl 8 → c = max_impact, bucket 0),
    // 15 low (tf 1 → bucket ≥ 1); k = 10 ≤ 15 top-bucket docs and the
    // 10th score m clears 0.875·m by ~0.0036 ≫ the 1e-6 quantum
    val docs = corpus(Seq.fill(15)((5, 8)) ++ Seq.fill(15)((1, 8)))
    withIndex(docs) { dir =>
      TermIndex.provenWidth.clear()
      val (p0, e0, f0) = counters()
      val got = bits(TermIndex.probe(spark, dir, Seq("the"), K))
      val (p1, e1, f1) = counters()
      assert(p1 == p0 + 1 && e1 == e0 && f1 == f0,
        s"expected one j=1 prune: pruned ${p1 - p0}, escalated ${e1 - e0}, fell back ${f1 - f0}")
      assert(got == bits(exhaustive(dir, Seq("the"), K)),
        "pruned result drifted from the exhaustive ranking")
      // the top-bucket candidate read prunes on the ib PARTITION column
      val cand = spark.read.parquet(TermIndex.postingsPath(dir))
        .filter(col("ib") < 1)
      cand.collect()
      val scan = cand.queryExecution.executedPlan.collectLeaves()
        .map(_.toString).find(_.contains("postings"))
        .getOrElse(fail("no postings scan"))
      assert(scan.contains("PartitionFilters") && scan.contains("ib"),
        s"ib not a partition filter: ${scan.take(400)}")
    }
  }

  test("histogram viability skips a provably-short width: j=1 has 5 < k " +
    "top-bucket postings, the probe STARTS at j=2 with zero wasted " +
    "rounds — still ≡ exhaustive (r18)") {
    // 5 docs at the ceiling (bucket 0), 10 at c/m ≈ 0.775 (tf 2 →
    // bucket 1), 15 low (bucket 3) — the stored histogram proves j=1
    // can only yield 5 < k candidates (pre-r18 this was a wasted
    // round, counted as one escalation); j=2 yields 15 with the 10th
    // at 0.775m > 0.75m bound
    val docs = corpus(Seq.fill(5)((5, 8)) ++ Seq.fill(10)((2, 8)) ++
      Seq.fill(15)((1, 8)))
    withIndex(docs) { dir =>
      TermIndex.provenWidth.clear()
      val (p0, e0, f0) = counters()
      val got = bits(TermIndex.probe(spark, dir, Seq("the"), K))
      val (p1, e1, f1) = counters()
      assert(p1 == p0 + 1 && e1 == e0 && f1 == f0,
        s"expected one j=2 prune with the short j=1 round SKIPPED: " +
          s"pruned ${p1 - p0}, escalated ${e1 - e0}, fell back ${f1 - f0}")
      assert(got == bits(exhaustive(dir, Seq("the"), K)))
    }
  }

  test("unprovable case goes STRAIGHT to the exhaustive fallback: the " +
    "histogram shows < k candidates at every width — zero wasted rounds " +
    "(r18), result identical") {
    // 3 docs at the ceiling, 27 long/low docs engineered PAST bucket 3
    // (c/m ≈ 0.49 → bucket 4): every scheduled j ∈ {1,2,4} can only
    // see 3 candidates < k — pre-r18 the probe PAID all three rounds
    // (two counted escalations) before falling back; the histogram now
    // proves them short driver-side
    val docs = corpus(Seq.fill(3)((5, 8)) ++ Seq.fill(27)((1, 32)))
    withIndex(docs) { dir =>
      TermIndex.provenWidth.clear()
      val (p0, e0, f0) = counters()
      val got = bits(TermIndex.probe(spark, dir, Seq("the"), K))
      val (p1, e1, f1) = counters()
      assert(f1 == f0 + 1 && p1 == p0,
        s"expected a fallback: pruned ${p1 - p0}, fell back ${f1 - f0}")
      assert(e1 == e0, s"expected ZERO candidate rounds, got ${e1 - e0} escalations")
      assert(got == bits(exhaustive(dir, Seq("the"), K)))
    }
  }

  test("proven-width memo: a multi-term probe that escalates 1→2 on first " +
    "execution starts at the proven width on the second — one candidate " +
    "round steady-state (r18, VERDICT r17 item 5)") {
    import spark.implicits._
    // two dense terms u, v (df 15/20 each > 0.5·n): 5 docs with ONLY u
    // at the ceiling (tf 5), 5 with only v, 10 OVERLAP docs holding
    // both at tf 2 (c/m ≈ 0.775 → bucket 1 for each term). All dl = 8.
    // Width 1: candidates = the 10 single-term ceiling docs, each
    // scoring one term's m — the 10th is ~m, far below the two-term
    // bound 0.875·(m_u + m_v) → proof FAILS, escalate. Width 2: the
    // overlap docs enter, each scoring ~1.55m > 1.5m = 0.75·Σm →
    // proof HOLDS. The single-term score estimate can never endorse
    // any width here (max-vs-sum gap), so the first execution pays
    // the wasted round — and the memo spares every later one.
    val docs = (
      (0 until 5).map(i => (i.toLong,
        (Seq.fill(5)("uu") ++ (0 until 3).map(j => s"f${i}x$j")).mkString(" "))) ++
      (5 until 10).map(i => (i.toLong,
        (Seq.fill(5)("vv") ++ (0 until 3).map(j => s"f${i}x$j")).mkString(" "))) ++
      (10 until 20).map(i => (i.toLong,
        (Seq.fill(2)("uu") ++ Seq.fill(2)("vv") ++
          (0 until 4).map(j => s"f${i}x$j")).mkString(" ")))
    ).toDF("doc_id", "text")
    withIndex(docs) { dir =>
      TermIndex.provenWidth.clear()
      val (p0, e0, f0) = counters()
      val first = bits(TermIndex.probe(spark, dir, Seq("uu", "vv"), K))
      val (p1, e1, f1) = counters()
      assert(p1 == p0 + 1 && e1 == e0 + 1 && f1 == f0,
        s"expected first execution to escalate once then prune: " +
          s"pruned ${p1 - p0}, escalated ${e1 - e0}, fell back ${f1 - f0}")
      val second = bits(TermIndex.probe(spark, dir, Seq("uu", "vv"), K))
      val (p2, e2, f2) = counters()
      assert(p2 == p1 + 1 && e2 == e1 && f2 == f1,
        s"expected the memoized width to prune in ONE round: " +
          s"pruned ${p2 - p1}, escalated ${e2 - e1}, fell back ${f2 - f1}")
      assert(first == second && first == bits(exhaustive(dir, Seq("uu", "vv"), K)),
        "memoized probe drifted from the exhaustive ranking")
    }
  }

  test("17 dense terms with NO histograms (pre-r18 terms table): every " +
    "width stays viable and the proof engages — the unknown-count check " +
    "must short-circuit, not sum a sentinel that overflows Long (r18 " +
    "review)") {
    import spark.implicits._
    // 30 docs each holding all 17 query terms once (df = 30 = n →
    // every term DENSE) plus one filler → identical dl, so every
    // posting sits at its term's ceiling (bucket 0) and the proof
    // holds at j = 1: the 10th score Σ_t m_t clears 0.875·Σ_t m_t.
    // The terms table is then rewritten WITHOUT ib_counts (the r17
    // shape): histByTerm comes back empty, and a sentinel-sum
    // viability check would wrap negative at 17 terms — ruling every
    // width out and silently forcing the exhaustive path on exactly
    // the index the impact branch was built for.
    val ts = (0 until 17).map(i => f"t$i%02d")
    val docs = (0L until 30L)
      .map(i => (i, (ts :+ s"f$i").mkString(" "))).toDF("doc_id", "text")
    withIndex(docs) { dir =>
      val stripped = spark.read.parquet(s"$dir/terms")
        .select(col("term"), col("shard"), col("df"), col("max_impact"))
        .collect()
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("term",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("shard",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("df",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("max_impact",
          org.apache.spark.sql.types.DoubleType)))
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(s"$dir/terms"))
      import scala.jdk.CollectionConverters._
      spark.createDataFrame(stripped.toList.asJava, schema)
        .repartition(col("shard"))
        .write.partitionBy("shard").parquet(s"$dir/terms")
      TermIndex.provenWidth.clear()
      val (p0, e0, f0) = counters()
      val got = bits(TermIndex.probe(spark, dir, ts, K))
      val (p1, e1, f1) = counters()
      assert(p1 == p0 + 1 && e1 == e0 && f1 == f0,
        s"expected the j=1 proof to engage with histograms absent: " +
          s"pruned ${p1 - p0}, escalated ${e1 - e0}, fell back ${f1 - f0}")
      assert(got == bits(exhaustive(dir, ts, K)))
    }
  }

  test("append buckets under the frozen stats: a beyond-ceiling posting " +
    "clamps into bucket 0 and ranks; unseen terms bound at the analytic " +
    "ceiling; probe stays ≡ exhaustive") {
    import spark.implicits._
    val docs = corpus(Seq.fill(15)((5, 8)) ++ Seq.fill(15)((1, 8)))
    withIndex(docs) { dir =>
      // tf 7 in an 8-token doc beats every build-time contribution →
      // c > max_impact → clamped to bucket 0 (read first, so the j=1
      // candidate set sees it); plus a term unseen at build
      TermIndex.append(spark,
        Seq((900L, "the the the the the the the zzz"))
          .toDF("doc_id", "text"), dir)
      val got = bits(TermIndex.probe(spark, dir, Seq("the"), K))
      assert(got == bits(exhaustive(dir, Seq("the"), K)))
      assert(got.head._1 == 900L,
        "the beyond-ceiling appended doc must rank first")
      // replayed append: bit-identical rows, identical probe output
      TermIndex.append(spark,
        Seq((900L, "the the the the the the the zzz"))
          .toDF("doc_id", "text"), dir)
      assert(bits(TermIndex.probe(spark, dir, Seq("the"), K)) == got)
      // compaction folds the replay away and keeps the ranking
      TermIndex.compact(spark, dir)
      assert(TermIndex.currentGen(dir) == 1L)
      assert(bits(TermIndex.probe(spark, dir, Seq("the"), K)) == got)
    }
  }
}
