package graft.pipeline

import graft.{SparkEntry, SparkFixture}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the corpus-preparation tier (SURVEY.md §2.9).
  * Each operator's DuckDB oracle is the primary gate; these specs pin
  * the semantic properties the oracle's row-hash can't express —
  * redaction completeness, packing-vs-window equivalence, range-join
  * equivalence with the naive non-equi formulation, and sampler bounds.
  */
class CorpusOpsSpec extends AnyFunSuite with SparkFixture {

  private val dir = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("pii scrub removes every email, phone, and ip it counted") {
    val rows = run("text_pii_scrub").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val red = r.getAs[String]("redacted")
      // by construction each blurb carries exactly one of each PII kind
      assert(r.getAs[Long]("n_email") == 1L, r)
      assert(r.getAs[Long]("n_phone") == 1L, r)
      assert(r.getAs[Long]("n_ip") == 1L, r)
      assert(red.contains("<EMAIL>") && red.contains("<PHONE>") && red.contains("<IP>"), red)
      assert(!red.contains("@example.com"), s"email survived: $red")
      assert(!red.matches(".*\\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}.*"), s"phone survived: $red")
      assert(!red.matches(".*\\b[0-9]{1,3}(\\.[0-9]{1,3}){3}\\b.*"), s"ip survived: $red")
    }
  }

  test("distributed prefix-sum packing equals the single-window reference") {
    val got = run("pack_sequences").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted.toSeq
    // reference: plain window cumsum (fine on test data, single-partition
    // at scale — which is exactly why the operator doesn't use it)
    val docs = graft.operators.Tables(spark, dir).documents
      .select(col("source"), col("doc_id"),
        size(split(lower(col("text")), " ")).cast("long").as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val ref = docs.withColumn("cum", sum(col("n")).over(w))
      .select(col("source"), ((col("cum") - col("n")) / 512L).cast("long").as("bin"), col("n"))
      .groupBy("source", "bin")
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).cast("long").as("bin_tokens"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted.toSeq
    assert(got == ref)
  }

  test("prefix-sum kernel: starts are exclusive, per-key, order-exact") {
    import spark.implicits._
    // keys interleaved, o1 reverses o2 within key b — the kernel must
    // follow (key, o1, o2), not input order
    val rows = Seq(
      ("a", 0.0, 1L, 10L), ("a", 0.0, 2L, 5L), ("a", 0.0, 3L, 7L),
      ("b", -0.9, 20L, 100L), ("b", -0.5, 10L, 50L)
    ).toDF("key", "o1", "o2", "n")
    val got = CorpusOps.prefixStarts(spark, rows)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(4))).toSet
    assert(got == Set(
      ("a", 1L, 0L), ("a", 2L, 10L), ("a", 3L, 15L),
      // b: o1 = -0.9 (o2=20) sorts FIRST, so its start is 0
      ("b", 20L, 0L), ("b", 10L, 100L)))
  }

  test("prefix-sum kernel matches the window reference on random inputs") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260813L)
    val rows = (1 to 300).map { i =>
      (s"k${rnd.nextInt(7)}", rnd.nextInt(5).toDouble - 2.0, i.toLong, rnd.nextInt(100).toLong)
    }
    val df = rows.toDF("key", "o1", "o2", "n")
    val got = CorpusOps.prefixStarts(spark, df)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(4))).toSet
    // reference: per-key exclusive running sum in plain Scala
    val ref = rows.groupBy(_._1).flatMap { case (k, rs) =>
      var cum = 0L
      rs.sortBy(r => (r._2, r._3)).map { r =>
        val start = cum; cum += r._4; (k, r._3, start)
      }
    }.toSet
    assert(got == ref)
  }

  test("token budget keeps exactly the best-quality prefix per source") {
    // reference: per-source window cumsum over (quality desc, doc_id)
    val docs = graft.operators.Tables(spark, dir).documents
      .select(col("source"), col("doc_id"),
        graft.textfn.TextFunctions.qualityScore(col("text")).as("q"),
        graft.textfn.TextFunctions.tokenCount(col("text")).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("q").desc, col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val ref = docs.withColumn("cum", sum(col("n")).over(w))
      .filter(col("cum") <= 800L)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n")).cast("long").as("kept_tokens"),
        min(col("q")).as("min_kept_quality"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sorted.toSeq
    val got = run("token_budget").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sorted.toSeq
    assert(got == ref)
    // the budget actually binds: nothing kept above it, and something cut
    got.foreach { case (_, _, tok, _) => assert(tok <= 800L) }
    val total = docs.agg(sum(col("n"))).collect()(0).getLong(0)
    assert(got.map(_._3).sum < total, "budget kept everything — not a selection")
  }

  test("bucketed range join equals the naive non-equi join") {
    val got = run("range_join_events").collect()
      .map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq
    val ev = graft.operators.Tables(spark, dir).events
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id").as("p_user"), unix_micros(col("ts")).as("pus"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), unix_micros(col("ts")).as("vus"))
    val ref = p.join(v,
        col("v_user") === col("p_user") &&
          col("vus") > col("pus") && col("vus") <= col("pus") + 60000000L, "left")
      .groupBy(col("event_id"))
      .agg(sum(when(col("vus").isNotNull, 1L).otherwise(0L)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == ref)
    assert(got.nonEmpty)
  }

  test("decontamination never flags a benchmark doc and finds real overlap") {
    val rows = run("decontam_ngram").collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_id") % 29 != 0, s"benchmark doc flagged: $r")
      assert(r.getAs[Long]("n_shared") > 0)
    }
  }

  test("stratified sampler hits each stratum's configured rate closely") {
    run("sample_stratified").collect().foreach { r =>
      val rate = r.getAs[Double]("rate")
      val realized = r.getAs[Long]("n_kept").toDouble / r.getAs[Long]("n_docs").toDouble
      // systematic (equidistributed) sampling concentrates tightly even
      // on 25-doc strata; 0.2 absolute slack is generous
      assert(math.abs(realized - rate) <= 0.2, s"rate $rate realized $realized")
    }
  }

  test("domain mixing keeps at most n_docs and fills under-target sources") {
    val rows = run("mix_domains").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val kept = r.getAs[Long]("n_kept")
      val n = r.getAs[Long]("n_docs")
      assert(kept <= n)
      if (r.getAs[Double]("rate") >= 1.0) assert(kept == n, s"rate-1 source must keep all: $r")
    }
  }

  test("temperature mixing flattens toward small domains and respects caps") {
    val rows = run("mix_temperature").collect()
    assert(rows.nonEmpty)
    val shares = rows.map(_.getAs[Double]("share"))
    assert(math.abs(shares.sum - 1.0) < 1e-9, s"shares sum to ${shares.sum}")
    rows.foreach { r =>
      val exp = r.getAs[Long]("expected_docs")
      assert(exp >= 0L && exp <= r.getAs[Long]("n_docs"), r.toString)
    }
    // sqrt-flattening: per-doc sampling mass decreases with domain size,
    // so any smaller domain must get a strictly higher share/n ratio
    val perDoc = rows.map(r =>
      (r.getAs[Long]("n_docs"), r.getAs[Double]("share") / r.getAs[Long]("n_docs")))
    for (Seq((nA, mA), (nB, mB)) <- perDoc.sortBy(_._1).toSeq.combinations(2))
      if (nA < nB) assert(mA > mB, s"per-doc mass not flattened: ($nA,$mA) vs ($nB,$mB)")
  }

  test("hash split is identity-stable, exhaustive, and near its design fractions") {
    // sf0.01: 500 docs give the binomial room to show the 90/5/5 design
    val big = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("sample_hash_split")(spark, big).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val total = graft.operators.Tables(spark, big).documents.count()
    assert(rows.length.toLong == total, "every doc assigned exactly once")
    val frac = rows.groupBy(_._2).view.mapValues(_.length.toDouble / rows.length).toMap
    assert(math.abs(frac("train") - 230.0 / 256) < 0.05, s"train ${frac("train")}")
    assert(math.abs(frac.getOrElse("val", 0.0) - 13.0 / 256) < 0.03, s"val $frac")
    assert(math.abs(frac.getOrElse("test", 0.0) - 13.0 / 256) < 0.03, s"test $frac")
    // identity-stability: the sf0.001 corpus is a different dataset, but
    // any doc_id appearing in both must land in the SAME split — the
    // assignment is a function of identity, not of corpus membership
    val small = SparkEntry.queries("sample_hash_split")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val bigMap = rows.toMap
    val shared = small.keySet.intersect(bigMap.keySet)
    assert(shared.nonEmpty)
    shared.foreach(id => assert(small(id) == bigMap(id), s"doc $id reassigned"))
  }

  test("hashed decontamination equals the exact-string probe (collision-free at this scale)") {
    def rows(q: String) = SparkEntry.queries(q)(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows("decontam_hashed") == rows("decontam_ngram"),
      "60-bit shingle hashing changed the contamination report")
    assert(rows("decontam_hashed").nonEmpty)
  }

  test("span lineage reconciles with the hashed verdict bit, doc for doc") {
    // decontam_spans answers "which benchmark doc, where"; its flagged
    // corpus-doc set must be EXACTLY decontam_hashed's (same hashed
    // keys, same bench split), and per-doc hit counts must cover at
    // least the distinct-shared-shingle count the verdict reports
    val spans = run("decontam_spans").collect()
    spans.foreach { r =>
      assert(r.getAs[Long]("doc_id") % 29 != 0, s"benchmark doc flagged: $r")
      assert(r.getAs[Long]("bench_id") % 29 == 0, s"non-benchmark lineage target: $r")
      assert(r.getAs[Long]("n_hits") > 0)
      assert(r.getAs[Long]("pos_first") <= r.getAs[Long]("pos_last"))
    }
    val spanDocs = spans.map(_.getAs[Long]("doc_id")).toSet
    val verdict = run("decontam_hashed").collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_shared")).toMap
    assert(spanDocs == verdict.keySet,
      "span lineage flags a different doc set than the verdict probe")
    // positions are at least as informative as the distinct-key count:
    // summing hits across a doc's bench targets can only overcount
    // (one position may match several bench docs), never undercount
    val hitsPerDoc = spans.groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(_.getAs[Long]("n_hits")).sum).toMap
    verdict.foreach { case (d, nShared) =>
      assert(hitsPerDoc(d) >= nShared, s"doc $d: ${hitsPerDoc(d)} hits < $nShared shared keys")
    }
    assert(spans.nonEmpty)
  }

  test("semantic-balanced sample takes min(quota, population) from every orthant, deterministically") {
    import org.apache.spark.sql.functions._
    val picks = SparkEntry.queries("sample_semantic_balanced")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // bucket populations computed independently from the raw embeddings
    val pop = graft.operators.Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding")).collect()
      .map { r =>
        val e = r.getSeq[Float](1)
        (0 until 4).map(d => (if (e(d) > 0f) 1 else 0) << (3 - d)).sum
      }
      .groupBy(identity).view.mapValues(_.length).toMap
    val got = picks.groupBy(_._2).view.mapValues(_.length).toMap
    (0 until 16).foreach { b =>
      val expect = math.min(8, pop.getOrElse(b, 0))
      assert(got.getOrElse(b, 0) == expect, s"bucket $b: ${got.getOrElse(b, 0)} vs $expect")
    }
    // sign-balanced embeddings: every orthant is populated at sf0.001
    assert(pop.size == 16, s"only ${pop.size} orthants populated")
    // ranks are 1..quota contiguous per bucket, and a re-run is identical
    picks.groupBy(_._2).foreach { case (b, ps) =>
      assert(ps.map(_._3).sorted.toSeq == (1L to ps.length.toLong), s"bucket $b ranks")
    }
    val again = SparkEntry.queries("sample_semantic_balanced")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(again.toSeq == picks.toSeq)
  }

  test("epoch accounting: cap binds exactly, delivery reconciles, both regimes live") {
    // Spark round() is HALF_UP — mirror it exactly (math.rint is
    // HALF_EVEN and would diverge on an exact .5)
    def half_up(x: Double): Long =
      java.math.BigDecimal.valueOf(x).setScale(0, java.math.RoundingMode.HALF_UP).longValue
    val rows = run("mix_epochs").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4), r.getInt(5), r.getLong(6)))
    assert(rows.length == 20)
    val budget = 2.0 * rows.map(_._2).sum
    rows.foreach { case (src, n, share, epochs, eff, capped, _) =>
      val raw = share * budget / n.toDouble
      if (capped == 1) {
        // the cap binds EXACTLY — capped sources deliver round(cap * n)
        assert(epochs == 4.0 && raw > 4.0, s"$src: epochs=$epochs raw=$raw")
        assert(eff == half_up(4.0 * n), s"$src eff=$eff")
      } else {
        // uncapped sources deliver their full allocation
        assert(epochs == raw, s"$src: epochs=$epochs raw=$raw")
        assert(eff == half_up(raw * n), s"$src eff=$eff")
      }
    }
    // accounting closes: leftover is the budget the cap left unspent
    val leftover = rows.head._7
    assert(rows.forall(_._7 == leftover))
    assert(leftover.toDouble == budget - rows.map(_._5).sum.toDouble)
    // the shipped skewed weights keep BOTH regimes live at every SF
    assert(rows.exists(_._6 == 1), "no source hit the epoch cap")
    assert(rows.exists(_._4 < 1.0), "no source was downsampled below one epoch")
  }

  test("importance weights match an independent driver DSIR reference exactly") {
    // reference: the same hashed-bucket log-likelihood-ratio recurrence
    // in plain Scala — 60-bit md5 bucket, Laplace +1, positive-domain
    // ln rounded 6dp to BigDecimal, decimal per-doc sums, one cast
    val docs = graft.operators.Tables(spark, dir).documents.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[String]("source"),
        r.getAs[String]("text").toLowerCase.split(" ", -1).toSeq))
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(tok: String): Long = {
      md.reset()
      val hex = md.digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16) % 256L
    }
    val all = docs.flatMap { case (id, lang, _, ts) => ts.map(t => (id, lang, bucket(t))) }
    val cr = all.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val ct = all.filter(_._2 == "en").groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val nr = all.size.toLong
    val nt = all.count(_._2 == "en").toLong
    def nll6(n: Long, c: Long): BigDecimal =
      BigDecimal(math.log((n + 256L).toDouble / (c + 1L).toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val delta = cr.keys.map(b =>
      b -> (nll6(nr, cr(b)) - nll6(nt, ct.getOrElse(b, 0L)))).toMap
    val expected = docs.map { case (id, lang, src, ts) =>
      (id, lang, src, ts.map(t => delta(bucket(t))).sum.toDouble)
    }.sortBy { case (id, _, _, w) => (-w, id) }.take(100).toSeq
    val got = run("sample_importance").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getDouble(3))).toSeq
    assert(got == expected)
    // the construction's point: the selection is tilted TOWARD the
    // target domain — target share among the selected is at least the
    // corpus base rate (measured 58% vs 43.6% at sf0.01)
    val baseShare = docs.count(_._2 == "en").toDouble / docs.length
    val gotShare = got.count(_._2 == "en").toDouble / got.length
    assert(gotShare >= baseShare - 1e-9,
      s"selected en share $gotShare below base rate $baseShare")
    // and a re-run selects the identical rows in the identical order
    val again = run("sample_importance").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getDouble(3))).toSeq
    assert(again == got)
  }

  test("docs_drift separates an engineered shifted source from an unshifted one") {
    import spark.implicits._
    // 'stable': both snapshots drawn from the same 100..199 range —
    // PSI ~ 0. 'shifted': base snapshot short docs (100..199), new
    // snapshot (doc_id % 7 == 0) long docs (900..999) — all new mass
    // lands in the top bin, PSI far above the 0.2 line. doc_ids are
    // chosen so each source has both snapshot members.
    val stable = (0L until 70L).map(i =>
      (i, "stable", 100L + (i * 37L) % 100L))
    val shifted = (100L until 170L).map { i =>
      val isNew = i % 7 == 0
      (i, "shifted", if (isNew) 900L + (i % 100L) else 100L + (i * 37L) % 100L)
    }
    val docs = (stable ++ shifted).toDF("doc_id", "source", "n_chars")
      .withColumn("text", lit("x")).withColumn("lang", lit("en"))
    val got = CorpusOps.docsDrift(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))))
      .toMap
    val (sbN, snN, sPsi, sFlag) = got("stable")
    val (hbN, hnN, hPsi, hFlag) = got("shifted")
    assert(sbN > 0 && snN > 0 && hbN > 0 && hnN > 0, "engineered snapshots degenerate")
    assert(!sFlag && sPsi < 0.2, s"stable source flagged: psi=$sPsi")
    assert(hFlag && hPsi > 1.0, s"shifted source not flagged: psi=$hPsi")
    // PSI is non-negative by construction (sum of (a-b)ln(a/b) terms,
    // each individually >= 0 before rounding)
    assert(sPsi >= -1e-5 && hPsi >= 0.0)
    // determinism: identical rerun
    val again = CorpusOps.docsDrift(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))))
      .toMap
    assert(again == got)
  }

  test("docs_drift_lang separates an engineered language-mix shift from a stable mix") {
    import spark.implicits._
    // 'stable': langs assigned by doc_id % 3 — the new snapshot
    // (doc_id % 7 == 0) inherits the same ~1/3 mix. 'shifted': base
    // docs en/de, every new doc in a lang the base never ships (zz) —
    // the seed-list-change signature.
    val langs3 = Array("en", "de", "fr")
    val stable = (0L until 84L).map(i => (i, "stable", langs3((i % 3).toInt)))
    val shifted = (100L until 184L).map { i =>
      (i, "shifted", if (i % 7 == 0) "zz" else langs3((i % 2).toInt))
    }
    val docs = (stable ++ shifted).toDF("doc_id", "source", "lang")
      .withColumn("text", lit("x")).withColumn("n_chars", lit(1L))
    val got = CorpusOps.docsDriftLang(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getBoolean(5))))
      .toMap
    val (sbN, snN, sL, sPsi, sFlag) = got("stable")
    val (hbN, hnN, hL, hPsi, hFlag) = got("shifted")
    assert(sbN > 0 && snN > 0 && hbN > 0 && hnN > 0)
    assert(sL == 3L, s"stable source lang universe: $sL")
    assert(hL == 3L, s"shifted source lang universe (en, de, zz): $hL")
    assert(!sFlag && sPsi < 0.2, s"stable mix flagged: psi=$sPsi")
    assert(hFlag && hPsi > 1.0, s"lang shift not flagged: psi=$hPsi")
    // rerun identity
    val again = CorpusOps.docsDriftLang(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getBoolean(5))))
      .toMap
    assert(again == got)
  }
}
