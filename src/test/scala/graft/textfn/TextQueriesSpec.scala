package graft.textfn

import graft.{SparkEntry, SparkFixture}
import org.scalatest.funsuite.AnyFunSuite

class TextQueriesSpec extends AnyFunSuite with SparkFixture {

  private val dir = "/root/testdata/sf0.001"

  test("unigram NLL matches an independent driver reference exactly") {
    // reference: collect the corpus, count words, apply the SAME
    // 6dp-round-then-decimal-sum contract in plain Scala
    val docs = graft.operators.Tables(spark, dir).documents.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").toLowerCase.split(" ", -1).toSeq)
    val counts = docs.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = counts.values.sum
    def nll6(w: String): BigDecimal =
      BigDecimal(math.log(total.toDouble / counts(w).toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    // sum_nll surfaces as DOUBLE (the §5 output boundary — r11 fix):
    // the reference mirrors the same decimal-sum-then-one-cast, so
    // equality stays exact
    val expected = docs.map { case (id, ws) =>
      val sum = ws.map(nll6).sum
      (id, ws.size.toLong, sum.toDouble, sum.toDouble / ws.size)
    }.sortBy(_._1)
    val got = SparkEntry.queries("text_perplexity")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.length == expected.length)
    got.zip(expected).foreach { case ((gi, gn, gs, ga), (ei, en, es, ea)) =>
      assert(gi == ei && gn == en, s"doc $gi tokens $gn vs $en")
      assert(gs == es, s"doc $gi sum_nll $gs vs $es")
      assert(ga == ea, s"doc $gi avg_nll $ga vs $ea")
    }
    // the score is a real LM quantity: every token's probability lies in
    // [1/total, c_max/total], so per-doc perplexity exp(avg_nll) lies in
    // [total/c_max, total] (rare-word docs may exceed vocab size — the
    // hard bound is the corpus token count)
    val cMax = counts.values.max
    got.foreach { case (id, _, _, avg) =>
      val ppl = math.exp(avg)
      assert(ppl >= total.toDouble / cMax - 1e-9 && ppl <= total.toDouble + 1e-9,
        s"doc $id perplexity $ppl outside [${total.toDouble / cMax}, $total]")
    }
  }

  test("per-doc funnel reasons reconcile exactly with the funnel's stage aggregates") {
    val reasons = SparkEntry.queries("pipeline_reasons")(spark, dir).collect()
      .map(r => r.getString(2))
    val stages = SparkEntry.queries("pipeline_filter")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stages("p0_all") == reasons.length.toLong)
    assert(stages("p1_quality") == reasons.count(_ != "p1_quality").toLong)
    assert(stages("p2_lang_en") ==
      reasons.count(r => r != "p1_quality" && r != "p2_lang_en").toLong)
    assert(stages("p3_dedup") == reasons.count(_ == "kept").toLong)
    assert(reasons.toSet.subsetOf(Set("p1_quality", "p2_lang_en", "p3_dedup", "kept")))
  }

  test("bigram NLL matches an independent driver reference exactly") {
    val docs = graft.operators.Tables(spark, dir).documents.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").toLowerCase.split(" ", -1).toSeq)
    val bigrams = docs.flatMap(_._2.sliding(2).filter(_.size == 2).map(p => (p(0), p(1))))
    val cb = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cu = bigrams.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val v = bigrams.map(_._2).distinct.size.toLong
    def nll6(b: (String, String)): BigDecimal =
      BigDecimal(math.log((cu(b._1) + v).toDouble / (cb(b) + 1).toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    // sum_nll surfaces as DOUBLE (§5 output boundary, r11) — same
    // decimal-sum-then-one-cast as the reference
    val expected = docs.filter(_._2.size >= 2).map { case (id, ws) =>
      val bs = ws.sliding(2).filter(_.size == 2).map(p => (p(0), p(1))).toSeq
      val sum = bs.map(nll6).sum
      (id, bs.size.toLong, sum.toDouble, sum.toDouble / bs.size)
    }.sortBy(_._1).toSeq
    val got = SparkEntry.queries("text_perplexity_bigram")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(got == expected)
    // the context sensitivity unigram scoring cannot have: scrambling a
    // doc's tokens leaves its unigram NLL fixed but must change the
    // bigram NLL whenever the reordered transitions differ (checked on
    // the reference math — both orderings score under the SAME corpus LM)
    val (_, ws) = docs.maxBy(_._2.size)
    val shuffled = new scala.util.Random(3).shuffle(ws)
    def score(seq: Seq[String]): BigDecimal =
      seq.sliding(2).filter(_.size == 2)
        .map(p => (p(0), p(1)))
        .filter(cb.contains) // scrambling can invent unseen bigrams; score shared mass
        .map(nll6).sum
    def multiset(seq: Seq[String]) =
      seq.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq.sorted
    assert(score(ws) != score(shuffled) || multiset(ws) == multiset(shuffled),
      "bigram LM failed to separate a scrambled ordering")
  }

  test("naive-bayes classifier matches an independent driver reference and beats the prior") {
    // reference: the same multiclass NB recurrence in plain Scala —
    // integer counts, Laplace +1, ln rounded 6dp to BigDecimal,
    // decimal per-class sums, argmax ties to the LARGER lang string
    val docs = graft.operators.Tables(spark, dir).documents.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[String]("text").toLowerCase.split(" ", -1).toSeq))
    val langs = docs.map(_._2).distinct.sorted
    val dBy = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val cBy = langs.map { l =>
      val m = new scala.collection.mutable.HashMap[String, Long]()
      docs.filter(_._2 == l).foreach(_._3.foreach(w => m.update(w, m.getOrElse(w, 0L) + 1L)))
      l -> m
    }.toMap
    val v = docs.flatMap(_._3).distinct.length.toLong
    val nBy = cBy.view.mapValues(_.values.sum).toMap
    def r6(x: Double): BigDecimal =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val priors = langs.map(l => l -> r6(math.log(dBy(l).toDouble / docs.length))).toMap
    val expected = docs.map { case (id, lang, ws) =>
      val best = langs.map { l =>
        val s = ws.map(w => r6(math.log((cBy(l).getOrElse(w, 0L) + 1).toDouble /
          (nBy(l) + v).toDouble))).sum + priors(l)
        (s, l)
      }.max // (score, lang) — ties to the larger lang, the struct-max rule
      (id, ws.size.toLong, best._2, lang)
    }.sortBy(_._1).toSeq
    val got = SparkEntry.queries("text_nb_langid")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3))).toSeq
    assert(got == expected)
    // learned signal: accuracy must beat the majority-class prior (the
    // synthetic corpus's langs share one vocabulary, so the ceiling is
    // low — but a classifier that can't beat the prior learned nothing)
    val acc = got.count(r => r._3 == r._4).toDouble / got.length
    val majority = dBy.values.max.toDouble / docs.length
    assert(acc > majority, s"accuracy $acc does not beat majority baseline $majority")
  }

  private def exactHh(rows: Seq[String], phi: Double): Seq[(String, Long)] = {
    val toks = rows.flatMap(_.toLowerCase.split(" ", -1))
    val n = toks.size
    toks.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .filter(_._2 > n / phi)
      .sortBy { case (t, c) => (-c, t) }
  }

  test("heavy hitters equal the exact full-groupBy answer on the real corpus") {
    val texts = graft.operators.Tables(spark, dir).documents.collect()
      .map(_.getAs[String]("text")).toSeq
    val got = SparkEntry.queries("text_heavy_hitters")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(got == exactHh(texts, 256.0), s"got ${got.take(5)}...")
    assert(got.nonEmpty, "sf0.001 corpus should have stopword-regime heavy hitters")
  }

  test("MG candidates never miss: adversarial spread + tiny slots still finds every heavy hitter") {
    import spark.implicits._
    // one target token holding ~1/6 of the corpus, diluted by a long
    // tail of one-off fillers that keeps every MG map at capacity and
    // the decrement pressure constant; round-robin partitioning spreads
    // the target so no partition sees a concentrated run. slots = 8 at
    // phi = 6 is the minimal-headroom regime (slots >= phi just holds).
    val target = Seq.fill(250)("hot")
    val fillers = (0 until 1000).map(i => s"f$i")
    val words = new scala.util.Random(7).shuffle(target ++ fillers)
    val docs = words.grouped(5).map(_.mkString(" ")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toSeq
      .toDF("doc_id", "text").repartition(16)
    val got = TextQueries.heavyHitters(docs, phi = 6.0, slots = 8).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(got == Seq("hot" -> 250L), s"got $got")
  }

  test("a uniform corpus has no heavy hitters: empty result, not a crash") {
    import spark.implicits._
    val docs = (0 until 300).map(i => (i.toLong, s"u$i v$i"))
      .toDF("doc_id", "text")
    assert(TextQueries.heavyHitters(docs, phi = 256.0, slots = 1024).isEmpty)
  }
}
