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
    val expected = docs.map { case (id, ws) =>
      val sum = ws.map(nll6).sum
      (id, ws.size.toLong, sum, sum.toDouble / ws.size)
    }.sortBy(_._1)
    val got = SparkEntry.queries("text_perplexity")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        BigDecimal(r.getDecimal(2)), r.getDouble(3)))
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
}
