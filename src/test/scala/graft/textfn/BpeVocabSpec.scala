package graft.textfn

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The frozen-BPE-vocab apply surface (`text_bpe_apply` + the persisted
  * vocab artifact): save/load roundtrip, apply ≡ the trainer's own
  * segmentation on the real training corpus, closure over unseen
  * holdout input, and the query-level frozen-split behavior. */
class BpeVocabSpec extends AnyFunSuite with SparkFixture {

  private val dir = "/root/testdata/sf0.001"

  private def docs = graft.operators.Tables(spark, dir).documents

  /** The query's own training input: base-split word frequencies. */
  private def trainSummary: Seq[(String, Long)] = docs
    .filter(col("doc_id") % 7 =!= 0)
    .select(explode(split(lower(col("text")), " ")).as("w"))
    .filter(col("w") =!= "")
    .groupBy(col("w")).agg(count(lit(1)).as("n"))
    .orderBy(col("n").desc, col("w")).limit(Bpe.VocabCap)
    .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  test("save/load roundtrip restores the merges in training order exactly") {
    val merges = Bpe.train(trainSummary)
    assert(merges.nonEmpty)
    val tmp = java.nio.file.Files.createTempDirectory("graft_bpevocab").toString
    try {
      Bpe.save(spark, merges, tmp)
      assert(Bpe.load(spark, tmp) == merges)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("the tokenizer joins the serving cut (r17): a snapshot pins the " +
    "vocab generation; a vocab RELEASE is a new generation that never " +
    "leaks into the pinned version; stale pins fail loudly after reap") {
    val mergesV1 = Bpe.train(trainSummary)
    // a deliberately different release: a truncated vocab segments
    // differently, which is exactly the drift the pin must exclude
    val mergesV2 = mergesV1.take(mergesV1.length / 2)
    val tmp = java.nio.file.Files.createTempDirectory("graft_bpesnap").toString
    try {
      val (vocab, term, snap) = (s"$tmp/vocab", s"$tmp/term", s"$tmp/snap")
      assert(Bpe.saveVersioned(spark, mergesV1, vocab) == 0L)
      graft.textfn.TermIndex.build(spark,
        docs.select(col("doc_id"), col("text")).limit(50), term)
      // the RAG sink's publish shape: indexes + the tokenizer in ONE cut
      graft.operators.ServingSnapshot.publish(snap,
        Map("sparse" -> term, "bpe" -> vocab))
      val s1 = graft.operators.ServingSnapshot.resolve(snap)
      assert(Bpe.loadPinned(spark, s1.legs("bpe")) == mergesV1)
      // a vocab release lands generation 1; the HEAD read moves, the
      // pinned read does not
      assert(Bpe.saveVersioned(spark, mergesV2, vocab) == 1L)
      assert(Bpe.loadVersioned(spark, vocab) == mergesV2)
      assert(Bpe.loadPinned(spark, s1.legs("bpe")) == mergesV1,
        "a vocab swap leaked into a pinned snapshot version")
      // a fresh publish pins the new generation
      graft.operators.ServingSnapshot.publish(snap,
        Map("sparse" -> term, "bpe" -> vocab))
      val s2 = graft.operators.ServingSnapshot.resolve(snap)
      assert(Bpe.loadPinned(spark, s2.legs("bpe")) == mergesV2)
      // wrong leg refused loudly
      val eWrong = intercept[IllegalArgumentException] {
        Bpe.loadPinned(spark, s2.legs("sparse"))
      }
      assert(eWrong.getMessage.contains("not a Bpe.loadPinned"), eWrong.getMessage)
      // retire v1, reap with the LIVE snapshot's generations protected
      // (the shared retention seam): the stale pinned read fails loudly
      graft.operators.ServingSnapshot.retire(snap, keepLatest = 1)
      graft.operators.Generations.reapOthers(vocab,
        graft.operators.Generations.currentGen(vocab),
        protect = graft.operators.ServingSnapshot.protectedGens(snap, vocab))
      val eGone = intercept[IllegalArgumentException] {
        Bpe.loadPinned(spark, s1.legs("bpe"))
      }
      assert(eGone.getMessage.contains("re-resolve"), eGone.getMessage)
      assert(Bpe.loadPinned(spark, s2.legs("bpe")) == mergesV2,
        "the live snapshot's vocab generation must survive the reap")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("applying the frozen vocab reproduces the trainer's own segmentation on every training word") {
    val merges = Bpe.train(trainSummary)
    val ranks = merges.zipWithIndex.toMap
    trainSummary.foreach { case (w, _) =>
      val applied = Bpe.encode(w, ranks)
      val trainer = Bpe.encodeInOrder(w, merges)
      assert(applied.sameElements(trainer),
        s"'$w': apply ${applied.mkString("|")} != trainer ${trainer.mkString("|")}")
      assert(applied.mkString == w, s"'$w' failed to reconstruct")
    }
  }

  test("encoding is closed over input the vocab never saw (char fallback, lossless)") {
    val merges = Bpe.train(trainSummary)
    val ranks = merges.zipWithIndex.toMap
    Seq("données", "ξένος", "zzzzqqqq", "a", "ab-cd_12").foreach { w =>
      val enc = Bpe.encode(w, ranks)
      assert(enc.mkString == w, s"unseen '$w' did not reconstruct")
      assert(enc.length >= 1 && enc.length <= w.length)
    }
  }

  test("text_bpe_apply: frozen-split encode covers both splits and holds its gates") {
    val out = graft.SparkEntry.queries("text_bpe_apply")(spark, dir).collect()
    assert(out.length == docs.count())
    val holdout = out.count(_.getAs[Long]("holdout") == 1L)
    assert(holdout > 0 && holdout < out.length,
      s"expected both splits in the output, holdout=$holdout/${out.length}")
    out.foreach { r =>
      val (w, c, b) = (r.getAs[Long]("n_words"), r.getAs[Long]("n_chars_tok"),
        r.getAs[Long]("n_bpe"))
      assert(w <= b && b <= c, s"envelope broken for doc ${r.getAs[Long]("doc_id")}")
      assert(r.getAs[Double]("train_chars_per_bpe") > 1.3)
      assert(r.getAs[Double]("holdout_chars_per_bpe") > 1.3)
    }
  }

  test("rerun is identical (training and apply deterministic)") {
    def run() = graft.SparkEntry.queries("text_bpe_apply")(spark, dir)
      .collect().map(_.toString).toSeq.sorted
    assert(run() == run())
  }
}
