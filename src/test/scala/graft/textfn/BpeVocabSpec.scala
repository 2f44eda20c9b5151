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
