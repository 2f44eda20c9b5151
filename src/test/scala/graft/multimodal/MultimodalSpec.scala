package graft.multimodal

import graft.SparkFixture
import graft.operators.Tables
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with SparkFixture {

  private val dir = "/root/testdata/sf0.001"

  test("stubbed decode kernel is deterministic and batch-shaped") {
    val blobs = Multimodal.withBlobs(Tables(spark, dir).documents.limit(20))
    val a = FakeDecode.decodeSampled(blobs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2))).sortBy(x => (x._1, x._2))
    val b = FakeDecode.decodeSampled(blobs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2))).sortBy(x => (x._1, x._2))
    assert(a.nonEmpty)
    assert(a.toSeq == b.toSeq) // deterministic
    assert(a.forall(_._3.length == FakeDecode.FeatureDim))
    assert(a.forall(_._3.forall(f => f >= 0.0f && f <= 1.0f)))
  }

  test("audio window kernel agrees with the column-expression window plan") {
    val docs = Tables(spark, dir).documents.limit(40)
    val blobs = Multimodal.withAudioBlobs(docs)
    val kernel = FakeAudioFeatures.extractWindows(blobs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val plan = graft.SparkEntry.queries("mm_audio_windows")(spark, dir)
      .collect()
      .map(r => (r.getLong(r.fieldIndex("doc_id")), r.getLong(r.fieldIndex("window_idx"))) ->
        r.getLong(r.fieldIndex("window_samples")))
      .toMap
    val planSubset = plan.filter { case ((id, _), _) => kernel.keys.exists(_._1 == id) }
    assert(kernel.nonEmpty)
    assert(kernel == planSubset) // same windows, same truncated lengths
    // determinism of the fake energy
    val a = FakeAudioFeatures.extractWindows(blobs).collect().map(_.getDouble(3)).toSeq
    val b = FakeAudioFeatures.extractWindows(blobs).collect().map(_.getDouble(3)).toSeq
    assert(a.sorted == b.sorted)
  }

  test("frame sampling matches header nframes at stride 4") {
    val blobs = Multimodal.withBlobs(Tables(spark, dir).documents.limit(50))
    val meta = Multimodal.extractMeta(blobs).collect()
      .map(r => r.getLong(0) -> r.getLong(r.fieldIndex("nframes"))).toMap
    val sampled = FakeDecode.decodeSampled(blobs).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    meta.foreach { case (id, nf) =>
      assert(sampled(id) == ((nf + 3) / 4).toInt, s"doc $id nframes $nf")
    }
  }
}
