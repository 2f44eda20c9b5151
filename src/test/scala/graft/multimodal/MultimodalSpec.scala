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

  test("A/V alignment: every frame lands in its covering second, frames past the audio on the last window") {
    val rows = graft.SparkEntry.queries("mm_av_align")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(r.fieldIndex("doc_id")), r.getLong(r.fieldIndex("frame_us")),
        r.getLong(r.fieldIndex("window_idx")), r.getLong(r.fieldIndex("win_start_us"))))
    assert(rows.nonEmpty)
    // audio windows start at exact seconds (start_sample * 1e6 div sr =
    // widx * 1e6), so the backward as-of must pick floor(frame_us / 1s),
    // clamped to the doc's last window
    val lastWin = rows.groupBy(_._1).view.mapValues(_.map(_._3).max).toMap
    rows.foreach { case (doc, fUs, wIdx, wStart) =>
      assert(wStart == wIdx * 1000000L, s"doc $doc window $wIdx starts at $wStart")
      val expected = math.min(fUs / 1000000L, lastWin(doc))
      assert(wIdx == expected, s"doc $doc frame@$fUs matched window $wIdx, want $expected")
    }
    // the clamp path is actually exercised: some frame outlasts its audio
    assert(rows.exists { case (doc, fUs, _, _) => fUs / 1000000L > lastWin(doc) },
      "no frame outlasts its audio at sf0.001 — the as-of clamp is untested")
  }

  test("shot detection matches an independent driver reference on the segment structure") {
    // reference: same 60-bit md5 phash per (doc, frame DIV seg_len),
    // same hamming threshold, plain Scala scan
    val md = java.security.MessageDigest.getInstance("MD5")
    def ph(doc: Long, seg: Long): Long = {
      md.reset()
      val hex = md.digest(s"ph:$doc:$seg".getBytes("UTF-8")).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val got = graft.SparkEntry.queries("mm_shot_detect")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got.nonEmpty)
    got.foreach { case (doc, nframes, nShots, avgLen) =>
      assert(nframes == 1 + doc % 24, s"doc $doc nframes")
      val segLen = 1 + doc % 4
      val cuts = (1L until nframes).count { fi =>
        val (a, b) = (ph(doc, (fi - 1) / segLen), ph(doc, fi / segLen))
        java.lang.Long.bitCount(a ^ b) > 15
      }
      assert(nShots == 1 + cuts, s"doc $doc: $nShots vs ${1 + cuts}")
      assert(avgLen == nframes.toDouble / nShots.toDouble)
      // every multi-segment doc should cut (independent 60-bit hashes
      // miss the 15-bit threshold with p ~ 1e-4)
      if (nframes > segLen) assert(nShots > 1, s"doc $doc found no cuts")
    }
  }
}
