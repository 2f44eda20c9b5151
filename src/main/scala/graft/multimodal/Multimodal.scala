package graft.multimodal

import graft.{QueryDef, QueryModule}
import graft.operators.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.7).
  *
  * Media decode libraries aren't in this container, so the *codec kernel*
  * is stubbed (see [[FakeDecode]]) — but everything Spark-side is real:
  * binary container columns, fixed-offset header parsing with pure
  * column expressions, frame-index explosion with batch-friendly
  * partitioning, and typed metadata structs. At 100 TB the blobs live in
  * parquet binary columns; header parsing is a codegen'd expression (no
  * UDF, no decode), so metadata-only queries never touch the payload
  * bytes beyond the scanned pages.
  *
  * Synthetic container format "GRFT": 4-byte magic | 4-byte width |
  * 4-byte height | 4-byte nframes | 64-byte payload (md5-derived).
  */
object Multimodal extends QueryModule {

  /** Deterministic per-doc media geometry (stands in for real headers). */
  private def widthExpr: Column = lit(16) + pmod(col("doc_id"), lit(64))
  private def heightExpr: Column = lit(16) + pmod(col("doc_id") * 7, lit(64))
  private def nframesExpr: Column = lit(1) + pmod(col("doc_id"), lit(24))

  /** int -> 4-byte big-endian binary via hex. */
  private def be4(c: Column): Column = unhex(lpad(hex(c), 8, "0"))

  /** Build the synthetic blob column from a documents DataFrame. */
  def withBlobs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text"))
      .withColumn("blob", concat(
        lit("GRFT".getBytes("UTF-8")),
        be4(widthExpr), be4(heightExpr), be4(nframesExpr),
        unhex(concat(
          md5(col("text")),
          md5(concat(col("text"), lit("f1"))),
          md5(concat(col("text"), lit("f2"))),
          md5(concat(col("text"), lit("f3")))))))
      .drop("text")

  /** Parse a 4-byte big-endian field out of the blob (1-based offset). */
  private def beField(blob: Column, off: Int): Column =
    conv(hex(substring(blob, off, 4)), 16, 10).cast("long")

  /** Typed metadata struct parsed back from the binary container —
    * column expressions only. */
  def extractMeta(blobs: DataFrame): DataFrame =
    blobs.select(
      col("doc_id"),
      substring(col("blob"), 1, 4).cast("string").as("magic"),
      beField(col("blob"), 5).as("width"),
      beField(col("blob"), 9).as("height"),
      beField(col("blob"), 13).as("nframes"),
      (length(col("blob")) - 16).cast("long").as("payload_len"))

  // ---- audio-shaped container "GRFA": 4-byte magic | 4-byte sample_rate
  // | 4-byte n_samples | 16-byte payload. Sample rates 8/12/16 kHz,
  // clips 0.5-4 s — all derived from doc_id so the oracle can recompute.
  private def rateExpr: Column = lit(8000) + pmod(col("doc_id"), lit(3)) * 4000
  private def nsamplesExpr: Column =
    (lit(4000) + pmod(col("doc_id"), lit(3)) * 2000) * (lit(1) + pmod(col("doc_id"), lit(8)))

  /** Build the synthetic audio blob column from a documents DataFrame. */
  def withAudioBlobs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text"))
      .withColumn("ablob", concat(
        lit("GRFA".getBytes("UTF-8")),
        be4(rateExpr), be4(nsamplesExpr),
        unhex(md5(col("text")))))
      .drop("text")

  /** 8-byte big-endian binary from a long (two's complement via hex). */
  private def be8(c: Column): Column = unhex(lpad(hex(c), 16, "0"))

  /** Synthetic container "GRFP" carrying a decode-time PERCEPTUAL HASH:
    * 4-byte magic | 8-byte phash (big-endian) | 16-byte payload. Real
    * media pipelines compute a pHash from decoded pixels at ingest and
    * carry it in sidecar metadata; the codec being stubbed here, the
    * stand-in value is the doc's content simhash (already
    * oracle-verified by `dedup_simhash`), so near-dup documents
    * genuinely land within hamming 7 of each other and the downstream
    * banded join is exercised on real similarity structure — not on
    * avalanche-hash noise that would never collide. */
  def withPhashBlobs(docsWithSim: DataFrame): DataFrame =
    docsWithSim.select(col("doc_id"),
      concat(
        lit("GRFP".getBytes("UTF-8")),
        be8(col("sim")),
        unhex(md5(col("doc_id").cast("string")))).as("pblob"))

  /** Audio metadata struct parsed from the container header. */
  def extractAudioMeta(blobs: DataFrame): DataFrame =
    blobs.select(
      col("doc_id"),
      substring(col("ablob"), 1, 4).cast("string").as("magic"),
      beField(col("ablob"), 5).as("sample_rate"),
      beField(col("ablob"), 9).as("n_samples"))

  def defs: Seq[QueryDef] = Seq(
    QueryDef(
      // build -> parse roundtrip: the oracle recomputes the metadata from
      // doc_id arithmetic; matching proves the binary header plumbing.
      "mm_extract_meta",
      (s, dir) => {
        extractMeta(withBlobs(Tables(s, dir).documents))
          .withColumn("pixels", (col("width") * col("height")).cast("long"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, 'GRFT' AS magic,
        CAST(16 + doc_id % 64 AS BIGINT) AS width,
        CAST(16 + (doc_id * 7) % 64 AS BIGINT) AS height,
        CAST(1 + doc_id % 24 AS BIGINT) AS nframes,
        CAST(64 AS BIGINT) AS payload_len,
        CAST((16 + doc_id % 64) * (16 + (doc_id * 7) % 64) AS BIGINT) AS pixels
      FROM documents ORDER BY doc_id""")
    ),

    QueryDef(
      // frame-sampling plan: every 4th frame index exploded to rows —
      // the batch shape a Pandas-UDF/mapInArrow decode stage would
      // consume. Decode itself is the stubbed kernel (FakeDecode),
      // exercised in MultimodalSpec.
      "mm_frame_sample",
      (s, dir) => {
        extractMeta(withBlobs(Tables(s, dir).documents))
          .select(col("doc_id"), col("nframes"),
            explode(sequence(lit(0L), col("nframes") - 1L, lit(4L))).as("frame_idx"))
          .orderBy(col("doc_id"), col("frame_idx"))
      },
      Some("""SELECT doc_id, CAST(1 + doc_id % 24 AS BIGINT) AS nframes,
        CAST(f AS BIGINT) AS frame_idx
      FROM (SELECT doc_id, unnest(range(0, 1 + doc_id % 24, 4)) AS f FROM documents) t
      ORDER BY doc_id, frame_idx""")
    ),

    QueryDef(
      // RESIZE planning + the stubbed pixel kernel's write-side
      // plumbing — the ViT/CLIP preprocessing step (aspect-fit into a
      // 224 box): out dims are pure integer arithmetic (fit the longer
      // side, floor the shorter, ≥1 guard), so the PLAN is
      // oracle-exact; the pixel kernel being stubbed (no codecs in the
      // container), the "resized" container is REBUILT with the new
      // header dims and a deterministic md5-derived payload, then
      // REPARSED with the same column expressions — the output's
      // out_w/out_h/payload_hex come from the reconstructed BINARY,
      // not the plan, so a broken write path cannot hash-match the
      // oracle's arithmetic. out_bytes (out_w·out_h·3) is the decode
      // budget a batch scheduler packs on. All column expressions —
      // payload bytes of the SOURCE are never read (the header-only
      // discipline of this tier).
      "mm_resize",
      (s, dir) => {
        val t = 224L
        val meta = extractMeta(withBlobs(Tables(s, dir).documents))
        val planned = meta.select(col("doc_id"), col("width"), col("height"))
          .withColumn("p_w", when(col("width") >= col("height"), lit(t))
            .otherwise(greatest(lit(1L), expr(s"width * $t div height"))))
          .withColumn("p_h", when(col("width") >= col("height"),
              greatest(lit(1L), expr(s"height * $t div width")))
            .otherwise(lit(t)))
        val rebuilt = planned.withColumn("rblob", concat(
          lit("GRFT".getBytes("UTF-8")),
          be4(col("p_w")), be4(col("p_h")), be4(lit(1L)),
          unhex(md5(concat_ws(":", col("doc_id"), col("p_w"), col("p_h"))))))
        rebuilt.select(col("doc_id"), col("width"), col("height"),
            beField(col("rblob"), 5).as("out_w"),
            beField(col("rblob"), 9).as("out_h"),
            (beField(col("rblob"), 5) * beField(col("rblob"), 9) * lit(3L))
              .as("out_bytes"),
            hex(substring(col("rblob"), 17, 4)).as("payload_hex"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH m AS (SELECT doc_id,
          CAST(16 + doc_id % 64 AS BIGINT) AS width,
          CAST(16 + (doc_id * 7) % 64 AS BIGINT) AS height
        FROM documents),
      p AS (SELECT doc_id, width, height,
          CAST(CASE WHEN width >= height THEN 224
               ELSE GREATEST(1, width * 224 // height) END AS BIGINT) AS out_w,
          CAST(CASE WHEN width >= height THEN GREATEST(1, height * 224 // width)
               ELSE 224 END AS BIGINT) AS out_h
        FROM m)
      SELECT doc_id, width, height, out_w, out_h,
        CAST(out_w * out_h * 3 AS BIGINT) AS out_bytes,
        upper(substr(md5(concat_ws(':', doc_id, out_w, out_h)), 1, 8)) AS payload_hex
      FROM p ORDER BY doc_id""")
    ),

    QueryDef(
      // audio plumbing: fixed-rate 1-second tumbling windows over each
      // clip, exploded to window rows (start sample + actual window
      // length, final window truncated) — the batch shape a feature
      // extractor (fbank/spectrogram kernel behind mapPartitions)
      // consumes. Header parse + windowing are pure column expressions;
      // payload bytes are never touched.
      "mm_audio_windows",
      (s, dir) => {
        extractAudioMeta(withAudioBlobs(Tables(s, dir).documents))
          .withColumn("n_windows",
            expr("(n_samples + sample_rate - 1) DIV sample_rate"))
          .select(col("doc_id"), col("sample_rate"), col("n_samples"),
            explode(sequence(lit(0L), col("n_windows") - 1L)).as("window_idx"))
          .withColumn("start_sample", (col("window_idx") * col("sample_rate")).cast("long"))
          .withColumn("window_samples",
            least(col("sample_rate"), col("n_samples") - col("start_sample")).cast("long"))
          .orderBy(col("doc_id"), col("window_idx"))
      },
      Some("""WITH m AS (
        SELECT doc_id,
          CAST(8000 + (doc_id % 3) * 4000 AS BIGINT) AS sample_rate,
          CAST((4000 + (doc_id % 3) * 2000) * (1 + doc_id % 8) AS BIGINT) AS n_samples
        FROM documents),
      w AS (
        SELECT doc_id, sample_rate, n_samples,
          unnest(range(0, (n_samples + sample_rate - 1) // sample_rate)) AS widx
        FROM m)
      SELECT doc_id, sample_rate, n_samples,
        CAST(widx AS BIGINT) AS window_idx,
        CAST(widx * sample_rate AS BIGINT) AS start_sample,
        CAST(LEAST(sample_rate, n_samples - widx * sample_rate) AS BIGINT) AS window_samples
      FROM w ORDER BY doc_id, window_idx""")
    ),

    QueryDef(
      // Perceptual-hash near-dup over binary media containers: parse
      // the carried 64-bit pHash back out of the "GRFP" header (two
      // big-endian 4-byte reads reassembled with shift/or — column
      // expressions only, payload bytes untouched) and run the SAME
      // two-level hamming banding + exact bit_count verify as
      // dedup_simhash. The carried hash IS the doc's simhash (see
      // [[withPhashBlobs]] — the honest codec stand-in), so output ≡
      // dedup_simhash and one oracle string gates both; what this query
      // adds to the inventory is the binary container roundtrip feeding
      // the shared dedup machinery — the image-dedup pipeline shape
      // with the pixel hash swapped for a content hash.
      "mm_dedup_phash",
      (s, dir) => {
        val sims = graft.dedup.Dedup.stagedDocFeatures(s, dir).feats
          .select(col("doc_id"), col("sim"))
        val hashed = withPhashBlobs(sims).select(col("doc_id"),
          shiftleft(beField(col("pblob"), 5), 32)
            .bitwiseOR(beField(col("pblob"), 9)).as("sim"))
        val banded = graft.dedup.Dedup.simhashBandKeys(hashed)
        val cands = graft.dedup.Dedup.bucketPairs(banded, "seg_key")
        val a = hashed.select(col("doc_id").as("doc_a"), col("sim").as("sim_a"))
        val b = hashed.select(col("doc_id").as("doc_b"), col("sim").as("sim_b"))
        cands.join(a, "doc_a").join(b, "doc_b")
          .withColumn("hamming", expr("bit_count(sim_a ^ sim_b)").cast("long"))
          .filter(col("hamming") <= 7)
          .select(col("doc_a"), col("doc_b"), col("hamming"))
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some(graft.dedup.Dedup.SimhashPairsOracleSql)
    ),

    QueryDef(
      // A/V ALIGNMENT: attach to every sampled video frame the audio
      // window playing at its timestamp — the multimodal training-pair
      // construction step ((frame, audio context) pairs for contrastive
      // or captioning training), composed from this tier's own frame/
      // window plumbing and the NATIVE AsOfJoinExec (backward as-of per
      // doc on integer microseconds — video and audio clocks don't
      // share tick boundaries, so an equi-join on timestamps is the
      // classically WRONG tool here). Frame times at the synthetic
      // 8 fps are frame_idx * 125000 us; window starts are
      // start_sample * 1e6 div sample_rate — integer division, exact in
      // both engines. Window 0 starts at 0 us, so the backward match is
      // total, and frames outlasting the audio land on the LAST window
      // (as-of semantics, mirrored by the oracle's correlated MAX). One
      // shuffle on doc_id with both sides range-sorted inside
      // AsOfJoinExec — never a per-frame probe.
      "mm_av_align",
      (s, dir) => {
        val frames = extractMeta(withBlobs(Tables(s, dir).documents))
          .select(col("doc_id"), col("nframes"),
            explode(sequence(lit(0L), col("nframes") - 1L, lit(4L))).as("frame_idx"))
          .select(col("doc_id"), col("frame_idx"),
            (col("frame_idx") * lit(125000L)).as("frame_us"))
        // the right side's by column is dropped from the as-of output
        // (AsOf.joinBackward contract), so wins carries doc_id directly
        val wins = extractAudioMeta(withAudioBlobs(Tables(s, dir).documents))
          .withColumn("n_windows",
            expr("(n_samples + sample_rate - 1) DIV sample_rate"))
          .select(col("doc_id"),
            explode(sequence(lit(0L), col("n_windows") - 1L)).as("window_idx"),
            col("sample_rate"))
          .select(col("doc_id"), col("window_idx"),
            expr("window_idx * sample_rate * 1000000 DIV sample_rate").as("win_start_us"))
        graft.plans.AsOf.joinBackward(frames, wins,
            Seq("doc_id"), "frame_us", "win_start_us")
          .orderBy(col("doc_id"), col("frame_idx"))
      },
      Some("""WITH f AS (
          SELECT doc_id, CAST(fi AS BIGINT) AS frame_idx,
            CAST(fi * 125000 AS BIGINT) AS frame_us
          FROM (SELECT doc_id, unnest(range(0, 1 + doc_id % 24, 4)) AS fi FROM documents) t),
        m AS (
          SELECT doc_id,
            CAST(8000 + (doc_id % 3) * 4000 AS BIGINT) AS sample_rate,
            CAST((4000 + (doc_id % 3) * 2000) * (1 + doc_id % 8) AS BIGINT) AS n_samples
          FROM documents),
        w AS (
          SELECT doc_id,
            CAST(widx AS BIGINT) AS window_idx,
            CAST(widx * sample_rate * 1000000 // sample_rate AS BIGINT) AS win_start_us
          FROM (SELECT doc_id, sample_rate,
              unnest(range(0, (n_samples + sample_rate - 1) // sample_rate)) AS widx
            FROM m) t)
      SELECT f.doc_id, f.frame_idx, f.frame_us,
        (SELECT w.window_idx FROM w
          WHERE w.doc_id = f.doc_id AND w.win_start_us <= f.frame_us
          ORDER BY w.win_start_us DESC LIMIT 1) AS window_idx,
        (SELECT MAX(w.win_start_us) FROM w
          WHERE w.doc_id = f.doc_id AND w.win_start_us <= f.frame_us) AS win_start_us
      FROM f ORDER BY doc_id, frame_idx""")
    ),

    QueryDef(
      // SHOT-BOUNDARY detection — the video curation step before frame
      // sampling: cut where consecutive frames' perceptual hashes jump
      // (real pipelines: pHash per decoded frame; hamming > threshold =
      // scene change). nframes comes through the binary-header parse
      // (the blob roundtrip stays in the path); the per-frame pHash is
      // the tier's deterministic decode stand-in, derived from
      // (doc, frame DIV seg_len) so frames share a hash within a
      // synthetic SEGMENT and jump across segments — real shot
      // structure with an exact oracle (within-segment hamming 0,
      // boundary hamming ~30 of 60 bits, threshold 15). The hash is
      // the decontam 60-bit md5 key arithmetic; hamming is
      // bit_count(xor) in both engines; the lag() window is per-doc
      // (bounded partitions — nframes ≤ 24 here, frame counts in the
      // thousands at production, never a corpus-wide sort). Output:
      // per-doc shot count + average shot length (one division).
      "mm_shot_detect",
      (s, dir) => {
        val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
        extractMeta(withBlobs(Tables(s, dir).documents))
          .select(col("doc_id"), col("nframes"),
            explode(sequence(lit(0L), col("nframes") - 1L)).as("frame_idx"),
            (lit(1L) + pmod(col("doc_id"), lit(4L))).as("seg_len"))
          .withColumn("ph",
            conv(substring(md5(concat(lit("ph:"), col("doc_id").cast("string"),
              lit(":"), expr("frame_idx DIV seg_len").cast("string")).cast("binary")),
              1, 15), 16, 10).cast("long"))
          .withColumn("prev", lag(col("ph"), 1).over(w))
          .withColumn("cut",
            when(col("prev").isNotNull &&
              bit_count(col("ph").bitwiseXOR(col("prev"))) > lit(ShotHammingThresh), 1L)
              .otherwise(0L))
          .groupBy(col("doc_id"), col("nframes"))
          .agg((lit(1L) + sum(col("cut"))).as("n_shots"))
          .withColumn("avg_shot_len",
            col("nframes").cast("double") / col("n_shots").cast("double"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH f AS (
          SELECT doc_id, CAST(1 + doc_id % 24 AS BIGINT) AS nframes,
            CAST(fi AS BIGINT) AS frame_idx,
            CAST(1 + doc_id % 4 AS BIGINT) AS seg_len
          FROM (SELECT doc_id, unnest(range(0, 1 + doc_id % 24)) AS fi FROM documents) t),
        h AS (
          SELECT doc_id, nframes, frame_idx,
            CAST('0x' || substr(md5('ph:' || CAST(doc_id AS VARCHAR) || ':' ||
              CAST(frame_idx // seg_len AS VARCHAR)), 1, 15) AS BIGINT) AS ph
          FROM f),
        d AS (
          SELECT doc_id, nframes, ph,
            LAG(ph) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS prev
          FROM h),
        c AS (
          SELECT doc_id, nframes,
            CASE WHEN prev IS NOT NULL AND bit_count(xor(ph, prev)) > $ShotHammingThresh
              THEN 1 ELSE 0 END AS cut
          FROM d)
      SELECT doc_id, nframes, CAST(1 + SUM(cut) AS BIGINT) AS n_shots,
        CAST(nframes AS DOUBLE) / CAST(1 + SUM(cut) AS DOUBLE) AS avg_shot_len
      FROM c GROUP BY doc_id, nframes ORDER BY doc_id""")
    )
  )

  /** `mm_shot_detect` cut threshold: independent 60-bit hashes sit at
    * hamming ~30 ± 3.9, identical hashes at 0 — 15 separates the two
    * populations by ~4 sigma each side. */
  private[multimodal] val ShotHammingThresh = 15
}

/** STUB audio feature kernel: per 1-second window, a fake "RMS"-style
  * scalar derived deterministically from the payload bytes. Real
  * deployments swap the inner loop for an fbank/spectrogram codec — the
  * Spark shape (header parse -> window plan -> batched per-partition
  * kernel over binary payloads) is exactly what survives.
  */
object FakeAudioFeatures {

  /** (doc_id, window_idx, window_samples, rms) per fixed-rate window. */
  def extractWindows(blobs: DataFrame): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("window_idx", LongType),
      StructField("window_samples", LongType),
      StructField("rms", DoubleType)))
    val blobIdx = blobs.schema.fieldIndex("ablob")
    val idIdx = blobs.schema.fieldIndex("doc_id")
    blobs.mapPartitions { iter =>
      iter.flatMap { row =>
        val blob = row.getAs[Array[Byte]](blobIdx)
        val id = row.getLong(idIdx)
        def be4(o: Int): Long =
          (((blob(o) & 0xff) << 24) | ((blob(o + 1) & 0xff) << 16) |
            ((blob(o + 2) & 0xff) << 8) | (blob(o + 3) & 0xff)).toLong
        val rate = be4(4)
        val nSamples = be4(8)
        val payload = java.util.Arrays.copyOfRange(blob, 12, blob.length)
        val nWindows = (nSamples + rate - 1) / rate
        (0L until nWindows).iterator.map { w =>
          val len = math.min(rate, nSamples - w * rate)
          // fake per-window energy: fold payload bytes keyed by window
          var acc = 0.0
          var i = 0
          while (i < payload.length) {
            val b = payload(((w.toInt + i) % payload.length + payload.length) % payload.length) & 0xff
            acc += (b / 255.0) * (b / 255.0)
            i += 1
          }
          Row(id, w, len, math.sqrt(acc / payload.length))
        }
      }
    }(Encoders.row(outSchema))
  }
}

/** STUB decode kernel. A real deployment swaps this for an image/audio
  * codec behind `mapInArrow`/`mapPartitions`; the container has no media
  * libraries, so we use a deterministic fake with the same signature and
  * batch shape (bytes -> fixed-length float feature vector).
  */
object FakeDecode {
  val FeatureDim = 8

  /** Deterministic fake "decoded features" for one frame's byte window. */
  def decodeFrame(payload: Array[Byte], frameIdx: Int): Array[Float] = {
    val out = new Array[Float](FeatureDim)
    var i = 0
    while (i < FeatureDim) {
      val b = payload(((frameIdx * FeatureDim) + i) % payload.length)
      out(i) = (b & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** Frame features for sampled frames, batch-shaped like a real decode
    * stage: one task per partition, primitive loops inside. */
  def decodeSampled(blobs: DataFrame, stride: Int = 4): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    val blobIdx = blobs.schema.fieldIndex("blob")
    val idIdx = blobs.schema.fieldIndex("doc_id")
    blobs.mapPartitions { iter =>
      iter.flatMap { row =>
        val blob = row.getAs[Array[Byte]](blobIdx)
        val id = row.getLong(idIdx)
        val nframes = ((blob(12) & 0xff) << 24) | ((blob(13) & 0xff) << 16) |
          ((blob(14) & 0xff) << 8) | (blob(15) & 0xff)
        val payload = java.util.Arrays.copyOfRange(blob, 16, blob.length)
        (0 until nframes by stride).iterator.map { f =>
          Row(id, f, FakeDecode.decodeFrame(payload, f).toSeq)
        }
      }
    }(Encoders.row(outSchema))
  }
}
