package graft.pipeline

import graft.{QueryDef, QueryModule}
import graft.operators.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-preparation operators (SURVEY.md §2.9) — the training-data
  * pipeline tier beyond per-doc text analysis: PII scrubbing,
  * deterministic stratified sampling, domain mixing, benchmark
  * decontamination, sequence packing, and a bucketed range join.
  *
  * Every operator is a declarative DataFrame plan (codegen-friendly, no
  * UDFs) and every random-looking decision is a deterministic pure
  * function of the row, so the same corpus always yields the same
  * sample/mix/packing on any cluster size — reproducibility is a
  * first-class requirement for training-data lineage.
  */
object CorpusOps extends QueryModule {

  /** Deterministic per-doc uniform draw in [0, 2^31 - 1): TWO
    * Lehmer/MINSTD steps over the stable doc id. Pure integer
    * arithmetic (exactly mirrorable in ANSI SQL), no RNG state, no seed
    * plumbing — sampling decisions are reproducible row-locally on any
    * partitioning. Two composed steps, each reduced mod M first, give
    * both required properties at once: every intermediate product is
    * ≤ (M-1)·48271 ≈ 1.0e14 (overflow-free for EVERY long id — a
    * single big multiplier overflows at ~3.5e9 ids, silently keeping
    * 100% of high-id docs), and small ids mix properly (one small-
    * multiplier step is monotone below id ≈ 44k, skewing realized
    * rates to 1.0 on small corpora). Measured: realized rate within
    * 0.03 of configured at 50 docs, 0.006 at 500.
    */
  // private[graft]: dedup's weighted sampling reuses the ONE draw chain
  private[graft] def hashU32(id: Column): Column =
    (((id % lit(2147483647L)) * lit(48271L)) % lit(2147483647L) * lit(48271L)) % lit(2147483647L)
  private[graft] val HashU32Sql =
    "(((doc_id % 2147483647) * 48271) % 2147483647 * 48271) % 2147483647"
  private[graft] val HashMod = 2147483647.0

  /** `'srcN'` → N — the synthetic source id carries its stratum number. */
  private def srcNum(source: Column): Column = substring(source, 4, 10).cast("int")

  // --- PII patterns (RE2-safe subset: no backrefs/lookaround, so the
  // same pattern strings run identically under Java regex and DuckDB).
  private[graft] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val PhoneRe = "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}"
  private[graft] val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** 8-token shingles of a lowercase-split text column; empty array
    * below 8 tokens (the guard keeps `sequence` from going negative).
    * THE shingle definition for decontamination — shared by the batch
    * `decontam_ngram` (explode drops empty arrays, so the guard doubles
    * as the length filter) and the streaming `markContaminated`, so
    * batch and stream cannot silently diverge on what "contaminated"
    * means. */
  private[graft] def shingles8(t: Column): Column = {
    val toks = split(lower(t), " ")
    when(size(toks) >= 8,
      transform(sequence(lit(0), size(toks) - 8),
        i => concat_ws(" ", slice(toks, i + 1, lit(8)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Ordered PII redaction (email → phone → IPv4 — see the query note).
    * Pure stateless column expression, shared by the batch query and the
    * streaming scrub. */
  private[graft] def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      Ipv4Re, "<IP>")

  /** THE shared positional shingle staging for ALL THREE
    * decontamination probes (`decontam_ngram` / `decontam_hashed` /
    * `decontam_spans`): one tokenize + posexplode of the corpus,
    * persisted ONCE — a review pass found the three probes each pinning
    * their own exploded 8-gram copy (string-keyed, hashed, hashed+pos —
    * three session-lifetime caches of the corpus's largest derived
    * frame). Key projections run downstream over the cached rows (an
    * md5 per scan costs far less than a third persisted copy), and the
    * CacheManager's plan-equality dedup means every caller hits the
    * same entry. MEMORY_AND_DISK so it evicts under pressure. */
  private def stagedShingles(s: org.apache.spark.sql.SparkSession,
                             dir: String): DataFrame =
    Tables(s, dir).documents
      .select(col("doc_id"), col("source"),
        posexplode(shingles8(col("text"))).as(Seq("p0", "s")))
      .select(col("doc_id"), col("source"),
        (col("p0") + 1).cast("long").as("pos"), col("s"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** THE decontamination probe — ONE pipeline for `decontam_ngram` and
    * `decontam_hashed`, parameterized by the membership-key projection
    * (identity 8-gram string vs its 60-bit hash) so the bench split,
    * shingle definition, and distinct/count tail cannot fork between
    * the two operators. Scans [[stagedShingles]]. */
  private def decontamBody(s: org.apache.spark.sql.SparkSession, dir: String,
                           key: Column => Column): DataFrame = {
    val shingled = stagedShingles(s, dir)
      .select(col("doc_id"), col("source"), key(col("s")).as("k"))
    val bench = shingled.filter(col("doc_id") % 29 === 0)
      .select(col("k")).distinct()
    shingled.filter(col("doc_id") % 29 =!= 0)
      .join(broadcast(bench), "k")
      .select(col("doc_id"), col("source"), col("k")).distinct()
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_shared"))
      .orderBy(col("doc_id"))
  }

  /** The matching oracle template: `keySql` is the per-position
    * membership key over token array `t` (must contain the unnest). */
  private def decontamOracleSql(keySql: String): String =
    s"""WITH toks AS (
        SELECT doc_id, source, string_split(lower(text), ' ') AS t FROM documents),
      sh AS (
        SELECT doc_id, source, $keySql AS k
        FROM toks WHERE len(t) >= 8),
      bench AS (SELECT DISTINCT k FROM sh WHERE doc_id % 29 = 0),
      cand AS (SELECT DISTINCT d.doc_id, d.source, d.k
        FROM sh d JOIN bench b USING (k) WHERE d.doc_id % 29 <> 0)
      SELECT doc_id, source, CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM cand GROUP BY doc_id, source ORDER BY doc_id"""

  /** THE distributed prefix-sum kernel — shared by `pack_sequences`
    * (context-bin assignment) and `token_budget` (budget cutoff). A
    * per-key running sum over a global order is NOT a window (an
    * unpartitioned / hot-key window is single-partition at scale); it is
    * a two-phase prefix sum:
    *   1. range-partition + locally sort rows by (key, o1, o2);
    *      per-partition partial sums per key — a summary of
    *      O(partitions × keys) rows, collected to the driver;
    *   2. driver folds partials into per-(partition, key) start offsets
    *      (broadcast back);
    *   3. one partition-local streaming pass emits each row's exclusive
    *      prefix `start`.
    * The result depends only on the global (key, o1, o2) order — any
    * partition layout yields byte-identical output. The input RDD is
    * persisted because phases 1 and 3 must see the SAME layout (and it
    * halves the work); the ContextCleaner unpersists it when
    * unreachable.
    *
    * @param rows columns (key: string, o1: double, o2: long, n: long);
    *             (o1, o2) is the within-key order, n the summed weight
    * @return columns (key, o1, o2, n, start), start = Σ n of rows
    *         strictly before this one in (o1, o2) order within key
    */
  private[graft] def prefixStarts(
      s: org.apache.spark.sql.SparkSession, rows: DataFrame): DataFrame = {
    import s.implicits._
    val parts = s.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = rows
      .select(col("key").cast("string"), col("o1").cast("double"),
        col("o2").cast("long"), col("n").cast("long"))
      .repartitionByRange(parts, col("key"), col("o1"), col("o2"))
      .sortWithinPartitions(col("key"), col("o1"), col("o2"))
      .as[(String, Double, Long, Long)]
    val rdd = ranged.rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val partials: Array[(Int, Seq[(String, Long)])] =
      rdd.mapPartitionsWithIndex { (pid, it) =>
        val acc = scala.collection.mutable.LinkedHashMap.empty[String, Long]
        it.foreach { case (k, _, _, n) => acc.update(k, acc.getOrElse(k, 0L) + n) }
        Iterator.single((pid, acc.toSeq))
      }.collect()
    val running = scala.collection.mutable.HashMap.empty[String, Long]
    val offsets: Map[(Int, String), Long] =
      partials.sortBy(_._1).flatMap { case (pid, sums) =>
        sums.map { case (k, tot) =>
          val off = running.getOrElse(k, 0L)
          running.update(k, off + tot)
          ((pid, k), off)
        }
      }.toMap
    val bOff = s.sparkContext.broadcast(offsets)
    rdd.mapPartitionsWithIndex { (pid, it) =>
      val cum = scala.collection.mutable.HashMap.empty[String, Long]
      it.map { case (k, o1, o2, n) =>
        val start = cum.getOrElse(k, bOff.value.getOrElse((pid, k), 0L))
        cum.update(k, start + n)
        (k, o1, o2, n, start)
      }
    }.toDF("key", "o1", "o2", "n", "start")
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef(
      // PII redaction (email → phone → IPv4, in that order so the phone
      // pass never sees digits freed by the email pass and the IP pass
      // never sees phone digits). The synthetic corpus has no natural
      // PII, so the query constructs a deterministic contact blurb per
      // customer — identically in Spark and the oracle — and scrubs
      // that. Pure per-row regexp chain: whole-stage codegen, no
      // shuffle, trivially linear at 100 TB.
      "text_pii_scrub",
      (s, dir) => {
        val key = col("c_custkey")
        val msg = concat(
          col("c_name"), lit(" <"), lower(col("c_name")), lit("."),
          key.cast("string"), lit("@example.com> tel +1-555-"),
          lpad((key % 10000).cast("string"), 4, "0"),
          lit(" ip 10."), (key % 200).cast("string"), lit("."),
          (key % 250).cast("string"), lit(".7 ok"))
        Tables(s, dir).customer
          .select(key.as("c_custkey"), msg.as("msg"))
          .select(
            col("c_custkey"),
            regexp_count(col("msg"), lit(EmailRe)).cast("long").as("n_email"),
            regexp_count(col("msg"), lit(PhoneRe)).cast("long").as("n_phone"),
            regexp_count(col("msg"), lit(Ipv4Re)).cast("long").as("n_ip"),
            redactPii(col("msg")).as("redacted"))
          .orderBy(col("c_custkey"))
      },
      Some(s"""WITH m AS (SELECT c_custkey,
          c_name || ' <' || lower(c_name) || '.' || CAST(c_custkey AS VARCHAR)
            || '@example.com> tel +1-555-'
            || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
            || ' ip 10.' || CAST(c_custkey % 200 AS VARCHAR) || '.'
            || CAST(c_custkey % 250 AS VARCHAR) || '.7 ok' AS msg
        FROM customer)
      SELECT c_custkey,
        CAST(len(regexp_extract_all(msg, '$EmailRe')) AS BIGINT) AS n_email,
        CAST(len(regexp_extract_all(msg, '$PhoneRe')) AS BIGINT) AS n_phone,
        CAST(len(regexp_extract_all(msg, '$Ipv4Re')) AS BIGINT) AS n_ip,
        regexp_replace(regexp_replace(regexp_replace(msg,
          '$EmailRe', '<EMAIL>', 'g'),
          '$PhoneRe', '<PHONE>', 'g'),
          '$Ipv4Re', '<IP>', 'g') AS redacted
      FROM m ORDER BY c_custkey""")
    ),

    QueryDef(
      // Deterministic stratified sampling: each source stratum gets its
      // own keep-rate (here a function of the stratum id; in production
      // a config map) and a doc survives iff its hash draw clears the
      // rate. One map-side-combined aggregate — the decision never
      // shuffles, only the 20-row per-source summary does. The
      // multiplicative-hash draw makes this systematic sampling:
      // per-stratum realized rates concentrate tighter than Bernoulli.
      "sample_stratified",
      (s, dir) => {
        val rate = (lit(25.0) + lit(5.0) * (srcNum(col("source")) % 5).cast("double")) / 100.0
        val kept = hashU32(col("doc_id")).cast("double") < rate * HashMod
        Tables(s, dir).documents
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(when(kept, 1L).otherwise(0L)).as("n_kept"),
            sum(when(kept, col("n_chars")).otherwise(0L)).cast("long").as("kept_chars"))
          .select(
            col("source"),
            ((lit(25.0) + lit(5.0) * (srcNum(col("source")) % 5).cast("double")) / 100.0).as("rate"),
            col("n_docs"), col("n_kept"), col("kept_chars"))
          .orderBy(col("source"))
      },
      Some(s"""SELECT source,
        (25.0 + 5.0 * CAST(CAST(substr(source, 4) AS INTEGER) % 5 AS DOUBLE)) / 100.0 AS rate,
        CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(CASE WHEN CAST($HashU32Sql AS DOUBLE) <
          ((25.0 + 5.0 * CAST(CAST(substr(source, 4) AS INTEGER) % 5 AS DOUBLE)) / 100.0) * 2147483647.0
          THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        CAST(SUM(CASE WHEN CAST($HashU32Sql AS DOUBLE) <
          ((25.0 + 5.0 * CAST(CAST(substr(source, 4) AS INTEGER) % 5 AS DOUBLE)) / 100.0) * 2147483647.0
          THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
      FROM documents GROUP BY source ORDER BY source""")
    ),

    QueryDef(
      // Domain mixing: rebalance the corpus toward target per-domain
      // shares (integer weights — exact under any summation order, so
      // the derived doubles are bit-identical across engines). The
      // per-source rate table is source-cardinality-sized (a global
      // window over ~20 rows, NOT over docs), broadcast back onto the
      // corpus for one deterministic filter pass. This is the FineWeb /
      // Pile-style mixing step: stats → rates → one re-sample scan.
      "mix_domains",
      (s, dir) => {
        val docs = Tables(s, dir).documents
        val w = (lit(60L) / (lit(1L) + (srcNum(col("source")) % 5).cast("long"))).as("w")
        val stats = docs.groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"))
          .withColumn("w", w)
        // global window is over the per-SOURCE summary (tiny), not rows
        val all = Window.partitionBy()
        val rates = stats
          .withColumn("share", col("w").cast("double") / sum(col("w")).over(all).cast("double"))
          .withColumn("total", sum(col("n_docs")).over(all))
          .withColumn("rate",
            least(lit(1.0), col("share") * col("total").cast("double") / col("n_docs").cast("double")))
          .select(col("source"), col("n_docs"), col("share"), col("rate"))
        val kept = hashU32(col("doc_id")).cast("double") < col("rate") * HashMod
        docs.join(broadcast(rates), "source")
          .groupBy(col("source"), col("n_docs"), col("share"), col("rate"))
          .agg(sum(when(kept, 1L).otherwise(0L)).as("n_kept"))
          .orderBy(col("source"))
      },
      Some(s"""WITH stats AS (
        SELECT source, COUNT(*) AS n_docs,
          60 / (1 + CAST(substr(source, 4) AS INTEGER) % 5) AS w
        FROM documents GROUP BY source),
      r AS (SELECT source, n_docs,
          CAST(w AS DOUBLE) / CAST(SUM(w) OVER () AS DOUBLE) AS share,
          SUM(n_docs) OVER () AS total
        FROM stats),
      rr AS (SELECT source, CAST(n_docs AS BIGINT) AS n_docs, share,
          LEAST(1.0, share * CAST(total AS DOUBLE) / CAST(n_docs AS DOUBLE)) AS rate
        FROM r)
      SELECT d.source, rr.n_docs, rr.share, rr.rate,
        CAST(SUM(CASE WHEN CAST((((d.doc_id % 2147483647) * 48271) % 2147483647 * 48271) % 2147483647 AS DOUBLE)
          < rr.rate * 2147483647.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      FROM documents d JOIN rr ON d.source = rr.source
      GROUP BY d.source, rr.n_docs, rr.share, rr.rate
      ORDER BY d.source""")
    ),

    QueryDef(
      // Temperature-scaled domain mixing (τ = 0.5): the multilingual /
      // multi-domain sampling rule w_i ∝ n_i^τ that upweights small
      // domains relative to proportional sampling. τ = 0.5 is sqrt —
      // chosen deliberately because IEEE-754 sqrt is CORRECTLY ROUNDED,
      // so Spark and the oracle agree bit-for-bit without the libm
      // last-ulp risk a general pow() carries; the one 6dp round (the
      // text_bm25 discipline) then pins the decimal weight, and the
      // weight SUM is decimal-exact so the share denominator cannot
      // drift with summation order. Per-source summary is tiny (one row
      // per domain) — at 100 TB this is a groupBy + a window over the
      // summary, never a second corpus pass. Budget = half the corpus;
      // expected_docs caps at the domain size (LEAST), which is where
      // sqrt-flattening visibly bites small domains' caps.
      "mix_temperature",
      (s, dir) => {
        val all = Window.partitionBy()
        Tables(s, dir).documents
          .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
          .withColumn("w", round(sqrt(col("n_docs").cast("double")), 6)
            .cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .withColumn("share", col("w").cast("double") / sum(col("w")).over(all).cast("double"))
          .withColumn("budget", sum(col("n_docs")).over(all).cast("double") * lit(0.5))
          .withColumn("expected_docs",
            least(col("n_docs"), round(col("share") * col("budget")).cast("long")))
          .select(col("source"), col("n_docs"), col("w").cast("double").as("w"),
            col("share"), col("expected_docs"))
          .orderBy(col("source"))
      },
      Some("""WITH stats AS (
        SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
      wt AS (SELECT source, n_docs,
          CAST(ROUND(sqrt(CAST(n_docs AS DOUBLE)), 6) AS DECIMAL(18,6)) AS w
        FROM stats),
      r AS (SELECT source, n_docs, w,
          CAST(w AS DOUBLE) / CAST(SUM(w) OVER () AS DOUBLE) AS share,
          CAST(SUM(n_docs) OVER () AS DOUBLE) * 0.5 AS budget
        FROM wt)
      SELECT source, CAST(n_docs AS BIGINT) AS n_docs, CAST(w AS DOUBLE) AS w, share,
        LEAST(CAST(n_docs AS BIGINT), CAST(ROUND(share * budget) AS BIGINT)) AS expected_docs
      FROM r ORDER BY source""")
    ),

    QueryDef(
      // EPOCH / REPETITION accounting under a token budget — the
      // data-constrained upsampling step mix_domains/mix_temperature
      // don't model: when a domain's share of the budget exceeds its
      // corpus size, it REPEATS (epochs > 1), and repetition is capped
      // (~4 epochs — the point past which repeated data stops paying,
      // per the published data-constrained scaling results), leaving
      // unspent budget the pipeline must surface rather than silently
      // under-deliver. Budget = 2x corpus tokens with uniform
      // per-source shares, so small sources visibly hit the cap.
      // Target shares reuse mix_domains' SKEWED integer weights
      // (w = 60/(1 + src%5)) so both regimes are live on the shipped
      // data: high-weight sources exceed the cap (capped = 1, unspent
      // budget surfaces), low-weight sources land under one epoch
      // (downsampling — fractional epochs). Exactness: every output is
      // a short chain of individually-IEEE-deterministic ops over exact
      // integers, mirrored in the SAME op order in both engines — no
      // accumulation anywhere. Plan: one corpus aggregate to the
      // ~|sources|-row summary, windows over the summary only — never
      // a second corpus pass.
      "mix_epochs",
      (s, dir) => {
        val all = Window.partitionBy()
        Tables(s, dir).documents
          .select(col("source"),
            size(split(lower(col("text")), " ")).cast("long").as("n"))
          .groupBy(col("source")).agg(sum(col("n")).as("n_tokens"))
          .withColumn("w", lit(60L) / (lit(1L) + (srcNum(col("source")) % 5).cast("long")))
          .withColumn("budget",
            (sum(col("n_tokens")).over(all) * lit(2L)).cast("double"))
          .withColumn("share", col("w").cast("double") / sum(col("w")).over(all).cast("double"))
          .withColumn("epochs_raw",
            col("share") * col("budget") / col("n_tokens").cast("double"))
          .withColumn("epochs", least(lit(EpochCap), col("epochs_raw")))
          .withColumn("eff_tokens",
            round(col("epochs") * col("n_tokens").cast("double")).cast("long"))
          .withColumn("capped", (col("epochs_raw") > lit(EpochCap)).cast("int"))
          .withColumn("leftover_tokens",
            (col("budget") - sum(col("eff_tokens")).over(all).cast("double")).cast("long"))
          .select(col("source"), col("n_tokens"), col("share"), col("epochs"),
            col("eff_tokens"), col("capped"), col("leftover_tokens"))
          .orderBy(col("source"))
      },
      Some(s"""WITH t AS (
          SELECT source,
            CAST(SUM(len(string_split(lower(text), ' '))) AS BIGINT) AS n_tokens,
            60 / (1 + CAST(substr(source, 4) AS INTEGER) % 5) AS w
          FROM documents GROUP BY source),
        r AS (
          SELECT source, n_tokens,
            CAST(SUM(n_tokens) OVER () * 2 AS DOUBLE) AS budget,
            CAST(w AS DOUBLE) / CAST(SUM(w) OVER () AS DOUBLE) AS share
          FROM t),
        e AS (
          SELECT source, n_tokens, share, budget,
            LEAST($EpochCap, share * budget / CAST(n_tokens AS DOUBLE)) AS epochs,
            CASE WHEN share * budget / CAST(n_tokens AS DOUBLE) > $EpochCap
              THEN 1 ELSE 0 END AS capped
          FROM r),
        f AS (
          SELECT source, n_tokens, share, epochs,
            CAST(ROUND(epochs * CAST(n_tokens AS DOUBLE)) AS BIGINT) AS eff_tokens,
            capped, budget
          FROM e)
      SELECT source, n_tokens, share, epochs, eff_tokens,
        CAST(capped AS INTEGER) AS capped,
        CAST(budget - CAST(SUM(eff_tokens) OVER () AS DOUBLE) AS BIGINT) AS leftover_tokens
      FROM f ORDER BY source""")
    ),

    QueryDef(
      // Benchmark decontamination: flag corpus docs sharing any 8-token
      // shingle with a held-out benchmark set (here: doc_id % 29 = 0,
      // standing in for an eval suite). The benchmark side is distinct
      // shingles of a tiny doc subset → broadcast; the corpus side
      // streams through one explode+join, never self-joining. At 100 TB
      // the broadcast side stays eval-suite-sized (MBs) and the probe is
      // a map-side hash join — no shuffle of the corpus at all.
      "decontam_ngram",
      (s, dir) => decontamBody(s, dir, identity),
      Some(decontamOracleSql(
        """unnest(list_transform(range(1, len(t) - 6),
            i -> array_to_string(t[i:i+7], ' ')))"""))
    ),

    QueryDef(
      // HASHED decontamination — decontam_ngram's membership probe on
      // 60-bit shingle hashes instead of raw 8-gram strings: at 100 TB
      // the broadcast benchmark set is the binding constraint (an eval
      // suite's distinct 8-grams are ~50 bytes each as text; 8-byte
      // longs cut the broadcast AND the probe's hash-table footprint
      // ~6x, and the corpus side never materializes shingle strings
      // past the hash). The hash is the low 60 bits of md5 via hex
      // (conv(substr(md5, 1, 15)) here ≡ CAST('0x' || substr(md5, 1,
      // 15) AS BIGINT) in DuckDB — 15 hex digits keep the value inside
      // BIGINT in both engines, no unsigned edge). A collision merging
      // two distinct shingles is ~(|bench| x |corpus|)/2^60 — and the
      // oracle mirrors the HASHED semantics, so the gate is exact
      // regardless. Same plan shape as decontam_ngram: benchmark
      // distinct -> broadcast, corpus streams through one map-side
      // hash join, never self-joined.
      "decontam_hashed",
      (s, dir) => decontamBody(s, dir,
        c => conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")),
      Some(decontamOracleSql(
        """CAST('0x' || substr(md5(unnest(list_transform(range(1, len(t) - 6),
            i -> array_to_string(t[i:i+7], ' ')))), 1, 15) AS BIGINT)"""))
    ),

    QueryDef(
      // SPAN-LEVEL decontamination lineage (VERDICT r10 item 5): the
      // two probes above answer "is this doc contaminated"; an
      // eval-integrity review reads "by WHICH benchmark item, WHERE" —
      // per (corpus doc, benchmark doc): how many 8-gram positions
      // match, and the first/last matched token position (1-based, the
      // pipeline_reasons audit discipline applied to decontamination).
      // Same 60-bit hashed keys as decontam_hashed (the scale path; the
      // oracle mirrors the hash, so the gate is exact regardless of
      // collisions) and the same plan shape — the broadcast side is now
      // keyed per benchmark DOC, still eval-suite-sized (distinct
      // shingles per bench doc ≤ the suite's token volume); the corpus
      // streams through one map-side hash join carrying an extra int,
      // then one candidate-sized aggregate. ReconcileSpec pins the
      // flagged-doc set identical to decontam_hashed's verdict.
      "decontam_spans",
      (s, dir) => {
        val key = (c: Column) =>
          conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")
        val sh = stagedShingles(s, dir)
          .select(col("doc_id"), col("source"), col("pos"), key(col("s")).as("k"))
        val bench = sh.filter(col("doc_id") % 29 === 0)
          .select(col("doc_id").as("bench_id"), col("k")).distinct()
        sh.filter(col("doc_id") % 29 =!= 0)
          .join(broadcast(bench), "k")
          .groupBy(col("doc_id"), col("source"), col("bench_id"))
          .agg(count(lit(1)).as("n_hits"),
            min(col("pos")).as("pos_first"), max(col("pos")).as("pos_last"))
          .orderBy(col("doc_id"), col("bench_id"))
      },
      Some("""WITH toks AS (
        SELECT doc_id, source, string_split(lower(text), ' ') AS t FROM documents),
      sh AS (
        SELECT doc_id, source, CAST(i AS BIGINT) AS pos,
          CAST('0x' || substr(md5(array_to_string(t[i:i+7], ' ')), 1, 15) AS BIGINT) AS k
        FROM (SELECT doc_id, source, t, unnest(range(1, len(t) - 6)) AS i
              FROM toks WHERE len(t) >= 8)),
      bench AS (SELECT DISTINCT doc_id AS bench_id, k FROM sh WHERE doc_id % 29 = 0),
      hits AS (SELECT d.doc_id, d.source, b.bench_id, d.pos
        FROM sh d JOIN bench b USING (k) WHERE d.doc_id % 29 <> 0)
      SELECT doc_id, source, bench_id, CAST(COUNT(*) AS BIGINT) AS n_hits,
        MIN(pos) AS pos_first, MAX(pos) AS pos_last
      FROM hits GROUP BY doc_id, source, bench_id ORDER BY doc_id, bench_id""")
    ),

    QueryDef(
      // SEMANTIC decontamination — the eval-leak probe PARAPHRASES
      // evade: decontam_ngram/hashed/spans match verbatim 8-grams, but
      // a benchmark item reworded into the training set shares no
      // 8-gram while its embedding stays near the original (the
      // DataComp/FineWeb decontam gap). Per corpus doc: the nearest
      // benchmark embedding (same held-out doc_id % 29 = 0 split, on
      // the aligned embeddings table), its cosine, and the ≥ 0.3
      // verdict — a full per-doc REPORT (never empty), the
      // pipeline_reasons audit discipline. Plan at 100 TB: the
      // benchmark side is eval-suite-sized by definition → broadcast
      // NLJ; the corpus streams through ONE codegen'd cosine pass; the
      // per-doc argmax is max(struct(sim, -bench_id)) — map-side
      // combinable, deterministic ties to the smallest bench_id, no
      // window, no corpus shuffle beyond one row per doc. Cosine is
      // the shared left-fold chain → the raw double is bit-identical
      // to the oracle's (knn_bruteforce's discipline, no rounding
      // needed); the oracle mirrors the argmax as ROW_NUMBER over
      // (sim DESC, bench_id).
      "decontam_semantic",
      (s, dir) => {
        val e = Tables(s, dir).embeddings
          .select(col("vec_id").as("doc_id"), col("embedding"))
        val bench = e.filter(col("doc_id") % 29 === 0)
          .select(col("doc_id").as("bench_id"), col("embedding").as("be"))
        e.filter(col("doc_id") % 29 =!= 0)
          .crossJoin(broadcast(bench))
          .withColumn("sim",
            graft.similarity.VectorOps.cosineNative(col("be"), col("embedding")))
          .groupBy(col("doc_id"))
          .agg(max(struct(col("sim"), (-col("bench_id")).as("nb"))).as("m"))
          .select(col("doc_id"),
            (-col("m.nb")).as("nearest_bench"),
            col("m.sim").as("max_sim"),
            (col("m.sim") >= lit(0.3)).as("contaminated"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH e AS (SELECT vec_id AS doc_id, embedding FROM embeddings),
        bench AS (SELECT doc_id AS bench_id, embedding AS be FROM e WHERE doc_id % 29 = 0),
        sims AS (SELECT c.doc_id, b.bench_id,
            ${graft.similarity.VectorOps.cosineSql("be", "embedding")} AS sim
          FROM e c, bench b WHERE c.doc_id % 29 <> 0),
        best AS (SELECT doc_id, bench_id, sim,
            ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY sim DESC, bench_id) AS rn
          FROM sims)
      SELECT doc_id, bench_id AS nearest_bench, sim AS max_sim,
        sim >= 0.3 AS contaminated
      FROM best WHERE rn = 1 ORDER BY doc_id""")
    ),

    QueryDef(
      // Sequence packing accounting: assign docs (ordered by doc_id
      // within source) to fixed 512-token context bins by running token
      // count; report docs/tokens per bin. The cumulative sum is NOT a
      // global window (single-partition at scale) — it's a two-phase
      // distributed prefix sum: range-partition by (source, doc_id),
      // per-partition partial sums (collected: O(partitions × sources)
      // rows), broadcast offsets, then a partition-local streaming scan.
      // Bin assignment is partitioning-invariant: bin = floor(prefix/B)
      // depends only on the global order, so any partition layout yields
      // byte-identical output.
      "pack_sequences",
      (s, dir) => {
        val B = 512L
        val docs = Tables(s, dir).documents
          .select(col("source").as("key"), lit(0.0).as("o1"),
            col("doc_id").cast("long").as("o2"),
            size(split(lower(col("text")), " ")).cast("long").as("n"))
        // shared two-phase prefix-sum kernel (see [[prefixStarts]]);
        // bin = start div B depends only on the global order, so any
        // partition layout yields byte-identical bins
        prefixStarts(s, docs)
          .select(col("key").as("source"), expr(s"start div $B").as("bin"),
            col("n").as("n_tokens"))
          .groupBy(col("source"), col("bin"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).cast("long").as("bin_tokens"))
          .orderBy(col("source"), col("bin"))
      },
      Some("""WITH t AS (
        SELECT source, doc_id,
          CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n FROM documents),
      c AS (
        SELECT source, doc_id, n,
          SUM(n) OVER (PARTITION BY source ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM t)
      SELECT source, CAST((cum - n) // 512 AS BIGINT) AS bin,
        CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(n) AS BIGINT) AS bin_tokens
      FROM c GROUP BY source, bin ORDER BY source, bin""")
    ),

    QueryDef(
      // Token-budget selection — "fill each domain's token budget with
      // its best documents", the curation step between quality scoring
      // and packing. Docs are ranked by (quality DESC, doc_id) within
      // source; a doc is kept iff it fits entirely within the source's
      // remaining budget under that order (exclusive prefix + its own
      // tokens ≤ B). The running total reuses THE shared prefix-sum
      // kernel ([[prefixStarts]]) — no global or hot-key window — and
      // the ranking key is the SHARED quality score
      // (TextFunctions.qualityScore), bit-identical in both engines, so
      // the boundary doc is the same doc everywhere. Output: per-source
      // kept docs/tokens + the quality cutoff actually realized.
      "token_budget",
      (s, dir) => {
        val B = 800L
        val docs = Tables(s, dir).documents
          .select(col("source").as("key"),
            (-graft.textfn.TextFunctions.qualityScore(col("text"))).as("o1"),
            col("doc_id").cast("long").as("o2"),
            graft.textfn.TextFunctions.tokenCount(col("text")).as("n"))
        prefixStarts(s, docs)
          .filter(col("start") + col("n") <= B)
          .groupBy(col("key"))
          .agg(count(lit(1)).as("n_kept"),
            sum(col("n")).cast("long").as("kept_tokens"),
            max(col("o1")).as("maxo1"))
          .select(col("key").as("source"), col("n_kept"), col("kept_tokens"),
            (-col("maxo1")).as("min_kept_quality"))
          .orderBy(col("source"))
      },
      Some(s"""WITH t AS (
        SELECT source, doc_id,
          CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n,
          ${graft.textfn.TextFunctions.qualityScoreSql} AS q
        FROM documents),
      c AS (
        SELECT source, doc_id, n, q,
          SUM(n) OVER (PARTITION BY source ORDER BY q DESC, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM t)
      SELECT source, COUNT(*) AS n_kept, CAST(SUM(n) AS BIGINT) AS kept_tokens,
        MIN(q) AS min_kept_quality
      FROM c WHERE cum <= 800 GROUP BY source ORDER BY source""")
    ),

    QueryDef(
      // Range join (Spark has no native one): views within 60 s after
      // each purchase by the same user. Naive formulation is a
      // non-equi-join (nested-loop at scale); here each purchase window
      // explodes into the ≤2 fixed-width time buckets it can overlap and
      // the join runs as an EQUI-join on (user, bucket) with a residual
      // range filter — the standard bucketed-range-join rewrite, shuffle
      // on (user, bucket), zero cartesian risk. Windows never double-
      // count: a view lies in exactly one bucket.
      "range_join_events",
      (s, dir) => {
        val W = 60000000L // 60 s in micros
        val ev = Tables(s, dir).events
        val p = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("pus"))
        val v = ev.filter(col("event_type") === "view")
          .select(col("user_id").as("v_user"), unix_micros(col("ts")).as("vus"))
        val pb = p.withColumn("bucket",
          // integer `div`, not floor(double /): at micros magnitude a
          // one-ulp division error could shift a boundary timestamp's
          // bucket and silently drop a matching pair
          explode(array(expr(s"pus div $W"), expr(s"pus div $W") + 1)))
        val vb = v.withColumn("bucket", expr(s"vus div $W"))
        val matched = pb.join(vb,
            pb("bucket") === vb("bucket") && col("v_user") === col("user_id") &&
              col("vus") > col("pus") && col("vus") <= col("pus") + W)
          .groupBy(col("event_id")).agg(count(lit(1)).as("n_views"))
        p.join(matched, Seq("event_id"), "left")
          .select(col("event_id"), col("user_id"),
            coalesce(col("n_views"), lit(0L)).as("n_views"))
          .orderBy(col("event_id"))
      },
      Some("""WITH p AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
      v AS (SELECT user_id, ts FROM events WHERE event_type = 'view')
      SELECT p.event_id, p.user_id, CAST(COUNT(v.ts) AS BIGINT) AS n_views
      FROM p LEFT JOIN v ON v.user_id = p.user_id
        AND v.ts > p.ts AND v.ts <= p.ts + INTERVAL 60 SECOND
      GROUP BY p.event_id, p.user_id ORDER BY p.event_id""")
    ),

    QueryDef(
      // Deterministic TRAIN/VAL/TEST split: held-out assignment must be
      // a pure function of document IDENTITY — never RNG state,
      // partition layout, or visit order — or the val set drifts across
      // reruns and incremental ingests and quietly leaks into training.
      // bucket = first hex byte of md5("split:" || doc_id): train
      // < 'e6' (230/256 ≈ 89.8%), val < 'f3' (13/256 ≈ 5.1%), else
      // test. Lowercase-hex string comparison is bytewise-identical in
      // both engines ('0'..'9' < 'a'..'f' in ASCII), and the whole
      // operator is row-local column arithmetic: zero shuffle at any
      // scale, and adding documents never reassigns an existing one.
      "sample_hash_split",
      (s, dir) => {
        val b = substring(
          md5(concat(lit("split:"), col("doc_id").cast("string")).cast("binary")),
          1, 2)
        Tables(s, dir).documents
          .select(col("doc_id"),
            when(b < lit("e6"), "train")
              .when(b < lit("f3"), "val")
              .otherwise("test").as("split"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
        CASE WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'train'
             WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2) < 'f3' THEN 'val'
             ELSE 'test' END AS split
      FROM documents ORDER BY doc_id""")
    ),

    QueryDef(
      // CLUSTER-BALANCED sampling over the embedding space — the
      // SemDeDup/DataComp-style semantic stratification: pick an equal
      // quota from every region of embedding space instead of letting a
      // dominant mode fill the sample. Region = the ORTHANT sign
      // pattern of the first SemBucketBits dims (axis-aligned LSH:
      // per-element sign tests only, ZERO float accumulation, so the
      // bucketing is exactly SQL-mirrorable where an iterative k-means
      // would not be; the shipped embeddings are sign-balanced per dim,
      // measured 25-42 docs per bucket at sf0.01). Within a bucket the
      // quota is picked by keyed-md5 order (the sample_hash_split
      // discipline — deterministic, identity-stable, no RNG state).
      // Output is capped at 2^bits x quota rows at ANY corpus size;
      // the plan is one scan -> sign-bucket + hash projection ->
      // map-side WindowGroupLimit top-quota per bucket -> one bounded
      // shuffle. No join, no iteration — the 100 TB shape.
      "sample_semantic_balanced",
      (s, dir) => {
        val bucket = (0 until SemBucketBits).map { d =>
          (col("embedding").getItem(d) > lit(0f)).cast("int") *
            lit(1 << (SemBucketBits - 1 - d))
        }.reduce(_ + _)
        val keyed = Tables(s, dir).embeddings
          .select(col("vec_id"), col("label"), bucket.as("bucket"),
            md5(concat(lit("sem:"), col("vec_id").cast("string")).cast("binary")).as("hk"))
        val w = Window.partitionBy(col("bucket")).orderBy(col("hk"), col("vec_id"))
        keyed.withColumn("pick_rank", row_number().over(w))
          .filter(col("pick_rank") <= SemBucketQuota)
          .select(col("vec_id"), col("bucket").cast("int").as("bucket"),
            col("pick_rank").cast("long").as("pick_rank"), col("label"))
          .orderBy(col("bucket"), col("pick_rank"))
      },
      Some {
        val bucketSql = (0 until SemBucketBits).map { d =>
          s"CAST(embedding[${d + 1}] > 0 AS INT) * ${1 << (SemBucketBits - 1 - d)}"
        }.mkString(" + ")
        s"""WITH b AS (SELECT vec_id, label, ($bucketSql) AS bucket,
            md5('sem:' || CAST(vec_id AS VARCHAR)) AS hk
          FROM embeddings),
        r AS (SELECT vec_id, label, bucket,
            ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY hk, vec_id) AS pick_rank
          FROM b)
        SELECT vec_id, CAST(bucket AS INT) AS bucket,
          CAST(pick_rank AS BIGINT) AS pick_rank, label
        FROM r WHERE pick_rank <= $SemBucketQuota
        ORDER BY bucket, pick_rank"""
      }
    ),

    QueryDef(
      // IMPORTANCE RESAMPLING toward a target domain — the DSIR shape
      // (Xie et al. 2023, "Data Selection for Language Models via
      // Importance Resampling"): score every raw document by the
      // log-likelihood RATIO of a target-domain hashed-feature LM over
      // the raw-corpus LM, then keep the top-ranked docs. The target
      // stand-in is the English slice (the quality-domain the synthetic
      // corpus actually has); features are 256 hashed token buckets
      // (60-bit md5 % 256 — the decontam_hashed key arithmetic, both
      // engines inside signed BIGINT).
      //
      // Exactness: ln runs once per BUCKET (≤ 256, not per vocab or
      // token) on identical exact-integer-derived double arguments,
      // each ln kept on the POSITIVE domain (argument (N+B)/(c+1) ≥ 1 —
      // the perplexity_bigram HALF_UP discipline), 6dp-rounded to
      // DECIMAL so the per-doc sum of (nll_raw − nll_target) is
      // order-independent and exact; the boundary surfaces DOUBLE (§5).
      //
      // Plan at 100 TB: ONE tokenize pass feeding a single 256-row
      // grouped aggregate (raw + target counts in the same map-side
      // combine — no second corpus scan for the target LM), the
      // always-tiny LM broadcast back over a second pass, a per-doc
      // aggregate, and TakeOrdered top-K (per-partition heaps — no
      // global sort materialization). The selection is deterministic:
      // (weight DESC, doc_id) is a total order.
      "sample_importance",
      (s, dir) => {
        val b = pmod(
          conv(substring(md5(col("tok").cast("binary")), 1, 15), 16, 10).cast("long"),
          lit(ImpBuckets.toLong))
        val rawToks = Tables(s, dir).documents
          .select(col("doc_id"), col("lang"),
            explode(split(lower(col("text")), " ")).as("tok"))
        // r18 (guide §1.2): md5+conv per TOKEN INSTANCE ran twice (the
        // toks subtree feeds both the bucket counts and the per-doc
        // weights, and Catalyst does not CSE across consumers); hash
        // only the DISTINCT tokens — the vocabulary is orders of
        // magnitude smaller than the token stream — and broadcast the
        // (tok -> bucket) map back onto the stream. b is a pure
        // function of tok, so every token instance gets the identical
        // bucket and every downstream aggregate is unchanged.
        val tokB = rawToks.select(col("tok")).distinct()
          .select(col("tok"), b.as("b"))
        val toks = rawToks.join(broadcast(tokB), "tok")
          .select(col("doc_id"), col("lang"), col("b"))
        val cnt = toks.groupBy(col("b")).agg(
          count(lit(1)).as("cr"),
          sum(when(col("lang") === ImpTargetLang, 1L).otherwise(0L)).as("ct"))
        val tot = cnt.agg(sum(col("cr")).as("nr"), sum(col("ct")).as("nt"))
        def nll6(n: Column, c: Column): Column =
          round(log((n + lit(ImpBuckets.toLong)).cast("double") /
            (c + lit(1L)).cast("double")), 6).cast("decimal(18,6)")
        val lm = cnt.crossJoin(broadcast(tot))
          .select(col("b"),
            (nll6(col("nr"), col("cr")) - nll6(col("nt"), col("ct"))).as("delta"))
        val w = toks.join(broadcast(lm), "b")
          .groupBy(col("doc_id"))
          .agg(sum(col("delta")).as("wdec"))
        Tables(s, dir).documents
          .select(col("doc_id"), col("lang"), col("source"))
          .join(w, "doc_id")
          .select(col("doc_id"), col("lang"), col("source"),
            col("wdec").cast("double").as("weight"))
          .orderBy(col("weight").desc, col("doc_id"))
          .limit(ImpTopK)
      },
      Some(s"""WITH toks AS (
          SELECT doc_id, lang,
            CAST('0x' || substr(md5(unnest(string_split(lower(text), ' '))), 1, 15)
              AS BIGINT) % $ImpBuckets AS b
          FROM documents),
        cnt AS (
          SELECT b, COUNT(*) AS cr,
            SUM(CASE WHEN lang = '$ImpTargetLang' THEN 1 ELSE 0 END) AS ct
          FROM toks GROUP BY b),
        tot AS (SELECT SUM(cr) AS nr, SUM(ct) AS nt FROM cnt),
        lm AS (
          SELECT b,
            CAST(ROUND(ln(CAST(nr + $ImpBuckets AS DOUBLE) / CAST(cr + 1 AS DOUBLE)), 6)
              AS DECIMAL(18,6)) -
            CAST(ROUND(ln(CAST(nt + $ImpBuckets AS DOUBLE) / CAST(ct + 1 AS DOUBLE)), 6)
              AS DECIMAL(18,6)) AS delta
          FROM cnt, tot),
        w AS (
          SELECT doc_id, SUM(delta) AS wdec
          FROM toks JOIN lm USING (b) GROUP BY doc_id)
      SELECT d.doc_id, d.lang, d.source, CAST(w.wdec AS DOUBLE) AS weight
      FROM documents d JOIN w USING (doc_id)
      ORDER BY weight DESC, doc_id LIMIT $ImpTopK""")
    ),

    QueryDef(
      // CATEGORICAL snapshot drift — docs_drift's sibling over the
      // LANGUAGE mix (the other axis a crawl shifts: a new seed list
      // pulls in a different language balance long before lengths
      // move). Same base/new split and smoothed-PSI machinery; the
      // category universe per source is the langs OBSERVED in that
      // source (either snapshot) — no binning, and the (source, lang)
      // group-by rows ARE the dense grid (a lang absent from both
      // snapshots of a source carries no evidence and contributes
      // nothing, unlike the equi-width case where the grid is fixed
      // a priori). B varies per source, so the smoothing denominator
      // (total + B) is computed from the same aggregate. Exactness and
      // 100 TB plan shape identical to docs_drift: one narrow
      // projection, one (source, lang) aggregate, everything past it
      // output-shaped (sources × observed langs).
      "docs_drift_lang",
      (s, dir) => docsDriftLang(Tables(s, dir).documents),
      Some("""WITH d AS (SELECT source, doc_id, lang FROM documents),
        counts AS (
          SELECT source, lang,
            SUM(CASE WHEN doc_id % 7 = 0 THEN 0 ELSE 1 END) AS cb,
            SUM(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END) AS cn
          FROM d GROUP BY source, lang),
        tots AS (
          SELECT source, SUM(cb) AS tb, SUM(cn) AS tn, COUNT(*) AS bs
          FROM counts GROUP BY source),
        terms AS (
          SELECT c.source,
            CAST(ROUND(
              (CAST(cn + 1 AS DOUBLE) / CAST(tn + bs AS DOUBLE)
                - CAST(cb + 1 AS DOUBLE) / CAST(tb + bs AS DOUBLE))
              * ln((CAST(cn + 1 AS DOUBLE) / CAST(tn + bs AS DOUBLE))
                / (CAST(cb + 1 AS DOUBLE) / CAST(tb + bs AS DOUBLE))),
              6) AS DECIMAL(18,6)) AS term
          FROM counts c JOIN tots USING (source)),
        psi AS (SELECT source, SUM(term) AS psi_dec FROM terms GROUP BY source)
      SELECT p.source,
        CAST(t.tb AS BIGINT) AS n_base, CAST(t.tn AS BIGINT) AS n_new,
        CAST(t.bs AS BIGINT) AS n_langs,
        CAST(p.psi_dec AS DOUBLE) AS psi,
        p.psi_dec >= 0.2 AS drifted
      FROM psi p JOIN tots t USING (source)
      ORDER BY p.source""")
    ),

    QueryDef(
      // CORPUS SNAPSHOT DRIFT REPORT (VERDICT r11 item 6) — a
      // production ingest compares snapshots: did today's crawl shift
      // each source's length mix? PSI (population stability index, the
      // standard model-monitoring divergence) per source over the
      // length distribution: base snapshot = doc_id % 7 <> 0, new
      // snapshot = doc_id % 7 = 0 (the SAME split dedup_incremental
      // uses for yesterday/today), binned by q_events_histogram's
      // equi-width rule — [[DriftBins]] bins over the source's COMBINED
      // [min, max] support so both snapshots share one grid, DENSIFIED
      // to the full grid (explicit zero rows) because smoothing gives
      // every bin mass.
      //
      // Exactness: bin counts are exact integers; proportions are
      // add-one (Laplace) smoothed — q = (count+1)/(total+B), one
      // double division of exact longs, never zero, so ln stays finite
      // with NO epsilon magic (an eps-clamp inflates PSI by
      // ~|empty bins|·p·ln(p/eps) on small snapshots — worked example
      // in CorpusOpsSpec predecessor analysis: a 10-doc undrifted
      // snapshot over 10 bins scored 4.6 "drift" from emptiness alone);
      // each bin's term (qn−qb)·ln(qn/qb) is ONE IEEE chain 6dp-rounded
      // to DECIMAL so the per-source sum is order-independent (the
      // perplexity discipline); DOUBLE boundary per §5.
      //
      // Plan at 100 TB: two scans of the narrow (source, doc_id,
      // n_chars) projection — one for per-source support, one binning
      // pass — with the per-source min/max frame joined back UN-hinted
      // (source-cardinality-bounded; the engine broadcasts it while it
      // fits); then everything downstream of the (source, bin) group-by
      // is output-shaped (sources × ≤10 bins). No corpus self-join, no
      // per-doc state.
      "docs_drift",
      (s, dir) => docsDrift(Tables(s, dir).documents),
      Some(s"""WITH d AS (SELECT source, doc_id, n_chars FROM documents),
        mm AS (SELECT source, MIN(n_chars) AS vmin, MAX(n_chars) AS vmax
          FROM d GROUP BY source),
        binned AS (
          SELECT d.source,
            CASE WHEN vmax = vmin THEN 0
                 ELSE LEAST(CAST(FLOOR((n_chars - vmin) * CAST($DriftBins AS DOUBLE)
                   / (vmax - vmin)) AS BIGINT), ${DriftBins - 1}) END AS bin,
            CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END AS is_new
          FROM d JOIN mm USING (source)),
        counts AS (
          SELECT source, bin, SUM(1 - is_new) AS cb, SUM(is_new) AS cn
          FROM binned GROUP BY source, bin),
        grid AS (SELECT source, unnest(range($DriftBins)) AS bin FROM mm),
        dense AS (
          SELECT g.source, g.bin,
            COALESCE(cb, 0) AS cb, COALESCE(cn, 0) AS cn
          FROM grid g LEFT JOIN counts c
            ON g.source = c.source AND g.bin = c.bin),
        tots AS (SELECT source, SUM(cb) AS tb, SUM(cn) AS tn
          FROM dense GROUP BY source),
        terms AS (
          SELECT e.source,
            CAST(ROUND(
              (CAST(cn + 1 AS DOUBLE) / CAST(tn + $DriftBins AS DOUBLE)
                - CAST(cb + 1 AS DOUBLE) / CAST(tb + $DriftBins AS DOUBLE))
              * ln((CAST(cn + 1 AS DOUBLE) / CAST(tn + $DriftBins AS DOUBLE))
                / (CAST(cb + 1 AS DOUBLE) / CAST(tb + $DriftBins AS DOUBLE))),
              6) AS DECIMAL(18,6)) AS term
          FROM dense e JOIN tots USING (source)),
        psi AS (SELECT source, SUM(term) AS psi_dec FROM terms GROUP BY source)
      SELECT p.source,
        CAST(t.tb AS BIGINT) AS n_base, CAST(t.tn AS BIGINT) AS n_new,
        CAST(p.psi_dec AS DOUBLE) AS psi,
        p.psi_dec >= 0.2 AS drifted
      FROM psi p JOIN tots t USING (source)
      ORDER BY p.source""")
    )
  )

  /** `docs_drift` body over any (source, doc_id, n_chars, ...) corpus
    * frame — exposed so the spec can feed engineered shifted/unshifted
    * snapshot pairs. Semantics and exactness contract in the QueryDef
    * comment. */
  private[graft] def docsDrift(docsIn: DataFrame): DataFrame = {
    val nb = lit(DriftBins.toLong)
    val docs = docsIn.select(col("source"), col("doc_id"), col("n_chars"))
    val mm = docs.groupBy(col("source"))
      .agg(min(col("n_chars")).as("vmin"), max(col("n_chars")).as("vmax"))
    val binned = docs.join(mm, "source")
      .select(col("source"),
        when(col("vmax") === col("vmin"), lit(0L)).otherwise(
          least(floor((col("n_chars") - col("vmin")).cast("double") * nb.cast("double") /
            (col("vmax") - col("vmin")).cast("double")).cast("long"), nb - 1L))
          .as("bin"),
        when(pmod(col("doc_id"), lit(7L)) === 0L, 1L).otherwise(0L).as("is_new"))
    val counts = binned.groupBy(col("source"), col("bin"))
      .agg(sum(lit(1L) - col("is_new")).as("cb"), sum(col("is_new")).as("cn"))
    // densified grid: add-one smoothing gives EVERY bin nonzero mass,
    // so absent (source, bin) rows must surface as explicit zeros
    val grid = mm.select(col("source"),
      explode(sequence(lit(0L), nb - 1L)).as("bin"))
    val dense = grid.join(counts, Seq("source", "bin"), "left")
      .select(col("source"), col("bin"),
        coalesce(col("cb"), lit(0L)).as("cb"),
        coalesce(col("cn"), lit(0L)).as("cn"))
    val tots = dense.groupBy(col("source"))
      .agg(sum(col("cb")).as("tb"), sum(col("cn")).as("tn"))
      .withColumn("bs", nb)
    smoothedPsiBySource(dense, tots)
      .select(col("source"),
        col("tb").as("n_base"), col("tn").as("n_new"),
        col("psi_dec").cast("double").as("psi"),
        driftFlag)
      .orderBy(col("source"))
  }

  /** The ONE smoothed-PSI chain both drift operators (and their SQL
    * oracles) implement: over a dense (source, cb, cn) grid and a
    * (source, tb, tn, bs) totals frame — bs = the source's category
    * count, the add-one smoothing denominator — each category's term
    * (qn−qb)·ln(qn/qb) with q = (count+1)/(total+bs) is ONE IEEE chain
    * 6dp-rounded to DECIMAL, summed exactly per source. Returns the
    * totals frame with `psi_dec` joined on. An exactness change here
    * changes every drift surface at once (review finding r12: the tail
    * was maintained in two copies). */
  private def smoothedPsiBySource(dense: DataFrame, tots: DataFrame): DataFrame = {
    def prop(n: Column, t: Column): Column =
      (n + lit(1L)).cast("double") / (t + col("bs")).cast("double")
    val qb = prop(col("cb"), col("tb"))
    val qn = prop(col("cn"), col("tn"))
    dense.join(tots, "source")
      .select(col("source"),
        round((qn - qb) * log(qn / qb), 6).cast("decimal(18,6)").as("term"))
      .groupBy(col("source")).agg(sum(col("term")).as("psi_dec"))
      .join(tots, "source")
  }

  /** The industry-standard "significant shift" line; a decimal
    * compare, so the flag is exact in both engines. */
  private def driftFlag: Column =
    (col("psi_dec") >= lit(BigDecimal("0.2"))).as("drifted")

  /** `docs_drift_lang` body — categorical smoothed PSI per source over
    * any (source, doc_id, lang, ...) frame; semantics in the QueryDef
    * comment, exposed for the engineered-snapshot spec. */
  private[graft] def docsDriftLang(docsIn: DataFrame): DataFrame = {
    val docs = docsIn.select(col("source"), col("doc_id"), col("lang"))
    val counts = docs.groupBy(col("source"), col("lang"))
      .agg(sum(when(pmod(col("doc_id"), lit(7L)) === 0L, 0L).otherwise(1L)).as("cb"),
        sum(when(pmod(col("doc_id"), lit(7L)) === 0L, 1L).otherwise(0L)).as("cn"))
    val tots = counts.groupBy(col("source"))
      .agg(sum(col("cb")).as("tb"), sum(col("cn")).as("tn"),
        count(lit(1)).as("bs"))
    smoothedPsiBySource(counts, tots)
      .select(col("source"),
        col("tb").as("n_base"), col("tn").as("n_new"), col("bs").as("n_langs"),
        col("psi_dec").cast("double").as("psi"),
        driftFlag)
      .orderBy(col("source"))
  }

  /** `docs_drift` bin count: 5 equi-width bins. Few enough that a
    * small "new" snapshot (the sf0.01 sources ship 3-4 docs with
    * doc_id % 7 == 0) doesn't scatter into mostly-empty cells — with
    * add-one smoothing over B bins, an undrifted sample of n docs
    * contributes O(B/n) spurious PSI, so B must stay well under n. A
    * production ingest comparing million-doc snapshots would raise
    * this; the FORMULA (smoothed, densified) is what scales, the
    * constant is sized to the shipped data. */
  // private[graft]: StreamDrift's numeric axis must share the bin count
  private[graft] val DriftBins = 5

  /** `mix_epochs` repetition cap: ~4 epochs, the published
    * data-constrained-scaling guidance for where repeated data stops
    * paying. A double literal rendered identically in both engines. */
  private[pipeline] val EpochCap = 4.0

  /** `sample_importance` knobs: 256 hashed feature buckets (ln runs
    * once per bucket, the LM broadcast is always tiny), English as the
    * target domain, top-100 selection. */
  private[pipeline] val ImpBuckets = 256
  private[pipeline] val ImpTargetLang = "en"
  private[pipeline] val ImpTopK = 100

  /** Orthant bits for `sample_semantic_balanced`: 4 dims → 16 buckets,
    * sized so every bucket is populated at every shipped SF (the
    * balance assertion in CorpusOpsSpec). */
  private[pipeline] val SemBucketBits = 4

  /** Per-bucket quota: 8 picks × 16 buckets = ≤128 rows at any scale. */
  private[pipeline] val SemBucketQuota = 8
}
