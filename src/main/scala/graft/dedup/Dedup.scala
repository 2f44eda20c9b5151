package graft.dedup

import graft.{QueryDef, QueryModule}
import graft.operators.Tables
import graft.similarity.VectorOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication suite (SURVEY.md §2.4) over `documents` / `embeddings`.
  *
  * Five operators, in increasing fuzziness:
  *  - exact (normalized-content hash groups)
  *  - exact set-similarity with prefix filtering (the PPJoin-style
  *    bound: a pair with Jaccard >= tau must share a token among each
  *    side's (n - ceil(tau*n) + 1) globally-rarest tokens) — recall 1,
  *    so it is oracle-checked against brute force
  *  - MinHash + LSH banding (128 perms, 64 bands x 2 rows) with exact
  *    verification of candidates — at tau=0.5 the banding miss
  *    probability is (1 - 0.5^2)^64 ~ 1e-8, so it too matches the
  *    brute-force oracle
  *  - SimHash (64-bit) with segment banding (8 x 8 bits; pigeonhole
  *    guarantees recall for Hamming <= 7) — xxhash-based, rows-only
  *  - embedding cosine near-dup, exact pair join (LSH variant lives in
  *    graft.similarity as the sub-linear scale path)
  *
  * Scale notes: candidate generation is always (key-explode, shuffle on
  * key, within-bucket pair join with `a < b`), never a cross join; the
  * verify step joins candidates back to features by doc_id — both
  * shuffles are on high-cardinality keys. Prefix filtering additionally
  * removes the stop-token skew that sinks naive inverted-index joins
  * (the prefix holds each doc's *rarest* tokens).
  */
object Dedup extends QueryModule {

  private val JaccardTauSets = 0.9     // word-set similarity threshold
  private val JaccardTauShingles = 0.5 // 3-shingle threshold (planted near-dups)
  private val CosineTau = 0.3
  private val ShingleK = 3
  private val NumPerms = 128
  private val Bands = 64               // x 2 rows = 128
  // 2^31 - 1 (Mersenne prime). With h reduced to 32 bits and multipliers
  // below 2^30 the product stays under 2^62 (ANSI-safe), while wrapping
  // the 31-bit modulus ~2^31 times — a genuine permutation of the
  // shingle ranking per multiplier.
  private val MinhashPrime = 2147483647L

  /** Deterministic odd multipliers in [1, 2^30) for the minhash family. */
  private val PermMultipliers: Seq[Long] = {
    val rnd = new scala.util.Random(20240612L)
    Seq.fill(NumPerms)(rnd.nextInt(1 << 29).toLong * 2L + 1L)
  }

  /** doc_id + distinct lowercase word set. */
  private def wordSets(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), array_distinct(split(lower(col("text")), " ")).as("ws"))

  /** doc_id + distinct word-3-shingle strings (docs with >= 3 tokens). */
  private def shingleSets(docs: DataFrame): DataFrame = {
    val toks = split(lower(col("text")), " ")
    docs
      .filter(size(toks) >= ShingleK)
      .select(col("doc_id"),
        array_distinct(transform(sequence(lit(0), size(toks) - ShingleK),
          i => concat_ws(" ", slice(toks, i + 1, lit(ShingleK))))).as("ss"))
  }

  private val shingleSetsSql =
    s"""SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - ${ShingleK - 2}),
          i -> array_to_string(toks[i:i+${ShingleK - 1}], ' '))) AS ss
        FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents) t
        WHERE len(toks) >= $ShingleK"""

  /** Exact-verify candidate pairs against set columns, emitting jaccard.
    *
    * Two scale tricks: (1) a size-ratio prefilter — Jaccard >= tau
    * implies min(|A|,|B|) >= tau * max(|A|,|B|) — runs over a sizes-only
    * join so pruned pairs never ship their arrays; (2) the surviving
    * pairs' intersection is a sorted-merge two-pointer kernel in plain
    * JVM code (see [[jaccardKernel]]) instead of the interpreted
    * `array_intersect`, which is ~10x on wide sets.
    */
  private def verifyJaccard(cands: DataFrame, sets: DataFrame, setCol: String, tau: Double): DataFrame = {
    val sorted = sets.select(col("doc_id"), array_sort(col(setCol)).as("s"))
    val sizes = sorted.select(col("doc_id"), size(col("s")).as("n"))
    val prefiltered = cands
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("n_a")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("n_b")), "doc_b")
      .filter(least(col("n_a"), col("n_b")).cast("double") >=
        greatest(col("n_a"), col("n_b")).cast("double") * tau)
      .select(col("doc_a"), col("doc_b"))
    val joined = prefiltered
      .join(sorted.select(col("doc_id").as("doc_a"), col("s").as("set_a")), "doc_a")
      .join(sorted.select(col("doc_id").as("doc_b"), col("s").as("set_b")), "doc_b")
    jaccardKernel(joined)
      .filter(col("jaccard") >= tau)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Sorted-merge set intersection + jaccard in a tight JVM loop.
    * Requires `set_a`/`set_b` sorted string arrays; appends `jaccard`.
    * The division matches the SQL mirror exactly (int/int in IEEE
    * double), so oracle results stay bit-identical.
    */
  private def jaccardKernel(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    val aIdx = df.schema.fieldIndex("set_a")
    val bIdx = df.schema.fieldIndex("set_b")
    val outSchema = StructType(df.schema.fields :+ StructField("jaccard", DoubleType, nullable = false))
    df.mapPartitions { iter =>
      iter.map { row =>
        val a = row.getSeq[String](aIdx)
        val b = row.getSeq[String](bIdx)
        var i = 0; var j = 0; var inter = 0
        while (i < a.length && j < b.length) {
          val c = a(i).compareTo(b(j))
          if (c == 0) { inter += 1; i += 1; j += 1 }
          else if (c < 0) i += 1
          else j += 1
        }
        val jac = inter.toDouble / (a.length + b.length - inter).toDouble
        Row.fromSeq(row.toSeq :+ jac)
      }
    }(Encoders.row(outSchema))
  }

  /** Candidate pairs from (key, doc_id) bucket rows WITHOUT a self-join:
    * group to id lists per bucket and explode the within-bucket pair
    * combinations. The upstream (often an expensive signature pipeline)
    * is computed exactly once — a self-join would recompute it per side
    * whenever exchange reuse doesn't kick in. `maxBucket` bounds skew:
    * a degenerate bucket can't quadratically explode an executor (cap is
    * far above anything a healthy banding produces).
    */
  private def bucketPairs(bucketed: DataFrame, keyCol: String, maxBucket: Int = 10000): DataFrame = {
    bucketed
      .groupBy(col(keyCol))
      .agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
      .select(explode(expr(
        """flatten(transform(ids, (a, i) ->
             transform(slice(ids, i + 2, size(ids)),
                       b -> struct(least(a, b) AS doc_a, greatest(a, b) AS doc_b))))""")).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"))
      .distinct()
  }

  private def jaccardPairsSql(setsCte: String, setCol: String, tau: Double,
                              idCol: String = "doc_id", outA: String = "doc_a", outB: String = "doc_b"): String = {
    val inter = s"len(list_intersect(a.$setCol, b.$setCol))"
    val jac = s"CAST($inter AS DOUBLE) / (len(a.$setCol) + len(b.$setCol) - $inter)"
    s"""WITH s AS ($setsCte)
      SELECT a.$idCol AS $outA, b.$idCol AS $outB, $jac AS jaccard
      FROM s a JOIN s b ON a.$idCol < b.$idCol
      WHERE $jac >= $tau ORDER BY $outA, $outB"""
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef(
      "dedup_exact",
      (s, dir) => {
        Tables(s, dir).documents
          .select(col("doc_id"),
            md5(concat_ws(" ", array_sort(array_distinct(split(lower(col("text")), " "))))).as("norm_md5"))
          .groupBy(col("norm_md5"))
          .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("canonical_doc_id"))
          .filter(col("n_docs") >= 2)
          .orderBy(col("norm_md5"))
      },
      Some("""SELECT norm_md5, COUNT(*) AS n_docs, MIN(doc_id) AS canonical_doc_id
      FROM (SELECT doc_id,
              md5(array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' ')) AS norm_md5
            FROM documents) t
      GROUP BY norm_md5 HAVING COUNT(*) >= 2 ORDER BY norm_md5""")
    ),

    QueryDef(
      "dedup_ngram_jaccard",
      (s, dir) => {
        val ws = wordSets(Tables(s, dir).documents)
        val tok = ws.select(col("doc_id"), size(col("ws")).as("n"), explode(col("ws")).as("token"))
        // global document frequency: the token dictionary is tiny relative
        // to the corpus -> broadcast back
        val dfreq = tok.groupBy(col("token")).agg(count(lit(1)).as("df"))
        // token ids in rarity order double as the dictionary: prefix
        // membership is just a row_number bound per doc
        val dict = dfreq.withColumn("token_id",
          (row_number().over(Window.orderBy(col("df"), col("token"))) - 1).cast("int"))
        val idTok = tok.join(broadcast(dict), "token")
        val ranked = idTok
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("doc_id")).orderBy(col("token_id"))))
          // prefix bound for Jaccard >= tau: n - ceil(tau*n) + 1 rarest tokens
          .filter(col("rk") <= col("n") - ceil(col("n") * JaccardTauSets) + 1)
          .select(col("doc_id"), col("token_id"))
        val cands = ranked.as("x").join(ranked.as("y"),
            col("x.token_id") === col("y.token_id") && col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
          .distinct()
        val vocabSize = dict.count() // one tiny job; picks the verify path
        if (vocabSize <= 64) {
          // Dictionary fits one machine word -> each doc's word set is a
          // 64-bit mask and verification is codegen'd bit arithmetic on a
          // 16-byte-per-doc table instead of shuffling string arrays.
          // (Real web corpora take the array path below; this tier kicks
          // in for small controlled vocabularies.)
          val masks = idTok.groupBy(col("doc_id"))
            .agg(sum(expr("shiftleft(1L, token_id)")).as("mask"), count(lit(1)).as("n"))
          val withMasks = cands
            .join(masks.select(col("doc_id").as("doc_a"), col("mask").as("mask_a"), col("n").as("n_a")), "doc_a")
            .join(masks.select(col("doc_id").as("doc_b"), col("mask").as("mask_b"), col("n").as("n_b")), "doc_b")
            .withColumn("inter", expr("CAST(bit_count(mask_a & mask_b) AS BIGINT)"))
          withMasks
            .withColumn("jaccard", col("inter").cast("double") /
              (col("n_a") + col("n_b") - col("inter")).cast("double"))
            .filter(col("jaccard") >= JaccardTauSets)
            .select(col("doc_a"), col("doc_b"), col("jaccard"))
            .orderBy(col("doc_a"), col("doc_b"))
        } else {
          verifyJaccard(cands, ws, "ws", JaccardTauSets)
        }
      },
      Some(jaccardPairsSql(
        "SELECT doc_id, list_distinct(string_split(lower(text), ' ')) AS ws FROM documents",
        "ws", JaccardTauSets))
    ),

    QueryDef(
      "dedup_minhash_lsh",
      (s, dir) => {
        val sh = shingleSets(Tables(s, dir).documents)
        // Signature kernel: explode shingle hashes, then one primitive
        // loop per doc computing all 128 permutation minima. (A 128-min
        // aggregate expression works too but generates thousands of lines
        // of janino code whose compilation dominates cold-start; an
        // interpreted HOF lambda is ~20x slower per element. The
        // permutation family keeps the per-shingle hash in 32 bits so
        // (a*h + b) stays overflow-free under ANSI arithmetic.)
        val exploded = sh
          .select(col("doc_id"), explode(col("ss")).as("t"))
          .select(col("doc_id"), pmod(xxhash64(col("t")), lit(4294967291L)).as("m"))
        val mult = PermMultipliers.toArray
        import org.apache.spark.sql.{Encoders, Row}
        import org.apache.spark.sql.types._
        val sigSchema = StructType(Seq(
          StructField("doc_id", LongType), StructField("sig", ArrayType(LongType, containsNull = false))))
        implicit val le: org.apache.spark.sql.Encoder[(Long, Long)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
        val sig = exploded.as[(Long, Long)](le)
          .groupByKey(_._1)(Encoders.scalaLong)
          .mapGroups { (id: Long, rows: Iterator[(Long, Long)]) =>
            val s = Array.fill(NumPerms)(Long.MaxValue)
            rows.foreach { case (_, m) =>
              var i = 0
              while (i < NumPerms) {
                val v = (m * mult(i) + i) % MinhashPrime
                if (v < s(i)) s(i) = v
                i += 1
              }
            }
            Row(id, s.toSeq)
          }(Encoders.row(sigSchema))
        val banded = sig.select(col("doc_id"),
          explode(array((0 until Bands).map(b =>
            xxhash64(lit(b), expr(s"sig[${b * 2}]"), expr(s"sig[${b * 2 + 1}]"))): _*)).as("band_key"))
        val cands = bucketPairs(banded, "band_key")
        verifyJaccard(cands, sh, "ss", JaccardTauShingles)
      },
      Some(jaccardPairsSql(shingleSetsSql, "ss", JaccardTauShingles))
    ),

    QueryDef(
      // 64-bit SimHash over shingle hashes; 8 bands x 8 bits (pigeonhole:
      // hamming <= 7 implies >= 1 equal segment). xxhash-based -> no SQL
      // mirror; deterministic, rows-only checked + unit-tested.
      "dedup_simhash",
      (s, dir) => {
        val sh = shingleSets(Tables(s, dir).documents)
        // bit-majority kernel (same rationale as the minhash signature:
        // a 64-sum aggregate compiles to outsized generated code, an
        // interpreted lambda is slow — a primitive loop is neither)
        import org.apache.spark.sql.{Encoders, Row}
        import org.apache.spark.sql.types._
        val simSchema = StructType(Seq(
          StructField("doc_id", LongType), StructField("sim", LongType)))
        implicit val le: org.apache.spark.sql.Encoder[(Long, Long)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
        val simhashed = sh
          .select(col("doc_id"), explode(col("ss")).as("t"))
          .select(col("doc_id"), xxhash64(col("t")).as("h"))
          .as[(Long, Long)](le)
          .groupByKey(_._1)(Encoders.scalaLong)
          .mapGroups { (id: Long, rows: Iterator[(Long, Long)]) =>
            val counts = new Array[Int](64)
            var n = 0
            rows.foreach { case (_, h) =>
              n += 1
              var j = 0
              while (j < 64) {
                counts(j) += ((h >>> j) & 1L).toInt
                j += 1
              }
            }
            var sim = 0L
            var j = 0
            while (j < 64) {
              if (2 * counts(j) > n) sim |= (1L << j)
              j += 1
            }
            Row(id, sim)
          }(Encoders.row(simSchema))
        val banded = simhashed.select(col("doc_id"),
          explode(expr("transform(sequence(0, 7), s -> concat(s, ':', (sim >> (s * 8)) & 255))")).as("seg_key"))
        val cands = bucketPairs(banded, "seg_key")
        val simsA = simhashed.select(col("doc_id").as("doc_a"), col("sim").as("sim_a"))
        val simsB = simhashed.select(col("doc_id").as("doc_b"), col("sim").as("sim_b"))
        cands.join(simsA, "doc_a").join(simsB, "doc_b")
          .withColumn("hamming", expr("bit_count(sim_a ^ sim_b)").cast("long"))
          .filter(col("hamming") <= 7)
          .select(col("doc_a"), col("doc_b"), col("hamming"))
          .orderBy(col("doc_a"), col("doc_b"))
      },
      None
    ),

    QueryDef(
      "dedup_embedding",
      (s, dir) => {
        val e = Tables(s, dir).embeddings
        val a = e.select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
        val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("eb"))
        val pairs = a.join(b, col("vec_a") < col("vec_b"))
        VectorOps.cosineKernel(pairs, "ea", "eb")
          .filter(col("cosine") >= CosineTau)
          .select(col("vec_a"), col("vec_b"), col("cosine"))
          .orderBy(col("vec_a"), col("vec_b"))
      },
      Some(s"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        ${VectorOps.cosineSql("a.embedding", "b.embedding")} AS cosine
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE ${VectorOps.cosineSql("a.embedding", "b.embedding")} >= $CosineTau
      ORDER BY vec_a, vec_b""")
    )
  )
}
