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

  /** Exact-verify candidate pairs against set columns, emitting jaccard. */
  private def verifyJaccard(cands: DataFrame, sets: DataFrame, setCol: String, tau: Double): DataFrame = {
    val a = sets.select(col("doc_id").as("doc_a"), col(setCol).as("set_a"))
    val b = sets.select(col("doc_id").as("doc_b"), col(setCol).as("set_b"))
    cands.join(a, "doc_a").join(b, "doc_b")
      .withColumn("inter", size(array_intersect(col("set_a"), col("set_b"))))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("set_a")) + size(col("set_b")) - col("inter")).cast("double"))
      .filter(col("jaccard") >= tau)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
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
        val ranked = tok.join(broadcast(dfreq), "token")
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("doc_id")).orderBy(col("df"), col("token"))))
          // prefix bound for Jaccard >= tau: n - ceil(tau*n) + 1 rarest tokens
          .filter(col("rk") <= col("n") - ceil(col("n") * JaccardTauSets) + 1)
          .select(col("doc_id"), col("token"))
        val cands = ranked.as("x").join(ranked.as("y"),
            col("x.token") === col("y.token") && col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
          .distinct()
        verifyJaccard(cands, ws, "ws", JaccardTauSets)
      },
      Some(jaccardPairsSql(
        "SELECT doc_id, list_distinct(string_split(lower(text), ' ')) AS ws FROM documents",
        "ws", JaccardTauSets))
    ),

    QueryDef(
      "dedup_minhash_lsh",
      (s, dir) => {
        val sh = shingleSets(Tables(s, dir).documents)
        val hashed = sh.withColumn("hs", transform(col("ss"), t => xxhash64(t)))
        // keep the per-shingle hash in 32 bits so the (a*h + b) permutation
        // family stays overflow-free under ANSI arithmetic
        val aLit = typedLit(PermMultipliers)
        val sig = hashed.withColumn("sig",
          transform(sequence(lit(0), lit(NumPerms - 1)), i =>
            array_min(transform(col("hs"), h =>
              pmod(pmod(h, lit(4294967291L)) * get(aLit, i) + i, lit(MinhashPrime))))))
        val banded = sig.select(col("doc_id"),
          explode(transform(sequence(lit(0), lit(Bands - 1)), b =>
            xxhash64(b, get(col("sig"), b * 2), get(col("sig"), b * 2 + 1)))).as("band_key"))
        val cands = banded.as("x").join(banded.as("y"),
            col("x.band_key") === col("y.band_key") && col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
          .distinct()
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
        val simhashed = sh
          .withColumn("hs", transform(col("ss"), t => xxhash64(t)))
          .withColumn("sim", expr(
            """aggregate(sequence(0, 63), 0L, (acc, j) ->
               acc + IF(2 * size(filter(hs, h -> ((h >> j) & 1) = 1)) > size(hs),
                        shiftleft(1L, j), 0L))"""))
        val banded = simhashed.select(col("doc_id"),
          explode(expr("transform(sequence(0, 7), s -> concat(s, ':', (sim >> (s * 8)) & 255))")).as("seg_key"))
        val cands = banded.as("x").join(banded.as("y"),
            col("x.seg_key") === col("y.seg_key") && col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
          .distinct()
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
        a.join(b, col("vec_a") < col("vec_b"))
          .withColumn("cosine", VectorOps.cosine("ea", "eb"))
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
