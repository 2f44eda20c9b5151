package graft.similarity

import graft.{QueryDef, QueryModule}
import graft.operators.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import VectorOps._

/** Similarity-search suite (SURVEY.md §2.5) over `embeddings`.
  *
  * Scale design: the query side is always the small side and is
  * broadcast; the 100 TB data side is scanned once, never shuffled.
  * Brute-force top-k is the exactness baseline (oracle-checked); the
  * LSH-bucketed variant is the sub-linear scale path (bucket join
  * instead of cross product) and is recall-checked in the test suite.
  */
object Similarity extends QueryModule {

  private val K = 5
  private val NQueries = 10

  def defs: Seq[QueryDef] = Seq(
    QueryDef(
      "knn_bruteforce",
      (s, dir) => {
        val e = Tables(s, dir).embeddings
        val queries = e.filter(col("vec_id") < NQueries)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"))
        val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("vec_id"))
        e.join(broadcast(queries), col("vec_id") =!= col("qid"))
          .withColumn("cosine", cosineNative(col("qe"), col("embedding")))
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= K)
          .select(col("qid"), col("vec_id"), col("cosine"), col("rk"))
          .orderBy(col("qid"), col("rk"))
      },
      Some(s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < $NQueries)
      SELECT qid, vec_id, cosine, rk FROM (
        SELECT qid, vec_id, cosine,
          CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS BIGINT) AS rk
        FROM (SELECT qid, e.vec_id, ${cosineSql("qe", "embedding")} AS cosine
              FROM q, embeddings e WHERE e.vec_id <> qid) c) r
      WHERE rk <= $K ORDER BY qid, rk""")
    ),

    QueryDef(
      // LSH-bucketed ANN: 16 bands x 6 hyperplanes; candidates share a
      // sign-bucket with the query in >=1 band, i.e. ~16/64 = 25% of the
      // corpus is scored per query instead of 100%. Sub-linear scale
      // path — not SQL-mirrorable (hyperplanes), so rows-only checked;
      // recall vs knn_bruteforce is asserted in SimilaritySpec. (On this
      // synthetic near-random corpus neighbors sit at ~70 degrees, the
      // regime where cosine LSH is weakest — real embedding corpora
      // cluster much tighter and recall rises accordingly.)
      "knn_lsh",
      (s, dir) => {
        val e = Tables(s, dir).embeddings
        val bands = (0 until 16).map { b =>
          val planes = hyperplanes(6, 64, seed = 42L + b)
          (b, planes)
        }
        // (vec_id, band, bucket) for all vectors
        val bucketed = bands.map { case (b, planes) =>
          e.select(col("vec_id"), col("embedding"),
            lit(b).as("band"), signBucket("embedding", planes).as("bucket"))
        }.reduce(_ unionByName _)
        val qb = bucketed.filter(col("vec_id") < NQueries)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"),
            col("band"), col("bucket"))
        val cands = bucketed.join(broadcast(qb), Seq("band", "bucket"))
          .filter(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("qe"), col("vec_id"), col("embedding"))
          .distinct()
        val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("vec_id"))
        cands
          .withColumn("cosine", cosineNative(col("qe"), col("embedding")))
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= K)
          .select(col("qid"), col("vec_id"), col("cosine"), col("rk"))
          .orderBy(col("qid"), col("rk"))
      },
      None
    ),

    QueryDef(
      "embed_norm_stats",
      (s, dir) => {
        Tables(s, dir).embeddings
          .withColumn("nrm", norm("embedding"))
          .groupBy(col("label"))
          .agg(
            count(lit(1)).as("n_vecs"),
            sum(col("nrm").cast(org.apache.spark.sql.types.DecimalType(18, 6))).cast("double").as("total_norm"),
            min(col("nrm")).as("min_norm"),
            max(col("nrm")).as("max_norm"))
          .orderBy(col("label"))
      },
      Some(s"""SELECT label, COUNT(*) AS n_vecs,
        CAST(SUM(CAST(nrm AS DECIMAL(18,6))) AS DOUBLE) AS total_norm,
        MIN(nrm) AS min_norm, MAX(nrm) AS max_norm
      FROM (SELECT label, ${normSql("embedding")} AS nrm FROM embeddings) t
      GROUP BY label ORDER BY label""")
    )
  )
}
