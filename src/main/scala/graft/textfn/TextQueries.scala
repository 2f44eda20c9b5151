package graft.textfn

import graft.{QueryDef, QueryModule}
import graft.operators.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import TextFunctions._

/** Text-analysis operator suite (SURVEY.md §2.6) over `documents`. */
object TextQueries extends QueryModule {

  def defs: Seq[QueryDef] = Seq(
    QueryDef(
      "text_tokens",
      (s, dir) => {
        Tables(s, dir).documents
          .select(
            col("doc_id"),
            tokenCount(col("text")).as("n_tokens"),
            subtokenCount(col("text")).as("n_subtokens"),
            length(col("text")).cast("long").as("n_chars_measured"))
          .orderBy(col("doc_id"))
      },
      Some(s"""SELECT doc_id,
        CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens,
        $subtokenCountSql AS n_subtokens,
        CAST(length(text) AS BIGINT) AS n_chars_measured
      FROM documents ORDER BY doc_id""")
    ),

    QueryDef(
      "text_langid",
      (s, dir) => {
        Tables(s, dir).documents
          .select(
            col("doc_id"),
            hits(col("text"), StopEn).as("en_hits"),
            hits(col("text"), StopDe).as("de_hits"),
            hits(col("text"), StopFr).as("fr_hits"),
            hits(col("text"), StopEs).as("es_hits"))
          .withColumn("pred_lang",
            when(col("en_hits") === 0 && col("de_hits") === 0 &&
              col("fr_hits") === 0 && col("es_hits") === 0, "unknown")
              .when(col("en_hits") >= col("de_hits") && col("en_hits") >= col("fr_hits") &&
                col("en_hits") >= col("es_hits"), "en")
              .when(col("de_hits") >= col("fr_hits") && col("de_hits") >= col("es_hits"), "de")
              .when(col("fr_hits") >= col("es_hits"), "fr")
              .otherwise("es"))
          .orderBy(col("doc_id"))
      },
      Some(s"""SELECT doc_id, en_hits, de_hits, fr_hits, es_hits,
        CASE WHEN en_hits = 0 AND de_hits = 0 AND fr_hits = 0 AND es_hits = 0 THEN 'unknown'
             WHEN en_hits >= de_hits AND en_hits >= fr_hits AND en_hits >= es_hits THEN 'en'
             WHEN de_hits >= fr_hits AND de_hits >= es_hits THEN 'de'
             WHEN fr_hits >= es_hits THEN 'fr'
             ELSE 'es' END AS pred_lang
      FROM (SELECT doc_id,
        ${hitsSql(StopEn)} AS en_hits,
        ${hitsSql(StopDe)} AS de_hits,
        ${hitsSql(StopFr)} AS fr_hits,
        ${hitsSql(StopEs)} AS es_hits
      FROM documents) h ORDER BY doc_id""")
    ),

    QueryDef(
      "text_quality",
      (s, dir) => {
        val nTok = tokenCount(col("text"))
        val stopRatio = hits(col("text"), StopEn).cast("double") / nTok.cast("double")
        val digitRatio = regexp_count(col("text"), lit("[0-9]")).cast("double") /
          length(col("text")).cast("double")
        val meanWordLen = (length(col("text")).cast("long") - (nTok - 1L)).cast("double") /
          nTok.cast("double")
        // quality itself is the SHARED score (TextFunctions.qualityScore)
        // — the same definition token_budget orders by
        Tables(s, dir).documents
          .select(
            col("doc_id"),
            length(col("text")).cast("long").as("n_chars_measured"),
            stopRatio.as("stop_ratio"),
            digitRatio.as("digit_ratio"),
            meanWordLen.as("mean_word_len"),
            qualityScore(col("text")).as("quality"))
          .orderBy(col("doc_id"))
      },
      Some(s"""SELECT doc_id,
        CAST(length(text) AS BIGINT) AS n_chars_measured,
        CAST(${hitsSql(StopEn)} AS DOUBLE) / CAST(len(string_split(lower(text), ' ')) AS DOUBLE) AS stop_ratio,
        CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE) AS digit_ratio,
        CAST(length(text) - (len(string_split(lower(text), ' ')) - 1) AS DOUBLE) /
          CAST(len(string_split(lower(text), ' ')) AS DOUBLE) AS mean_word_len,
        $qualityScoreSql AS quality
      FROM documents ORDER BY doc_id""")
    ),

    QueryDef(
      // the training-data cleaning FUNNEL composed from the §2.4/§2.6
      // primitives, as one operator: quality-filter -> language-filter
      // (en) -> exact dedup (canonical = min doc_id per normalized
      // content among survivors) with per-stage doc/token retention —
      // the shape every corpus-prep pipeline reports. Single scan builds
      // the per-doc flags; four cheap aggregates read the persisted
      // flags table.
      "pipeline_filter",
      (s, dir) => {
        val nTok = tokenCount(col("text"))
        val quality = qualityScore(col("text"))
        val enHits = hits(col("text"), StopEn)
        val isEn = enHits > 0 &&
          enHits >= hits(col("text"), StopDe) &&
          enHits >= hits(col("text"), StopFr) &&
          enHits >= hits(col("text"), StopEs)
        val flags = Tables(s, dir).documents
          .select(col("doc_id"), nTok.as("n_tokens"), quality.as("quality"),
            isEn.as("is_en"),
            md5(concat_ws(" ", array_sort(array_distinct(split(lower(col("text")), " ")))))
              .as("norm_md5"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val qual = flags.filter(col("quality") >= 0.5)
        val lang = qual.filter(col("is_en"))
        val canon = lang.withColumn("cdoc",
            min(col("doc_id")).over(org.apache.spark.sql.expressions.Window.partitionBy(col("norm_md5"))))
          .filter(col("doc_id") === col("cdoc"))
        def stage(df: org.apache.spark.sql.DataFrame, label: String) =
          df.agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
            .select(lit(label).as("stage"), col("n_docs"),
              col("total_tokens").cast("long").as("total_tokens"))
        stage(flags, "p0_all")
          .unionByName(stage(qual, "p1_quality"))
          .unionByName(stage(lang, "p2_lang_en"))
          .unionByName(stage(canon, "p3_dedup"))
          .orderBy(col("stage"))
      },
      Some(s"""WITH f AS (
        SELECT doc_id,
          CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens,
          $qualityScoreSql AS quality,
          ${hitsSql(StopEn)} > 0 AND ${hitsSql(StopEn)} >= ${hitsSql(StopDe)}
            AND ${hitsSql(StopEn)} >= ${hitsSql(StopFr)}
            AND ${hitsSql(StopEn)} >= ${hitsSql(StopEs)} AS is_en,
          md5(array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' ')) AS norm_md5
        FROM documents),
      q AS (SELECT * FROM f WHERE quality >= 0.5),
      l AS (SELECT * FROM q WHERE is_en),
      c AS (SELECT * FROM l WHERE doc_id =
        (SELECT MIN(doc_id) FROM l l2 WHERE l2.norm_md5 = l.norm_md5))
      SELECT 'p0_all' AS stage, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens FROM f
      UNION ALL SELECT 'p1_quality', COUNT(*), CAST(SUM(n_tokens) AS BIGINT) FROM q
      UNION ALL SELECT 'p2_lang_en', COUNT(*), CAST(SUM(n_tokens) AS BIGINT) FROM l
      UNION ALL SELECT 'p3_dedup', COUNT(*), CAST(SUM(n_tokens) AS BIGINT) FROM c
      ORDER BY stage""")
    ),

    QueryDef(
      "text_fingerprint",
      (s, dir) => {
        Tables(s, dir).documents
          .select(
            col("doc_id"),
            contentMd5(col("text")).as("content_md5"),
            minShingleMd5(col("text")).as("min_shingle_md5"))
          .orderBy(col("doc_id"))
      },
      Some(s"""SELECT doc_id, md5(text) AS content_md5,
        ${minShingleMd5Sql()} AS min_shingle_md5
      FROM documents ORDER BY doc_id""")
    ),

    QueryDef(
      // Within-doc repetition signals (the Gopher-style repetition
      // filter): duplicated-token ratio and the share of the single most
      // frequent token. One explode + two partial-aggregating shuffles on
      // (doc_id[, token]) — both fully map-side-combinable, so the 100 TB
      // shape is token-count-bounded, not corpus-bounded.
      "text_repetition",
      (s, dir) => {
        val perTok = Tables(s, dir).documents
          .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("tok"))
          .groupBy(col("doc_id"), col("tok"))
          .agg(count(lit(1)).as("c"))
        perTok.groupBy(col("doc_id"))
          .agg(sum(col("c")).as("n_tokens"),
            count(lit(1)).as("n_distinct"),
            max(col("c")).as("top_count"))
          .select(col("doc_id"),
            col("n_tokens").cast("long").as("n_tokens"),
            col("n_distinct"),
            (lit(1.0) - col("n_distinct").cast("double") / col("n_tokens").cast("double"))
              .as("dup_ratio"),
            (col("top_count").cast("double") / col("n_tokens").cast("double"))
              .as("top_token_share"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
        CAST(COUNT(*) AS BIGINT) AS n_distinct,
        1.0 - CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS dup_ratio,
        CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top_token_share
      FROM (SELECT doc_id, tok, COUNT(*) AS c
            FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents) t
            GROUP BY doc_id, tok) g
      GROUP BY doc_id ORDER BY doc_id""")
    ),

    QueryDef(
      // Corpus-wide top-20 bigrams (the n-gram census behind contamination
      // checks and boilerplate discovery). Bigrams are formed with a
      // per-doc lead() window — partitioned by doc_id, so no global sort
      // and no single-partition window; the count is a map-side-combined
      // groupBy and the final top-20 a TakeOrdered, not a full sort.
      // (count DESC, bigram ASC) is a total order, so the cut is
      // deterministic.
      "text_ngram_top",
      (s, dir) => {
        val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        Tables(s, dir).documents
          .select(col("doc_id"), posexplode(split(lower(col("text")), " ")).as(Seq("pos", "tok")))
          .withColumn("nxt", lead(col("tok"), 1).over(w))
          .filter(col("nxt").isNotNull)
          .select(concat_ws(" ", col("tok"), col("nxt")).as("bigram"))
          .groupBy(col("bigram"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("bigram"))
          .limit(20)
      },
      Some("""SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n FROM (
        SELECT unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS bigram
        FROM (SELECT string_split(lower(text), ' ') AS toks FROM documents) t) b
      GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20""")
    ),

    QueryDef(
      // Corpus-composition report per (source, lang) — the first table in
      // every dataset card. Single map-side-combined aggregate.
      "docs_source_stats",
      (s, dir) => {
        Tables(s, dir).documents
          .groupBy(col("source"), col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("total_chars"),
            sum(size(split(lower(col("text")), " ")).cast("long")).as("total_tokens"))
          .select(col("source"), col("lang"), col("n_docs"),
            col("total_chars").cast("long").as("total_chars"),
            col("total_tokens").cast("long").as("total_tokens"),
            (col("total_chars").cast("double") / col("n_docs")).as("avg_chars"))
          .orderBy(col("source"), col("lang"))
      },
      Some("""SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        CAST(SUM(len(string_split(lower(text), ' '))) AS BIGINT) AS total_tokens,
        CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
      FROM documents GROUP BY source, lang ORDER BY source, lang""")
    ),

    QueryDef(
      // Per-doc rarity signal (the CCNet-style "how surprising is this
      // document" building block): each document's 3 rarest corpus
      // tokens by document frequency. Shape at scale: the corpus df is
      // ONE map-side-combined aggregate over distinct (doc, token)
      // pairs, the df joins back on the token key (both sides shuffle
      // on tok — co-partitioned), the per-doc top-3 is a rank filter
      // Spark executes as WindowGroupLimit (partial top-k before the
      // shuffle), and the doc count rides along as a one-row broadcast.
      // Exactness: rarity is ORDERED by the integer df (ties on token
      // text), and the surfaced ratio is one bigint/double division per
      // output row — no float aggregation anywhere.
      "text_rare_tokens",
      (s, dir) => {
        val docs = Tables(s, dir).documents
        val toks = docs.select(col("doc_id"),
          explode(array_distinct(split(lower(col("text")), " "))).as("tok"))
        val dfreq = toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
        val nDocs = docs.agg(count(lit(1)).cast("double").as("n_docs"))
        val w = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("tok"))
        toks.join(dfreq, "tok")
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 3)
          .crossJoin(broadcast(nDocs))
          .select(col("doc_id"), col("tok"), col("df"),
            (col("df") / col("n_docs")).as("df_ratio"), col("rk"))
          .orderBy(col("doc_id"), col("rk"))
      },
      Some("""WITH toks AS (SELECT DISTINCT doc_id, tok FROM (
          SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
          FROM documents) u),
        dfreq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df
          FROM toks GROUP BY tok),
        n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents)
      SELECT doc_id, tok, df, df / n_docs AS df_ratio, rk FROM (
        SELECT t.doc_id, t.tok, d.df,
          CAST(ROW_NUMBER() OVER (PARTITION BY t.doc_id
            ORDER BY d.df, t.tok) AS BIGINT) AS rk
        FROM toks t JOIN dfreq d USING (tok)) x, n
      WHERE rk <= 3 ORDER BY doc_id, rk""")
    ),

    QueryDef(
      // BM25 retrieval scoring (k1=1.2, b=0.75) of the corpus against a
      // fixed 3-term query — the ranking kernel of sparse retrieval /
      // training-data selection. Shape at scale: corpus stats (N, total
      // length, per-term document frequency) are ONE map-side-combined
      // aggregate riding back as a one-row broadcast; per-doc term
      // frequencies are codegen'd array expressions inside the scan
      // projection (no explode, no shuffle of token rows); the top-20
      // is TakeOrderedAndProject (per-partition heaps), never a global
      // sort. Exactness: tf/df/dl are exact integers surfaced as
      // doubles, every combination is IEEE basic ops except one ln per
      // term (libm-identical in practice), and the score is rounded to
      // 6dp — the same discipline §5 applies to averages.
      "text_bm25",
      (s, dir) => {
        // constants spelled as the same decimal literals the oracle SQL
        // uses (k1=1.2, b=0.75, k1+1=2.2, 1-b=0.25): computing 1.2+1.0
        // in Scala doubles need not equal the parsed literal 2.2's
        // nearest double, and one ulp here would shift the 6dp rounding
        val k1 = 1.2
        val k1p1 = 2.2
        val b = 0.75
        val oneMinusB = 0.25
        val terms = Seq("spark", "merge", "vector")
        val base = Tables(s, dir).documents
          .select(col("doc_id"), split(lower(col("text")), " ").as("toks"))
          .withColumn("dl", size(col("toks")).cast("double"))
        val statCols =
          count(lit(1)).cast("double").as("n_docs") +:
          sum(col("dl").cast("long")).cast("double").as("sum_dl") +:
          terms.map(t =>
            sum(array_contains(col("toks"), t).cast("long")).cast("double")
              .as(s"df_$t"))
        val stats = base.agg(statCols.head, statCols.tail: _*)
        val scored = base.crossJoin(broadcast(stats))
        val avgdl = col("sum_dl") / col("n_docs")
        val contrib = terms.map { t =>
          val tf = size(filter(col("toks"), x => x === lit(t))).cast("double")
          val idf = log(lit(1.0) +
            (col("n_docs") - col(s"df_$t") + lit(0.5)) / (col(s"df_$t") + lit(0.5)))
          idf * (tf * lit(k1p1)) /
            (tf + lit(k1) * (lit(oneMinusB) + lit(b) * col("dl") / avgdl))
        }.reduce(_ + _)
        scored
          .select(col("doc_id"), round(contrib, 6).as("score"))
          .orderBy(col("score").desc, col("doc_id"))
          .limit(20)
      },
      Some("""WITH base AS (
        SELECT doc_id, string_split(lower(text), ' ') AS toks,
          CAST(len(string_split(lower(text), ' ')) AS DOUBLE) AS dl
        FROM documents),
      s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
          CAST(SUM(CAST(dl AS BIGINT)) AS DOUBLE) AS sum_dl,
          CAST(SUM(CASE WHEN list_contains(toks, 'spark') THEN 1 ELSE 0 END) AS DOUBLE) AS df_spark,
          CAST(SUM(CASE WHEN list_contains(toks, 'merge') THEN 1 ELSE 0 END) AS DOUBLE) AS df_merge,
          CAST(SUM(CASE WHEN list_contains(toks, 'vector') THEN 1 ELSE 0 END) AS DOUBLE) AS df_vector
        FROM base),
      tf AS (SELECT doc_id, dl,
          CAST(len(list_filter(toks, x -> x = 'spark')) AS DOUBLE) AS tf_spark,
          CAST(len(list_filter(toks, x -> x = 'merge')) AS DOUBLE) AS tf_merge,
          CAST(len(list_filter(toks, x -> x = 'vector')) AS DOUBLE) AS tf_vector
        FROM base)
      SELECT doc_id, ROUND(
          ln(1.0 + (n_docs - df_spark + 0.5) / (df_spark + 0.5)) *
            (tf_spark * 2.2) / (tf_spark + 1.2 * (0.25 + 0.75 * dl / (sum_dl / n_docs))) +
          ln(1.0 + (n_docs - df_merge + 0.5) / (df_merge + 0.5)) *
            (tf_merge * 2.2) / (tf_merge + 1.2 * (0.25 + 0.75 * dl / (sum_dl / n_docs))) +
          ln(1.0 + (n_docs - df_vector + 0.5) / (df_vector + 0.5)) *
            (tf_vector * 2.2) / (tf_vector + 1.2 * (0.25 + 0.75 * dl / (sum_dl / n_docs))),
        6) AS score
      FROM tf, s
      ORDER BY score DESC, doc_id LIMIT 20""")
    )
  )
}
