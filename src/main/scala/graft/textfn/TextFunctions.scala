package graft.textfn

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the training-data pipeline (SURVEY.md
  * §2.6), shared with the dedup operators (§2.4).
  *
  * Everything here is composed from builtin (whole-stage-codegen'd)
  * functions and SQL higher-order functions — no UDFs, so filters around
  * these still push down and the expressions inline into generated code.
  * Each primitive has an exact DuckDB SQL mirror for the oracle gate.
  */
object TextFunctions {

  /** Whitespace tokens, lowercased. Documents are single-space clean. */
  def tokens(text: Column): Column = split(lower(text), " ")

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish sub-token estimate: each word contributes ceil(len/4)
    * sub-tokens (a 4-chars-per-token heuristic), computed with exact
    * integer arithmetic so the oracle matches bit-for-bit.
    */
  def subtokenCount(text: Column): Column =
    expr("CAST(aggregate(split(lower(text), ' '), 0L, (acc, t) -> acc + (length(t) + 3) div 4) AS BIGINT)")

  val subtokenCountSql: String =
    "CAST(list_sum(list_transform(string_split(lower(text), ' '), t -> (length(t) + 3) // 4)) AS BIGINT)"

  /** Number of tokens that appear in `words`. */
  def hits(text: Column, words: Seq[String]): Column = {
    val lst = words.map(w => s"'$w'").mkString(", ")
    expr(s"CAST(size(filter(split(lower(text), ' '), t -> t IN ($lst))) AS BIGINT)")
  }

  def hitsSql(words: Seq[String]): String = {
    val lst = words.map(w => s"'$w'").mkString(", ")
    s"CAST(len(list_filter(string_split(lower(text), ' '), t -> t IN ($lst))) AS BIGINT)"
  }

  /** Tiny per-language stopword profiles for the n-gram/stopword
    * language-ID heuristic. */
  val StopEn: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "it")
  val StopDe: Seq[String] = Seq("der", "die", "und", "das", "ist", "ein")
  val StopFr: Seq[String] = Seq("le", "la", "et", "les", "des", "un")
  val StopEs: Seq[String] = Seq("el", "la", "y", "los", "de", "un")

  /** Content fingerprint: md5 of the raw text (identical across engines
    * by definition). */
  def contentMd5(text: Column): Column = md5(text)

  /** Winnowing-style rolling fingerprint: minimum md5 over all 5-word
    * shingles (falls back to whole-text md5 for short docs). A shared
    * min-shingle is a strong near-dup signal and is trivially
    * distributable — one pass, no state.
    */
  def minShingleMd5(text: Column, k: Int = 5): Column =
    expr(s"""CASE WHEN size(split(lower(text), ' ')) >= $k THEN
        array_min(transform(sequence(0, size(split(lower(text), ' ')) - $k),
          i -> md5(concat_ws(' ', slice(split(lower(text), ' '), i + 1, $k)))))
      ELSE md5(lower(text)) END""")

  def minShingleMd5Sql(k: Int = 5): String =
    s"""CASE WHEN len(string_split(lower(text), ' ')) >= $k THEN
        list_min(list_transform(range(1, len(string_split(lower(text), ' ')) - ${k - 2}),
          i -> md5(array_to_string(string_split(lower(text), ' ')[i:i+${k - 1}], ' '))))
      ELSE md5(lower(text)) END"""

  /** THE quality score — length term + stopword term + digit penalty.
    * One definition shared by `text_quality`, the `pipeline_filter`
    * funnel, and the `token_budget` selection, so "quality" can never
    * silently mean two different things in one pipeline. Every term is
    * the same IEEE double expression tree in Spark and DuckDB →
    * bit-identical scores (required: token_budget ORDERS by this value,
    * and an ordering flip at the budget boundary would flip the kept
    * set). Empty-text guard: zero tokens scores 0.0. */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text)
    val stopRatio = hits(text, StopEn).cast("double") / nTok.cast("double")
    val digitRatio = regexp_count(text, lit("[0-9]")).cast("double") /
      length(text).cast("double")
    when(length(text) === 0, 0.0).otherwise(
      least(lit(1.0), length(text).cast("double") / 400.0) * 0.5 +
        stopRatio * 0.3 +
        (lit(1.0) - least(lit(1.0), digitRatio * 5.0)) * 0.2)
  }

  val qualityScoreSql: String =
    s"""CASE WHEN length(text) = 0 THEN 0.0 ELSE
      LEAST(1.0, CAST(length(text) AS DOUBLE) / 400.0) * 0.5
      + (CAST(${hitsSql(StopEn)} AS DOUBLE)
         / CAST(len(string_split(lower(text), ' ')) AS DOUBLE)) * 0.3
      + (1.0 - LEAST(1.0,
          (CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
           / CAST(length(text) AS DOUBLE)) * 5.0)) * 0.2 END"""
}
