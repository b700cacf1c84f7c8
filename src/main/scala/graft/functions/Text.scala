package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Text-analysis operators for training-data pipelines over the
  * `documents` table: token counting, quality scoring, language-ID
  * heuristics, and content fingerprinting. All pure `functions._`
  * expressions — fully codegen'd, no UDFs, so they stay inside
  * WholeStageCodegen on the scan.
  */
object Text {

  private val stopEn = Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "that")
  private val stopEs = Seq("el", "la", "de", "que", "y", "en", "los", "se", "del", "las")
  private val stopDe = Seq("der", "die", "und", "das", "ist", "von", "den", "mit", "auf", "ein")

  def tokens(text: Column): Column = split(text, " ")

  private def hitCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  /** Token/quality statistics per document. `quality_score` is a
    * deterministic blend of lexical-diversity, non-stopword density, and a
    * length factor — the shape of heuristic quality filters used on web
    * corpora. */
  def textStats(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    d.select(
        col("doc_id"), col("lang"), col("source"),
        tokens(col("text")).as("toks"), col("text"))
      .select(
        col("doc_id"), col("lang"), col("source"),
        size(col("toks")).as("n_tokens"),
        size(array_distinct(col("toks"))).as("n_distinct_tokens"),
        hitCount(col("toks"), stopEn).as("n_stopwords"),
        length(col("text")).as("n_chars_text"),
        (length(regexp_replace(col("text"), " ", "")).cast(DoubleType) / size(col("toks")))
          .as("avg_token_len"))
      .withColumn("distinct_ratio",
        col("n_distinct_tokens").cast(DoubleType) / col("n_tokens"))
      .withColumn("stopword_ratio",
        col("n_stopwords").cast(DoubleType) / col("n_tokens"))
      .withColumn("quality_score",
        lit(0.5) * col("distinct_ratio")
          + lit(0.3) * (lit(1.0) - col("stopword_ratio"))
          + lit(0.2) * least(col("n_tokens").cast(DoubleType) / 100.0, lit(1.0)))
  }

  /** n-gram/stopword-overlap language ID. (On this synthetic corpus the
    * `lang` column is random — the operator itself is what's under test;
    * accuracy on real text is exercised in the unit spec.) */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val toks = tokens(col("text"))
    d.select(
        col("doc_id"),
        hitCount(toks, stopEn).as("en_hits"),
        hitCount(toks, stopEs).as("es_hits"),
        hitCount(toks, stopDe).as("de_hits"))
      .withColumn("lang_guess",
        when(col("en_hits") >= col("es_hits")
          && col("en_hits") >= col("de_hits") && col("en_hits") > 0, "en")
          .when(col("es_hits") >= col("de_hits") && col("es_hits") > 0, "es")
          .when(col("de_hits") > 0, "de")
          .otherwise("und"))
  }

  /** Regex token-class counting — the BPE-ish pre-tokenization pass of a
    * training pipeline: alpha words, numbers, punctuation runs, plus the
    * alpha character mass and mean word length. Pure codegen'd regex
    * built-ins; patterns stick to character classes that mean the same
    * thing in Java regex (Spark) and RE2 (DuckDB). */
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        size(regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0))).as("n_words"),
        size(regexp_extract_all(col("text"), lit("[0-9]+"), lit(0))).as("n_numbers"),
        size(regexp_extract_all(lower(col("text")), lit("[^a-z0-9 ]+"), lit(0))).as("n_punct_runs"),
        length(regexp_replace(lower(col("text")), "[^a-z]", "")).as("n_alpha_chars"))
      .withColumn("mean_word_len",
        when(col("n_words") > 0,
          col("n_alpha_chars").cast(DoubleType) / col("n_words")))

  /** Whitespace-normalized md5 content fingerprint (document identity for
    * exact dedup). */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "\\s+", " "))

  def textFingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      fingerprint(col("text")).as("fp"),
      size(tokens(col("text"))).as("n_tokens"))

  /** End-to-end corpus cleaning — the composition a training-data pipeline
    * actually runs: quality/length gates, then exact-dup removal keeping
    * the smallest doc_id per fingerprint. One aggregation + one semi-join;
    * both shuffle on the md5 fingerprint. */
  def corpusClean(spark: SparkSession, dir: String,
                  minTokens: Int = 20, maxStopRatio: Double = 0.5): DataFrame = {
    val d = Tables.documents(spark, dir)
      .withColumn("toks", tokens(col("text")))
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("stop_ratio",
        hitCount(col("toks"), stopEn).cast(DoubleType) / size(col("toks")))
      .withColumn("fp", fingerprint(col("text")))
    // rename the grouped fp so the semi-join condition can't collapse to a
    // trivially-true self-comparison
    val keepers = d.groupBy(col("fp")).agg(min(col("doc_id")).as("keeper"))
      .withColumnRenamed("fp", "kfp")
    d.join(keepers, d("fp") === col("kfp") && d("doc_id") === col("keeper"), "left_semi")
      .where(col("n_tokens") >= minTokens && col("stop_ratio") <= maxStopRatio)
      .select(col("doc_id"), col("lang"), col("source"), col("n_tokens"), col("stop_ratio"))
  }

  object oracle {
    val corpusClean: String = {
      val stops = stopEn.map("'" + _ + "'").mkString("(", ",", ")")
      s"""WITH d AS (
         |  SELECT doc_id, lang, source,
         |    CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
         |    CAST(len(list_filter(string_split(text, ' '), t -> t IN $stops)) AS DOUBLE)
         |      / CAST(len(string_split(text, ' ')) AS INT) AS stop_ratio,
         |    md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp
         |  FROM documents),
         |keepers AS (SELECT fp, min(doc_id) AS keeper FROM d GROUP BY 1)
         |SELECT doc_id, lang, source, n_tokens, stop_ratio
         |FROM d JOIN keepers ON d.fp = keepers.fp AND d.doc_id = keepers.keeper
         |WHERE n_tokens >= 20 AND stop_ratio <= 0.5""".stripMargin
    }

    private def inList(words: Seq[String]) = words.map("'" + _ + "'").mkString("(", ",", ")")
    private def hits(words: Seq[String]) =
      s"CAST(len(list_filter(string_split(text, ' '), t -> t IN ${inList(words)})) AS INT)"

    val textStats: String =
      s"""WITH s AS (
         |  SELECT doc_id, lang, source,
         |    CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
         |    CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct_tokens,
         |    ${hits(stopEn)} AS n_stopwords,
         |    CAST(length(text) AS INT) AS n_chars_text,
         |    CAST(length(replace(text, ' ', '')) AS DOUBLE) / CAST(len(string_split(text, ' ')) AS INT) AS avg_token_len
         |  FROM documents)
         |SELECT *,
         |  CAST(n_distinct_tokens AS DOUBLE) / n_tokens AS distinct_ratio,
         |  CAST(n_stopwords AS DOUBLE) / n_tokens AS stopword_ratio,
         |  0.5 * (CAST(n_distinct_tokens AS DOUBLE) / n_tokens)
         |    + 0.3 * (1.0 - CAST(n_stopwords AS DOUBLE) / n_tokens)
         |    + 0.2 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) AS quality_score
         |FROM s""".stripMargin

    val langId: String =
      s"""WITH h AS (
         |  SELECT doc_id, ${hits(stopEn)} AS en_hits, ${hits(stopEs)} AS es_hits,
         |         ${hits(stopDe)} AS de_hits
         |  FROM documents)
         |SELECT *,
         |  CASE WHEN en_hits >= es_hits AND en_hits >= de_hits AND en_hits > 0 THEN 'en'
         |       WHEN es_hits >= de_hits AND es_hits > 0 THEN 'es'
         |       WHEN de_hits > 0 THEN 'de'
         |       ELSE 'und' END AS lang_guess
         |FROM h""".stripMargin

    val tokenCount: String =
      s"""SELECT doc_id,
         |  CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS INT) AS n_words,
         |  CAST(len(regexp_extract_all(text, '[0-9]+')) AS INT) AS n_numbers,
         |  CAST(len(regexp_extract_all(lower(text), '[^a-z0-9 ]+')) AS INT) AS n_punct_runs,
         |  CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS INT) AS n_alpha_chars,
         |  CASE WHEN len(regexp_extract_all(lower(text), '[a-z]+')) > 0 THEN
         |    CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE)
         |      / len(regexp_extract_all(lower(text), '[a-z]+')) END AS mean_word_len
         |FROM documents""".stripMargin

    val textFingerprint: String =
      s"""SELECT doc_id, md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp,
         |  CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
         |FROM documents""".stripMargin
  }
}
