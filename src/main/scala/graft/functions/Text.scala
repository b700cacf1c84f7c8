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

  /** Deterministic train/validation/test assignment (90/5/5) from an
    * md5-derived bucket of the doc id — the reproducible, engine-portable
    * form of corpus splitting: no RNG state, stable under reruns and
    * repartitioning, and any engine that has md5 assigns identically.
    * Map-only (no shuffle); the split literally costs one hash per row. */
  def splitAssign(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        (graft.operators.Dedup.md5Long(concat(lit("split_"), col("doc_id"))) % 100)
          .as("bucket"))
      .withColumn("split",
        when(col("bucket") < 90, "train")
          .when(col("bucket") < 95, "validation")
          .otherwise("test"))

  /** PII patterns, written WITHOUT backslash escapes (`[.]` over `\.`)
    * so the same literal means the same thing in Java regex (Spark) and
    * RE2 (DuckDB) and survives SQL string quoting untouched. */
  val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+[.][a-zA-Z]{2,}"
  val PhoneRe = "[+][0-9]{7,15}"
  val LongNumRe = "[0-9]{9,}"

  /** PII scrubbing — the redaction pass a corpus pipeline runs before
    * training: emails, international phone numbers, and long digit runs
    * (ids/accounts) are replaced with typed placeholder tokens, and each
    * class is counted so the drop/flag policy is auditable. Replacement
    * order matters and is fixed (emails first — an email contains digit
    * runs; then phones — a phone is itself a digit run; then bare runs).
    * Map-only, fully codegen'd regex built-ins: at 100 TB this pass costs
    * one scan, no shuffle. */
  def piiScrub(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(regexp_extract_all(col("text"), lit(EmailRe), lit(0))).as("n_emails"),
        size(regexp_extract_all(col("text"), lit(PhoneRe), lit(0))).as("n_phones"),
        size(regexp_extract_all(col("text"), lit(LongNumRe), lit(0))).as("n_long_nums"),
        regexp_replace(
          regexp_replace(
            regexp_replace(col("text"), EmailRe, "<EMAIL>"),
            PhoneRe, "<PHONE>"),
          LongNumRe, "<NUM>").as("text_scrubbed"))
      .withColumn("has_pii",
        col("n_emails") + col("n_phones") + col("n_long_nums") > 0)

  /** Token-level repetition statistics per document — the Gopher-style
    * intra-document quality signals: the mass fraction of the single most
    * frequent bigram, and the fraction of trigram occurrences that are
    * repeats. n-grams via the codegen'd posexplode+lead pipeline (array
    * lambdas are interpreted — see [[graft.operators.Dedup]]); both
    * aggregations shuffle on doc_id and the window partitions by doc_id,
    * so the op parallelizes across documents at any corpus size. */
  def repetitionStats(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val grams = Tables.documents(spark, dir)
      .select(col("doc_id"), posexplode(tokens(col("text"))))
      .withColumnRenamed("col", "tok")
      .withColumn("t2", lead(col("tok"), 1).over(w))
      .withColumn("t3", lead(col("tok"), 2).over(w))
    val bi = grams.where(col("t2").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("tok"), col("t2")).as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(max(col("c")).as("top_bigram_cnt"), sum(col("c")).as("n_bigrams"))
    val tri = grams.where(col("t3").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("tok"), col("t2"), col("t3")).as("tg"))
      .groupBy(col("doc_id"), col("tg")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_trigrams"), count(lit(1)).as("n_distinct_trigrams"))
    Tables.documents(spark, dir).select(col("doc_id"))
      .join(bi, Seq("doc_id"), "left")
      .join(tri, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        when(col("n_bigrams") > 0,
          col("top_bigram_cnt").cast(DoubleType) / col("n_bigrams"))
          .as("top_bigram_frac"),
        when(col("n_trigrams") > 0,
          lit(1.0) - col("n_distinct_trigrams").cast(DoubleType) / col("n_trigrams"))
          .as("dup_trigram_frac"))
  }

  /** TF-IDF top-3 terms per document: corpus document frequencies joined
    * back (the df table is vocabulary-sized → broadcast; the doc count is
    * a one-row broadcast), score ranked per doc. Scores round to 6
    * decimals BEFORE ranking so the kept rows don't depend on the last
    * ulp of each engine's ln(). */
  def tfidfTop3(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    // document frequency as a second aggregation over the (doc, tok)
    // rows, broadcast back (the df table is vocabulary-sized). NOT a
    // window partitioned by tok: a stopword's window partition holds
    // every document containing it — corpus-sized on one reducer, and
    // window partitions (unlike join partitions) cannot be split by AQE
    // skew handling. Both branches share the (doc_id, tok) shuffle via
    // ReusedExchange, so the tokenize/explode scan still runs once. For
    // web-scale vocabularies that outgrow a broadcast, drop the hint:
    // the same plan becomes a shuffle join whose skewed token keys AQE
    // CAN split.
    val nDocs = Tables.documents(spark, dir).agg(count(lit(1)).as("n_docs"))
    val dfTab = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfTab), Seq("tok"))
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        round(col("tf") * log(col("n_docs").cast(DoubleType) / col("df")), 6))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("tok"))))
      .where(col("rk") <= 3)
      .select(col("doc_id"), col("tok"), col("tf"), col("df"), col("score"), col("rk"))
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

    val splitAssign: String =
      s"""SELECT doc_id,
         |  ${graft.operators.Dedup.md5LongSql("'split_' || doc_id")} % 100 AS bucket,
         |  CASE WHEN ${graft.operators.Dedup.md5LongSql("'split_' || doc_id")} % 100 < 90 THEN 'train'
         |       WHEN ${graft.operators.Dedup.md5LongSql("'split_' || doc_id")} % 100 < 95 THEN 'validation'
         |       ELSE 'test' END AS split
         |FROM documents""".stripMargin

    val repetitionStats: String =
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |bg AS (
         |  SELECT doc_id, unnest(list_transform(range(1, len(toks)),
         |    i -> toks[i] || ' ' || toks[i+1])) AS g
         |  FROM t WHERE len(toks) >= 2),
         |bi AS (
         |  SELECT doc_id, MAX(c) AS top_bigram_cnt,
         |    CAST(SUM(c) AS BIGINT) AS n_bigrams FROM (
         |    SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY 1, 2)
         |  GROUP BY 1),
         |tg AS (
         |  SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1),
         |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS g
         |  FROM t WHERE len(toks) >= 3),
         |tri AS (
         |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_trigrams,
         |    COUNT(*) AS n_distinct_trigrams FROM (
         |    SELECT doc_id, g, COUNT(*) AS c FROM tg GROUP BY 1, 2)
         |  GROUP BY 1)
         |SELECT d.doc_id,
         |  COALESCE(n_bigrams, 0) AS n_bigrams,
         |  CASE WHEN n_bigrams > 0
         |       THEN CAST(top_bigram_cnt AS DOUBLE) / n_bigrams END AS top_bigram_frac,
         |  CASE WHEN n_trigrams > 0
         |       THEN 1.0 - CAST(n_distinct_trigrams AS DOUBLE) / n_trigrams END AS dup_trigram_frac
         |FROM documents d
         |LEFT JOIN bi ON bi.doc_id = d.doc_id
         |LEFT JOIN tri ON tri.doc_id = d.doc_id""".stripMargin

    val piiScrub: String =
      s"""SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '$EmailRe')) AS INT) AS n_emails,
         |  CAST(len(regexp_extract_all(text, '$PhoneRe')) AS INT) AS n_phones,
         |  CAST(len(regexp_extract_all(text, '$LongNumRe')) AS INT) AS n_long_nums,
         |  regexp_replace(regexp_replace(regexp_replace(text,
         |    '$EmailRe', '<EMAIL>', 'g'),
         |    '$PhoneRe', '<PHONE>', 'g'),
         |    '$LongNumRe', '<NUM>', 'g') AS text_scrubbed,
         |  len(regexp_extract_all(text, '$EmailRe'))
         |    + len(regexp_extract_all(text, '$PhoneRe'))
         |    + len(regexp_extract_all(text, '$LongNumRe')) > 0 AS has_pii
         |FROM documents""".stripMargin

    val tfidfTop3: String =
      s"""WITH tf AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         |tfc AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tf GROUP BY 1, 2),
         |dfc AS (SELECT tok, COUNT(*) AS df FROM tfc GROUP BY 1),
         |n AS (SELECT COUNT(*) AS n_docs FROM documents),
         |scored AS (
         |  SELECT doc_id, tok, tf, df,
         |    round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS score
         |  FROM tfc JOIN dfc USING (tok) CROSS JOIN n)
         |SELECT doc_id, tok, tf, df, score,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, tok) AS INT) AS rk
         |FROM scored QUALIFY rk <= 3""".stripMargin
  }
}
