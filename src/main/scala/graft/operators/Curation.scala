package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Corpus-curation operators rounding out the training-data pipeline
  * surface: fuzzy (edit-distance) dedup, deterministic stratified
  * sampling, composite quality gating, and multi-dimensional layout keys
  * (Z-order) for data-skipping writes.
  *
  * All pure `functions._` expressions — fully codegen'd, no UDFs — and
  * every output is deterministic, so each op carries a full DuckDB oracle
  * mirror.
  */
object Curation {

  /** Cheap length cap for the edit-distance comparison: fuzzy dedup on
    * long documents compares bounded prefixes (cost is O(len²) per pair —
    * unbounded text would make one adversarial pair dominate a task). */
  val FuzzyPrefixLen = 120

  /** edit_sim at or above this confirms an LSH candidate as a fuzzy dup. */
  val FuzzyVerifyThreshold = 0.6

  /** Fuzzy (edit-distance) dedup — the LSH-verify composition a production
    * dedup stack runs: [[Dedup.minHashLsh]] generates candidate pairs
    * (banded bucket join, never all-pairs), then each candidate is scored
    * by Levenshtein similarity on bounded prefixes and confirmed or
    * rejected against [[FuzzyVerifyThreshold]]. The character-level verify
    * catches what the token-set estimate can't distinguish — small
    * in-token edits versus genuine rewrites that happen to share shingle
    * buckets — so `verified` is the keep/drop signal and a false-positive
    * bucket collision scores low and is rejected. */
  def fuzzyEditPairs(spark: SparkSession, dir: String): DataFrame =
    fuzzyVerifyOn(
      Tables.documents(spark, dir),
      Dedup.minHashLsh(spark, dir).select(col("doc_a"), col("doc_b"), col("jaccard_est")))

  /** Score arbitrary candidate pairs (doc_a, doc_b, jaccard_est) by
    * bounded-prefix Levenshtein similarity against `docs` (doc_id, text).
    *
    * Scale shape: the pair set is dup-population-sized (LSH output), the
    * two prefix lookups are equi-joins on doc id — each shuffles the
    * BOUNDED prefix projection of the corpus, never full text — and the
    * distance itself is a codegen'd built-in with per-pair cost capped at
    * `prefixLen`² regardless of document length. No driver data, no
    * fan-out beyond the candidate set. */
  def fuzzyVerifyOn(docs: DataFrame, candidates: DataFrame,
                    prefixLen: Int = FuzzyPrefixLen,
                    threshold: Double = FuzzyVerifyThreshold): DataFrame = {
    val d = docs.select(col("doc_id"), substring(col("text"), 1, prefixLen).as("pfx"))
    val a = d.select(col("doc_id").as("doc_a"), col("pfx").as("pa"))
    val b = d.select(col("doc_id").as("doc_b"), col("pfx").as("pb"))
    candidates
      .join(a, Seq("doc_a"))
      .join(b, Seq("doc_b"))
      .select(
        col("doc_a"), col("doc_b"), col("jaccard_est"),
        levenshtein(col("pa"), col("pb")).as("edit_dist"),
        greatest(length(col("pa")), length(col("pb"))).as("max_len"))
      .withColumn("edit_sim",
        when(col("max_len") > 0,
          lit(1.0) - col("edit_dist").cast(DoubleType) / col("max_len"))
          .otherwise(lit(1.0)))
      .withColumn("verified", col("edit_sim") >= threshold)
  }

  /** Deterministic stratified reservoir sample: `perStratum` documents per
    * language, selected by minimum md5-derived priority — the
    * engine-portable form of uniform-without-replacement sampling (A-Res
    * with uniform weights ≡ top-k on a hash priority). Stable under
    * reruns, repartitioning, and engine choice; no RNG state to seed.
    *
    * Scale shape: strata here are languages (few, large), so a single
    * window partitioned by `lang` would put each language's ENTIRE
    * stratum on one reducer — ~10 reducers holding a 100 TB corpus. The
    * sample is therefore a salted two-phase top-k: phase 1 ranks within
    * (lang, doc_id % salts) — every window partition is ~1/salts of a
    * stratum — and keeps `perStratum` rows per salt; phase 2 ranks the
    * union (≤ salts × perStratum rows per lang, corpus-size-independent)
    * down to the final `perStratum`. Lossless: the global top-perStratum
    * of a stratum is contained in the union of its per-salt
    * top-perStratum sets, and both phases use the same
    * (priority, doc_id) order, so the output — including the rank
    * column — is identical to the single-window form. */
  def stratifiedSample(spark: SparkSession, dir: String, perStratum: Int = 5,
                       salts: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val prioritized = Tables.documents(spark, dir)
      .select(col("lang"), col("doc_id"),
        Dedup.md5Long(concat(lit("rs_"), col("doc_id"))).as("priority"))
    val perSalt = prioritized
      .withColumn("salt", pmod(col("doc_id"), lit(salts.toLong)))
      .withColumn("rk1", row_number().over(
        Window.partitionBy(col("lang"), col("salt"))
          .orderBy(col("priority"), col("doc_id"))))
      .where(col("rk1") <= perStratum)
    perSalt
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("priority"), col("doc_id"))))
      .where(col("rk") <= perStratum)
      .select(col("lang"), col("doc_id"), col("priority"), col("rk"))
  }

  /** Composite quality gate — the keep/drop decision op a corpus pipeline
    * runs after scoring: each heuristic is surfaced as a named boolean
    * flag (so drops are attributable) and `keep` is their conjunction.
    * Thresholds follow the common web-corpus heuristics (Gopher/C4
    * family): minimum length, lexical diversity, symbol-to-text ratio.
    * Map-only scan; at 100 TB this is the cheapest pass in the pipeline
    * and the flags partition the drop set for auditing. */
  def qualityGate(spark: SparkSession, dir: String,
                  minTokens: Int = 20, minDistinctRatio: Double = 0.4,
                  maxPunctRatio: Double = 0.12): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).as("n_tokens"),
        (size(array_distinct(split(col("text"), " "))).cast(DoubleType)
          / size(split(col("text"), " "))).as("distinct_ratio"),
        (length(regexp_replace(lower(col("text")), "[a-z0-9 ]", "")).cast(DoubleType)
          / length(col("text"))).as("punct_ratio"))
      .withColumn("too_short", col("n_tokens") < minTokens)
      .withColumn("low_diversity", col("distinct_ratio") < minDistinctRatio)
      .withColumn("high_punct", col("punct_ratio") > maxPunctRatio)
      .withColumn("keep",
        !col("too_short") && !col("low_diversity") && !col("high_punct"))

  /** n-gram order for decontamination overlap (13 is the common
    * benchmark-decontam choice; 5 here so the synthetic 60-token docs
    * produce meaningful overlap surface). */
  val DecontamN = 5

  /** Benchmark decontamination — the train/eval overlap check every
    * training corpus needs: any training document sharing an n-gram with
    * the held-out eval set is flagged (the GPT-3/PaLM-style n-gram
    * collision rule). The eval set here is the deterministic slice
    * doc_id % 50 == 0 standing in for an external benchmark table; the
    * operator takes any (doc_id, text) eval frame in production.
    *
    * Scale shape: train-side n-grams are generated map-only (the native
    * shingle generator — no window, no shuffle); the eval n-gram set
    * is DISTINCT and benchmark-sized (eval sets are thousands of docs,
    * not corpora) → broadcast, so the collision probe is a map-only
    * broadcast semi-join against the train scan — the corpus never
    * shuffles on gram. The per-doc rollup then shuffles once on doc_id,
    * sized by the train corpus' gram counts. */
  def decontaminate(spark: SparkSession, dir: String, n: Int = DecontamN): DataFrame = {
    val docs = Tables.documents(spark, dir)
    def gramsOf(d: DataFrame): DataFrame =
      d.select(col("doc_id"),
        graft.functions.Native.shingle_rows(col("text"), n).as("g"))
    val evalGrams = gramsOf(docs.where(col("doc_id") % 50 === 0))
      .select(col("g")).distinct()
    val trainGrams = gramsOf(docs.where(col("doc_id") % 50 =!= 0))
      .distinct()
    trainGrams
      .join(broadcast(evalGrams.withColumn("hit", lit(1))), Seq("g"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("hit"), lit(0))).as("n_contaminated"))
      .withColumn("contamination_ratio",
        col("n_contaminated").cast(DoubleType) / col("n_grams"))
      .withColumn("contaminated", col("n_contaminated") > 0)
  }

  /** Default language mixture weights for [[langRebalance]]: copies per
    * document — <1 downsamples, >1 upsamples (epoch repetition). */
  val MixRates: Seq[(String, Double)] = Seq(
    "en" -> 0.5, "zh" -> 1.0, "es" -> 1.5, "de" -> 2.25, "fr" -> 3.0)

  /** Corpus mixing / language rebalancing — the data-mixture step that
    * turns raw language proportions into target training proportions:
    * each document receives `floor(rate)` guaranteed copies plus one
    * more with probability `frac(rate)`, decided by an md5-derived
    * uniform — deterministic Bernoulli, so reruns, engines, and
    * partitionings all agree (same A-Res-style trick as
    * [[stratifiedSample]]). rate=0.5 halves a language, rate=2.25 repeats
    * every doc twice and every fourth doc a third time.
    *
    * Output is the per-language audit the mixing step must emit: source
    * count, effective (post-mix) count, and the achieved rate. Map-only
    * scoring (the rates table is a literal CASE — at production size a
    * broadcast join) + one groupBy(lang) rollup. */
  def langRebalance(spark: SparkSession, dir: String,
                    rates: Seq[(String, Double)] = MixRates): DataFrame = {
    val rate = rates.foldLeft(lit(1.0)) { case (acc, (l, r)) =>
      when(col("lang") === l, lit(r)).otherwise(acc)
    }
    // uniform in [0,1) from the top-60-bit md5 hash; binary fractions of
    // a 2^60 numerator are exact in double, so both engines compute the
    // identical u and make identical keep decisions.
    val u = Dedup.md5Long(concat(lit("mix_"), col("doc_id"))).cast(DoubleType) /
      lit((1L << 60).toDouble)
    Tables.documents(spark, dir)
      .select(col("lang"), col("doc_id"), rate.as("rate"),
        (floor(rate) + when(u < rate - floor(rate), 1).otherwise(0)).as("n_copies"))
      .groupBy(col("lang"))
      .agg(max(col("rate")).as("rate"),
        count(lit(1)).as("n_docs"),
        sum(col("n_copies")).as("effective_docs"))
      .withColumn("achieved_rate",
        col("effective_docs").cast(DoubleType) / col("n_docs"))
  }

  /** Tokens per packed training sequence. */
  val PackSeqLen = 512

  /** Sequence packing — the batching step that turns a cleaned corpus
    * into fixed-length training sequences: documents are concatenated in
    * a deterministic order and cut every `seqLen` tokens (GPT-style
    * packing with document spillover), emitting for each document the
    * sequence index and token offset where it starts.
    *
    * Scale shape: packing is inherently a prefix sum, which does NOT
    * distribute as one global window. The corpus is therefore sharded by
    * an md5-derived key (balanced regardless of id distribution) and
    * packed independently per shard — exactly how production packers run
    * (each worker packs its own shard into its own sequence namespace).
    * Per-shard windows hold 1/`shards` of the corpus; `shards` scales
    * with corpus size (tokens / target-tokens-per-shard), so no reducer
    * ever sees more than a bounded token mass. Output sequence ids are
    * (shard, seq_in_shard) pairs — globally unique without coordination. */
  def packSequences(spark: SparkSession, dir: String,
                    seqLen: Int = PackSeqLen, shards: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        pmod(Dedup.md5Long(concat(lit("shard_"), col("doc_id"))), lit(shards.toLong)).as("shard"),
        size(split(col("text"), " ")).cast(LongType).as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("start_tok", col("cum_tokens") - col("n_tokens"))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        floor(col("start_tok") / seqLen).as("seq_in_shard"),
        (col("start_tok") % seqLen).as("seq_offset"))
  }

  /** Bits per dimension of the Z-order key (16 ⇒ a 32-bit interleaved
    * key over two dimensions). */
  val ZBits = 16

  /** Z-order (Morton) layout key over two join/filter dimensions of
    * lineitem, with the 100 smallest keys surfaced (deterministic
    * total order → oracle-comparable top-k via TakeOrderedAndProject).
    *
    * The point of the op is the KEY, not the top-k: sorting a table by
    * the interleaved key before a partitioned write co-locates rows that
    * are close in BOTH dimensions, so file-level min/max statistics prune
    * scans filtered on either column — the standard multi-dimensional
    * data-skipping layout (Delta/Iceberg `ZORDER BY`). The key itself is
    * 32 codegen'd shift/mask terms, map-only at any scale. */
  def zorderKeys(spark: SparkSession, dir: String, topN: Int = 100): DataFrame = {
    val x = (col("l_partkey") % (1 << ZBits)).cast(LongType)
    val y = (col("l_suppkey") % (1 << ZBits)).cast(LongType)
    val z = (0 until ZBits).map { i =>
      shiftrightunsigned(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftrightunsigned(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        x.as("zx"), y.as("zy"), z.as("zkey"))
      .orderBy(col("zkey"), col("l_orderkey"), col("l_linenumber"))
      .limit(topN)
  }

  object oracle {
    /** Composition of the two existing mirrors: the full md5-mirrored
      * MinHash-LSH pair query ([[Dedup.oracle.minHashLsh]]) as the
      * candidate CTE, then the same prefix-Levenshtein verify. */
    val fuzzyEditPairs: String =
      s"""WITH pairs AS (
         |${Dedup.oracle.minHashLsh}
         |),
         |d AS (
         |  SELECT doc_id, substr(text, 1, $FuzzyPrefixLen) AS pfx FROM documents)
         |SELECT p.doc_a, p.doc_b, p.jaccard_est,
         |  CAST(levenshtein(a.pfx, b.pfx) AS INT) AS edit_dist,
         |  CAST(greatest(length(a.pfx), length(b.pfx)) AS INT) AS max_len,
         |  CASE WHEN greatest(length(a.pfx), length(b.pfx)) > 0
         |       THEN 1.0 - CAST(levenshtein(a.pfx, b.pfx) AS DOUBLE)
         |              / greatest(length(a.pfx), length(b.pfx))
         |       ELSE 1.0 END AS edit_sim,
         |  (CASE WHEN greatest(length(a.pfx), length(b.pfx)) > 0
         |        THEN 1.0 - CAST(levenshtein(a.pfx, b.pfx) AS DOUBLE)
         |               / greatest(length(a.pfx), length(b.pfx))
         |        ELSE 1.0 END) >= $FuzzyVerifyThreshold AS verified
         |FROM pairs p
         |JOIN d a ON a.doc_id = p.doc_a
         |JOIN d b ON b.doc_id = p.doc_b""".stripMargin

    val stratifiedSample: String = {
      val pr = Dedup.md5LongSql("'rs_' || doc_id")
      s"""SELECT lang, doc_id, priority, rk FROM (
         |  SELECT lang, doc_id, $pr AS priority,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY $pr, doc_id) AS INT) AS rk
         |  FROM documents)
         |WHERE rk <= 5""".stripMargin
    }

    val decontaminate: String = {
      val n = DecontamN
      val gram = (0 until n).map(j => s"toks[i+$j]").mkString(" || ' ' || ")
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |g AS (
         |  SELECT doc_id, unnest(list_transform(range(1, len(toks) - ${n - 2}),
         |    i -> $gram)) AS g
         |  FROM t WHERE len(toks) >= $n),
         |eg AS (SELECT DISTINCT g FROM g WHERE doc_id % 50 = 0),
         |tg AS (SELECT DISTINCT doc_id, g FROM g WHERE doc_id % 50 != 0),
         |j AS (SELECT tg.doc_id, CASE WHEN eg.g IS NOT NULL THEN 1 ELSE 0 END AS hit
         |      FROM tg LEFT JOIN eg ON tg.g = eg.g),
         |agg AS (
         |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
         |    CAST(SUM(hit) AS BIGINT) AS n_contaminated
         |  FROM j GROUP BY 1)
         |SELECT doc_id, n_grams, n_contaminated,
         |  CAST(n_contaminated AS DOUBLE) / n_grams AS contamination_ratio,
         |  n_contaminated > 0 AS contaminated
         |FROM agg""".stripMargin
    }

    val langRebalance: String = {
      // the mix rates all have exact binary fractional parts, so the
      // frac-threshold compare is bit-identical across engines
      val cases = MixRates.map { case (l, r) =>
        s"WHEN '$l' THEN CAST($r AS DOUBLE)"
      }.mkString(" ")
      s"""WITH d AS (
         |  SELECT lang, doc_id,
         |    CASE lang $cases ELSE CAST(1.0 AS DOUBLE) END AS rate,
         |    CAST(${Dedup.md5LongSql("'mix_' || doc_id")} AS DOUBLE)
         |      / ${(1L << 60).toDouble} AS u
         |  FROM documents),
         |c AS (
         |  SELECT lang, rate,
         |    CAST(FLOOR(rate) AS BIGINT)
         |      + CASE WHEN u < rate - FLOOR(rate) THEN 1 ELSE 0 END AS n_copies
         |  FROM d)
         |SELECT lang, MAX(rate) AS rate, COUNT(*) AS n_docs,
         |  CAST(SUM(n_copies) AS BIGINT) AS effective_docs,
         |  CAST(CAST(SUM(n_copies) AS BIGINT) AS DOUBLE) / COUNT(*) AS achieved_rate
         |FROM c GROUP BY 1""".stripMargin
    }

    val packSequences: String =
      s"""WITH d AS (
         |  SELECT doc_id,
         |    ${Dedup.md5LongSql("'shard_' || doc_id")} % 8 AS shard,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, shard, n_tokens,
         |    CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      - n_tokens AS start_tok
         |  FROM d)
         |SELECT doc_id, shard, n_tokens,
         |  CAST(FLOOR(start_tok / $PackSeqLen) AS BIGINT) AS seq_in_shard,
         |  start_tok % $PackSeqLen AS seq_offset
         |FROM c""".stripMargin

    val qualityGate: String =
      s"""WITH s AS (
         |  SELECT doc_id, lang,
         |    CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
         |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
         |      / len(string_split(text, ' ')) AS distinct_ratio,
         |    CAST(length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) AS DOUBLE)
         |      / length(text) AS punct_ratio
         |  FROM documents)
         |SELECT *,
         |  n_tokens < 20 AS too_short,
         |  distinct_ratio < 0.4 AS low_diversity,
         |  punct_ratio > 0.12 AS high_punct,
         |  NOT (n_tokens < 20) AND NOT (distinct_ratio < 0.4)
         |    AND NOT (punct_ratio > 0.12) AS keep
         |FROM s""".stripMargin

    val zorderKeys: String = {
      val terms = (0 until ZBits).map { i =>
        s"(((zx >> $i) & 1) * ${1L << (2 * i)} + ((zy >> $i) & 1) * ${1L << (2 * i + 1)})"
      }.mkString("\n         |    + ")
      s"""WITH b AS (
         |  SELECT l_orderkey, l_linenumber,
         |    CAST(l_partkey % ${1 << ZBits} AS BIGINT) AS zx,
         |    CAST(l_suppkey % ${1 << ZBits} AS BIGINT) AS zy
         |  FROM lineitem)
         |SELECT l_orderkey, l_linenumber, zx, zy,
         |  $terms AS zkey
         |FROM b
         |ORDER BY zkey, l_orderkey, l_linenumber
         |LIMIT 100""".stripMargin
    }
  }
}
