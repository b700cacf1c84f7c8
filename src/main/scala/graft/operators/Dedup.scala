package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.functions.Text

/** Document-deduplication operators for training-data pipelines:
  * exact (hash groupBy), MinHash+LSH, SimHash, and n-gram Jaccard.
  *
  * Scale design: every variant is shuffle-bounded by either the
  * fingerprint/bucket key (exact, MinHash, SimHash) or an explicit
  * candidate-pair generator (Jaccard) — never an all-pairs cross join.
  * MinHash/SimHash follow the standard distributed shape:
  * doc → signature (map-only, codegen'd expressions) → explode bands →
  * shuffle on (band, bucket-hash) → pairs within bucket. Bucket sizes are
  * bounded in practice; a production guard would drop degenerate buckets
  * above a size cap (noted inline).
  */
object Dedup {

  /** 3-word shingles of a space-tokenized text, deduplicated. Guarded for
    * texts shorter than 3 tokens (empty shingle set). Works on any input
    * column (no name dependency). */
  def shingles(toks: Column): Column =
    when(size(toks) >= 3,
      array_distinct(transform(sequence(lit(0), size(toks) - 3), i =>
        concat_ws(" ",
          element_at(toks, i + 1), element_at(toks, i + 2), element_at(toks, i + 3)))))
      .otherwise(array().cast(ArrayType(StringType)))

  private def withShingles(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
      .select(col("doc_id"), shingles(col("toks")).as("sh"), col("toks"))

  /** Distinct (doc_id, shingle) rows via posexplode + window lead — the
    * hot-path form of `shingles`: array higher-order functions are
    * interpreted (CodegenFallback) and measured ~6× slower than this
    * fully-codegen'd explode+window+concat pipeline at sf0.1. The window
    * partitions by doc_id, so it parallelizes across documents. */
  private def explodedShingles(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), posexplode(Text.tokens(col("text"))))
      .withColumnRenamed("col", "tok")
      .withColumn("t2", lead(col("tok"), 1).over(w))
      .withColumn("t3", lead(col("tok"), 2).over(w))
      .where(col("t3").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("tok"), col("t2"), col("t3")).as("s"))
      .distinct()
  }

  /** Exact dedup: group identical normalized content by md5 fingerprint and
    * keep the smallest doc_id per group (deterministic keeper). */
  def exactDedup(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(Text.fingerprint(col("text")).as("fp"))
      .agg(
        min(col("doc_id")).as("keeper_doc_id"),
        count(lit(1)).as("n_copies"))

  /** Exact n-gram Jaccard similarity over candidate pairs — here adjacent
    * doc_id pairs so the result is oracle-comparable; the LSH variants
    * below generate candidates for the general case. Jaccard via
    * |A∩B| / (|A| + |B| - |A∩B|) on distinct shingle sets. */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val sh = withShingles(spark, dir).select(col("doc_id"), col("sh"))
    val a = sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    a.join(b, col("doc_b") === col("doc_a") + 1)
      .select(
        col("doc_a"), col("doc_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).as("n_common"),
        size(col("sh_a")).as("n_a"),
        size(col("sh_b")).as("n_b"))
      .withColumn("jaccard",
        when(col("n_a") + col("n_b") - col("n_common") > 0,
          col("n_common").cast(DoubleType) / (col("n_a") + col("n_b") - col("n_common")))
          .otherwise(lit(null).cast(DoubleType)))
  }

  /** MinHash signatures + banded LSH candidate pairs.
    *
    * k hash functions are xxhash64 with per-function salts; the signature
    * is min over shingles per function (all codegen'd array expressions —
    * map-only). Bands of r rows each hash to a bucket; docs sharing any
    * (band, bucket) are candidates; the estimated Jaccard is the fraction
    * of matching signature components. One shuffle on the bucket key, one
    * self-join within buckets. At 100 TB add a bucket-size cap before the
    * join to bound skew (degenerate buckets = boilerplate dups anyway).
    */
  def minHashLsh(spark: SparkSession, dir: String,
                 k: Int = 32, bands: Int = 8, threshold: Double = 0.5): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val r = k / bands
    // Signature via explode + hash-aggregate rather than array lambdas:
    // higher-order functions (transform/aggregate) are CodegenFallback in
    // Spark — 32 interpreted passes per doc — while explode + 32 min()
    // aggregates stay fully inside whole-stage codegen. Each shingle is
    // string-hashed ONCE; the k permutations rehash the 8-byte base hash
    // (cheap, and overflow-free under Spark 4's ANSI arithmetic, unlike a
    // multiply-mix).
    val sigCols = (0 until k).map { j => min(xxhash64(lit(j), col("h"))).as(s"h$j") }
    val sigs = explodedShingles(spark, dir)
      .withColumn("h", xxhash64(col("s")))
      .groupBy(col("doc_id"))
      .agg(sigCols.head, sigCols.tail: _*)
      .withColumn("sig", array((0 until k).map(j => col(s"h$j")): _*))
      .select(col("doc_id"), col("sig"))

    val banded = sigs.select(
      col("doc_id"), col("sig"),
      posexplode(array((0 until bands).map(b =>
        hash(slice(col("sig"), b * r + 1, r))): _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")

    val l = banded.select(col("band"), col("bucket"), col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val rgt = banded.select(col("band"), col("bucket"), col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    l.join(rgt, Seq("band", "bucket"))
      .where(col("doc_a") < col("doc_b"))
      .withColumn("jaccard_est",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
          .cast(DoubleType) / k)
      .where(col("jaccard_est") >= threshold)
      // dedup multi-band collisions on the small projection, not the sigs
      .select(col("doc_a"), col("doc_b"), col("jaccard_est"))
      .distinct()
  }

  /** 64-bit SimHash near-dup detection.
    *
    * Each token contributes ±1 to each of 64 bit positions according to
    * its xxhash64 bits; the signature takes the sign of each accumulated
    * position. Candidates come from equality on 4×16-bit chunks (any two
    * signatures within Hamming distance 3 share at least one chunk —
    * pigeonhole), then are filtered by exact Hamming distance. Shuffle is
    * on the (chunk index, chunk value) key.
    */
  def simHash(spark: SparkSession, dir: String, maxHamming: Int = 3): DataFrame = {
    // Signature via explode + hash-aggregate: one xxhash64 per distinct
    // token, then 64 codegen'd conditional sums per doc (array
    // higher-order filters are interpreted — measured slower). The only
    // other shuffle is the candidate-bucket join.
    val bits = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(array_distinct(Text.tokens(col("text")))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { j =>
      sum(when(col("h").bitwiseAND(lit(1L << j)) =!= 0, 1).otherwise(-1)).as(s"b$j")
    }
    val sig = bits.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
      .withColumn("simhash",
        (0 until 64).map(j =>
          when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce((a, b) => a.bitwiseOR(b)))
      .select(col("doc_id"), col("simhash"))

    // 4 chunks of 16 bits → candidate buckets
    val chunks = sig.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(c =>
        shiftrightunsigned(col("simhash"), c * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "ckey")

    val l = chunks.select(col("chunk"), col("ckey"), col("doc_id").as("doc_a"), col("simhash").as("sh_a"))
    val rgt = chunks.select(col("chunk"), col("ckey"), col("doc_id").as("doc_b"), col("simhash").as("sh_b"))
    l.join(rgt, Seq("chunk", "ckey"))
      .where(col("doc_a") < col("doc_b"))
      .withColumn("hamming", expr("bit_count(sh_a ^ sh_b)"))
      .where(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .distinct()
  }

  object oracle {
    val exactDedup: String =
      s"""SELECT md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp,
         |  min(doc_id) AS keeper_doc_id, COUNT(*) AS n_copies
         |FROM documents GROUP BY 1""".stripMargin

    val ngramJaccard: String =
      s"""WITH sh AS (
         |  SELECT doc_id,
         |    CASE WHEN len(string_split(text, ' ')) >= 3 THEN
         |      list_distinct(list_transform(range(1, len(string_split(text, ' ')) - 1),
         |        i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] || ' ' || string_split(text, ' ')[i+2]))
         |    ELSE CAST([] AS VARCHAR[]) END AS s
         |  FROM documents)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(len(list_intersect(a.s, b.s)) AS INT) AS n_common,
         |  CAST(len(a.s) AS INT) AS n_a,
         |  CAST(len(b.s) AS INT) AS n_b,
         |  CASE WHEN len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) > 0
         |       THEN CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
         |            / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
         |       ELSE NULL END AS jaccard
         |FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1""".stripMargin
  }
}
