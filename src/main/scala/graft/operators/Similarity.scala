package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Similarity search over the `embeddings` table (`Array[Float]` column).
  *
  * Numeric policy: float dot products are accumulation-order sensitive, so
  * each elementwise product is cast to DECIMAL(20,12) and summed exactly;
  * the cosine is then fixed IEEE double arithmetic over exact inputs —
  * bit-reproducible against the DuckDB oracle (same per-element rounding,
  * same final expression). Overhead vs a float fold is irrelevant next to
  * the shuffle/scan cost, and at scale the exactness also makes reruns and
  * AQE re-plans produce identical rankings.
  *
  * Scale design: brute force broadcasts the (small) query set against the
  * corpus — map-only, no shuffle, embarrassingly parallel; the per-query
  * top-k uses a partition-local rank after an aggregated-size window input.
  * The LSH variant buckets by hyperplane sign signature so candidate
  * generation is a bucket-key shuffle instead of a cross join (the IVF
  * shape with hash-derived planes instead of trained centroids — no
  * training dependency).
  */
object Similarity {

  // Acc re-cast each step: Spark shrinks scale on decimal-add overflow
  // ((38,12)+(20,12) → (38,11)), which would break the fold's type
  // contract. (30,12) + explicit cast keeps the type fixed and is lossless
  // here (|terms| ≤ 1, ≤ a few thousand dims).
  private val Acc  = DecimalType(30, 12)
  private val Term = DecimalType(20, 12)

  /** Exact (order-independent) sum of elementwise products of two float
    * arrays: per-term DECIMAL(20,12) rounding, exact decimal accumulation. */
  private def exactZipSum(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x.cast(DoubleType) * y.cast(DoubleType)).cast(Term)),
      lit(BigDecimal(0)).cast(Acc),
      (acc, z) => (acc + z).cast(Acc)).cast(DoubleType)

  private def exactSelfSum(a: Column): Column = exactZipSum(a, a)

  def cosine(a: Column, b: Column): Column =
    exactZipSum(a, b) / sqrt(exactSelfSum(a) * exactSelfSum(b))

  /** Brute-force cosine top-k: queries = vec_id < nQueries, candidates =
    * whole corpus minus self. Baseline and ground truth for the ANN
    * variants. */
  def bruteForceTopK(spark: SparkSession, dir: String,
                     nQueries: Int = 10, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.Native.float_cosine
    val e = Tables.embeddings(spark, dir)
    // norms once per side (exactSelfSum is an interpreted fold — doing it
    // per pair would triple the dominant cost); the final cosine keeps the
    // exact dot/sqrt(nq*nc) expression shape the oracle mirrors.
    val q = e.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"),
        exactSelfSum(col("embedding")).as("nq"))
    val c = e.select(col("vec_id").as("cid"), col("embedding").as("cv"),
      exactSelfSum(col("embedding")).as("nc"))

    // two-phase rank: the codegen'd float kernel prunes to a generous
    // candidate margin per query, then only those are rescored with the
    // exact-decimal cosine the oracle mirrors. Float error is ~1e-7 while
    // similarity gaps at the margin boundary are orders larger, so the
    // exact top-k is inside the float top-margin; the margin is 10× k to
    // keep that comfortably true (cross-checked against the single-phase
    // form in SimilaritySpec/ProbePerf when touched).
    val margin = math.max(10 * k, 100)
    val candidates = c.crossJoin(broadcast(q))
      .where(col("cid") =!= col("qid"))
      .withColumn("approx_sim", float_cosine(col("qv"), col("cv")))
      .withColumn("rk0", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("approx_sim").desc, col("cid"))))
      .where(col("rk0") <= margin)

    candidates
      .select(col("qid"), col("cid"),
        (exactZipSum(col("qv"), col("cv")) / sqrt(col("nq") * col("nc"))).as("similarity"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("similarity").desc, col("cid"))))
      .where(col("rk") <= k)
  }

  /** Sign-LSH bucketed candidate pairs: pseudo-random hyperplanes
    * (components derived from xxhash64(plane, dim) — deterministic, no RNG
    * state), signature = sign bits, candidates share the full signature.
    * Near-dup vectors (cosine ≈ 1) agree on almost all hyperplane signs,
    * so bucketing on the signature finds them with one shuffle; exact
    * cosine is emitted per candidate pair (apply `minCosine` to keep only
    * true near-dups — the default emits all candidates, which is the
    * useful output when the corpus may contain none). */
  def nearDupLsh(spark: SparkSession, dir: String,
                 planes: Int = 8, minCosine: Double = -1.0): DataFrame = {
    val e = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    // hash-derived ±1 plane components: plane j, dim i → sign(xxhash64(j, i))
    val sigBits = (0 until planes).map { j =>
      val dot = aggregate(
        expr(s"transform(embedding, (x, i) -> CASE WHEN xxhash64($j, i) % 2 = 0 THEN CAST(x AS DOUBLE) ELSE -CAST(x AS DOUBLE) END)"),
        lit(0.0), (acc, x) => acc + x)
      when(dot >= 0, lit(1L << j)).otherwise(lit(0L))
    }
    val sigs = e.withColumn("sig", sigBits.reduce((a, b) => a.bitwiseOR(b)))

    // no oracle on this op → score candidates with the codegen'd native
    // kernel (the exact-decimal fold is reserved for oracle-compared paths)
    import graft.functions.Native.float_cosine
    val l = sigs.select(col("sig"), col("vec_id").as("id_a"), col("embedding").as("v_a"))
    val r = sigs.select(col("sig"), col("vec_id").as("id_b"), col("embedding").as("v_b"))
    l.join(r, Seq("sig"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        float_cosine(col("v_a"), col("v_b")).as("similarity"))
      .where(col("similarity") >= minCosine)
  }

  /** IVF-style ANN: a deterministic coarse quantizer (the first `nlist`
    * corpus vectors act as centroids — no training dependency), inverted
    * lists built by nearest-centroid assignment, queries probing the
    * `nprobe` closest lists. Scoring uses the codegen'd
    * [[graft.functions.Native.FloatCosine]] kernel — the throughput path;
    * exactness of ranking within probed lists matches brute force, recall
    * is bounded by the probe coverage (measured in the unit spec).
    *
    * Scale shape: centroids broadcast twice (assignment, probe); the only
    * shuffle is the equi-join of query-probes to inverted lists on
    * `centroid_id`, and the per-query top-k runs on candidate sets a
    * fraction nprobe/nlist of the corpus.
    */
  def ivfTopK(spark: SparkSession, dir: String, nQueries: Int = 10, k: Int = 10,
              nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.Native.float_cosine
    val e = Tables.embeddings(spark, dir)
    val centroids = e.where(col("vec_id") < nlist)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid"))

    // inverted lists: each vector assigned to its nearest centroid
    val assigned = e.crossJoin(broadcast(centroids))
      .withColumn("cos_c", float_cosine(col("embedding"), col("centroid")))
      .withColumn("rk_c", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("cos_c").desc, col("centroid_id"))))
      .where(col("rk_c") === 1)
      .select(col("centroid_id"), col("vec_id").as("cid"), col("embedding").as("cv"))

    // each query probes its nprobe nearest lists
    val probes = e.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      .crossJoin(broadcast(centroids))
      .withColumn("cos_c", float_cosine(col("qv"), col("centroid")))
      .withColumn("rk_c", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos_c").desc, col("centroid_id"))))
      .where(col("rk_c") <= nprobe)
      .select(col("qid"), col("qv"), col("centroid_id"))

    probes.join(assigned, Seq("centroid_id"))
      .where(col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"), float_cosine(col("qv"), col("cv")).as("similarity"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("similarity").desc, col("cid"))))
      .where(col("rk") <= k)
  }

  object oracle {
    /** Correlated exact-decimal dot product: DuckDB 1-based list indexing,
      * same DECIMAL(20,12) per-term rounding as the Spark side. The dim
      * range is fixed (64) because DuckDB's `range` table function cannot
      * take lateral column parameters like len(qv). */
    private def dot(a: String, b: String) =
      s"""(SELECT CAST(SUM(CAST(CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE) AS DECIMAL(20,12))) AS DOUBLE)
         | FROM range(1, 65) t(i))""".stripMargin.replace("\n", "")

    val bruteForceTopK: String =
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 10),
         |c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings),
         |p AS (
         |  SELECT qid, cid,
         |    ${dot("qv", "cv")} / sqrt(${dot("qv", "qv")} * ${dot("cv", "cv")}) AS similarity
         |  FROM c CROSS JOIN q WHERE cid <> qid)
         |SELECT qid, cid, similarity,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY similarity DESC, cid) AS INT) AS rk
         |FROM p QUALIFY rk <= 10""".stripMargin
  }
}
