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
    * arrays: per-term DECIMAL(20,12) rounding, exact decimal accumulation.
    *
    * Deliberately the aggregate/zip_with fold, NOT an unrolled element_at
    * chain: the fold is CodegenFallback (interpreted lambda eval per
    * element) but its Catalyst tree is ~10 nodes, while a Dim-width
    * unrolled chain is ~320 nodes that get duplicated across window/agg
    * stages — measured 2-3× slower end-to-end at bench scale because
    * analysis/optimization/codegen time dwarfs the interpreted runtime on
    * vector-sized inputs. Unrolling only wins for small fixed widths with
    * large row multipliers (see the PQ encoder's 8-term chains). */
  def exactZipSum(a: Column, b: Column): Column =
    graft.functions.Native.exact_dot_decimal(a, b)

  /** The aggregate/zip_with fold [[exactZipSum]] used to be — kept (and
    * property-matched in NativeDecSpec) as the executable spec of the
    * native kernel's semantics: per-term DECIMAL(20,12) HALF_UP rounding,
    * exact DECIMAL(30,12) accumulation, double at the end. The kernel
    * removes the per-term `Double.toString`+BigDecimal-parse the casts
    * paid (55% of ANN task CPU at sf0.1, JFR-measured). */
  private[graft] def exactZipSumFold(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x.cast(DoubleType) * y.cast(DoubleType)).cast(Term)),
      lit(BigDecimal(0)).cast(Acc),
      (acc, z) => (acc + z).cast(Acc)).cast(DoubleType)

  def exactSelfSum(a: Column): Column = exactZipSum(a, a)

  def cosine(a: Column, b: Column): Column =
    exactZipSum(a, b) / sqrt(exactSelfSum(a) * exactSelfSum(b))

  /** Brute-force cosine top-k: queries = vec_id < nQueries, candidates =
    * whole corpus minus self. Baseline and ground truth for the ANN
    * variants.
    *
    * Scale shape: the corpus side is NEVER shuffled. Phase 1 scores
    * corpus × broadcast-queries with the codegen'd float kernel and keeps
    * a per-partition bounded heap of the top `margin` candidates per query
    * (map-only; output ≤ partitions × nQueries × margin rows — independent
    * of corpus size). Phase 2 ranks that tiny union down to the global
    * float top-margin, and phase 3 re-fetches just those candidates'
    * vectors via a broadcast semi-join against the scan to rescore with
    * the exact-decimal cosine the oracle mirrors. Float error is ~1e-7
    * while similarity gaps at the margin boundary are orders larger, so
    * the exact top-k is inside the float top-margin (margin = 10× k);
    * and every member of the global float top-margin is inside its own
    * partition's local top-margin, so the heap prune is lossless. */
  def bruteForceTopK(spark: SparkSession, dir: String,
                     nQueries: Int = 10, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.Native.float_cosine
    import spark.implicits._
    val e = Tables.embeddings(spark, dir)
    val q = e.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"),
        exactSelfSum(col("embedding")).as("nq"))

    val margin = math.max(10 * k, 100)

    // phase 1: map-only float scoring + per-partition top-margin heaps.
    // A qid-partitioned ranking window here would shuffle the whole corpus
    // into nQueries reducer partitions — the single-reducer-per-query
    // pattern this repo bans. The heap keeps ≤ nQueries×margin tuples of
    // three primitives per task: bounded memory at any corpus size.
    val scored = e.select(col("vec_id").as("cid"), col("embedding").as("cv"))
      .crossJoin(broadcast(q.select(col("qid"), col("qv"))))
      .where(col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"),
        float_cosine(col("qv"), col("cv")).as("approx_sim"))
    // greatest under this ordering = the WORST kept candidate (lowest sim,
    // then highest cid) — i.e. the heap head is the eviction candidate,
    // matching orderBy(approx_sim.desc, cid) semantics exactly.
    val worstAtHead: Ordering[(Double, Long)] =
      Ordering.Tuple2(implicitly[Ordering[Double]].reverse, implicitly[Ordering[Long]])
    val localTop = scored.toDF("_1", "_2", "_3").as[(Long, Long, Double)]
      .mapPartitions { it =>
        val heaps = scala.collection.mutable.LongMap
          .empty[scala.collection.mutable.PriorityQueue[(Double, Long)]]
        it.foreach { case (qid, cid, sim) =>
          val h = heaps.getOrElseUpdate(qid,
            scala.collection.mutable.PriorityQueue.empty(worstAtHead))
          if (h.size < margin) h.enqueue((sim, cid))
          else if (worstAtHead.compare((sim, cid), h.head) < 0) {
            h.dequeue(); h.enqueue((sim, cid))
          }
        }
        heaps.iterator.flatMap { case (qid, h) =>
          h.iterator.map { case (sim, cid) => (qid, cid, sim) }
        }
      }
      .toDF("qid", "cid", "approx_sim")

    // phase 2: global float top-margin over the pruned union — the window
    // input is partitions×nQueries×margin rows, never corpus-sized.
    val pruned = localTop
      .withColumn("rk0", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("approx_sim").desc, col("cid"))))
      .where(col("rk0") <= margin)
      .select(col("qid"), col("cid"))

    // phase 3: exact-decimal rescore of just the surviving candidates.
    // The candidate list is broadcast back against the scan (map-only), so
    // the expensive interpreted fold (exactZipSum/exactSelfSum) runs on
    // nQueries×margin rows — not the corpus, as the old plan did.
    e.select(col("vec_id").as("cid"), col("embedding").as("cv"))
      .join(broadcast(pruned), Seq("cid"))
      .join(broadcast(q), Seq("qid"))
      .select(col("qid"), col("cid"),
        (exactZipSum(col("qv"), col("cv"))
          / sqrt(col("nq") * exactSelfSum(col("cv")))).as("similarity"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("similarity").desc, col("cid"))))
      .where(col("rk") <= k)
  }

  /** Embedding dimension of the testdata corpus (the oracle's correlated
    * dot subqueries hardcode it too — DuckDB `range` can't take lateral
    * column parameters). */
  val Dim = 64

  /** Deterministic ±1 hyperplane components: plane j, dim i → parity of
    * md5("j_i"). Computed once in Scala and embedded as LITERALS in both
    * the Spark plan and the oracle SQL — the engines share the planes
    * without sharing a runtime hash function. */
  def planeSigns(planes: Int): IndexedSeq[IndexedSeq[Int]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until planes).map { j =>
      (0 until Dim).map { i =>
        val h = md.digest(s"${j}_$i".getBytes("UTF-8"))
        if ((h(7) & 1) == 0) 1 else -1
      }
    }
  }

  /** (vec_id, pos, x) exploded view of an embedding column — the
    * codegen-friendly shape: per-element work becomes plain projections
    * and decimal hash-aggregates instead of interpreted array folds
    * (higher-order functions are CodegenFallback; the fold form measured
    * ~4× slower on the signature pass at sf0.1). */
  private def exploded(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol), posexplode(col(vecCol)))
      .select(col(idCol), col("pos"), col("col").cast(DoubleType).as("x"))

  /** Sign-LSH bucketed near-dup pairs: signature = sign bits of the
    * hyperplane dot products, candidates share the full signature.
    * Near-dup vectors (cosine ≈ 1) agree on almost all hyperplane signs,
    * so bucketing on the signature finds them with one shuffle; the exact
    * (decimal) cosine is emitted per candidate pair (apply `minCosine` to
    * keep only true near-dups — the default emits all candidates, which
    * is the useful output when the corpus may contain none).
    *
    * The dot products behind the sign bits accumulate in exact decimals
    * (term rounding identical to the fold form: (x*s) cast per element),
    * so the signs — and therefore buckets, candidates, and similarities —
    * are bit-identical in [[oracle.nearDupLsh]]'s DuckDB mirror: the LSH
    * structure itself is oracle-checked. */
  def nearDupLsh(spark: SparkSession, dir: String,
                 planes: Int = 8, minCosine: Double = -1.0): DataFrame = {
    val e = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val signs = planeSigns(planes)
    // one codegen'd aggregate pass: 8 plane dots + the self-norm per vector
    val planeAggs = (0 until planes).map { j =>
      val signArr = array(signs(j).map(s => lit(s.toDouble)): _*)
      sum(graft.functions.Native.to_dec(col("x") * element_at(signArr, col("pos") + 1), 18, 12)).as(s"d$j")
    }
    // signatures + norms are reused by both join sides and the rescore —
    // materialize once (the "index build" of the LSH pipeline)
    val sigs = exploded(e, "vec_id", "embedding")
      .groupBy(col("vec_id"))
      .agg(planeAggs.head, (planeAggs.tail :+
        sum(graft.functions.Native.to_dec(col("x") * col("x"), 18, 12)).cast(DoubleType).as("nrm")): _*)
      .withColumn("sig",
        (0 until planes).map(j =>
          when(col(s"d$j") >= 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce((a, b) => a.bitwiseOR(b)))
      .select(col("vec_id"), col("sig"), col("nrm"))
      .persist()

    val l = sigs.select(col("sig"), col("vec_id").as("id_a"), col("nrm").as("n_a"))
    val r = sigs.select(col("sig"), col("vec_id").as("id_b"), col("nrm").as("n_b"))
    val pairs = l.join(r, Seq("sig"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("n_a"), col("n_b"))

    // candidate-pair dots: attach both arrays and evaluate the unrolled
    // exact-decimal chain as a plain projection — candidate pairs are a
    // tiny fraction of the corpus, so this is a map-only rescore with no
    // explode fan-out or extra shuffle (same per-term rounding the oracle
    // mirrors)
    pairs
      .join(e.select(col("vec_id").as("id_a"), col("embedding").as("va")), Seq("id_a"))
      .join(e.select(col("vec_id").as("id_b"), col("embedding").as("vb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (exactZipSum(col("va"), col("vb")) / sqrt(col("n_a") * col("n_b")))
          .as("similarity"))
      .where(col("similarity") >= minCosine)
  }

  /** IVF-style ANN: a deterministic coarse quantizer (the first `nlist`
    * corpus vectors act as centroids — no training dependency), inverted
    * lists built by nearest-centroid assignment, queries probing the
    * `nprobe` closest lists, exact ranking within the probed candidates.
    *
    * Every similarity on the decision path (assignment, probing, final
    * rank) is the exact-decimal cosine, so the whole IVF structure —
    * inverted lists, probe sets, candidate ranking — is reproduced
    * bit-identically by [[oracle.ivfTopK]]'s DuckDB mirror. The output
    * contract is the honest IVF one (top-k WITHIN the probed lists, the
    * recall/throughput tradeoff surfaced in the unit spec), and the
    * oracle checks that contract itself rather than assuming full recall.
    *
    * Scale shape: centroids broadcast twice (assignment, probe); the only
    * shuffle is the equi-join of query-probes to inverted lists on
    * `centroid_id`, and the per-query top-k runs on candidate sets a
    * fraction nprobe/nlist of the corpus.
    */
  /** IVF coarse quantizer: the first `nlist` corpus vectors as
    * deterministic centroids (no training dependency). */
  private def ivfCentroids(e: DataFrame, nlist: Int): DataFrame =
    e.where(col("vec_id") < nlist)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid"),
        exactSelfSum(col("embedding")).as("ncent"))

  /** Inverted-list assignment: map-only broadcast cross join (no shuffle
    * for the pairing) + exact codegen'd cosine, then argmax-by-struct —
    * row_number + filter rk=1 measured ~13x slower than the equivalent
    * max_by hash aggregation at sf0.1. Tie-break matches the oracle's
    * window: highest cosine, then lowest centroid id. first() is safe for
    * cv/nc: constant within each group. */
  private def ivfAssigned(e: DataFrame, centroids: DataFrame): DataFrame =
    e.select(col("vec_id").as("cid"), col("embedding").as("cv"),
        exactSelfSum(col("embedding")).as("nc"))
      .crossJoin(broadcast(centroids))
      .select(col("cid"), col("cv"), col("nc"), col("centroid_id"),
        (exactZipSum(col("cv"), col("centroid")) / sqrt(col("nc") * col("ncent")))
          .as("cos_c"))
      .groupBy(col("cid"))
      .agg(
        max_by(col("centroid_id"), struct(col("cos_c"), col("centroid_id") * -1))
          .as("centroid_id"),
        first(col("cv")).as("cv"), first(col("nc")).as("nc"))

  /** Probe sets: each query's `nprobe` nearest lists (window input is
    * only nQueries*nlist rows — the query-side filter prunes the scan). */
  private def ivfProbes(e: DataFrame, centroids: DataFrame,
                        nQueries: Int, nprobe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    e.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"),
        exactSelfSum(col("embedding")).as("nq"))
      .crossJoin(broadcast(centroids))
      .withColumn("cos_c",
        exactZipSum(col("qv"), col("centroid")) / sqrt(col("nq") * col("ncent")))
      .withColumn("rk_c", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos_c").desc, col("centroid_id"))))
      .where(col("rk_c") <= nprobe)
      .select(col("qid"), col("qv"), col("nq"), col("centroid_id"))
  }

  def ivfTopK(spark: SparkSession, dir: String, nQueries: Int = 10, k: Int = 10,
              nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.embeddings(spark, dir)
    val centroids = ivfCentroids(e, nlist)
    val assigned = ivfAssigned(e, centroids)
    val probes = ivfProbes(e, centroids, nQueries, nprobe)

    // exact rescore of the probed candidates, per-query top-k
    broadcast(probes).join(assigned, Seq("centroid_id"))
      .where(col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"),
        (exactZipSum(col("qv"), col("cv")) / sqrt(col("nq") * col("nc")))
          .as("similarity"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("similarity").desc, col("cid"))))
      .where(col("rk") <= k)
  }

  /** Int8 symmetric quantization profile per label — the compression pass
    * a vector store runs before ANN serving (4× smaller than float32,
    * SIMD-friendly dot products). Per vector: scale = max|x|/127, q_i =
    * round(x_i/scale); reported are the integer-domain statistics (mean
    * |q|, max |q|, saturation and zero counts), which are bit-exact across
    * engines by construction — scale and q derive from fixed IEEE double
    * ops, everything after is integer arithmetic. The double-valued
    * reconstruction-error bound (|x − q·scale| ≤ scale/2) is pinned in the
    * unit spec, not the oracle, to keep the gate ulp-proof. Map-only until
    * the final label rollup — one shuffle sized by label cardinality. */
  def quantizeStats(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // explode + window-scale + hash-aggregate instead of array lambdas:
    // transform/aggregate/filter are CodegenFallback, so the lambda forms
    // ran interpreted over every element; this pipeline is fully
    // codegen'd. The per-vector window partitions by vec_id — parallel
    // across the corpus at any scale — and the rollup shuffles once per
    // grouping level. Values are identical: same round()/cast pipeline,
    // integer arithmetic after quantization.
    val w = Window.partitionBy(col("vec_id"))
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), posexplode(col("embedding")))
      .select(col("vec_id"), col("label"), col("col").cast(DoubleType).as("x"))
      .withColumn("scale", max(abs(col("x"))).over(w) / 127.0)
      .where(col("scale") > 0)
      .withColumn("q", round(col("x") / col("scale")).cast(IntegerType))
      .groupBy(col("vec_id"), col("label"))
      .agg(
        sum(abs(col("q")).cast(LongType)).as("sum_abs_q"),
        max(abs(col("q"))).as("max_q"),
        sum(when(abs(col("q")) === 127, 1).otherwise(0)).as("n_sat"),
        sum(when(col("q") === 0, 1).otherwise(0)).as("n_zero"))
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_vecs"),
        (sum(col("sum_abs_q")).cast(DoubleType) / (count(lit(1)) * lit(Dim)))
          .as("avg_abs_q"),
        max(col("max_q")).as("max_q"),
        sum(col("n_sat")).as("n_saturated"),
        sum(col("n_zero")).as("n_zeros"))
  }

  // ---- product quantization (encode path) ----------------------------
  // M subspaces × K codes over Dim dims; codebook entries are dyadic
  // rationals n/128 with n ∈ [-32,32] from a seeded LCG — exact in IEEE
  // double and exact as SQL decimal text, so the identical codebook is
  // embedded literal-for-literal in the oracle (same pattern as the
  // MinHash permutation constants).
  val PqM = 8
  val PqK = 16
  val PqSubDim: Int = Dim / PqM

  /** Codebook integer at (subspace m, code k, dim d). */
  def pqCentInt(m: Int, k: Int, d: Int): Int = {
    val x = (m * 317L + k * 31L + d) * 2654435761L + 1013904223L
    (math.floorMod(x >> 8, 65L) - 32L).toInt
  }
  def pqCent(m: Int, k: Int, d: Int): Double = pqCentInt(m, k, d) / 128.0

  /** PQ code assignment statistics: each vector's Dim-dim embedding is
    * split into M subvectors, each assigned its nearest codebook entry by
    * squared distance; reported are (label, subspace, code) population
    * counts — the encode path of a PQ-ANN index (16× compression here),
    * and the skew check a real index needs (unbalanced codes = bad
    * recall). Distance argmin uses score = ||c||² − 2·x·c (the ||x||²
    * term is constant per subvector): the dot falls to the proven
    * exact-decimal kernel, ||c||² is an exact dyadic sum, and the final
    * counts are integers — bit-exact across engines end to end. The
    * codebook (128 rows) broadcasts; one shuffle per grouping level. */
  /** The PQ codebook as a broadcastable frame: (m, k, cvec, ||c||²). */
  private def pqCodebook(spark: SparkSession): DataFrame = {
    val centRows = for (m <- 0 until PqM; k <- 0 until PqK) yield {
      val cvec = (0 until PqSubDim).map(d => pqCent(m, k, d))
      val c2 = cvec.map(c => c * c).sum  // exact: dyadics on a 2^-14 grid
      (m, k, cvec.toArray, c2)
    }
    spark.createDataFrame(centRows.toSeq).toDF("m", "k", "cvec", "c2")
  }

  /** Per-vector PQ code assignment: (vec_id, label, m, code) — each of
    * the M subvectors mapped to its nearest codebook entry. The encode
    * path shared by [[pqCodeStats]] (population skew profile) and
    * [[ivfPqTopK]] (ADC serving). */
  def pqCodes(spark: SparkSession, dir: String): DataFrame = {
    val subs = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), col("embedding"),
        explode(array((0 until PqM).map(m => lit(m)): _*)).as("m"))
    // dot unrolled over the (fixed, small) subspace width: element_at
    // chains stay in whole-stage codegen, where an aggregate/zip_with
    // fold would run interpreted 1M+ times (vectors × codebook rows)
    val dot = (0 until PqSubDim).map { d =>
      graft.functions.Native.to_dec(
        element_at(col("embedding"), col("m") * PqSubDim + d + 1).cast(DoubleType)
          * element_at(col("cvec"), d + 1), 18, 12)
    }.reduce(_ + _).cast(DoubleType)
    subs.join(broadcast(pqCodebook(spark)), Seq("m"))
      .withColumn("score", col("c2") - lit(2.0) * dot)
      .groupBy(col("vec_id"), col("label"), col("m"))
      .agg(min_by(col("k"), struct(col("score"), col("k"))).as("code"))
  }

  def pqCodeStats(spark: SparkSession, dir: String): DataFrame =
    pqCodes(spark, dir)
      .groupBy(col("label"), col("m"), col("code"))
      .agg(count(lit(1)).as("n_vectors"))

  /** One Lloyd (k-means) refinement step over the IVF assignment — how a
    * coarse quantizer's codebook actually gets trained at corpus scale:
    * assign every vector to its nearest centroid (the proven exact-cosine
    * assignment), then emit the per-dimension member means as the updated
    * centroid matrix (centroid_id, pos, n_members, new_val).
    *
    * Scale shape: assignment is the map-only broadcast pass; the update
    * is one explode + hash aggregation keyed by (centroid, dim) — nlist×
    * Dim output rows regardless of corpus size, i.e. the classic
    * map-side-combinable centroid update. Means are exact-decimal sums
    * divided as doubles and rounded to 6 decimals (same ulp-absorption
    * contract as embNormStats). */
  def kmeansRefine(spark: SparkSession, dir: String, nlist: Int = 16): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    ivfAssigned(e, ivfCentroids(e, nlist))
      .select(col("centroid_id"), posexplode(col("cv")))
      .select(col("centroid_id"), (col("pos") + 1).as("pos"),
        col("col").cast(DoubleType).as("x"))
      .groupBy(col("centroid_id"), col("pos"))
      .agg(
        count(lit(1)).as("n_members"),
        round(sum(graft.functions.Native.to_dec(col("x"), 18, 12)).cast(DoubleType) / count(lit(1)), 6)
          .as("new_val"))
  }

  /** IVF+PQ ANN serving path — the composition a 100 TB vector index
    * actually runs: queries probe their `nprobe` nearest inverted lists,
    * and candidates in those lists are ranked by the PQ asymmetric
    * distance computation (ADC): score(q, c) = Σ_m ⟨q_m, codeword(m,
    * code_m(c))⟩, i.e. the query is compared against each candidate's
    * 8-byte PQ code through a per-query lookup table — never against the
    * raw vectors.
    *
    * Scale shape: the per-query lookup table (nQueries × M × K dot
    * products against the broadcast codebook) is tiny and broadcasts;
    * candidates flow through one equi-join on centroid_id and one on the
    * code key; the raw embedding column is never shuffled — that is the
    * entire point of PQ at scale (16× less candidate bandwidth here,
    * 100×+ at production dims). Every arithmetic step is exact decimal
    * until the final cast, so the ADC ranking itself is mirrored
    * bit-identically by [[oracle.ivfPqTopK]]. */
  def ivfPqTopK(spark: SparkSession, dir: String, nQueries: Int = 10, k: Int = 10,
                nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.embeddings(spark, dir)
    val centroids = ivfCentroids(e, nlist)
    val lists = ivfAssigned(e, centroids).select(col("cid"), col("centroid_id"))
    val probes = ivfProbes(e, centroids, nQueries, nprobe)
      .select(col("qid"), col("qv"), col("centroid_id"))

    // per-query ADC lookup table: qdot(qid, m, k) = ⟨q_m, c_{m,k}⟩ as an
    // exact DECIMAL(30,12) (kept decimal so the final Σ_m stays exact)
    val qdotTerm = (0 until PqSubDim).map { d =>
      graft.functions.Native.to_dec(
        element_at(col("qv"), col("m") * PqSubDim + (d + 1)).cast(DoubleType)
          * element_at(col("cvec"), d + 1), 18, 12)
    }.reduceLeft[org.apache.spark.sql.Column]((acc, t) => (acc + t).cast(Acc))
    val qdots = e.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_qid"), col("embedding").as("qv"))
      .crossJoin(broadcast(pqCodebook(spark)))
      .select(col("q_qid"), col("m").as("q_m"), col("k").as("q_k"),
        qdotTerm.as("qdot"))

    val codes = pqCodes(spark, dir).select(col("vec_id").as("cid"), col("m"), col("code"))

    // probes are nQueries×nprobe rows — broadcast so candidate harvesting
    // is a map-side join over the inverted lists (no corpus shuffle)
    broadcast(probes).join(lists, Seq("centroid_id"))
      .where(col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"))
      .join(codes, Seq("cid"))
      .join(broadcast(qdots),
        col("qid") === col("q_qid") && col("m") === col("q_m")
          && col("code") === col("q_k"))
      .groupBy(col("qid"), col("cid"))
      .agg(sum(col("qdot")).cast(DoubleType).as("adc_score"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("adc_score").desc, col("cid"))))
      .where(col("rk") <= k)
  }

  /** Embedding outlier profiling: distance² of each vector to its LABEL
    * CENTROID, top-20 most distant — the embedding-quality pass that
    * surfaces mislabeled or corrupted vectors before they poison a
    * similarity index or a contrastive batch.
    *
    * Scale shape: posexplode fans each vector into Dim (label, pos, x)
    * rows but they never leave their partition un-aggregated — both the
    * centroid aggregate and the per-vector distance sum are map-side
    * combined on keys that are local to a partition row ((label, pos) is
    * tiny; all Dim rows of one vec_id share a partition), so the shuffles
    * carry labels×Dim rows and one row per vector respectively. Centroids
    * broadcast back; the top-20 is a TakeOrderedAndProject. Exactness:
    * per-dim sums and per-vector squared-residual sums accumulate as
    * DECIMAL(18,12) (order-independent); the one double division
    * (centroid mean) is an identical IEEE op in both engines, and the
    * final round(…,6) absorbs the decimal→double ulp (same policy as
    * embNormStats). */
  def embOutliers(spark: SparkSession, dir: String, topN: Int = 20): DataFrame = {
    val ex = graft.Tables.embeddings(spark, dir)
      .select(col("label"), col("vec_id"), posexplode(col("embedding")))
      .select(col("label"), col("vec_id"), col("pos"),
        col("col").cast(DoubleType).as("x"))
    val cent = ex.groupBy(col("label"), col("pos"))
      .agg((sum(graft.functions.Native.to_dec(col("x"), 18, 12)).cast(DoubleType)
        / count(lit(1))).as("c"))
    ex.join(broadcast(cent), Seq("label", "pos"))
      .groupBy(col("label"), col("vec_id"))
      .agg(round(
        sum(graft.functions.Native.to_dec((col("x") - col("c")) * (col("x") - col("c")), 18, 12))
          .cast(DoubleType), 6).as("dist2"))
      .orderBy(col("dist2").desc, col("vec_id"))
      .limit(topN)
  }

  object oracle {
    /** Correlated exact-decimal dot product: DuckDB 1-based list indexing,
      * same DECIMAL(20,12) per-term rounding as the Spark side. The dim
      * range is fixed ([[Dim]]) because DuckDB's `range` table function
      * cannot take lateral column parameters like len(qv). */
    private def dot(a: String, b: String) =
      s"""(SELECT CAST(SUM(CAST(CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE) AS DECIMAL(20,12))) AS DOUBLE)
         | FROM range(1, ${Dim + 1}) t(i))""".stripMargin.replace("\n", "")

    /** Exact brute-force cosine top-k — the oracle for both the
      * brute-force query and (by recall design) the IVF variant. */
    private def exactTopK(nQueries: Int, k: Int): String =
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < $nQueries),
         |c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings),
         |p AS (
         |  SELECT qid, cid,
         |    ${dot("qv", "cv")} / sqrt(${dot("qv", "qv")} * ${dot("cv", "cv")}) AS similarity
         |  FROM c CROSS JOIN q WHERE cid <> qid)
         |SELECT qid, cid, similarity,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY similarity DESC, cid) AS INT) AS rk
         |FROM p QUALIFY rk <= $k""".stripMargin

    val bruteForceTopK: String = exactTopK(10, 10)

    /** Full DuckDB mirror of [[Similarity.ivfTopK]]: same exact-decimal
      * assignment, probe sets, and in-list ranking — checks the IVF
      * contract (top-k within probed lists) rather than assuming recall. */
    val ivfTopK: String = {
      val (nQueries, k, nlist, nprobe) = (10, 10, 16, 4)
      s"""WITH cent AS (
         |  SELECT vec_id AS centroid_id, embedding AS centroid FROM embeddings
         |  WHERE vec_id < $nlist),
         |assigned AS (
         |  SELECT centroid_id, cid, cv FROM (
         |    SELECT c.centroid_id, e.vec_id AS cid, e.embedding AS cv,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
         |        ${dot("e.embedding", "c.centroid")}
         |          / sqrt(${dot("e.embedding", "e.embedding")} * ${dot("c.centroid", "c.centroid")}) DESC,
         |        c.centroid_id) AS rk_c
         |    FROM embeddings e CROSS JOIN cent c)
         |  WHERE rk_c = 1),
         |probes AS (
         |  SELECT qid, qv, centroid_id FROM (
         |    SELECT q.vec_id AS qid, q.embedding AS qv, c.centroid_id,
         |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
         |        ${dot("q.embedding", "c.centroid")}
         |          / sqrt(${dot("q.embedding", "q.embedding")} * ${dot("c.centroid", "c.centroid")}) DESC,
         |        c.centroid_id) AS rk_c
         |    FROM embeddings q CROSS JOIN cent c WHERE q.vec_id < $nQueries)
         |  WHERE rk_c <= $nprobe)
         |SELECT qid, cid, similarity,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY similarity DESC, cid) AS INT) AS rk
         |FROM (
         |  SELECT p.qid, a.cid,
         |    ${dot("p.qv", "a.cv")}
         |      / sqrt(${dot("p.qv", "p.qv")} * ${dot("a.cv", "a.cv")}) AS similarity
         |  FROM probes p JOIN assigned a ON p.centroid_id = a.centroid_id
         |  WHERE a.cid <> p.qid)
         |QUALIFY rk <= $k""".stripMargin
    }

    /** Full DuckDB mirror of [[Similarity.nearDupLsh]]: identical literal
      * hyperplanes, exact-decimal sign bits, bucket join, and exact
      * cosine — the LSH structure itself is hash-compared. */
    val nearDupLsh: String = {
      val planes = 8
      val signs = planeSigns(planes)
      val sigExpr = (0 until planes).map { j =>
        val terms = (0 until Dim).map { i =>
          s"CAST(CAST(embedding[${i + 1}] AS DOUBLE) * ${signs(j)(i)}.0 AS DECIMAL(20,12))"
        }.mkString(" + ")
        s"(CASE WHEN ($terms) >= 0 THEN ${1L << j} ELSE 0 END)"
      }.mkString("\n         |    + ")
      s"""WITH sig AS (
         |  SELECT vec_id, embedding,
         |    $sigExpr AS sig
         |  FROM embeddings)
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  ${dot("a.embedding", "b.embedding")}
         |    / sqrt(${dot("a.embedding", "a.embedding")} * ${dot("b.embedding", "b.embedding")}) AS similarity
         |FROM sig a JOIN sig b ON a.sig = b.sig AND a.vec_id < b.vec_id""".stripMargin
    }

    /** Mirror of [[Similarity.pqCodeStats]]: the identical dyadic
      * codebook as VALUES literals, the same exact-decimal dot, the same
      * (score, k) argmin tiebreak. */
    val pqCodeStats: String = {
      val rows = (for (m <- 0 until PqM; k <- 0 until PqK; d <- 0 until PqSubDim)
        yield s"($m, $k, $d, ${pqCentInt(m, k, d)})").mkString(",\n         |  ")
      s"""WITH cent(m, k, d, n) AS (VALUES
         |  $rows),
         |c2 AS (
         |  SELECT m, k, SUM((CAST(n AS DOUBLE) / 128.0) * (CAST(n AS DOUBLE) / 128.0)) AS c2
         |  FROM cent GROUP BY 1, 2),
         |dots AS (
         |  SELECT e.vec_id, e.label, cent.m, cent.k,
         |    CAST(SUM(CAST(CAST(e.embedding[cent.m * ${PqSubDim} + cent.d + 1] AS DOUBLE)
         |      * (CAST(cent.n AS DOUBLE) / 128.0) AS DECIMAL(20,12))) AS DOUBLE) AS dot
         |  FROM embeddings e CROSS JOIN cent
         |  GROUP BY 1, 2, 3, 4),
         |scored AS (
         |  SELECT d.vec_id, d.label, d.m, d.k, c2.c2 - 2.0 * d.dot AS score
         |  FROM dots d JOIN c2 ON d.m = c2.m AND d.k = c2.k),
         |codes AS (
         |  SELECT vec_id, label, m, k AS code
         |  FROM scored
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY score, k) = 1)
         |SELECT label, m, code, COUNT(*) AS n_vectors
         |FROM codes GROUP BY 1, 2, 3""".stripMargin
    }

    /** Mirror of [[Similarity.kmeansRefine]]: identical exact-decimal
      * assignment, then per-dimension member means over the same
      * DECIMAL(20,12) term rounding. */
    val kmeansRefine: String = {
      val nlist = 16
      s"""WITH cent AS (
         |  SELECT vec_id AS centroid_id, embedding AS centroid FROM embeddings
         |  WHERE vec_id < $nlist),
         |assigned AS (
         |  SELECT centroid_id, cid, cv FROM (
         |    SELECT c.centroid_id, e.vec_id AS cid, e.embedding AS cv,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
         |        ${dot("e.embedding", "c.centroid")}
         |          / sqrt(${dot("e.embedding", "e.embedding")} * ${dot("c.centroid", "c.centroid")}) DESC,
         |        c.centroid_id) AS rk_c
         |    FROM embeddings e CROSS JOIN cent c)
         |  WHERE rk_c = 1)
         |SELECT centroid_id, CAST(i AS INT) AS pos, COUNT(*) AS n_members,
         |  round(CAST(SUM(CAST(CAST(cv[i] AS DOUBLE) AS DECIMAL(20,12))) AS DOUBLE)
         |    / COUNT(*), 6) AS new_val
         |FROM assigned CROSS JOIN range(1, ${Dim + 1}) t(i)
         |GROUP BY 1, 2""".stripMargin
    }

    /** Full mirror of [[Similarity.ivfPqTopK]]: the identical codebook
      * literals, code assignment, probe sets, and exact-decimal ADC
      * lookup sums — the approximate index's own ranking is what gets
      * hash-compared, not a recall proxy. */
    val ivfPqTopK: String = {
      val (nQueries, k, nlist, nprobe) = (10, 10, 16, 4)
      val rows = (for (m <- 0 until PqM; kk <- 0 until PqK; d <- 0 until PqSubDim)
        yield s"($m, $kk, $d, ${pqCentInt(m, kk, d)})").mkString(",\n         |  ")
      s"""WITH centpq(m, k, d, n) AS (VALUES
         |  $rows),
         |c2 AS (
         |  SELECT m, k, SUM((CAST(n AS DOUBLE) / 128.0) * (CAST(n AS DOUBLE) / 128.0)) AS c2
         |  FROM centpq GROUP BY 1, 2),
         |dots AS (
         |  SELECT e.vec_id, centpq.m, centpq.k,
         |    CAST(SUM(CAST(CAST(e.embedding[centpq.m * $PqSubDim + centpq.d + 1] AS DOUBLE)
         |      * (CAST(centpq.n AS DOUBLE) / 128.0) AS DECIMAL(20,12))) AS DOUBLE) AS dot
         |  FROM embeddings e CROSS JOIN centpq
         |  GROUP BY 1, 2, 3),
         |scored AS (
         |  SELECT d.vec_id, d.m, d.k, c2.c2 - 2.0 * d.dot AS score
         |  FROM dots d JOIN c2 ON d.m = c2.m AND d.k = c2.k),
         |codes AS (
         |  SELECT vec_id, m, k AS code FROM scored
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY score, k) = 1),
         |cent AS (
         |  SELECT vec_id AS centroid_id, embedding AS centroid FROM embeddings
         |  WHERE vec_id < $nlist),
         |assigned AS (
         |  SELECT centroid_id, cid FROM (
         |    SELECT c.centroid_id, e.vec_id AS cid,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
         |        ${dot("e.embedding", "c.centroid")}
         |          / sqrt(${dot("e.embedding", "e.embedding")} * ${dot("c.centroid", "c.centroid")}) DESC,
         |        c.centroid_id) AS rk_c
         |    FROM embeddings e CROSS JOIN cent c)
         |  WHERE rk_c = 1),
         |probes AS (
         |  SELECT qid, centroid_id FROM (
         |    SELECT q.vec_id AS qid, c.centroid_id,
         |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
         |        ${dot("q.embedding", "c.centroid")}
         |          / sqrt(${dot("q.embedding", "q.embedding")} * ${dot("c.centroid", "c.centroid")}) DESC,
         |        c.centroid_id) AS rk_c
         |    FROM embeddings q CROSS JOIN cent c WHERE q.vec_id < $nQueries)
         |  WHERE rk_c <= $nprobe),
         |qd AS (
         |  SELECT q.vec_id AS qid, centpq.m, centpq.k,
         |    CAST(SUM(CAST(CAST(q.embedding[centpq.m * $PqSubDim + centpq.d + 1] AS DOUBLE)
         |      * (CAST(centpq.n AS DOUBLE) / 128.0) AS DECIMAL(20,12))) AS DECIMAL(30,12)) AS qdot
         |  FROM embeddings q CROSS JOIN centpq
         |  WHERE q.vec_id < $nQueries
         |  GROUP BY 1, 2, 3)
         |SELECT qid, cid, adc_score,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc_score DESC, cid) AS INT) AS rk
         |FROM (
         |  SELECT p.qid, a.cid,
         |    CAST(SUM(qd.qdot) AS DOUBLE) AS adc_score
         |  FROM probes p JOIN assigned a ON p.centroid_id = a.centroid_id
         |  JOIN codes c ON c.vec_id = a.cid
         |  JOIN qd ON qd.qid = p.qid AND qd.m = c.m AND qd.k = c.code
         |  WHERE a.cid <> p.qid
         |  GROUP BY 1, 2)
         |QUALIFY rk <= $k""".stripMargin
    }

    /** Mirror of [[Similarity.quantizeStats]]: identical scale/round/cast
      * pipeline, integer statistics summed per label. */
    val quantizeStats: String =
      s"""WITH s AS (
         |  SELECT label, embedding,
         |    list_max(list_transform(embedding, v -> abs(CAST(v AS DOUBLE)))) / 127.0 AS scale
         |  FROM embeddings),
         |q AS (
         |  SELECT label,
         |    list_transform(embedding, v -> CAST(round(CAST(v AS DOUBLE) / scale) AS INT)) AS q
         |  FROM s WHERE scale > 0),
         |p AS (
         |  SELECT label,
         |    list_sum(list_transform(q, v -> CAST(abs(v) AS BIGINT))) AS sum_abs_q,
         |    list_max(list_transform(q, v -> abs(v))) AS max_q,
         |    len(list_filter(q, v -> abs(v) = 127)) AS n_sat,
         |    len(list_filter(q, v -> v = 0)) AS n_zero
         |  FROM q)
         |SELECT label, COUNT(*) AS n_vecs,
         |  CAST(SUM(sum_abs_q) AS DOUBLE) / (COUNT(*) * ${Dim}) AS avg_abs_q,
         |  CAST(MAX(max_q) AS INT) AS max_q,
         |  CAST(SUM(n_sat) AS BIGINT) AS n_saturated,
         |  CAST(SUM(n_zero) AS BIGINT) AS n_zeros
         |FROM p GROUP BY 1""".stripMargin

    /** Mirror of [[Similarity.embOutliers]]: 1-indexed list explode, the
      * same DECIMAL(18,12) exact sums, double mean division, round(,6). */
    val embOutliers: String =
      s"""WITH ex AS (
         |  SELECT label, vec_id, i AS pos, CAST(embedding[i] AS DOUBLE) AS x
         |  FROM embeddings, range(1, ${Dim + 1}) t(i)),
         |cent AS (
         |  SELECT label, pos,
         |    CAST(SUM(CAST(x AS DECIMAL(18,12))) AS DOUBLE) / COUNT(*) AS c
         |  FROM ex GROUP BY 1, 2),
         |d AS (
         |  SELECT ex.label, ex.vec_id,
         |    round(CAST(SUM(CAST((x - c) * (x - c) AS DECIMAL(18,12))) AS DOUBLE), 6) AS dist2
         |  FROM ex JOIN cent ON ex.label = cent.label AND ex.pos = cent.pos
         |  GROUP BY 1, 2)
         |SELECT label, vec_id, dist2 FROM d
         |ORDER BY dist2 DESC, vec_id LIMIT 20""".stripMargin
  }
}
