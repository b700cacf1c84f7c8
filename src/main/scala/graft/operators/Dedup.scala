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
  * shuffle on (band, bucket-hash) → pairs within bucket. Degenerate
  * (boilerplate-flooded) buckets are droppable via the optional
  * `maxBucket` guard ([[capBuckets]]) — off by default so the DuckDB
  * oracles stay literal mirrors.
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

  /** (doc_id, shingle) rows via the native [[graft.functions.Native.ShingleGenerate]]
    * generator — map-only, shingles never leave their input row's
    * partition. (Two prior formulations were measured slower: array
    * higher-order functions are interpreted ~6× slower, and the
    * posexplode + window-lead pipeline, while codegen'd, SHUFFLES the
    * corpus × tokens rows just to line up neighbors the generator reads
    * locally.) Duplicate shingles are NOT removed here: the only consumer
    * aggregates with MIN, for which multiset and set agree, so the dedup
    * shuffle would be pure cost — the downstream per-doc aggregate's
    * map-side partial collapses each doc before anything moves. */
  private def explodedShinglesOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      graft.functions.Native.shingle_rows(col("text"), 3).as("s"))

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

  /** Asymmetric n-gram containment over candidate pairs: C(A→B) =
    * |S(A)∩S(B)| / |S(A)| — the measure that catches PARTIAL copies
    * (quotation, boilerplate wrapping, excerpt reuse) which symmetric
    * Jaccard under-scores when the containing document is much larger.
    * The standard complement to [[ngramJaccard]] in a dedup stack
    * (Broder's containment, the basis of "mostly-contained" dedup rules).
    * Candidates are adjacent doc_ids for oracle comparability; production
    * pairs come from the MinHash/SimHash bucket joins above. Map-only
    * over the pair set, same plan shape as [[ngramJaccard]]. */
  def ngramContainment(spark: SparkSession, dir: String): DataFrame = {
    val sh = withShingles(spark, dir).select(col("doc_id"), col("sh"))
    val a = sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    a.join(b, col("doc_b") === col("doc_a") + 1)
      .select(
        col("doc_a"), col("doc_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).as("n_common"),
        size(col("sh_a")).as("n_a"),
        size(col("sh_b")).as("n_b"))
      .withColumn("contain_ab",
        when(col("n_a") > 0, col("n_common").cast(DoubleType) / col("n_a"))
          .otherwise(lit(null).cast(DoubleType)))
      .withColumn("contain_ba",
        when(col("n_b") > 0, col("n_common").cast(DoubleType) / col("n_b"))
          .otherwise(lit(null).cast(DoubleType)))
  }

  /** Engine-portable base hash: top 60 bits of md5 as a non-negative
    * BIGINT. md5 is the one hash both Spark and DuckDB implement
    * identically, so every LSH pipeline built on it can be mirrored
    * verbatim in oracle SQL — the sketch structure itself gets
    * hash-compared, not just a downstream exact filter. */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** SQL mirror of [[md5Long]] (DuckDB hex-literal cast). */
  def md5LongSql(x: String): String =
    s"CAST(('0x' || substr(md5($x), 1, 15)) AS BIGINT)"

  /** Mersenne-prime modulus for the MinHash permutation family. The base
    * hash is reduced mod P once, then permuted as (a_j*h + b_j) mod P —
    * a_j*(P-1) < 2^62 keeps Spark-4 ANSI arithmetic overflow-free. */
  val MinHashP: Long = 2147483647L

  /** Deterministic permutation coefficients (seeded; shared literal-for-
    * literal with the oracle SQL generator). */
  def minHashCoeffs(k: Int): IndexedSeq[(Long, Long)] = {
    val rng = new scala.util.Random(42)
    (0 until k).map { _ =>
      (1L + rng.nextInt((MinHashP - 1).toInt).toLong,
        rng.nextInt(MinHashP.toInt).toLong)
    }
  }

  /** MinHash signatures + banded LSH candidate pairs.
    *
    * k permutations of the md5-derived base hash; the signature is min
    * over shingles per permutation. Bands of r rows each form a bucket
    * key; docs sharing any (band, bucket) are candidates; the estimated
    * Jaccard is the fraction of matching signature components. One
    * shuffle on the bucket key, one self-join within buckets. At 100 TB
    * enable the `maxBucket` guard on [[minHashLshOn]] to bound skew
    * (degenerate buckets = boilerplate dups anyway).
    *
    * Signature via explode + hash-aggregate rather than array lambdas:
    * higher-order functions (transform/aggregate) are CodegenFallback in
    * Spark — 32 interpreted passes per doc — while explode + 32 min()
    * aggregates stay fully inside whole-stage codegen. Each shingle is
    * md5-hashed ONCE; the k permutations are two multiplies on the base
    * hash. The whole pipeline (hashes, buckets, estimates) is mirrored
    * in [[oracle.minHashLsh]], so the LSH output itself is hash-compared
    * against DuckDB — no empirical-recall caveat.
    */
  def minHashLsh(spark: SparkSession, dir: String,
                 k: Int = 32, bands: Int = 16, threshold: Double = 0.5): DataFrame =
    minHashLshOn(Tables.documents(spark, dir), k, bands, threshold)

  /** [[minHashLsh]] over an arbitrary (doc_id, text) frame.
    *
    * `maxBucket` is the degenerate-bucket guard: a (band, bucket) shared
    * by B docs emits B² candidate pairs, so one boilerplate flood (every
    * page sharing a template footer) turns the bucket join quadratic on a
    * single key — the classic LSH skew failure at corpus scale. With the
    * cap on, buckets holding more than `maxBucket` docs are dropped before
    * the self-join (one extra count-aggregate on the SAME key the join
    * shuffles on). Dropping is sound for dedup: members of a flooded
    * bucket are near-identical boilerplate that exact/fingerprint dedup
    * already collapses, and genuinely-similar pairs still meet in their
    * other (un-flooded) bands. Default off so the oracle mirror stays
    * literal. */
  def minHashLshOn(docs: DataFrame,
                   k: Int = 32, bands: Int = 16, threshold: Double = 0.5,
                   maxBucket: Option[Int] = None): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val r = k / bands
    val coeffs = minHashCoeffs(k)
    val sigCols = coeffs.zipWithIndex.map { case ((a, b), j) =>
      min((lit(a) * col("h") + lit(b)) % MinHashP).as(s"h$j")
    }
    val sigs = explodedShinglesOf(docs)
      .withColumn("h", md5Long(col("s")) % MinHashP)
      .groupBy(col("doc_id"))
      .agg(sigCols.head, sigCols.tail: _*)
      .withColumn("sig", array((0 until k).map(j => col(s"h$j")): _*))

    // band key = the r signature components joined as a string: plain
    // equality, no second-level hash needed (and trivially SQL-portable)
    val banded0 = sigs.select(
      col("doc_id"), col("sig"),
      posexplode(array((0 until bands).map(b =>
        concat_ws("_", (0 until r).map(i => col(s"h${b * r + i}")): _*)): _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")

    val banded = capBuckets(banded0, Seq("band", "bucket"), maxBucket)

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

  /** Degenerate-bucket guard shared by the LSH variants: drop every
    * bucket whose membership exceeds `cap`. One count-aggregate on the
    * exact key the candidate join shuffles on (so AQE can reuse the
    * exchange), then a semi-join filter — no new shuffle key, no skew of
    * its own. `None` disables the guard (the oracle-checked default). */
  private def capBuckets(banded: DataFrame, keys: Seq[String],
                         maxBucket: Option[Int]): DataFrame =
    maxBucket match {
      case None => banded
      case Some(cap) =>
        val keyCols = keys.map(col)
        val small = banded.groupBy(keyCols: _*)
          .agg(count(lit(1)).as("bucket_n"))
          .where(col("bucket_n") <= cap)
          .select(keyCols: _*)
        banded.join(small, keys)
    }

  /** 60-bit SimHash near-dup detection.
    *
    * Each distinct token contributes ±1 to each of 60 bit positions
    * according to its md5-derived hash bits; the signature takes the sign
    * of each accumulated position. Candidates come from equality on
    * 4×15-bit chunks (any two signatures within Hamming distance 3 share
    * at least one chunk — pigeonhole), then are filtered by exact Hamming
    * distance. Shuffle is on the (chunk index, chunk value) key. The hash
    * is md5-derived ([[md5Long]]) so [[oracle.simHash]] reproduces the
    * identical signatures/buckets/distances in DuckDB.
    */
  def simHash(spark: SparkSession, dir: String, maxHamming: Int = 3): DataFrame =
    simHashOn(Tables.documents(spark, dir), maxHamming)

  /** [[simHash]] over an arbitrary (doc_id, text) frame. `maxBucket` is
    * the same degenerate-bucket guard as [[minHashLshOn]] (see there):
    * chunk buckets flooded by template boilerplate would otherwise emit
    * B² candidate pairs. */
  def simHashOn(docs: DataFrame, maxHamming: Int = 3,
                maxBucket: Option[Int] = None): DataFrame = {
    // Signature via explode + hash-aggregate: one md5 per distinct
    // token, then 60 codegen'd conditional sums per doc (array
    // higher-order filters are interpreted — measured slower). The only
    // other shuffle is the candidate-bucket join.
    val bits = docs
      .select(col("doc_id"), explode(array_distinct(Text.tokens(col("text")))).as("tok"))
      .withColumn("h", md5Long(col("tok")))
    val bitSums = (0 until 60).map { j =>
      sum(when(col("h").bitwiseAND(lit(1L << j)) =!= 0, 1).otherwise(-1)).as(s"b$j")
    }
    val sig = bits.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
      .withColumn("simhash",
        (0 until 60).map(j =>
          when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce((a, b) => a.bitwiseOR(b)))
      .select(col("doc_id"), col("simhash"))

    // 4 chunks of 15 bits → candidate buckets
    val chunks0 = sig.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(c =>
        shiftrightunsigned(col("simhash"), c * 15).bitwiseAND(lit(0x7FFFL))): _*)))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "ckey")
    val chunks = capBuckets(chunks0, Seq("chunk", "ckey"), maxBucket)

    val l = chunks.select(col("chunk"), col("ckey"), col("doc_id").as("doc_a"), col("simhash").as("sh_a"))
    val rgt = chunks.select(col("chunk"), col("ckey"), col("doc_id").as("doc_b"), col("simhash").as("sh_b"))
    l.join(rgt, Seq("chunk", "ckey"))
      .where(col("doc_a") < col("doc_b"))
      .withColumn("hamming", expr("bit_count(sh_a ^ sh_b)"))
      .where(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .distinct()
  }

  /** Duplicate-cluster resolution: connected components over the MinHash
    * LSH candidate pairs, labeling every document with the minimum doc_id
    * reachable through near-dup edges (singletons label themselves). This
    * is the step that turns pairwise candidates into keep/drop decisions
    * when dups chain (A≈B, B≈C ⇒ one cluster {A,B,C} even if A and C
    * never collide in a band).
    *
    * Scale design: min-label propagation — each round is one shuffle-join
    * of the (symmetric) edge list against current labels plus a grouped
    * min, i.e. fully distributed with no driver-side data. Rounds needed
    * = graph diameter; near-dup clusters are shallow (dozens of docs, not
    * millions), so convergence is 2–4 rounds in practice and `maxIter`
    * guards the pathological case. Each generation is persisted and the
    * lineage truncated (localCheckpoint) so plans don't grow with
    * iteration count. For adversarial deep graphs the alternating
    * large-star/small-star contraction (O(log n) rounds) is the drop-in
    * upgrade; the per-round shuffle structure is identical.
    */
  def dedupComponents(spark: SparkSession, dir: String, maxIter: Int = 20): DataFrame =
    componentsOf(
      Tables.documents(spark, dir).select(col("doc_id")),
      minHashLsh(spark, dir).select(col("doc_a"), col("doc_b")),
      maxIter)

  /** Bucket cap used by the skew-guarded components query (and its oracle
    * mirror — the cap must be shared literal-for-literal). */
  val ComponentsCap = 8

  /** [[dedupComponents]] over the CAPPED candidate pairs — the
    * configuration a 100 TB run actually uses: buckets flooded past
    * `cap` members (template boilerplate) are dropped before the
    * quadratic self-join, so no reducer ever sees a B² pair blow-up, at
    * the documented recall cost on the flooded (near-identical) docs.
    * The DuckDB oracle mirrors the cap with a window count over the same
    * band keys, so the recall trade-off itself is hash-verified — the
    * cap's effect on components is pinned, not guessed. */
  def dedupComponentsCapped(spark: SparkSession, dir: String,
                            cap: Int = ComponentsCap, maxIter: Int = 20): DataFrame =
    componentsOf(
      Tables.documents(spark, dir).select(col("doc_id")),
      minHashLshOn(Tables.documents(spark, dir), maxBucket = Some(cap))
        .select(col("doc_a"), col("doc_b")),
      maxIter)

  /** Connected components of `pairs` over `nodes` (column 1 of each frame
    * is the id); returns (doc_id, component = min reachable id).
    *
    * Propagation runs only over nodes incident to an edge — singletons
    * can never change label, and in a near-dup graph the edge-node set is
    * orders of magnitude smaller than the corpus, so every per-round join
    * is sized by the duplicate population, not the corpus. The full node
    * set rejoins once at the end. */
  /** Frees the RDD-level cache behind a localCheckpoint'ed frame (or any
    * frame derived from one): checkpoint blocks live on the RDD, outside
    * the CacheManager, so `Dataset.unpersist` never touches them. */
  private def unpersistCheckpointed(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  def componentsOf(nodes: DataFrame, pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val edges = pairs.toDF("src", "dst")
      .union(pairs.toDF("dst", "src").select(col("src"), col("dst")))
      .persist()
    var labels = edges.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
      .localCheckpoint(eager = true)
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      val nbrMin = edges
        .join(labels, edges("dst") === labels("node"))
        .groupBy(col("src")).agg(min(col("label")).as("nbr_label"))
      // neighbor-min step, then one pointer-doubling (path compression)
      // step: each node also adopts its label's label. Compression halves
      // the remaining propagation distance every round, so convergence is
      // O(log diameter) instead of O(diameter) — the property that keeps
      // adversarially deep dup-chains from needing maxIter rounds at
      // 100 TB. Labels are always ids of edge-incident nodes (min over
      // neighbors' labels, seeded with self), so the self-join below
      // always finds its target row.
      // The changed flag rides inside the checkpointed frame, so the
      // convergence probe is a scan of cached blocks — no per-round
      // compare-join against the previous generation.
      // Materialize the neighbor-min result ONCE before the compression
      // self-join: `stepped` is referenced twice below (as both sides of
      // the pointer lookup), and without a checkpoint each reference
      // re-executes the edges⋈labels join + grouped min — doubling the
      // per-round shuffle cost for zero benefit.
      val stepped = labels.as("l")
        .join(nbrMin, col("l.node") === nbrMin("src"), "left")
        .select(col("l.node").as("node"),
          least(col("l.label"), coalesce(col("nbr_label"), col("l.label"))).as("label"))
        .localCheckpoint(eager = true)
      val next = stepped.as("a")
        .join(stepped.select(col("node").as("p_node"), col("label").as("p_label")).as("p"),
          col("a.label") === col("p_node"), "left")
        .join(labels.select(col("node").as("o_node"), col("label").as("o_label")).as("o"),
          col("a.node") === col("o_node"))
        .select(col("a.node").as("node"),
          least(col("a.label"), coalesce(col("p_label"), col("a.label"))).as("label"),
          (least(col("a.label"), coalesce(col("p_label"), col("a.label")))
            < col("o_label")).as("chg"))
        .localCheckpoint(eager = true)
      converged = next.where(col("chg")).isEmpty
      // drop the superseded generation's cached blocks — without this a
      // long-running session (Verify runs 78 queries in one JVM)
      // accumulates one orphaned RDD cache per round. localCheckpoint
      // persists at the RDD layer, so Dataset.unpersist (CacheManager)
      // would be a no-op; free the underlying checkpointed RDD instead.
      unpersistCheckpointed(labels)
      unpersistCheckpointed(stepped)
      labels = next.select(col("node"), col("label"))
      it += 1
    }
    edges.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"componentsOf did not converge within $maxIter rounds; " +
          "component labels would be partially propagated. Raise maxIter " +
          "or switch to large-star/small-star contraction for deep graphs.")
    nodes.toDF("doc_id")
      .join(labels, col("doc_id") === col("node"), "left")
      .select(col("doc_id"),
        coalesce(col("label"), col("doc_id")).as("component"))
  }

  /** Connected components via alternating large-star / small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC'14) — the adversarial-depth fallback to
    * [[componentsOf]]'s min-label propagation: converges in O(log².n)
    * rounds (O(log n) in practice) REGARDLESS of graph diameter, where
    * label propagation's pointer-doubling needs O(log diameter) rounds
    * over the full edge set each time.
    *
    * Per round, two passes, each one groupBy-shuffle over the current
    * edge set plus a join back — the same shuffle structure as a
    * propagation round, but the edge set itself contracts toward stars:
    * - large-star: every node u links its LARGER neighbors to
    *   m(u) = min(N(u) ∪ u) — long tails fold onto local minima;
    * - small-star: every node u links its smaller-or-equal neighbors and
    *   itself to m(u) — stars flatten so the next large-star sees them.
    * Terminates when a round leaves the edge set unchanged (checked with
    * one checksum aggregate per round, not a full diff); at fixpoint the
    * edges are exactly (member → component-min) pointers.
    *
    * Same contract as [[componentsOf]]: returns (doc_id, component = min
    * reachable id) over `nodes`, singletons labeling themselves. */
  def starComponents(nodes: DataFrame, pairs: DataFrame, maxIter: Int = 30): DataFrame = {
    // self-loops contribute nothing; normalize to src != dst
    var edges = pairs.toDF("src", "dst").where(col("src") =!= col("dst"))
      .localCheckpoint(eager = true)

    def minOver(e: DataFrame): DataFrame =
      e.groupBy(col("src")).agg(min(col("dst")).as("mn"))
        .select(col("src"), least(col("src"), col("mn")).as("m"))

    // large-star: for each u over the SYMMETRIZED neighborhood, attach
    // strictly-larger neighbors to m(u). Keeping only v > u edges makes
    // every emitted edge point downward, so the edge set cannot grow.
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      sym.join(minOver(sym), "src")
        .where(col("dst") > col("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .distinct()
    }

    // small-star: orient edges downward (u > v), attach each u's
    // smaller-or-equal neighborhood and u itself to its minimum.
    def smallStar(e: DataFrame): DataFrame = {
      val oriented = e
        .select(greatest(col("src"), col("dst")).as("src"),
          least(col("src"), col("dst")).as("dst"))
      val withMin = oriented.join(minOver(oriented), "src")
      withMin.select(col("dst").as("src"), col("m").as("dst"))
        .union(withMin.select(col("src"), col("m").as("dst")))
        .where(col("src") =!= col("dst"))
        .distinct()
    }

    // order/multiplicity-insensitive fingerprint of the edge set: count +
    // sum of a per-edge hash over the distinct set. One tiny aggregate
    // per round — no edge-set diff join.
    def checksum(e: DataFrame): (Long, BigDecimal) = {
      // sum as decimal(38,0): ANSI long-sum would overflow on ~2^32 hashes
      val r = e.agg(
        count(lit(1)).as("n"),
        coalesce(sum(xxhash64(col("src"), col("dst")).cast(DecimalType(38, 0))),
          lit(0).cast(DecimalType(38, 0))).as("h")).first()
      (r.getLong(0), BigDecimal(r.getDecimal(1)))
    }

    var fp = checksum(edges)
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      val nextEdges = smallStar(largeStar(edges)).localCheckpoint(eager = true)
      val nfp = checksum(nextEdges)
      converged = nfp == fp
      fp = nfp
      unpersistCheckpointed(edges)
      edges = nextEdges
      it += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"starComponents did not converge within $maxIter rounds")

    // fixpoint edges are (member -> min) star pointers
    nodes.toDF("doc_id")
      .join(edges.select(col("src").as("doc_id"), col("dst").as("component")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("component"), col("doc_id")).as("component"))
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

    val ngramContainment: String =
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
         |  CASE WHEN len(a.s) > 0
         |       THEN CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(a.s)
         |       ELSE NULL END AS contain_ab,
         |  CASE WHEN len(b.s) > 0
         |       THEN CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(b.s)
         |       ELSE NULL END AS contain_ba
         |FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1""".stripMargin

    /** Shared generator for the LSH mirror, optionally with the
      * degenerate-bucket cap (a window count over the same band keys the
      * Spark side aggregates on). */
    private def minHashLshSql(maxBucket: Option[Int]): String = {
      val k = 32; val bands = 16; val r = k / bands
      val coeffs = minHashCoeffs(k)
      val sigCols = coeffs.zipWithIndex.map { case ((a, b), j) =>
        s"MIN(($a * h + $b) % $MinHashP) AS h$j"
      }.mkString(",\n         |    ")
      val hCols = (0 until k).map(j => s"h$j").mkString(", ")
      val bandSelects = (0 until bands).map { bnd =>
        val key = (0 until r).map(i => s"h${bnd * r + i}").mkString(", '_', ")
        s"SELECT doc_id, $hCols, $bnd AS band, concat($key) AS bucket FROM sig"
      }.mkString("\n         |  UNION ALL ")
      val matches = (0 until k).map(j =>
        s"(CASE WHEN a.h$j = b.h$j THEN 1 ELSE 0 END)").mkString(" + ")
      val (pairSource, capCte) = maxBucket match {
        case None => ("banded", "")
        case Some(cap) => ("banded_k",
          s"""banded_k AS (
             |  SELECT * FROM banded
             |  QUALIFY COUNT(*) OVER (PARTITION BY band, bucket) <= $cap),
             |""".stripMargin)
      }
      s"""WITH ts AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         |sh AS (
         |  SELECT DISTINCT doc_id,
         |    unnest(list_transform(range(1, len(t) - 1),
         |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
         |  FROM ts WHERE len(t) >= 3),
         |hs AS (SELECT doc_id, ${md5LongSql("s")} % $MinHashP AS h FROM sh),
         |sig AS (SELECT doc_id,
         |    $sigCols
         |  FROM hs GROUP BY doc_id),
         |banded AS (
         |  $bandSelects),
         |${capCte}pairs AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    ($matches) / ${k}.0 AS jaccard_est
         |  FROM $pairSource a JOIN $pairSource b
         |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, jaccard_est FROM pairs WHERE jaccard_est >= 0.5""".stripMargin
    }

    /** Full DuckDB mirror of [[Dedup.minHashLsh]]: same md5-derived base
      * hash, same permutation literals, same band keys — the LSH output
      * itself is hash-compared, not just a downstream exact filter. */
    val minHashLsh: String = minHashLshSql(None)

    /** Full DuckDB mirror of [[Dedup.simHash]]: identical 60-bit
      * signatures, chunk buckets, and Hamming distances. */
    val simHash: String = {
      val bitSums = (0 until 60).map { j =>
        s"SUM(CASE WHEN (h & ${1L << j}) != 0 THEN 1 ELSE -1 END) AS b$j"
      }.mkString(",\n         |    ")
      val sigExpr = (0 until 60).map { j =>
        s"(CASE WHEN b$j > 0 THEN ${1L << j} ELSE 0 END)"
      }.mkString(" + ")
      val chunkSelects = (0 until 4).map { c =>
        s"SELECT doc_id, simhash, $c AS chunk, (simhash >> ${c * 15}) & 32767 AS ckey FROM sig"
      }.mkString("\n         |  UNION ALL ")
      s"""WITH toks AS (
         |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         |hs AS (SELECT doc_id, ${md5LongSql("tok")} AS h FROM toks),
         |bits AS (SELECT doc_id,
         |    $bitSums
         |  FROM hs GROUP BY doc_id),
         |sig AS (SELECT doc_id, $sigExpr AS simhash FROM bits),
         |chunks AS (
         |  $chunkSelects)
         |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
         |FROM chunks a JOIN chunks b
         |  ON a.chunk = b.chunk AND a.ckey = b.ckey AND a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""".stripMargin
    }

    /** Transitive closure over a pair query → (doc_id, min reachable). */
    private def componentsSql(pairsSql: String): String =
      s"""WITH RECURSIVE pairs AS (
         |$pairsSql
         |),
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
         |          UNION ALL SELECT doc_b AS a, doc_a AS b FROM pairs),
         |reach(a, b) AS (
         |  SELECT a, b FROM edges
         |  UNION
         |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         |m AS (SELECT a, MIN(b) AS mn FROM reach GROUP BY a)
         |SELECT d.doc_id, LEAST(d.doc_id, COALESCE(m.mn, d.doc_id)) AS component
         |FROM documents d LEFT JOIN m ON m.a = d.doc_id""".stripMargin

    /** Connected components via recursive transitive closure over the
      * same md5-mirrored MinHash pair set ([[minHashLsh]] embedded as a
      * CTE), then min reachable id per node — the declarative ground
      * truth for the distributed label-propagation loop. */
    val dedupComponents: String = componentsSql(minHashLsh)

    /** [[dedupComponents]] with the degenerate-bucket cap mirrored — pins
      * the cap's exact recall trade-off cross-engine. */
    val dedupComponentsCapped: String =
      componentsSql(minHashLshSql(Some(ComponentsCap)))
  }
}
