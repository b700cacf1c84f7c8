package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** The LSH dedup operators are also DuckDB-oracle-checked (md5-derived
  * hashes are mirrored in SQL), but hash parity alone wouldn't catch a
  * semantically wrong pipeline that's wrong identically on both sides —
  * so correctness is additionally established here on planted duplicates:
  * write a corpus with known near/exact dup pairs to parquet, run the
  * operator, check recall on the planted pairs and precision via the
  * similarity scores. */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** A corpus with planted dups, written in documents.parquet shape. */
  private lazy val plantedDir: String = {
    val base = List(
      "the quick brown fox jumps over the lazy dog near the river bank today",
      "spark engines shuffle data across the cluster when joins need co location",
      "completely different words about astronomy planets stars galaxies and comets",
      "machine learning models train on huge corpora of text scraped from the web")
    val docs = base.zipWithIndex.flatMap { case (t, i) =>
      val id = i * 10L
      val toks = t.split(" ")
      Seq(
        (id, t),                                             // original
        (id + 1, t),                                         // exact dup
        (id + 2, (toks.dropRight(1) :+ "changed").mkString(" "))  // near dup
      )
    } ++ Seq((900L, "zz yy xx ww vv uu tt ss rr qq pp oo"))  // unique
    val dir = Files.createTempDirectory("dedup_spec").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("spec"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("exactDedup groups identical texts under one fingerprint") {
    val out = Dedup.exactDedup(spark, plantedDir).cache()
    // 4 texts have an exact duplicate → 4 groups of n_copies=2
    assert(out.where(col("n_copies") === 2).count() === 4)
    // keeper is the smallest doc_id of each group
    val keepers = out.where(col("n_copies") === 2)
      .select("keeper_doc_id").collect().map(_.getLong(0)).toSet
    assert(keepers === Set(0L, 10L, 20L, 30L))
  }

  test("minHashLsh finds planted exact+near dups with est >= threshold") {
    val pairs = Dedup.minHashLsh(spark, plantedDir).cache()
    val found = pairs.select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact dups must be found with jaccard_est == 1
    for (i <- 0 until 4) assert(found.contains((i * 10L, i * 10L + 1)), s"missing exact pair $i")
    val exact = pairs.where(col("doc_a") % 10 === 0 && col("doc_b") - col("doc_a") === 1)
    assert(exact.where(col("jaccard_est") < 1.0).count() === 0)
    // the unique doc pairs with nothing
    assert(!found.exists { case (a, b) => a == 900L || b == 900L })
  }

  test("simHash: identical docs at hamming 0; unique doc unpaired") {
    val pairs = Dedup.simHash(spark, plantedDir).cache()
    val zero = pairs.where(col("hamming") === 0)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (i <- 0 until 4) assert(zero.contains((i * 10L, i * 10L + 1)), s"missing exact pair $i")
    assert(pairs.where(col("doc_a") === 900L || col("doc_b") === 900L).count() === 0)
  }

  test("ngramJaccard: adjacent exact dups score 1.0") {
    val j = Dedup.ngramJaccard(spark, plantedDir).cache()
    // pairs (i*10, i*10+1) are adjacent ids and identical → jaccard 1
    val ones = j.where(col("jaccard") === 1.0)
      .select("doc_a").collect().map(_.getLong(0)).toSet
    assert(Set(0L, 10L, 20L, 30L).subsetOf(ones))
    // near-dup pairs (i*10+1, i*10+2) differ by one trailing word
    val near = j.where(col("doc_a") % 10 === 1)
    assert(near.where(col("jaccard") < 0.5 || col("jaccard") >= 1.0).count() === 0)
  }

  test("maxBucket cap drops a planted boilerplate flood, keeps organic dups") {
    // 40 copies of one template would emit 40*39/2 = 780 pairs per shared
    // bucket — the quadratic-blowup case the cap exists for. Organic dup
    // pairs live in buckets of size 2 and must survive the cap.
    val flood = (0 until 40).map(i =>
      (1000L + i, "identical boilerplate template footer text repeated across every scraped page verbatim"))
    val organic = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank today"))
    val docs = (flood ++ organic).toDF("doc_id", "text")

    val uncapped = Dedup.minHashLshOn(docs)
    val floodPairs = uncapped.where(col("doc_a") >= 1000L).count()
    assert(floodPairs === 40L * 39 / 2, "uncapped flood must be quadratic")

    val capped = Dedup.minHashLshOn(docs, maxBucket = Some(10)).cache()
    assert(capped.where(col("doc_a") >= 1000L).count() === 0,
      "capped flood buckets must emit no pairs")
    assert(capped.where(col("doc_a") === 1L && col("doc_b") === 2L).count() === 1,
      "organic pair must survive the cap")

    val simCapped = Dedup.simHashOn(docs, maxBucket = Some(10)).cache()
    assert(simCapped.where(col("doc_a") >= 1000L).count() === 0)
    assert(simCapped.where(col("doc_a") === 1L && col("doc_b") === 2L).count() === 1)

    // the components built on the CAPPED pair set: the flood degrades to
    // singletons (each labels itself — exact dedup's job anyway) while
    // the organic cluster still contracts to its min id
    val comps = Dedup.componentsOf(
      docs.select(col("doc_id")),
      Dedup.minHashLshOn(docs, maxBucket = Some(10)).select(col("doc_a"), col("doc_b")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps(1L) === 1L && comps(2L) === 1L, "organic cluster resolves")
    (0 until 40).foreach(i => assert(comps(1000L + i) === 1000L + i,
      "capped flood docs become singletons"))
  }

  test("componentsOf: chains, triangles and singletons resolve to min ids") {
    // graph: chain 1-2-3-4 (diameter 3), triangle 10-11-12, edge 20-21,
    // singleton 30; min-label must cross the full chain
    val nodes = Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 20L, 21L, 30L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L)).toDF("doc_a", "doc_b")
    val got = Dedup.componentsOf(nodes, pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L, 30L -> 30L))
  }

  test("componentsOf: differential vs union-find on seeded random graphs") {
    val rnd = new scala.util.Random(20260812L)
    for (_ <- 1 to 5) {
      val n = 30 + rnd.nextInt(40)
      val nodeIds = (0 until n).map(_.toLong)
      val m = rnd.nextInt(n)
      val pairSeq = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // driver-side union-find ground truth (min id per component)
      val parent = scala.collection.mutable.Map(nodeIds.map(i => i -> i): _*)
      def find(x: Long): Long = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      pairSeq.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = nodeIds.map(i => i -> find(i)).toMap
      val got = Dedup.componentsOf(
        nodeIds.toDF("doc_id"), pairSeq.toDF("doc_a", "doc_b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got === expected, s"n=$n m=${pairSeq.size}")
    }
  }

  test("starComponents: differential vs label propagation + union-find, incl. a deep chain") {
    // adversarial depth: a 300-node chain (diameter 299) — the case the
    // star-contraction fallback exists for. Shuffled ids so min != head.
    val chainIds = new scala.util.Random(7L).shuffle((0 until 300).map(_.toLong + 1000).toVector)
    val chainPairs = chainIds.sliding(2).map(s => (s(0), s(1))).toSeq
    val chainGot = Dedup.starComponents(
      chainIds.toDF("doc_id"), chainPairs.toDF("doc_a", "doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val chainMin = chainIds.min
    assert(chainGot.values.toSet === Set(chainMin),
      "every chain node must resolve to the global min")

    // random graphs: star contraction must agree with union-find exactly
    val rnd = new scala.util.Random(424242L)
    for (_ <- 1 to 3) {
      val n = 40 + rnd.nextInt(40)
      val nodeIds = (0 until n).map(_.toLong)
      val pairSeq = Seq.fill(rnd.nextInt(n))((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val parent = scala.collection.mutable.Map(nodeIds.map(i => i -> i): _*)
      def find(x: Long): Long = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      pairSeq.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = nodeIds.map(i => i -> find(i)).toMap
      val got = Dedup.starComponents(
        nodeIds.toDF("doc_id"), pairSeq.toDF("doc_a", "doc_b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got === expected, s"n=$n m=${pairSeq.size}")
    }
  }

  test("dedupComponents: transitive closure of the planted LSH pairs") {
    val pairs = Dedup.minHashLsh(spark, plantedDir)
      .select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val comp = Dedup.dedupComponents(spark, plantedDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // every pair is in one component, labeled by a member <= both ends
    pairs.foreach { case (a, b) =>
      assert(comp(a) === comp(b), s"pair ($a,$b) split across components")
      assert(comp(a) <= math.min(a, b))
    }
  }
}
