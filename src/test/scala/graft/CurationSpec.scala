package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Curation, Similarity}

/** Round-3 curation + ANN-serving operators. Invariants only — the
  * cell-exact cross-engine contract is enforced by the DuckDB oracle
  * gate (scripts/check_oracle.py). */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("fuzzyEditPairs: LSH-fed candidates, sim bounds, pairs are real LSH output") {
    val rows = Curation.fuzzyEditPairs(spark, dir).collect()
    rows.foreach { r =>
      val (dist, sim) = (r.getAs[Int]("edit_dist"), r.getAs[Double]("edit_sim"))
      assert(dist >= 0 && sim >= 0.0 && sim <= 1.0)
      assert(r.getAs[Boolean]("verified") === (sim >= Curation.FuzzyVerifyThreshold))
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      assert(r.getAs[Double]("jaccard_est") >= 0.5)
    }
    // the scored pair set is exactly the LSH candidate set (verify scores
    // every candidate; it never invents or drops pairs)
    val nCands = graft.operators.Dedup.minHashLsh(spark, dir).count()
    assert(rows.length.toLong === nCands)
  }

  test("fuzzyVerifyOn: planted near-dup confirmed via LSH; planted bucket collision rejected") {
    import spark.implicits._
    // 40-token docs: 1 and 2 differ by one in-token edit (near-dup);
    // 3 is unrelated content
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val edited = base.replace("tok7", "tokX")
    val other = (1 to 40).map(i => s"zzz$i").mkString(" ")
    val docs = Seq((1L, base), (2L, edited), (3L, other)).toDF("doc_id", "text")

    // true positives flow end-to-end: LSH finds the planted pair, verify
    // confirms it (one character of 120+ differs)
    val lshPairs = graft.operators.Dedup.minHashLshOn(docs)
      .select(col("doc_a"), col("doc_b"), col("jaccard_est"))
    val confirmed = Curation.fuzzyVerifyOn(docs, lshPairs).collect()
    assert(confirmed.exists(r =>
      r.getAs[Long]("doc_a") == 1L && r.getAs[Long]("doc_b") == 2L
        && r.getAs[Boolean]("verified")))
    // no pair involving doc 3 survives LSH at all
    assert(!confirmed.exists(r =>
      r.getAs[Long]("doc_a") == 3L || r.getAs[Long]("doc_b") == 3L))

    // a planted FALSE-POSITIVE bucket collision (pair 1-3 injected as if
    // two bands collided) is scored low and rejected by the verify step
    val planted = Seq((1L, 3L, 0.5)).toDF("doc_a", "doc_b", "jaccard_est")
    val rejected = Curation.fuzzyVerifyOn(docs, planted).head()
    assert(!rejected.getAs[Boolean]("verified"))
    assert(rejected.getAs[Double]("edit_sim") < 0.5)
  }

  test("stratifiedSample: bounded per stratum, deterministic across runs") {
    val s1 = Curation.stratifiedSample(spark, dir).collect()
    val perLang = s1.groupBy(_.getAs[String]("lang")).view.mapValues(_.length)
    perLang.foreach { case (_, n) => assert(n <= 5) }
    val s2 = Curation.stratifiedSample(spark, dir).collect()
    assert(s1.map(_.toString).sorted.toSeq === s2.map(_.toString).sorted.toSeq)
  }

  test("stratifiedSample: salted two-phase equals single-window form; no stratum-sized window") {
    import org.apache.spark.sql.expressions.Window
    import graft.operators.Dedup
    // reference single-window form (the readable-but-stratum-sized plan)
    val single = graft.Tables.documents(spark, dir)
      .select(col("lang"), col("doc_id"),
        Dedup.md5Long(concat(lit("rs_"), col("doc_id"))).as("priority"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("priority"), col("doc_id"))))
      .where(col("rk") <= 5)
      .collect().map(_.toString).sorted.toSeq
    val salted = Curation.stratifiedSample(spark, dir)
    assert(salted.collect().map(_.toString).sorted.toSeq === single,
      "salted two-phase sample must be lossless vs the single-window form")
    // plan shape: the window reading the raw scan partitions by
    // (lang, salt) — no window partition ever holds a whole stratum. The
    // lang-only window exists but runs over the phase-1 output
    // (<= salts × perStratum rows per lang).
    val plan = salted.queryExecution.optimizedPlan.toString
    val firstWindow = plan.split("\n").reverse.find(_.contains("windowspecdefinition"))
    assert(firstWindow.exists(l => l.contains("salt")),
      "scan-side window must be salted:\n" + plan.take(1500))
  }

  test("qualityGate: keep is exactly the conjunction of the negated flags") {
    Curation.qualityGate(spark, dir).collect().foreach { r =>
      val expected = !r.getAs[Boolean]("too_short") &&
        !r.getAs[Boolean]("low_diversity") && !r.getAs[Boolean]("high_punct")
      assert(r.getAs[Boolean]("keep") === expected)
    }
  }

  test("decontaminate: per-doc gram accounting is complete and ratios bounded") {
    val rows = Curation.decontaminate(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_id") % 50 !== 0, "eval docs must not be scored")
      val (ng, nc) = (r.getAs[Long]("n_grams"), r.getAs[Long]("n_contaminated"))
      assert(ng > 0 && nc >= 0 && nc <= ng)
      assert(r.getAs[Boolean]("contaminated") === (nc > 0))
      val ratio = r.getAs[Double]("contamination_ratio")
      assert(ratio >= 0.0 && ratio <= 1.0)
    }
  }

  test("decontaminate flags a planted eval-overlapping document") {
    import spark.implicits._
    import java.nio.file.Files
    // doc 50 is "eval" (50 % 50 == 0); doc 1 copies a 5-gram from it
    val docs = Seq(
      (50L, "alpha beta gamma delta epsilon zeta eta theta"),
      (1L, "completely unrelated words then alpha beta gamma delta epsilon closing words"),
      (2L, "nothing shared with the held out benchmark here at all today")
    ).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("spec"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val d = Files.createTempDirectory("decontam").toString
    docs.write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = Curation.decontaminate(spark, d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("contaminated")).toMap
    assert(out(1L) === true, "doc 1 shares 'alpha beta gamma delta epsilon'")
    assert(out(2L) === false)
  }

  test("packSequences: offsets consistent with a per-shard driver-side repack") {
    val rows = Curation.packSequences(spark, dir).collect()
    val nDocs = graft.Tables.documents(spark, dir).count()
    assert(rows.length === nDocs, "every document must be packed")
    // replay the packing per shard in doc_id order; offsets must agree
    rows.groupBy(_.getAs[Long]("shard")).foreach { case (_, docs) =>
      var cum = 0L
      docs.sortBy(_.getAs[Long]("doc_id")).foreach { r =>
        assert(r.getAs[Long]("seq_in_shard") === cum / Curation.PackSeqLen)
        assert(r.getAs[Long]("seq_offset") === cum % Curation.PackSeqLen)
        cum += r.getAs[Long]("n_tokens")
      }
    }
    // offsets always inside a sequence
    rows.foreach(r => assert(r.getAs[Long]("seq_offset") >= 0
      && r.getAs[Long]("seq_offset") < Curation.PackSeqLen))
  }

  test("langRebalance: effective counts bounded by floor/ceil of rate, deterministic") {
    val rows = Curation.langRebalance(spark, dir).collect()
    assert(rows.map(_.getAs[String]("lang")).toSet === Set("en", "zh", "es", "de", "fr"))
    rows.foreach { r =>
      val (rate, n, eff) = (r.getAs[Double]("rate"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("effective_docs"))
      // every doc contributes floor(rate) or floor(rate)+1 copies
      assert(eff >= math.floor(rate).toLong * n && eff <= math.ceil(rate).toLong * n,
        s"lang=${r.getAs[String]("lang")} rate=$rate n=$n eff=$eff")
      val achieved = r.getAs[Double]("achieved_rate")
      assert(math.abs(achieved - rate) < 0.5, "achieved rate tracks the target")
    }
    // whole-number rates are exact: zh at 1.0 must keep every doc once
    val zh = rows.find(_.getAs[String]("lang") == "zh").get
    assert(zh.getAs[Long]("effective_docs") === zh.getAs[Long]("n_docs"))
  }

  test("zorderKeys: key matches a reference bit-interleave of (zx, zy)") {
    def interleave(x: Long, y: Long): Long =
      (0 until Curation.ZBits).map { i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }.sum
    val rows = Curation.zorderKeys(spark, dir).collect()
    assert(rows.length === 100)
    rows.foreach { r =>
      assert(r.getAs[Long]("zkey") ===
        interleave(r.getAs[Long]("zx"), r.getAs[Long]("zy")))
    }
    // output is the global minimum of the key (sorted ascending)
    val keys = rows.map(_.getAs[Long]("zkey")).toSeq
    assert(keys === keys.sorted)
  }

  test("kmeansRefine: full centroid matrix, members conserved per dimension") {
    val rows = Similarity.kmeansRefine(spark, dir).collect()
    assert(rows.length === 16 * Similarity.Dim)
    val nVecs = graft.Tables.embeddings(spark, dir).count()
    // every vector lands in exactly one cluster ⇒ per-dim member counts
    // sum to the corpus size
    rows.groupBy(_.getAs[Int]("pos")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("n_members")).sum === nVecs)
    }
  }

  test("ivfPqTopK: ranked per query, no self pairs, codes bounded") {
    val rows = Similarity.ivfPqTopK(spark, dir).collect()
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    byQ.foreach { case (qid, rs) =>
      assert(rs.length <= 10)
      val rks = rs.map(_.getAs[Int]("rk")).sorted
      assert(rks === (1 to rs.length))
      rs.foreach(r => assert(r.getAs[Long]("cid") !== qid))
      // ranking is by descending ADC score with deterministic ties
      val byRk = rs.sortBy(_.getAs[Int]("rk")).map(_.getAs[Double]("adc_score"))
      assert(byRk === byRk.sortBy(-_))
    }
    // PQ codes stay within the codebook
    Similarity.pqCodes(spark, dir).collect().foreach { r =>
      val c = r.getAs[Int]("code")
      assert(c >= 0 && c < Similarity.PqK)
    }
  }
}
