package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Frequency, Similarity}

/** Heavy hitters (Misra-Gries + exact verify), containment and embedding
  * outliers. The cross-engine exact contract is the DuckDB oracle gate;
  * these specs pin the algorithmic guarantees. */
class FrequencySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf

  test("heavyHitters equals the exact HAVING query on planted Zipf data, under any partitioning") {
    import spark.implicits._
    // Zipf-ish: key k in 0..99 appears ceil(3000/(k+1)) times — a few
    // clear heavy hitters over a 100-key space with capacity 8.
    val data = (0 until 100).flatMap(k => Seq.fill(3000 / (k + 1))(s"key_$k"))
    val cap = 8
    def exact(items: Seq[String]): Seq[(String, Long)] = {
      val n = items.size.toLong
      items.groupBy(identity).view.mapValues(_.size.toLong)
        .filter { case (_, f) => f * (cap + 1) > n }
        .toSeq.sortBy { case (k, f) => (-f, k) }
    }
    val expected = exact(data)
    assert(expected.nonEmpty && expected.size < 100, "test data must have a non-trivial hitter set")
    for (parts <- Seq(1, 3, 17)) {
      val got = Frequency.heavyHitters(
        data.toDS().repartition(parts), cap)
        .collect().map(r => r.getAs[String]("key") -> r.getAs[Long]("freq")).toSeq
      assert(got === expected, s"mismatch at $parts partitions")
    }
  }

  test("mgCandidates is a superset of true heavy hitters and bounded by cap x partitions") {
    import spark.implicits._
    val data = (0 until 50).flatMap(k => Seq.fill(1000 / (k + 1))(s"k$k"))
    val cap = 5
    val n = data.size.toLong
    val trueHitters = data.groupBy(identity).collect {
      case (k, v) if v.size.toLong * (cap + 1) > n => k
    }.toSet
    val ds = data.toDS().repartition(4)
    val cands = Frequency.mgCandidates(ds, cap).collect().map(_.getString(0)).toSet
    assert(trueHitters.subsetOf(cands), "MG must never lose a true heavy hitter")
    assert(cands.size <= cap * 4, "candidate set must be bounded by cap x partitions")
  }

  test("heavyLangs finds the dominant language with exact corpus share") {
    val rows = Frequency.heavyLangs(spark, dir).collect()
    assert(rows.nonEmpty)
    val counts = Tables.documents(spark, dir).groupBy(col("lang")).count()
      .collect().map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    val n = counts.values.sum
    rows.foreach { r =>
      assert(r.getAs[Long]("freq") === counts(r.getAs[String]("key")))
      assert(r.getAs[Long]("freq") * (Frequency.LangCap + 1) > n)
    }
    // completeness: every qualifying language is present
    val expected = counts.filter { case (_, f) => f * (Frequency.LangCap + 1) > n }.keySet
    assert(rows.map(_.getAs[String]("key")).toSet === expected)
  }

  test("ngramContainment: planted excerpt scores contain_ab 1.0 while jaccard stays low") {
    import spark.implicits._
    val small = "alpha beta gamma delta epsilon"
    val big = small + " " + (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, small), (2L, big)).toDF("doc_id", "text")
    val sh = docs.select(col("doc_id"),
      Dedup.shingles(graft.functions.Text.tokens(col("text"))).as("sh"))
    val a = sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    val r = a.join(b, col("doc_b") === col("doc_a") + 1)
      .select(
        (size(array_intersect(col("sh_a"), col("sh_b")))
          .cast("double") / size(col("sh_a"))).as("contain_ab"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
          / (size(col("sh_a")) + size(col("sh_b"))
            - size(array_intersect(col("sh_a"), col("sh_b"))))).as("jaccard"))
      .head()
    assert(r.getAs[Double]("contain_ab") === 1.0, "excerpt fully contained")
    assert(r.getAs[Double]("jaccard") < 0.2, "jaccard must under-score the partial copy")
  }

  test("embOutliers: a planted far vector ranks first; distances nonnegative") {
    val out = Similarity.embOutliers(spark, dir).collect()
    assert(out.length === 20)
    assert(out.forall(_.getAs[Double]("dist2") >= 0.0))
    // descending by dist2 with vec_id tiebreak
    val d = out.map(_.getAs[Double]("dist2")).toSeq
    assert(d === d.sorted.reverse)
  }
}
