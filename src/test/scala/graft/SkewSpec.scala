package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedJoin: result equals plain join on heavily skewed data") {
    // 10k rows of one hot key + scattered keys, joined to a small dim
    val skewed = (1 to 10000).map(i => (if (i % 10 == 0) i.toLong % 97 else 1L, i))
      .toDF("k", "v")
    val dim = (0L to 100L).map(k => (k, s"dim_$k")).toDF("k", "name")

    val plain = skewed.join(dim, Seq("k")).select("k", "v", "name")
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(skewed, dim, Seq("k"), factor = 8)
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    assert(salted === plain)
  }

  test("saltedJoin: left join preserves unmatched skewed rows") {
    val skewed = Seq((1L, "a"), (1L, "b"), (99L, "c")).toDF("k", "v")
    val dim = Seq((1L, "one")).toDF("k", "name")
    val out = Skew.saltedJoin(skewed, dim, Seq("k"), factor = 4, joinType = "left")
      .select("k", "v", "name").collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)))).toSet
    assert(out === Set((1L, "a", Some("one")), (1L, "b", Some("one")), (99L, "c", None)))
  }

  test("approxMetrics: every sketch-bound verdict is true") {
    val rows = Skew.approxMetrics(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("hll_ok"), s"HLL bound violated: $r")
      assert(r.getAs[Boolean]("median_rank_ok"), s"median rank bound violated: $r")
      assert(r.getAs[Boolean]("p99_rank_ok"), s"p99 rank bound violated: $r")
      assert(r.getAs[Long]("exact_orders") > 0 && r.getAs[Long]("n") > 0)
    }
  }
}
