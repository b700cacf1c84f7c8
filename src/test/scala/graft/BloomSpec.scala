package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bloom

/** Bloom-prune semi-join: superset guarantee, exact-verify equivalence,
  * and the plan shape (fact probes via broadcast, never shuffles). */
class BloomSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf

  test("candidates are a superset of exact matches; exact agg equals plain semi-join") {
    val out = Bloom.bloomPruneJoin(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_candidates") >= r.getAs[Long]("n_exact"))
    }
    // the exact leg must equal the straightforward exact join aggregate
    val expected = Tables.lineitem(spark, dir)
      .join(
        Tables.supplier(spark, dir)
          .join(Tables.nation(spark, dir), col("s_nationkey") === col("n_nationkey"))
          .join(Tables.region(spark, dir), col("n_regionkey") === col("r_regionkey"))
          .where(col("r_name") === "ASIA")
          .select(col("s_suppkey")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[String]("l_returnflag") -> r.getAs[Long]("n")).toMap
    out.foreach { r =>
      assert(r.getAs[Long]("n_exact") === expected(r.getAs[String]("l_returnflag")))
    }
  }

  test("a deliberately tiny filter plants false positives and the exact join drops them") {
    import spark.implicits._
    // 8 dim keys into a 64-bit filter (2 words) — heavy fill, FPs certain
    // across 10k probe keys; membership semantics must still be a superset.
    val dim = (0L until 8L).map(_ * 13L + 1L).toDF("key")
    val words = Bloom.buildBits(dim, "key", mBits = 64, k = 3)
      .collect().map(r => r.getAs[Long]("w") -> r.getAs[Long]("bits")).toMap
    assert(words.values.forall(b => b >= 0 && b <= 0xFFFFFFFFL), "32-bit words only")
    // exhaustive membership check in Scala mirrors the expression logic
    def contains(key: Long): Boolean = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"bf_$key".getBytes("UTF-8")).map("%02x".format(_)).mkString
      val h1 = math.floorMod(java.lang.Long.parseLong(hex.substring(0, 15), 16), 64L)
      val h2 = 1L + math.floorMod(java.lang.Long.parseLong(hex.substring(15, 30), 16), 63L)
      (0 until 3).forall { i =>
        val pos = math.floorMod(h1 + i * h2, 64L)
        val bits = words.getOrElse(pos / 32, 0L)
        ((bits >> (pos % 32)) & 1L) == 1L
      }
    }
    val dimKeys = (0L until 8L).map(_ * 13L + 1L).toSet
    dimKeys.foreach(k => assert(contains(k), s"dim key $k must always pass"))
    val fps = (0L until 10000L).filterNot(dimKeys).count(contains)
    assert(fps > 0, "tiny filter must produce false positives for this test to bite")
  }

  test("probe plan: bloom test reaches the fact scan as a data filter; raw fact rows never shuffle") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val exec = Bloom.bloomPruneJoin(spark, dir).queryExecution.executedPlan
    val factScan = exec.collectLeaves().map(_.toString)
      .find(s => s.contains("lineitem") && s.contains("Scan parquet"))
    assert(factScan.exists(_.contains("bloom_contains")),
      "bloom membership must be pushed into the fact scan's DataFilters:\n" +
        factScan.getOrElse("<no lineitem scan>").take(400))
    // every shuffle whose subtree reads lineitem must sit above a partial
    // aggregate — i.e. the fact is map-side combined before it ever moves;
    // probes and the exact-verify join shuffle nothing on the fact side.
    val factShuffles = exec.collect {
      case s: ShuffleExchangeExec
        if s.collectLeaves().exists(_.toString.contains("lineitem")) => s
    }
    factShuffles.foreach { s =>
      assert(s.child.toString.linesIterator.next().contains("HashAggregate"),
        "raw fact rows shuffled without map-side combine:\n" + s.child.toString.take(500))
    }
  }
}
