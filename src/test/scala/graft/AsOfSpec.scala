package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.AsOf

class AsOfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def canon(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("asofJoin: hand-checked semantics incl. no-match and update chains") {
    val txns = Seq(           // (contract, ts)
      (1L, 100L), (1L, 205L), (1L, 300L),
      (2L, 50L),              // before any attribute -> null
      (3L, 400L)              // key with no attributes at all -> null
    ).toDF("contract_id", "ts")
    val attrs = Seq(          // (contract, valid_from, value)
      (1L, 90L, "limit=100"), (1L, 200L, "limit=250"), (1L, 210L, "limit=300"),
      (2L, 60L, "limit=9")
    ).toDF("contract_id", "valid_from", "attr_value")

    // output shape: left cols ++ ALL right cols (right key incl., null on no-match)
    val expected = Set[Seq[Any]](
      Seq(1L, 100L, 1L, 90L, "limit=100"),
      Seq(1L, 205L, 1L, 200L, "limit=250"),
      Seq(1L, 300L, 1L, 210L, "limit=300"),
      Seq(2L, 50L, null, null, null),
      Seq(3L, 400L, null, null, null))

    val custom = AsOf.asofJoin(txns, attrs, "contract_id", "ts", "valid_from")
    assert(canon(custom) === expected)
    val composed = AsOf.asofJoinComposed(txns, attrs, "contract_id", "ts", "valid_from")
    assert(canon(composed) === expected)
  }

  test("asofJoin: differential vs composed on generated reference data") {
    import graft.bronze.Generate
    // transactions as-of joined to a per-contract attribute history
    val txns = Generate.fTransactions(spark, 3000, nContracts = 80)
      .select(col("transaction_id"), col("contract_id"),
        col("requested_at_time_id").cast("long").as("ts"))
    val attrs = spark.range(400).select(
      pmod(col("id"), lit(80L)).as("contract_id"),
      (lit(1704067200L) + col("id") * 6000).as("valid_from"),   // unique per contract
      concat(lit("v"), col("id")).as("attr_value"))

    val custom = AsOf.asofJoin(txns, attrs, "contract_id", "ts", "valid_from")
    val composed = AsOf.asofJoinComposed(txns, attrs, "contract_id", "ts", "valid_from")
    assert(custom.count() === 3000)          // exactly one output row per left row
    assert(canon(custom) === canon(composed))
  }

  test("asofJoin: custom plan contains AsOfJoinExec, not a cartesian blow-up") {
    val txns = Seq((1L, 10L)).toDF("k", "ts")
    val attrs = Seq((1L, 5L, "x")).toDF("k", "vf", "v")
    val plan = AsOf.asofJoin(txns, attrs, "k", "ts", "vf")
      .queryExecution.executedPlan.toString
    // physical nodeName renders without the Exec suffix
    assert(plan.contains("AsOfJoin"), plan.take(500))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"))
  }
}
