package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Profile
import graft.pipeline.Incremental

/** Incremental view maintenance + data-quality profiling. The cell-exact
  * cross-engine contract is the DuckDB oracle gate. */
class IncrementalAndProfileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf

  test("incremental refresh is invisible: combined partials equal the full recompute") {
    val inc = Incremental.incrementalAggRefresh(spark, dir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type")) ->
        (r.getAs[Long]("n_events"), r.getAs[Double]("total_value"))).toMap
    val full = Tables.events(spark, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"), Dsl.dsum(col("value")).as("t"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type")) ->
        (r.getAs[Long]("n"), r.getAs[Double]("t"))).toMap
    assert(inc === full, "incremental maintenance must be bit-invisible in the result")
  }

  test("incremental refresh: n_delta accounts exactly for post-cutoff rows") {
    val cutoffDelta = Tables.events(spark, dir)
      .where(col("ts") >= lit(Incremental.Cutoff).cast("timestamp_ntz"))
      .count()
    val totalDelta = Incremental.incrementalAggRefresh(spark, dir)
      .agg(sum(col("n_delta"))).head().getLong(0)
    assert(totalDelta === cutoffDelta)
    assert(totalDelta > 0, "cutoff must split the event window non-trivially")
  }

  test("tableProfile: one row per column, counts consistent, single scan") {
    val rows = Profile.tableProfile(spark, dir).collect()
    assert(rows.length === 6)
    val n = Tables.orders(spark, dir).count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rows") === n)
      assert(r.getAs[Long]("n_null") >= 0 && r.getAs[Long]("n_null") <= n)
      assert(r.getAs[Long]("n_distinct") <= n)
      assert(r.getAs[Double]("null_rate") >= 0.0 && r.getAs[Double]("null_rate") <= 1.0)
    }
    // key column must be unique and non-null
    val key = rows.find(_.getAs[String]("column_name") == "o_orderkey").get
    assert(key.getAs[Long]("n_null") === 0 && key.getAs[Long]("n_distinct") === n)
    // one pass: exactly one lineitem/orders file scan in the plan
    val plan = Profile.tableProfile(spark, dir).queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(l =>
      l.contains("Scan parquet") && l.contains("orders")) === 1,
      "profile must scan the table once")
  }

  test("skewProfile: totals and ratio consistent; heaviest key verified") {
    val r = Profile.skewProfile(spark, dir).head()
    val perKey = Tables.lineitem(spark, dir).groupBy(col("l_suppkey")).count()
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r.getAs[Long]("n_keys") === perKey.size)
    assert(r.getAs[Long]("n_rows") === perKey.values.sum)
    assert(r.getAs[Long]("max_rows_per_key") === perKey.values.max)
    val maxCnt = perKey.values.max
    val expectHeaviest = perKey.collect { case (k, c) if c == maxCnt => k }.max
    assert(r.getAs[Long]("heaviest_key") === expectHeaviest)
    assert(r.getAs[Double]("skew_ratio") >= 1.0)
  }
}
