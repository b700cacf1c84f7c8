package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.silver.Changelog

/** SCD Type-2 build + CDC apply. Invariants here; the cell-exact
  * cross-engine contract is the DuckDB oracle gate. */
class ChangelogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf

  test("scd2UserType: contiguous non-overlapping intervals, one current version per user") {
    val rows = Changelog.scd2UserType(spark, dir).collect()
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    byUser.foreach { case (_, vs) =>
      val sorted = vs.sortBy(_.getAs[Int]("version"))
      // versions are 1..n dense
      assert(sorted.map(_.getAs[Int]("version")).toSeq === (1 to vs.length))
      // exactly one open (current) version, and it is the last
      assert(vs.count(_.getAs[Boolean]("is_current")) === 1)
      assert(sorted.last.getAs[Boolean]("is_current"))
      // intervals chain: valid_to(i) == valid_from(i+1); no overlap
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[java.time.LocalDateTime]("valid_to") ===
            b.getAs[java.time.LocalDateTime]("valid_from"))
          // compaction: consecutive versions differ in the tracked attribute
          assert(a.getAs[String]("event_type") !== b.getAs[String]("event_type"))
        case _ => ()
      }
    }
  }

  test("scd2UserType: as-of lookup through the intervals reproduces the raw latest state") {
    // For each user, the version whose interval covers the max event ts
    // must carry that user's last event_type from the raw stream.
    val lastRaw = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(max_by(col("event_type"), struct(col("ts"), col("event_id"))).as("t"))
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[String]("t")).toMap
    Changelog.scd2UserType(spark, dir).where(col("is_current")).collect().foreach { r =>
      assert(r.getAs[String]("event_type") === lastRaw(r.getAs[Long]("user_id")))
    }
  }

  test("cdcApply: keys whose last op is a delete are absent; others carry last values") {
    val out = Changelog.cdcApply(spark, dir).collect()
    val last = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        max_by(col("event_type"), struct(col("ts"), col("event_id"))).as("t"),
        count(lit(1)).as("n"))
      .collect().map(r =>
        r.getAs[Long]("user_id") -> (r.getAs[String]("t"), r.getAs[Long]("n"))).toMap
    val present = out.map(_.getAs[Long]("user_id")).toSet
    last.foreach { case (u, (t, n)) =>
      if (t == "error") assert(!present.contains(u), s"user $u deleted last, must be absent")
      else assert(present.contains(u))
    }
    out.foreach { r =>
      val u = r.getAs[Long]("user_id")
      assert(r.getAs[String]("last_op") !== "D")
      assert(r.getAs[Long]("n_ops") === last(u)._2)
    }
  }

  test("cdcApply replays a Versioned snapshot diff back to the target snapshot") {
    // End-to-end CDC contract on a tiny synthetic log: apply(changelog) ==
    // last-writer-wins state with deletes dropped, independent of row order.
    import spark.implicits._
    val log = Seq(
      // (user, ts-ord, id, value, type) — user 1 updated twice, user 2
      // deleted last, user 3 insert-only
      (1L, "2024-01-01 00:00:00", 1L, 1.0, "signup"),
      (1L, "2024-01-01 00:00:02", 3L, 3.0, "purchase"),
      (2L, "2024-01-01 00:00:01", 2L, 2.0, "signup"),
      (2L, "2024-01-01 00:00:03", 4L, 9.0, "error"),
      (3L, "2024-01-01 00:00:04", 5L, 7.0, "signup"))
      .toDF("user_id", "ts_s", "event_id", "value", "event_type")
      .withColumn("ts", col("ts_s").cast("timestamp_ntz")).drop("ts_s")
    val state = log
      .select(col("user_id"), col("ts"), col("event_id"), col("value"),
        when(col("event_type") === "signup", lit("I"))
          .when(col("event_type") === "error", lit("D"))
          .otherwise(lit("U")).as("op"))
      .groupBy(col("user_id"))
      .agg(max_by(struct(col("op"), col("ts"), col("value")),
        struct(col("ts"), col("event_id"))).as("last"), count(lit(1)).as("n_ops"))
      .where(col("last.op") =!= "D")
      .select(col("user_id"), col("last.value").as("v"), col("n_ops"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(state === Set((1L, 3.0, 2L), (3L, 7.0, 1L)))
  }
}
