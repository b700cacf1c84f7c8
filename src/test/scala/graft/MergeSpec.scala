package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.silver.{Ingest, Merge}

/** Property tests for the MERGE INTO rewrites (SURVEY §5 item 2):
  * key-uniqueness after merge, staging-wins-on-match,
  * target-preserved-on-no-match, insert-only immutability.
  * (Seeded random cases — scalatestplus isn't in the offline cache, so no
  * ScalaCheckPropertyChecks bridge; same coverage by hand.) */
class MergeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rng = new scala.util.Random(42)
  private def randRows(): List[(Long, Int)] =
    List.fill(30)((rng.nextInt(15).toLong, rng.nextInt(2000) - 1000))

  test("upsert: unique keys, staging wins, unmatched target survives (20 random cases)") {
    for (_ <- 1 to 20) {
      val target  = randRows().toDF("k", "v").dropDuplicates("k")
      val staging = randRows().toDF("k", "v").dropDuplicates("k")
      val merged = Merge.upsert(target, staging, Seq("k")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap

      val tm = target.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val sm = staging.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(merged === (tm ++ sm))           // staging wins on overlap
      assert(merged.keySet === tm.keySet ++ sm.keySet)
    }
  }

  test("insertOnly: target rows immutable, only new keys appended (20 random cases)") {
    for (_ <- 1 to 20) {
      val target  = randRows().toDF("k", "v").dropDuplicates("k")
      val staging = randRows().toDF("k", "v").dropDuplicates("k")
      val merged = Merge.insertOnly(target, staging, Seq("k")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap

      val tm = target.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val sm = staging.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(merged === (sm ++ tm))           // target wins on overlap
    }
  }

  test("dedupLatest: idempotent and keeps the newest row per key") {
    val df = Seq(
      (1L, "a", 10, 100L), (1L, "a", 20, 200L), (1L, "b", 30, 150L),
      (2L, "a", 40, 100L), (2L, "a", 50, 100L)   // ts tie → higher id wins
    ).toDF("uid", "typ", "id", "ts")
    val once  = Ingest.dedupLatest(df, Seq("uid", "typ"), "ts", "id")
    val twice = Ingest.dedupLatest(once, Seq("uid", "typ"), "ts", "id")
    val got = once.collect().map(r => (r.getLong(0), r.getString(1)) -> r.getInt(2)).toMap
    assert(got === Map((1L, "a") -> 20, (1L, "b") -> 30, (2L, "a") -> 50))
    assert(twice.collect().toSet === once.collect().toSet)
  }

  test("watermark filter keeps only strictly newer rows") {
    val df = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "ts")
    val out = Ingest.newerThanWatermark(df, "ts", 20L).collect().map(_.getLong(0)).toSet
    assert(out === Set(3L))
  }
}
