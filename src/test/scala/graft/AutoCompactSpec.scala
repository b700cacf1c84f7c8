package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ManifestTable
import graft.sources.v2.VersionedCatalog

/** Opt-in post-append auto-compaction (`auto.compact` table property —
  * Delta's autoCompact): once a day's live file count reaches
  * `auto.compact.min_files`, the append that crossed the threshold folds
  * exactly that day's small files back through the day-replace commit.
  * Best-effort and batch-INSERT-only by contract. */
class AutoCompactSpec extends AnyFunSuite {
  private lazy val wh = java.nio.file.Files.createTempDirectory("graft_acwh").toString
  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.gac", classOf[VersionedCatalog].getName)
    s.conf.set("spark.sql.catalog.gac.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gac.ns")
    s
  }

  private def dayCounts(tbl: String): Map[String, Int] =
    ManifestTable.liveDayFileCounts(s"$wh/ns/$tbl")

  private def mk(tbl: String, props: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS gac.ns.$tbl")
    spark.sql(s"CREATE TABLE gac.ns.$tbl (id BIGINT, ts TIMESTAMP_NTZ, v DOUBLE) " +
      s"PARTITIONED BY (days(ts)) TBLPROPERTIES($props)")
  }

  test("crossing min_files folds the fragmented day; cold days untouched") {
    mk("a1", "'auto.compact'='true', 'auto.compact.min_files'='4', 'retain'='10'")
    // one row into a COLD day that must never be rewritten
    spark.sql("INSERT INTO gac.ns.a1 VALUES (0, TIMESTAMP_NTZ '2024-05-01 00:00:00', 0.0)")
    val coldRels = ManifestTable.liveEntries(s"$wh/ns/a1")
      .map(_.rel).filter(_.startsWith("__day=2024-05-01/")).toSet
    // fragment a HOT day one append at a time
    (1 to 3).foreach { i =>
      spark.sql(s"INSERT INTO gac.ns.a1 VALUES ($i, TIMESTAMP_NTZ '2024-05-02 0$i:00:00', $i.0)")
    }
    assert(dayCounts("a1")("2024-05-02") === 3, "below threshold: no compaction yet")
    // the 4th append crosses min_files=4 and auto-compacts the day
    spark.sql("INSERT INTO gac.ns.a1 VALUES (4, TIMESTAMP_NTZ '2024-05-02 04:00:00', 4.0)")
    assert(dayCounts("a1")("2024-05-02") === 1, "hot day must fold to one file")
    assert(ManifestTable.liveEntries(s"$wh/ns/a1")
      .map(_.rel).filter(_.startsWith("__day=2024-05-01/")).toSet === coldRels,
      "cold day files must carry by reference")
    assert(spark.table("gac.ns.a1").count() === 5)
    assert(spark.table("gac.ns.a1").agg(sum("v")).collect()(0).getDouble(0) === 10.0)
    spark.sql("DROP TABLE gac.ns.a1")
  }

  test("IDENTITY layouts auto-fold per partition key (the gold ano/mes shape)") {
    spark.sql("DROP TABLE IF EXISTS gac.ns.aid")
    spark.sql("CREATE TABLE gac.ns.aid (id BIGINT, grp STRING, v DOUBLE) " +
      "PARTITIONED BY (grp) TBLPROPERTIES('auto.compact'='true', " +
      "'auto.compact.min_files'='4', 'retain'='10')")
    val root = s"$wh/ns/aid"
    def keyCounts = ManifestTable.liveKeyFileCounts(root)
    // one row into a COLD key that must never be rewritten
    spark.sql("INSERT INTO gac.ns.aid VALUES (0, 'cold', 0.0)")
    val coldRels = ManifestTable.liveEntries(root)
      .map(_.rel).filter(_.startsWith("grp=cold/")).toSet
    // fragment a HOT key one append at a time; below threshold nothing folds
    (1 to 3).foreach { i =>
      spark.sql(s"INSERT INTO gac.ns.aid VALUES ($i, 'hot', $i.0)")
    }
    assert(keyCounts("grp=hot") === 3, "below min_files nothing folds")
    // the 4th append crosses the threshold: exactly the hot key folds
    spark.sql("INSERT INTO gac.ns.aid VALUES (4, 'hot', 4.0)")
    assert(keyCounts("grp=hot") === 1,
      s"hot key must auto-fold, got $keyCounts")
    assert(ManifestTable.liveEntries(root)
      .map(_.rel).filter(_.startsWith("grp=cold/")).toSet === coldRels,
      "the cold key's file must carry untouched")
    assert(spark.table("gac.ns.aid").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ===
      (0L to 4L).map(i => (i, if (i == 0) "cold" else "hot")))
    spark.sql("DROP TABLE gac.ns.aid")
  }

  test("without the property nothing compacts; ALTER turns it on") {
    mk("a2", "'auto.compact.min_files'='2', 'retain'='10'") // NOT enabled
    (0 until 4).foreach { i =>
      spark.sql(s"INSERT INTO gac.ns.a2 VALUES ($i, TIMESTAMP_NTZ '2024-05-03 0$i:00:00', 1.0)")
    }
    assert(dayCounts("a2")("2024-05-03") === 4, "opt-in means OFF by default")
    spark.sql("ALTER TABLE gac.ns.a2 SET TBLPROPERTIES('auto.compact'='true')")
    spark.sql("INSERT INTO gac.ns.a2 VALUES (9, TIMESTAMP_NTZ '2024-05-03 09:00:00', 1.0)")
    assert(dayCounts("a2")("2024-05-03") === 1)
    assert(spark.table("gac.ns.a2").count() === 5)
    spark.sql("DROP TABLE gac.ns.a2")
  }

  test("merge-on-read deletes survive the auto-compaction (materialized, not resurrected)") {
    mk("a3", "'auto.compact'='true', 'auto.compact.min_files'='3', 'retain'='10'")
    spark.sql("INSERT INTO gac.ns.a3 VALUES (1, TIMESTAMP_NTZ '2024-05-04 01:00:00', 1.0)," +
      "(2, TIMESTAMP_NTZ '2024-05-04 02:00:00', 2.0)")
    val prev = spark.conf.getOption("spark.graft.delete.mode")
    try {
      spark.conf.set("spark.graft.delete.mode", "merge-on-read")
      graft.plans.MergeInto.sql(spark, "DELETE FROM gac.ns.a3 WHERE id = 2")
    } finally prev match {
      case Some(m) => spark.conf.set("spark.graft.delete.mode", m)
      case None => spark.conf.unset("spark.graft.delete.mode")
    }
    // appends cross the threshold; the compaction rewrites from the
    // deletes-applied snapshot, so id=2 stays deleted
    spark.sql("INSERT INTO gac.ns.a3 VALUES (3, TIMESTAMP_NTZ '2024-05-04 03:00:00', 3.0)")
    spark.sql("INSERT INTO gac.ns.a3 VALUES (4, TIMESTAMP_NTZ '2024-05-04 04:00:00', 4.0)")
    assert(dayCounts("a3")("2024-05-04") === 1)
    assert(spark.table("gac.ns.a3").orderBy("id").collect().map(_.getLong(0)).toSeq
      === Seq(1L, 3L, 4L))
    spark.sql("DROP TABLE gac.ns.a3")
  }
}
