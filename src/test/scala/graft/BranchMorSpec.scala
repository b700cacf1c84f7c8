package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ManifestTable
import graft.sources.v2.VersionedCatalog

/** Merge-on-read deletes × named branches — the write-audit-publish
  * pattern applied to DELETE commits: tombstones staged on a branch must
  * be invisible to main (and to time-travel reads of pre-delete
  * snapshots) until the branch is published, because delete entries live
  * in the MANIFEST of the commit that created them, and a scan resolves
  * deletes from its own snapshot's manifest only.
  *
  * (The r9 branch specs covered staged DATA commits; these cover staged
  * positional and equality DELETE commits.)
  */
class BranchMorSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.gbm", classOf[VersionedCatalog].getName)
    s.conf.set("spark.sql.catalog.gbm.warehouse",
      java.nio.file.Files.createTempDirectory("graft_bmwh").toString)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gbm.ns")
    s
  }
  private def wh = spark.conf.get("spark.sql.catalog.gbm.warehouse")

  /** Move main's pointer back to `v` through the public ref surface
    * (branch-at-v + publish) — the engine's rollback idiom. */
  private def rollbackMain(root: String, v: Long): Unit = {
    ManifestTable.createBranch(root, "rb_tmp", Some(v))
    ManifestTable.publishBranch(root, "rb_tmp")
    ManifestTable.dropRef(root, "rb_tmp")
  }

  test("positional MOR deletes staged on a branch: invisible on main and on pre-delete snapshots until publish") {
    val t = "gbm.ns.posb"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v STRING)")
    import spark.implicits._
    (0L until 100L).map(i => (i, s"r$i")).toDF("k", "v")
      .repartition(4).writeTo(t).append()
    val root = s"$wh/ns/posb"
    val v1 = ManifestTable.currentVersion(root).get

    val prev = spark.conf.getOption("spark.graft.delete.mode")
    try {
      spark.conf.set("spark.graft.delete.mode", "merge-on-read")
      graft.plans.MergeInto.sql(spark, s"DELETE FROM $t WHERE k % 2 = 0")
    } finally prev match {
      case Some(m) => spark.conf.set("spark.graft.delete.mode", m)
      case None => spark.conf.unset("spark.graft.delete.mode")
    }
    val v2 = ManifestTable.currentVersion(root).get
    assert(ManifestTable.hasDeletes(root), "expected a MOR delete commit")

    // stage: branch pins the delete commit, main rolls back to v1
    ManifestTable.createBranch(root, "audit", Some(v2))
    rollbackMain(root, v1)

    assert(spark.table(t).count() === 100,
      "tombstones staged on the branch leaked into main")
    assert(spark.sql(s"SELECT * FROM $t VERSION AS OF $v1").count() === 100,
      "a pre-delete snapshot applied a later commit's tombstones")
    val branchRows = spark.sql(s"SELECT * FROM $t VERSION AS OF 'audit'")
    assert(branchRows.count() === 50)
    assert(branchRows.where("k % 2 = 0").count() === 0)

    // publish: one pointer flip and main reads exactly the audited bytes
    ManifestTable.publishBranch(root, "audit")
    assert(spark.table(t).count() === 50)
    assert(spark.table(t).where("k % 2 = 0").count() === 0)
    spark.sql(s"DROP TABLE $t")
  }

  test("equality deletes staged on a branch: retraction invisible on main until publish, sequence scoping survives") {
    val t = "gbm.ns.eqb"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v STRING)")
    import spark.implicits._
    (0L until 40L).map(i => (i, s"r$i")).toDF("k", "v").writeTo(t).append()
    val root = s"$wh/ns/eqb"
    val v1 = ManifestTable.currentVersion(root).get

    // CDC-style key retraction (no positions known) committed at v2
    ManifestTable.appendEqualityDeletes(
      (0L until 40L by 4L).toDF("k"), root, retain = 4)
    val v2 = ManifestTable.currentVersion(root).get
    ManifestTable.createBranch(root, "cdc_audit", Some(v2))
    rollbackMain(root, v1)

    assert(spark.table(t).count() === 40,
      "staged equality deletes leaked into main")
    assert(spark.sql(s"SELECT * FROM $t VERSION AS OF 'cdc_audit'").count() === 30)

    ManifestTable.publishBranch(root, "cdc_audit")
    assert(spark.table(t).count() === 30)
    assert(spark.table(t).where("k % 4 = 0").count() === 0)

    // sequence scoping after publish: re-inserting a retracted key lands
    // at a NEWER commit sequence, so the published eq delete can't touch it
    Seq((4L, "again")).toDF("k", "v").writeTo(t).append()
    assert(spark.table(t).where("k = 4").count() === 1)
    spark.sql(s"DROP TABLE $t")
  }
}
