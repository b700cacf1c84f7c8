package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.v2.VersionedCatalog

/** Full-table DELETE (`DELETE FROM t` with no / an all-true predicate):
  * a legitimate operation — retention wipes, GDPR erasure of a whole
  * cohort table — that must leave a readable EMPTY table with history
  * intact, not an error about unrepresentable manifests. */
class DeleteAllSpec extends AnyFunSuite {
  private lazy val wh = java.nio.file.Files.createTempDirectory("graft_dawh").toString
  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.gda", classOf[VersionedCatalog].getName)
    s.conf.set("spark.sql.catalog.gda.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gda.ns")
    s
  }

  test("DELETE FROM t without WHERE empties the table; history survives") {
    spark.sql("DROP TABLE IF EXISTS gda.ns.d1")
    spark.sql("CREATE TABLE gda.ns.d1 (k BIGINT, v DOUBLE)")
    spark.sql("ALTER TABLE gda.ns.d1 SET TBLPROPERTIES('retain'='5')")
    spark.sql("INSERT INTO gda.ns.d1 VALUES (1, 1.0), (2, 2.0)")
    val root = s"$wh/ns/d1"
    val v1 = graft.sources.ManifestTable.currentVersion(root).get
    graft.plans.MergeInto.sql(spark, "DELETE FROM gda.ns.d1")
    assert(spark.table("gda.ns.d1").count() === 0L)
    // the wipe is a COMMIT: pre-wipe history stays addressable
    assert(spark.sql(s"SELECT COUNT(*) FROM gda.ns.d1 VERSION AS OF $v1")
      .collect()(0).getLong(0) === 2L)
    // and the table lives on: inserts land normally
    spark.sql("INSERT INTO gda.ns.d1 VALUES (3, 3.0)")
    assert(spark.table("gda.ns.d1").collect().map(_.getLong(0)).toSeq === Seq(3L))
    spark.sql("DROP TABLE gda.ns.d1")
  }

  test("an all-true predicate takes the same path") {
    spark.sql("DROP TABLE IF EXISTS gda.ns.d2")
    spark.sql("CREATE TABLE gda.ns.d2 (k BIGINT)")
    spark.sql("INSERT INTO gda.ns.d2 VALUES (1), (2)")
    graft.plans.MergeInto.sql(spark, "DELETE FROM gda.ns.d2 WHERE k >= 0")
    assert(spark.table("gda.ns.d2").count() === 0L)
    spark.sql("DROP TABLE gda.ns.d2")
  }
}
