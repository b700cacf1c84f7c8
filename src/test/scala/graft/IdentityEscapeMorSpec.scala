package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.v2.VersionedCatalog

/** Merge-on-read deletes on IDENTITY layouts whose partition values need
  * URI escaping (spaces, '%'): row identity (`_metadata`-derived,
  * URL-encoded) and the manifest rels (raw directory names) live in two
  * encodings, and every comparison along the tombstone path must bridge
  * them — a one-sided compare silently detaches the tombstones from
  * their files and deleted rows resurrect. */
class IdentityEscapeMorSpec extends AnyFunSuite {
  private lazy val wh = java.nio.file.Files.createTempDirectory("graft_iewh").toString
  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.gie", classOf[VersionedCatalog].getName)
    s.conf.set("spark.sql.catalog.gie.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gie.ns")
    s
  }

  test("MOR delete under an escaped identity value: rows stay deleted everywhere") {
    spark.sql("DROP TABLE IF EXISTS gie.ns.esc")
    spark.sql("CREATE TABLE gie.ns.esc (k BIGINT, region STRING, v DOUBLE) " +
      "PARTITIONED BY (region) TBLPROPERTIES('retain'='5')")
    import spark.implicits._
    (0L until 40L).map(i => (i, if (i % 2 == 0) "north america" else "emea%zone", i * 1.0))
      .toDF("k", "region", "v").createOrReplaceTempView("esc_src")
    spark.sql("INSERT INTO gie.ns.esc SELECT * FROM esc_src")
    val prev = spark.conf.getOption("spark.graft.delete.mode")
    try {
      spark.conf.set("spark.graft.delete.mode", "merge-on-read")
      graft.plans.MergeInto.sql(spark, "DELETE FROM gie.ns.esc WHERE k % 4 = 0")
    } finally prev match {
      case Some(m) => spark.conf.set("spark.graft.delete.mode", m)
      case None => spark.conf.unset("spark.graft.delete.mode")
    }
    val root = s"$wh/ns/esc"
    assert(graft.sources.ManifestTable.hasDeletes(root),
      "setup must leave merge-on-read artifacts")
    // the catalog scan must not resurrect: k%4==0 rows are gone in both
    // partitions, incl. the escaped ones
    assert(spark.table("gie.ns.esc").where(col("k") % 4 === 0).count() === 0L,
      "deleted rows resurrected through the escaped identity dir")
    assert(spark.table("gie.ns.esc").count() === 30L)
    // and a second MOR delete over the same files composes
    try {
      spark.conf.set("spark.graft.delete.mode", "merge-on-read")
      graft.plans.MergeInto.sql(spark, "DELETE FROM gie.ns.esc WHERE k % 4 = 1")
    } finally prev match {
      case Some(m) => spark.conf.set("spark.graft.delete.mode", m)
      case None => spark.conf.unset("spark.graft.delete.mode")
    }
    assert(spark.table("gie.ns.esc").count() === 20L)
    // maintenance folds the backlog without losing attribution
    spark.sql("CALL gie.system.rewrite_deletes(`table` => 'ns.esc')")
    assert(spark.table("gie.ns.esc").count() === 20L)
    assert(spark.table("gie.ns.esc").where(col("k") % 4 <= 1).count() === 0L)
    spark.sql("DROP TABLE gie.ns.esc")
  }
}
