package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.v2.VersionedCatalog

/** Iceberg-style column defaults on the versioned catalog, metadata-only:
  *
  *  - `ADD COLUMN c T DEFAULT v` pins v as the column's INITIAL default —
  *    files written before the ADD (which physically lack the column) read
  *    v instead of NULL, via Spark's own EXISTS_DEFAULT existence-default
  *    machinery in the parquet/orc readers (and the engine's avro leg).
  *  - The same v becomes the WRITE default: an INSERT naming only the other
  *    columns stores v. `ALTER COLUMN c SET DEFAULT w` moves ONLY the write
  *    default; pre-ADD files keep reading v forever (Iceberg v3
  *    initial-default vs write-default split).
  *  - No data file is ever read or rewritten by any of these DDLs.
  */
class ColumnDefaultSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.gdef", classOf[VersionedCatalog].getName)
    s.conf.set("spark.sql.catalog.gdef.warehouse",
      java.nio.file.Files.createTempDirectory("graft_defwh").toString)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gdef.ns")
    s
  }

  private def roundTrip(fmt: String): Unit = {
    val t = s"gdef.ns.d_$fmt"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v STRING) USING $fmt")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a'), (2, 'b')")
    spark.sql(s"ALTER TABLE $t ADD COLUMN score INT DEFAULT 42")
    spark.sql(s"ALTER TABLE $t ADD COLUMN tag STRING DEFAULT 'fresh'")
    // post-ADD inserts: full-width explicit, and one omitting the defaulted
    // columns (write-default path); explicit NULL must stay NULL
    spark.sql(s"INSERT INTO $t VALUES (3, 'c', 7, NULL)")
    spark.sql(s"INSERT INTO $t (k, v) VALUES (4, 'd')")
    val got = spark.table(t).orderBy("k").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(2)) null else r.getInt(2),
        if (r.isNullAt(3)) null else r.getString(3))).toSeq
    assert(got === Seq(
      (1L, 42, "fresh"), (2L, 42, "fresh"), // pre-ADD files: initial default
      (3L, 7, null),                        // explicit values / explicit NULL
      (4L, 42, "fresh")))                   // write default
  }

  test("initial + write defaults round-trip on parquet") { roundTrip("parquet") }
  test("initial + write defaults round-trip on orc") { roundTrip("orc") }
  test("initial + write defaults round-trip on avro") { roundTrip("avro") }

  test("SET DEFAULT moves only the write default; initial default stays pinned") {
    val t = "gdef.ns.setd"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT)")
    spark.sql(s"INSERT INTO $t VALUES (1)")
    spark.sql(s"ALTER TABLE $t ADD COLUMN c INT DEFAULT 5")
    spark.sql(s"ALTER TABLE $t ALTER COLUMN c SET DEFAULT 9")
    spark.sql(s"INSERT INTO $t (k) VALUES (2)")
    val got = spark.table(t).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    // row 1 predates the ADD → initial default 5, NOT the new write default
    assert(got === Seq((1L, 5), (2L, 9)))
    // and a filter on the defaulted column still answers correctly over the
    // mixed file generations
    assert(spark.table(t).where("c = 5").count() === 1)
  }

  test("defaults survive column rename and type widening") {
    val t = "gdef.ns.renw"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT)")
    spark.sql(s"INSERT INTO $t VALUES (1)")
    spark.sql(s"ALTER TABLE $t ADD COLUMN c INT DEFAULT 5")
    spark.sql(s"ALTER TABLE $t RENAME COLUMN c TO score")
    spark.sql(s"ALTER TABLE $t ALTER COLUMN score TYPE BIGINT")
    spark.sql(s"INSERT INTO $t (k) VALUES (2)")
    val got = spark.table(t).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((1L, 5L), (2L, 5L)))
  }

  test("time travel to a pre-ADD snapshot shows the pre-ADD schema era via current schema") {
    val t = "gdef.ns.tt"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT)")
    spark.sql(s"INSERT INTO $t VALUES (1)")
    spark.sql(s"ALTER TABLE $t ADD COLUMN c INT DEFAULT 5")
    spark.sql(s"INSERT INTO $t VALUES (2, 8)")
    // snapshot 1 held only the pre-ADD file; reading it through the current
    // (defaulted) schema fills the initial default — same choice Iceberg
    // makes when a time-travel read uses the table's current schema mapping
    val v1 = spark.sql(s"SELECT * FROM $t VERSION AS OF 1").collect()
    assert(v1.map(r => (r.getLong(0), r.getInt(1))).toSeq === Seq((1L, 5)))
  }
}
