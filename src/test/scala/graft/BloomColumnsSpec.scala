package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.v2.VersionedCatalog

/** Writer-side bloom filters (`bloom.columns` table property — Delta's
  * bloom-filter index / Iceberg's `write.parquet.bloom-filter-enabled`
  * shape): every pool write emits a per-row-group bloom for the declared
  * columns, so scan-time point lookups on high-cardinality keys skip row
  * groups that min/max bounds cannot prune. Write-side only — stock
  * parquet/ORC readers consult the filter under pushed equality
  * predicates; pre-declaration files simply carry none. */
class BloomColumnsSpec extends AnyFunSuite {
  private lazy val wh = java.nio.file.Files.createTempDirectory("graft_blwh").toString
  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.gbl", classOf[VersionedCatalog].getName)
    s.conf.set("spark.sql.catalog.gbl.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gbl.ns")
    s
  }

  /** Column names with a bloom filter in the first row group of each
    * parquet pool file under the table root. */
  private def bloomedCols(tbl: String): Seq[Set[String]] = {
    val conf = spark.sparkContext.hadoopConfiguration
    graft.sources.MetaIO.listFilesRec(s"$wh/ns/$tbl/data")
      .filter(_.getPath.getName.endsWith(".parquet")).map { st =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(st.getPath, conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          import scala.jdk.CollectionConverters._
          r.getFooter.getBlocks.asScala.headOption.toSeq
            .flatMap(_.getColumns.asScala)
            .filter(_.getBloomFilterOffset >= 0)
            .map(_.getPath.toDotString).toSet
        } finally r.close()
      }
  }

  test("declared columns carry parquet bloom filters; others do not") {
    spark.sql("DROP TABLE IF EXISTS gbl.ns.b1")
    spark.sql("CREATE TABLE gbl.ns.b1 (k BIGINT, s STRING, v DOUBLE) " +
      "TBLPROPERTIES('bloom.columns'='k,s', 'bloom.ndv'='10000')")
    import spark.implicits._
    (0L until 5000L).map(i => (i, s"key-$i", i * 0.5)).toDF("k", "s", "v")
      .createOrReplaceTempView("b1_src")
    spark.sql("INSERT INTO gbl.ns.b1 SELECT * FROM b1_src")
    val perFile = bloomedCols("b1")
    assert(perFile.nonEmpty)
    perFile.foreach { cols =>
      assert(cols.contains("k") && cols.contains("s"), s"missing blooms: $cols")
      assert(!cols.contains("v"), "undeclared column must carry no bloom")
    }
    // correctness under pushed equality (the predicate that consults the
    // bloom at scan time)
    assert(spark.table("gbl.ns.b1").where(col("k") === 4321L).count() === 1L)
    assert(spark.table("gbl.ns.b1").where(col("s") === "nope").count() === 0L)
    spark.sql("DROP TABLE gbl.ns.b1")
  }

  test("the bloom excludes row groups stats and dictionaries cannot") {
    // xxhash64 keys: PLAIN encoded (dictionary falls back on the
    // cardinality), min/max span the full int64 range — the ONLY
    // structure that can exclude the row group for an absent key is the
    // bloom. Proven through parquet-mr's own row-group filtering, the
    // machinery the scan runs per task.
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS gbl.ns.b5")
    spark.sql("DROP TABLE IF EXISTS gbl.ns.b5n")
    spark.sql("CREATE TABLE gbl.ns.b5 (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES('bloom.columns'='k', 'bloom.ndv'='300000')")
    spark.sql("CREATE TABLE gbl.ns.b5n (k BIGINT, v BIGINT)")
    val keyed = spark.range(300000L)
      .select(xxhash64(col("id")).as("k"), (col("id") % 7L).as("v")).coalesce(1)
    keyed.writeTo("gbl.ns.b5").append()
    keyed.writeTo("gbl.ns.b5n").append()
    def candidates(tbl: String): Long = {
      val hconf = spark.sparkContext.hadoopConfiguration
      val pred = org.apache.parquet.filter2.predicate.FilterApi.eq(
        org.apache.parquet.filter2.predicate.FilterApi.longColumn("k"),
        java.lang.Long.valueOf(42L))
      graft.sources.MetaIO.listFilesRec(s"$wh/ns/$tbl/data")
        .filter(_.getPath.getName.endsWith(".parquet"))
        .map(st => graft.sources.ParquetProbe
          .filteredCount(st.getPath, hconf, pred)._1).sum
    }
    assert(candidates("b5n") === 300000L,
      "nothing else may exclude full-range PLAIN row groups")
    assert(candidates("b5") === 0L, "the bloom must exclude the row group")
    spark.sql("DROP TABLE gbl.ns.b5"); spark.sql("DROP TABLE gbl.ns.b5n")
  }

  test("UNSET stops stamping new files; renames follow the physical column") {
    spark.sql("DROP TABLE IF EXISTS gbl.ns.b2")
    spark.sql("CREATE TABLE gbl.ns.b2 (k BIGINT, v DOUBLE) " +
      "TBLPROPERTIES('bloom.columns'='k')")
    spark.sql("INSERT INTO gbl.ns.b2 VALUES (1, 1.0)")
    assert(bloomedCols("b2").forall(_.contains("k")))
    spark.sql("ALTER TABLE gbl.ns.b2 UNSET TBLPROPERTIES('bloom.columns')")
    spark.sql("INSERT INTO gbl.ns.b2 VALUES (2, 2.0)")
    val perFile = bloomedCols("b2")
    assert(perFile.exists(_.isEmpty), "post-UNSET file must carry no bloom")
    // rename: the physical column keeps its name; the marker (physical
    // names) keeps stamping it and reads keep pruning
    spark.sql("ALTER TABLE gbl.ns.b2 SET TBLPROPERTIES('bloom.columns'='k')")
    spark.sql("ALTER TABLE gbl.ns.b2 RENAME COLUMN k TO key")
    spark.sql("INSERT INTO gbl.ns.b2 VALUES (3, 3.0)")
    assert(spark.table("gbl.ns.b2").where(col("key") === 3L).count() === 1L)
    spark.sql("DROP TABLE gbl.ns.b2")
  }

  test("mixed-case columns get blooms (per-column keys are case-exact)") {
    // DataFrameWriter.options lowercases keys through CaseInsensitiveMap,
    // which would silently miss `parquet.bloom.filter.enabled#UserId`;
    // the keys ride the session-clone conf instead (case preserved)
    spark.sql("DROP TABLE IF EXISTS gbl.ns.bmc")
    spark.sql("CREATE TABLE gbl.ns.bmc (UserId BIGINT, v DOUBLE) " +
      "TBLPROPERTIES('bloom.columns'='UserId', 'bloom.ndv'='10000')")
    import spark.implicits._
    (0L until 5000L).map(i => (i, i * 0.5)).toDF("UserId", "v")
      .createOrReplaceTempView("bmc_src")
    spark.sql("INSERT INTO gbl.ns.bmc SELECT * FROM bmc_src")
    val perFile = bloomedCols("bmc")
    assert(perFile.nonEmpty && perFile.forall(_.contains("UserId")),
      s"mixed-case column must carry a bloom, got $perFile")
    spark.sql("DROP TABLE gbl.ns.bmc")
  }

  test("refusal matrix: unknown column, non-atomic type, avro tables, bad ndv") {
    spark.sql("DROP TABLE IF EXISTS gbl.ns.b3")
    val e1 = intercept[Exception] {
      spark.sql("CREATE TABLE gbl.ns.b3 (k BIGINT) TBLPROPERTIES('bloom.columns'='nope')")
    }
    assert(e1.getMessage.contains("no such column"))
    val e2 = intercept[Exception] {
      spark.sql("CREATE TABLE gbl.ns.b3 (k BIGINT, a ARRAY<INT>) " +
        "TBLPROPERTIES('bloom.columns'='a')")
    }
    assert(e2.getMessage.contains("atomic"))
    val e3 = intercept[Exception] {
      spark.sql("CREATE TABLE gbl.ns.b3 (k BIGINT) USING avro " +
        "TBLPROPERTIES('bloom.columns'='k')")
    }
    assert(e3.getMessage.contains("avro"))
    val e4 = intercept[Exception] {
      spark.sql("CREATE TABLE gbl.ns.b3 (k BIGINT) " +
        "TBLPROPERTIES('bloom.columns'='k', 'bloom.ndv'='-5')")
    }
    assert(e4.getMessage.contains("positive"))
    // a failed CREATE leaves nothing behind
    assert(!spark.catalog.tableExists("gbl.ns.b3"))
  }

  test("orc tables stamp the orc writer bloom (proven by the stream bytes)") {
    // identical data written with and without the declaration: the bloom
    // stream makes the stamped file strictly larger — a behavioral proof
    // the per-write option reached the ORC writer (the stream kinds live
    // in stripe footers no public reader API lists)
    import spark.implicits._
    val rows = (0L until 20000L).map(i => (i, i * 0.5))
    def poolBytes(tbl: String): Long =
      graft.sources.MetaIO.listFilesRec(s"$wh/ns/$tbl/data")
        .filter(_.getPath.getName.endsWith(".orc")).map(_.getLen).sum
    spark.sql("DROP TABLE IF EXISTS gbl.ns.b4")
    spark.sql("DROP TABLE IF EXISTS gbl.ns.b4n")
    spark.sql("CREATE TABLE gbl.ns.b4 (k BIGINT, v DOUBLE) USING orc " +
      "TBLPROPERTIES('bloom.columns'='k')")
    spark.sql("CREATE TABLE gbl.ns.b4n (k BIGINT, v DOUBLE) USING orc")
    rows.toDF("k", "v").coalesce(1).createOrReplaceTempView("b4_src")
    spark.sql("INSERT INTO gbl.ns.b4 SELECT * FROM b4_src")
    spark.sql("INSERT INTO gbl.ns.b4n SELECT * FROM b4_src")
    assert(poolBytes("b4") > poolBytes("b4n"),
      "bloom-declared orc file must carry extra stream bytes")
    assert(spark.table("gbl.ns.b4").where(col("k") === 7L).count() === 1L)
    spark.sql("DROP TABLE gbl.ns.b4"); spark.sql("DROP TABLE gbl.ns.b4n")
  }
}
