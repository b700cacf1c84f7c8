package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ManifestTable
import graft.sources.v2.VersionedCatalog

/** Equality deletes (Iceberg v2 / Flink-CDC shape): key-addressed
  * retraction with no data read, scoped by commit sequence so same-key
  * re-inserts survive; coexistence with positional tombstones; compaction
  * materializes everything away.
  */
class EqualityDeleteSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.geq", classOf[VersionedCatalog].getName)
    s.conf.set("spark.sql.catalog.geq.warehouse",
      Files.createTempDirectory("graft_eqwh").toString)
    s
  }

  private def root(tbl: String) = VersionedCatalog.warehouseOf("geq").get + "/ns/" + tbl

  test("eq-delete retracts by key without touching data files; re-inserts survive by sequence") {
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS geq.ns")
    spark.sql("DROP TABLE IF EXISTS geq.ns.ed")
    (0L until 1000L).map(i => (i % 50, i, s"u${i % 50}-$i")).toDF("uid", "n", "s")
      .repartition(3).writeTo("geq.ns.ed").create()                  // seq 1
    val r = root("ed")
    val dataBefore = ManifestTable.liveEntries(r).map(_.rel)
      .filterNot(ManifestTable.isDeleteEntry).toSet

    // retract three user keys — a pure metadata+keys commit
    Seq(7L, 13L, 21L).toDF("uid").createOrReplaceTempView("ed_keys")
    ManifestTable.appendEqualityDeletes(spark.table("ed_keys"), r)   // seq 2
    assert(ManifestTable.liveEntries(r).map(_.rel)
      .filterNot(ManifestTable.isDeleteEntry).toSet === dataBefore,
      "an equality delete must rewrite zero data files")
    assert(ManifestTable.liveDeleteEntries(r)
      .exists(e => ManifestTable.isEqDeleteEntry(e.rel)))

    // V2 scan and the DataFrame read agree, both minus the retracted keys
    val expect = (0L until 1000L).filterNot(i => Set(7L, 13L, 21L)(i % 50))
    assert(spark.table("geq.ns.ed").count() === expect.size.toLong)
    assert(ManifestTable.read(spark, r).count() === expect.size.toLong)
    // projection WITHOUT the key column exercises widen-and-project
    val ns = spark.table("geq.ns.ed").select("n").collect().map(_.getLong(0)).sorted
    assert(ns.toSeq === expect.sorted)

    // a LATER insert of a retracted key has a newer sequence and survives
    Seq((7L, 100007L, "back")).toDF("uid", "n", "s")
      .writeTo("geq.ns.ed").append()                                 // seq 3
    assert(spark.table("geq.ns.ed").where(col("uid") === 7L).count() === 1)
    assert(ManifestTable.read(spark, r).where(col("uid") === 7L).count() === 1)
    spark.sql("DROP TABLE geq.ns.ed")
  }

  test("positional and equality deletes coexist on one table") {
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS geq.ns")
    spark.sql("DROP TABLE IF EXISTS geq.ns.mix")
    (0L until 500L).map(i => (i % 20, i)).toDF("uid", "n")
      .repartition(2).writeTo("geq.ns.mix").create()
    val r = root("mix")

    spark.conf.set("spark.graft.delete.mode", "merge-on-read")
    try graft.plans.MergeInto.sql(spark, "DELETE FROM geq.ns.mix WHERE n % 5 = 1")
    finally spark.conf.unset("spark.graft.delete.mode")
    ManifestTable.appendEqualityDeletes(Seq(3L).toDF("uid"), r)

    val expect = (0L until 500L).filter(i => i % 5 != 1 && i % 20 != 3)
    assert(spark.table("geq.ns.mix").count() === expect.size.toLong)
    assert(ManifestTable.read(spark, r).count() === expect.size.toLong)
    val scan = spark.table("geq.ns.mix").queryExecution.executedPlan
      .collect { case b: BatchScanExec => b }.head
    assert(scan.scan.description().contains("equality-delete"))
    assert(scan.supportsColumnar, "mixed-delete scans stay vectorized")
    spark.sql("DROP TABLE geq.ns.mix")
  }

  test("compaction materializes equality deletes; retraction and re-insert semantics survive it") {
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS geq.ns")
    spark.sql("DROP TABLE IF EXISTS geq.ns.cp")
    (0L until 300L).map(i => (i % 10, i)).toDF("uid", "n")
      .repartition(2).writeTo("geq.ns.cp").create()                  // seq 1
    val r = root("cp")
    ManifestTable.appendEqualityDeletes(Seq(4L).toDF("uid"), r)      // seq 2
    Seq((4L, 9999L)).toDF("uid", "n").writeTo("geq.ns.cp").append()  // seq 3
    val before = spark.table("geq.ns.cp").orderBy("n")
      .collect().map(r0 => (r0.getLong(0), r0.getLong(1))).toSeq

    spark.sql("CALL geq.system.optimize(`table` => 'ns.cp')")
    assert(ManifestTable.liveDeleteEntries(r).isEmpty,
      "compaction must materialize every delete entry away")
    val after = spark.table("geq.ns.cp").orderBy("n")
      .collect().map(r0 => (r0.getLong(0), r0.getLong(1))).toSeq
    assert(after === before, "compaction must be invisible in the data")
    assert(after.count(_._1 == 4L) === 1, "only the re-inserted key-4 row remains")
    spark.sql("DROP TABLE geq.ns.cp")
  }

  test("second engine: duckdb applies sequence-scoped equality deletes through the protocol") {
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS geq.ns")
    spark.sql("DROP TABLE IF EXISTS geq.ns.dk")
    (0L until 200L).map(i => (i % 10, i)).toDF("uid", "n")
      .repartition(2).writeTo("geq.ns.dk").create()                  // seq 1
    val r = root("dk")
    ManifestTable.appendEqualityDeletes(Seq(4L).toDF("uid"), r)      // seq 2
    Seq((4L, 8888L)).toDF("uid", "n").writeTo("geq.ns.dk").append()  // seq 3

    import scala.sys.process._
    val script = new java.io.File("scripts/duckdb_versioned.py").getAbsolutePath
    val out = Seq("python3", script, r, "SELECT COUNT(*) AS c, SUM(n) AS s FROM t").!!
    val nums = out.linesIterator.toSeq.last.trim.split("\\s+")
    val sparkRow = spark.table("geq.ns.dk").agg(count(lit(1)), sum("n")).collect()(0)
    assert(nums(0).toLong === sparkRow.getLong(0), s"duckdb count diverged: $out")
    assert(nums(1).toDouble.toLong === sparkRow.getLong(1), s"duckdb sum diverged: $out")
    spark.sql("DROP TABLE geq.ns.dk")
  }

  test("first eq-delete on an upgraded pre-sequence table still retracts the legacy rows") {
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS geq.ns")
    spark.sql("DROP TABLE IF EXISTS geq.ns.lg")
    (0L until 100L).map(i => (i % 10, i)).toDF("uid", "n")
      .coalesce(1).writeTo("geq.ns.lg").create()
    val r = root("lg")
    // simulate a manifest written BEFORE sequences existed: strip every
    // seq= field from the live manifest's inline entries
    val v = ManifestTable.versions(r).last
    val mf = s"$r/manifests/v=$v.txt"
    val legacy = graft.sources.MetaIO.readString(mf).linesIterator
      .map(_.replaceAll("\tseq=\\d+", "")).mkString("\n")
    graft.sources.MetaIO.writeAtomic(mf, legacy)
    assert(ManifestTable.liveEntries(r).forall(_.seq.contains(0L)),
      "legacy entries must parse as sequence 0 (older than everything)")

    // the FIRST sequence-stamping commit is the eq-delete itself: carried
    // legacy data must stay strictly older than it, or the retraction
    // silently no-ops (the carried entries would share its sequence)
    ManifestTable.appendEqualityDeletes(Seq(3L).toDF("uid"), r)
    val expect = (0L until 100L).filterNot(_ % 10 == 3)
    assert(spark.table("geq.ns.lg").count() === expect.size.toLong,
      "eq-delete must retract rows of pre-sequence (legacy) data files")
    assert(ManifestTable.read(spark, r).count() === expect.size.toLong)
    spark.sql("DROP TABLE geq.ns.lg")
  }

  test("eq-delete key outside the projection on a RENAMED identity-partitioned table") {
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS geq.ns")
    spark.sql("DROP TABLE IF EXISTS geq.ns.rnp")
    spark.sql("CREATE TABLE geq.ns.rnp (uid BIGINT, n BIGINT, region STRING) " +
      "PARTITIONED BY (region)")
    (0L until 200L).map(i => (i % 20, i, if (i % 2 == 0) "na" else "eu"))
      .toDF("uid", "n", "region").writeTo("geq.ns.rnp").append()
    spark.sql("ALTER TABLE geq.ns.rnp RENAME COLUMN n TO amount") // RenamedScan delegate
    val r = root("rnp")
    ManifestTable.appendEqualityDeletes(Seq(5L).toDF("uid"), r)
    // projection lacks the key (widen-and-project) AND includes the
    // identity partition column — the partition ordinals of the physical
    // batch exceed the renamed delegate's logical readSchema, so the
    // projection schema must come from the real batch layout
    val got = spark.table("geq.ns.rnp").select("amount", "region")
      .collect().map(x => (x.getLong(0), x.getString(1)))
    val expect = (0L until 200L).filterNot(_ % 20 == 5)
      .map(i => (i, if (i % 2 == 0) "na" else "eu"))
    assert(got.sorted.toSeq === expect.sorted)
    spark.sql("DROP TABLE geq.ns.rnp")
  }

  test("rewrite_deletes shrinks the backlog without data rewrites; GC reclaims superseded files") {
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS geq.ns")
    spark.sql("DROP TABLE IF EXISTS geq.ns.rw")
    (0L until 500L).map(i => (i % 20, i)).toDF("uid", "n")
      .repartition(3).writeTo("geq.ns.rw").create()                  // seq 1
    val r = root("rw")
    def dataRels = ManifestTable.liveEntries(r).map(_.rel)
      .filterNot(ManifestTable.isDeleteEntry).toSet
    def delRels = ManifestTable.liveDeleteEntries(r).map(_.rel)

    spark.conf.set("spark.graft.delete.mode", "merge-on-read")
    try {
      graft.plans.MergeInto.sql(spark, "DELETE FROM geq.ns.rw WHERE n % 7 = 1")
      graft.plans.MergeInto.sql(spark, "DELETE FROM geq.ns.rw WHERE n % 7 = 3")
    } finally spark.conf.unset("spark.graft.delete.mode")
    val dataBefore = dataRels
    val mergedAway = delRels
    assert(mergedAway.size === 2)
    val expect1 = spark.table("geq.ns.rw").orderBy("n")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq

    // STAGE 1 — merge: two positional files fold into one, zero data IO
    ManifestTable.rewriteDeletes(spark, r)
    assert(dataRels === dataBefore, "a deletes-only rewrite must not touch data files")
    assert(delRels.size === 1)
    assert(spark.table("geq.ns.rw").orderBy("n")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq === expect1,
      "the merged backlog must read identically")
    // idempotent: nothing left to shrink, version unchanged
    val vAfter = ManifestTable.currentVersion(r).get
    assert(ManifestTable.rewriteDeletes(spark, r) === vAfter)

    // STAGE 2 — inert files drop: an eq-delete retracts uid=5, then a
    // copy-on-write UPDATE rewrites every data file, leaving BOTH the
    // merged positional file (targets gone) and the eq file (no older
    // data left) inert — the rewrite drops them all
    ManifestTable.appendEqualityDeletes(Seq(5L).toDF("uid"), r)
    graft.plans.MergeInto.sql(spark, "UPDATE geq.ns.rw SET n = n")
    val expect2 = spark.table("geq.ns.rw").orderBy("n")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(expect2 === expect1.filterNot(_._1 == 5L))
    ManifestTable.rewriteDeletes(spark, r)
    assert(delRels.isEmpty, "inert positional and equality files must drop")
    assert(spark.table("geq.ns.rw").orderBy("n")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq === expect2)

    // STAGE 3 — GC: expiring superseded snapshots reclaims the old
    // delete files from the pool (grace zeroed so the sweep sees them)
    spark.conf.set("spark.graft.manifest.orphanFileGraceMs", "0")
    try ManifestTable.expireOldVersions(r, retain = 1)
    finally spark.conf.unset("spark.graft.manifest.orphanFileGraceMs")
    mergedAway.foreach { rel =>
      assert(!graft.sources.MetaIO.exists(s"$r/data/$rel"),
        s"superseded delete file $rel must be reclaimed by GC")
    }
    spark.sql("DROP TABLE geq.ns.rw")
  }

  test("eq-delete key sets load ONCE per executor, not once per task") {
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS geq.ns")
    spark.sql("DROP TABLE IF EXISTS geq.ns.ec")
    (0L until 2000L).map(i => (i % 40, i)).toDF("uid", "n")
      .repartition(8).writeTo("geq.ns.ec").create()     // 8 data files
    val r = root("ec")
    ManifestTable.appendEqualityDeletes(Seq(9L).toDF("uid"), r)

    val t = spark.table("geq.ns.ec")
    val nParts = t.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b }.head.scan.toBatch.planInputPartitions().length
    assert(nParts > 1, s"fixture must scan several partitions, got $nParts")
    val before = graft.sources.v2.MorDeletes.eqKeyLoads.get()
    assert(t.count() === 2000L - 50L)
    val firstScan = graft.sources.v2.MorDeletes.eqKeyLoads.get() - before
    assert(firstScan === 1L,
      s"one eq-delete file must load once per executor JVM, loaded $firstScan times " +
        s"across $nParts partitions")
    assert(t.where(col("uid") === 8L).count() === 50L)
    assert(graft.sources.v2.MorDeletes.eqKeyLoads.get() - before === 1L,
      "a second scan must hit the executor cache, not re-read the delete file")
    spark.sql("DROP TABLE geq.ns.ec")
  }

  test("string keys, NULL keys, and multi-column keys retract exactly") {
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS geq.ns")
    spark.sql("DROP TABLE IF EXISTS geq.ns.sk")
    Seq(("a", 1L, 1.0), ("b", 2L, 2.0), (null, 3L, 3.0), ("a", 2L, 4.0), ("c", 1L, 5.0))
      .toDF("k", "g", "v").coalesce(1).writeTo("geq.ns.sk").create()
    val r = root("sk")
    // composite (k, g) key; the NULL key row must match a NULL key entry
    Seq(("a", 1L), (null.asInstanceOf[String], 3L)).toDF("k", "g")
      .createOrReplaceTempView("sk_keys")
    ManifestTable.appendEqualityDeletes(spark.table("sk_keys"), r)
    val got = spark.table("geq.ns.sk").select("v").collect().map(_.getDouble(0)).sorted
    assert(got.toSeq === Seq(2.0, 4.0, 5.0))
    assert(ManifestTable.read(spark, r).select("v")
      .collect().map(_.getDouble(0)).sorted.toSeq === Seq(2.0, 4.0, 5.0))
    spark.sql("DROP TABLE geq.ns.sk")
  }
}
