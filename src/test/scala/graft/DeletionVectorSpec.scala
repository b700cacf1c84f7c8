package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{DeleteVectors, ManifestTable}
import graft.sources.v2.{MorDeletes, VersionedCatalog}

/** Deletion vectors: `rewrite_deletes` merges the positional backlog
  * (parquet tombstone files and earlier vectors) into ONE blob with a
  * per-(target, delete-version) section index — readers pay one ranged
  * read per file, the change feed keeps original commit provenance, and
  * every read path (V2 scan, raw ManifestTable read, compaction) applies
  * them identically. */
class DeletionVectorSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.gdv", classOf[VersionedCatalog].getName)
    s.conf.set("spark.sql.catalog.gdv.warehouse",
      Files.createTempDirectory("graft_dvwh").toString)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gdv.ns")
    s
  }
  private def root(t: String) =
    s"${spark.conf.get("spark.sql.catalog.gdv.warehouse")}/ns/$t"

  private def withMorDelete[T](body: => T): T = {
    val prev = spark.conf.getOption("spark.graft.delete.mode")
    spark.conf.set("spark.graft.delete.mode", "merge-on-read")
    try body finally prev match {
      case Some(m) => spark.conf.set("spark.graft.delete.mode", m)
      case None => spark.conf.unset("spark.graft.delete.mode")
    }
  }

  test("position/index codecs round-trip, including empty and large-gap sections") {
    for (positions <- Seq(Seq.empty[Long], Seq(0L), Seq(7L), Seq(0L, 1L, 2L),
        Seq(5L, 1000000L, 123456789012L))) {
      assert(DeleteVectors.decodePositions(
        DeleteVectors.encodePositions(positions)).toSeq === positions)
    }
    val slices = Seq(
      DeleteVectors.Slice("a.parquet", 0L, 12, 3L),
      DeleteVectors.Slice("dir=x y%/b.parquet", 12L, 999, 5L))
    assert(DeleteVectors.decodeIndex(DeleteVectors.encodeIndex(slices)) ===
      Some(slices))
    assert(DeleteVectors.decodeIndex("files=a,b") === None)
  }

  test("merge-on-read DELETE publishes deletion vectors in the SAME commit — one ranged read per tombstoned file, no maintenance needed") {
    import spark.implicits._
    val t = "gdv.ns.direct"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v DOUBLE)")
    (0L until 20000L).map(k => (k, k * 0.5)).toDF("k", "v")
      .repartition(5).writeTo(t).append()                                  // v1
    val r = root("direct")
    withMorDelete {
      graft.plans.MergeInto.sql(spark, s"DELETE FROM $t WHERE k % 40 = 9") // v2
    }
    val backlog = ManifestTable.liveDeleteEntries(r)
    assert(backlog.nonEmpty && backlog.forall(e => ManifestTable.isDvEntry(e.rel)),
      s"the DELETE commit itself must carry dv_*.bin entries: ${backlog.map(_.rel)}")
    // slice delete-versions are stamped with the COMMIT's version (the
    // write-time sentinel must never reach a committed manifest)
    val slices = backlog.flatMap(e => DeleteVectors.decodeIndex(e.stats.get).get)
    assert(slices.nonEmpty && slices.forall(_.seq === 2L),
      s"slice versions must be the DELETE's commit version: ${slices.map(_.seq).distinct}")
    assert(slices.map(_.relEnc).distinct.size === 5, "every tombstoned file sliced")

    // scans between DML and maintenance pay ranged slice reads ONLY —
    // zero parquet tombstone scans, at most one load per slice
    val pqBefore = MorDeletes.positionLoads.get()
    val dvBefore = MorDeletes.dvSliceLoads.get()
    assert(spark.table(t).count() === 20000L - 500)
    assert(MorDeletes.positionLoads.get() - pqBefore === 0,
      "direct DV commit must leave no parquet tombstones to scan")
    val dvLoads = MorDeletes.dvSliceLoads.get() - dvBefore
    assert(dvLoads > 0 && dvLoads <= slices.size,
      s"one ranged read per slice at most (cache-shared): $dvLoads vs ${slices.size}")
    spark.sql(s"DROP TABLE $t")
  }

  test("merge-on-read UPDATE carries its tombstones as a deletion vector and still classifies as update in the feed") {
    import spark.implicits._
    val t = "gdv.ns.updv"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v STRING)")
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
      .coalesce(1).writeTo(t).append()                                     // v1
    val r = root("updv")
    val prev = spark.conf.getOption("spark.graft.update.mode")
    spark.conf.set("spark.graft.update.mode", "merge-on-read")
    try graft.plans.MergeInto.sql(spark, s"UPDATE $t SET v = 'B' WHERE k = 2") // v2
    finally prev match {
      case Some(m) => spark.conf.set("spark.graft.update.mode", m)
      case None => spark.conf.unset("spark.graft.update.mode")
    }
    val dels = ManifestTable.liveDeleteEntries(r)
    assert(dels.nonEmpty && dels.forall(e => ManifestTable.isDvEntry(e.rel)),
      s"the UPDATE commit must carry its tombstones as dv_*.bin: ${dels.map(_.rel)}")
    val feed = spark.table(s"$t.changes")
      .select($"k", $"_change_type", $"_commit_version")
      .as[(Long, String, Long)].collect().toSet
    assert(feed.contains((2L, "update_preimage", 2L)) &&
      feed.contains((2L, "update_postimage", 2L)),
      s"DV-carrying update commit must still classify as update: $feed")
    assert(spark.table(t).orderBy($"k").select($"v").as[String].collect().toSeq ===
      Seq("a", "B", "c"))
    spark.sql(s"DROP TABLE $t")
  }

  test("rewrite merges the parquet backlog into ONE deletion vector; reads stay exact") {
    import spark.implicits._
    val t = "gdv.ns.merge"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v DOUBLE)")
    (0L until 10000L).map(k => (k, k * 0.5)).toDF("k", "v")
      .repartition(4).writeTo(t).append()
    val r = root("merge")
    withMorDelete {
      graft.plans.MergeInto.sql(spark, s"DELETE FROM $t WHERE k % 100 = 7")  // v2
      graft.plans.MergeInto.sql(spark, s"DELETE FROM $t WHERE k % 100 = 13") // v3
    }
    // DML writes deletion vectors DIRECTLY — one per commit; the rewrite
    // still merges the two-blob backlog into one
    val backlog = ManifestTable.liveDeleteEntries(r)
    assert(backlog.size === 2 && backlog.forall(e => ManifestTable.isDvEntry(e.rel)))

    ManifestTable.rewriteDeletes(spark, r)
    val merged = ManifestTable.liveDeleteEntries(r)
    assert(merged.size === 1 && ManifestTable.isDvEntry(merged.head.rel),
      s"backlog must become one deletion vector: ${merged.map(_.rel)}")
    // the merged entry keeps the NEWEST source version as its sequence —
    // a stream past v3 must not see the rewrite as a new delete
    assert(merged.head.seq === Some(3L))
    // index covers all four data files, with per-section ORIGINAL versions
    val slices = DeleteVectors.decodeIndex(merged.head.stats.get).get
    assert(slices.map(_.relEnc).distinct.size === 4)
    assert(slices.map(_.seq).toSet === Set(2L, 3L))

    // V2 scan and raw ManifestTable read both apply the vector exactly
    val expect = (0L until 10000L).filterNot(k => k % 100 == 7 || k % 100 == 13)
    assert(spark.table(t).select($"k").as[Long].collect().sorted.toSeq === expect)
    assert(ManifestTable.read(spark, r).select($"k").as[Long]
      .collect().sorted.toSeq === expect)
    spark.sql(s"DROP TABLE $t")
  }

  test("delete application costs ONE ranged slice read per file (executor-cached)") {
    import spark.implicits._
    val t = "gdv.ns.cost"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v DOUBLE)")
    (0L until 20000L).map(k => (k, k * 0.5)).toDF("k", "v")
      .repartition(6).writeTo(t).append()
    val r = root("cost")
    withMorDelete {
      graft.plans.MergeInto.sql(spark, s"DELETE FROM $t WHERE k % 50 = 1")
      graft.plans.MergeInto.sql(spark, s"DELETE FROM $t WHERE k % 50 = 2")
      graft.plans.MergeInto.sql(spark, s"DELETE FROM $t WHERE k % 50 = 3")
    }
    ManifestTable.rewriteDeletes(spark, r)
    val merged = ManifestTable.liveDeleteEntries(r)
    assert(merged.size === 1 && ManifestTable.isDvEntry(merged.head.rel))
    val nSlices = DeleteVectors.decodeIndex(merged.head.stats.get).get.size

    val pqBefore = MorDeletes.positionLoads.get()
    val dvBefore = MorDeletes.dvSliceLoads.get()
    assert(spark.table(t).count() === 20000L - 3 * 400)
    val pqLoads = MorDeletes.positionLoads.get() - pqBefore
    val dvLoads = MorDeletes.dvSliceLoads.get() - dvBefore
    assert(pqLoads === 0, "no parquet tombstone scan should remain after the rewrite")
    assert(dvLoads > 0 && dvLoads <= nSlices,
      s"at most one ranged read per slice (cache-shared): $dvLoads vs $nSlices slices")
    spark.sql(s"DROP TABLE $t")
  }

  test("the change feed keeps ORIGINAL delete versions across the vector merge") {
    import spark.implicits._
    val t = "gdv.ns.cdf"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v STRING)")
    Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("k", "v")
      .coalesce(1).writeTo(t).append()                                    // v1
    val r = root("cdf")
    withMorDelete {
      graft.plans.MergeInto.sql(spark, s"DELETE FROM $t WHERE k = 2")     // v2
      graft.plans.MergeInto.sql(spark, s"DELETE FROM $t WHERE k = 4")     // v3
    }
    val before = spark.table(s"$t.changes")
      .select($"k", $"_change_type", $"_commit_version")
      .as[(Long, String, Long)].collect().toSet
    ManifestTable.rewriteDeletes(spark, r)                                // v4
    assert(ManifestTable.liveDeleteEntries(r).forall(e => ManifestTable.isDvEntry(e.rel)))
    val after = spark.table(s"$t.changes")
      .select($"k", $"_change_type", $"_commit_version")
      .as[(Long, String, Long)].collect().toSet
    assert(after === before, "maintenance must be invisible to the feed")
    assert(after.contains((2L, "delete", 2L)) && after.contains((4L, "delete", 3L)))

    // a change-feed stream that already consumed the deletes sees an
    // EMPTY window across the rewrite, not a re-delivery
    val checkpoint = Files.createTempDirectory("dv_ck").toString
    val sink = Files.createTempDirectory("dv_sink").toString + "/out"
    def drain(): Unit = {
      val q = spark.readStream.table(s"$t.changes").writeStream
        .format("parquet").option("path", sink)
        .option("checkpointLocation", checkpoint)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain()
    val n1 = spark.read.parquet(sink).count()
    withMorDelete {
      graft.plans.MergeInto.sql(spark, s"DELETE FROM $t WHERE k = 3")     // v5
    }
    ManifestTable.rewriteDeletes(spark, r)                                // v6
    drain()
    val rows = spark.read.parquet(sink)
      .select($"k", $"_change_type", $"_commit_version")
      .as[(Long, String, Long)].collect()
    assert(rows.length === n1 + 1, s"exactly the one new delete event: ${rows.toSeq}")
    assert(rows.contains((3L, "delete", 5L)))
    spark.sql(s"DROP TABLE $t")
  }

  test("second engine: duckdb decodes deletion vectors through the protocol") {
    import spark.implicits._
    val t = "gdv.ns.duck"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v DOUBLE)")
    (0L until 2000L).map(k => (k, k * 0.5)).toDF("k", "v")
      .repartition(3).writeTo(t).append()
    val r = root("duck")
    withMorDelete {
      graft.plans.MergeInto.sql(spark, s"DELETE FROM $t WHERE k % 10 = 3")
      graft.plans.MergeInto.sql(spark, s"DELETE FROM $t WHERE k % 10 = 6")
    }
    ManifestTable.rewriteDeletes(spark, r)
    assert(ManifestTable.liveDeleteEntries(r).forall(e => ManifestTable.isDvEntry(e.rel)))

    import scala.sys.process._
    val script = new java.io.File("scripts/duckdb_versioned.py").getAbsolutePath
    val out = Seq("python3", script, r,
      "SELECT COUNT(*) AS c, SUM(k) AS s FROM t").!!
    val nums = out.linesIterator.toSeq.last.trim.split("\\s+")
    val sparkRow = spark.table(t).agg(count(lit(1)), sum($"k")).collect()(0)
    assert(nums(0).toLong === sparkRow.getLong(0), s"duckdb count diverged: $out")
    assert(nums(1).toDouble.toLong === sparkRow.getLong(1), s"duckdb sum diverged: $out")
    spark.sql(s"DROP TABLE $t")
  }

  test("vectors and fresh parquet tombstones coexist; the next rewrite folds both") {
    import spark.implicits._
    val t = "gdv.ns.mix"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v DOUBLE)")
    (0L until 1000L).map(k => (k, k * 1.0)).toDF("k", "v")
      .coalesce(2).writeTo(t).append()
    val r = root("mix")
    withMorDelete {
      graft.plans.MergeInto.sql(spark, s"DELETE FROM $t WHERE k < 100")
      graft.plans.MergeInto.sql(spark, s"DELETE FROM $t WHERE k >= 900")
    }
    ManifestTable.rewriteDeletes(spark, r)
    // an EXTERNAL CDC writer stages a parquet tombstone file (the
    // pre-vector shape) against the merged-vector table: find k=500's
    // physical position by reading its data file in file order
    val dataRels = ManifestTable.liveEntries(r).map(_.rel)
      .filterNot(ManifestTable.isDeleteEntry)
    val hit = dataRels.flatMap { rel =>
      val ks = spark.read.parquet(s"$r/data/$rel").select($"k").as[Long].collect()
      val i = ks.indexOf(500L)
      if (i >= 0) Some((ManifestTable.encodedRel(r, rel), i.toLong)) else None
    }
    assert(hit.size === 1)
    ManifestTable.appendDeletesParquet(hit.toDF("__file", "__pos"), r)
    val mixed = ManifestTable.liveDeleteEntries(r)
    assert(mixed.exists(e => ManifestTable.isDvEntry(e.rel)) &&
      mixed.exists(e => !ManifestTable.isDvEntry(e.rel)))
    val expect = (100L until 1000L).filterNot(k => k >= 900 || k == 500)
    assert(spark.table(t).select($"k").as[Long].collect().sorted.toSeq === expect)

    ManifestTable.rewriteDeletes(spark, r)
    val merged = ManifestTable.liveDeleteEntries(r)
    assert(merged.size === 1 && ManifestTable.isDvEntry(merged.head.rel))
    assert(spark.table(t).select($"k").as[Long].collect().sorted.toSeq === expect)

    // compaction (raw read path) materializes the vector away
    ManifestTable.compact(spark, r, None)
    assert(!ManifestTable.hasDeletes(r))
    assert(spark.table(t).select($"k").as[Long].collect().sorted.toSeq === expect)
    spark.sql(s"DROP TABLE $t")
  }

  test("a DENSE delete fans out across dv blobs, splitting one file's positions") {
    import spark.implicits._
    val t = "gdv.ns.dense"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v DOUBLE)")
    (0L until 1000L).map(k => (k, k * 0.5)).toDF("k", "v")
      .repartition(2).writeTo(t).append()                                  // v1
    val r = root("dense")
    val prevBlob = spark.conf.getOption("spark.graft.delete.dvRowsPerBlob")
    spark.conf.set("spark.graft.delete.dvRowsPerBlob", "100")
    try withMorDelete {
      graft.plans.MergeInto.sql(spark, s"DELETE FROM $t WHERE k % 10 < 8")  // v2
    } finally prevBlob match {
      case Some(v) => spark.conf.set("spark.graft.delete.dvRowsPerBlob", v)
      case None => spark.conf.unset("spark.graft.delete.dvRowsPerBlob")
    }
    // 800 tombstones over 2 files at 100 rows/blob: the write fans out
    // (capped by 64), so each of the 2 dense files spans several blobs —
    // a file's positions are NOT atomic to one slice
    val dvs = ManifestTable.liveDeleteEntries(r)
      .filter(e => ManifestTable.isDvEntry(e.rel))
    assert(dvs.size >= 4, s"dense delete must fan out, got ${dvs.size} blobs")
    val slices = dvs.flatMap(e => DeleteVectors.decodeIndex(e.stats.getOrElse("")).get)
    val perFile = slices.groupBy(_.relEnc).values.map(_.size)
    assert(perFile.exists(_ >= 2),
      s"a dense file's positions must split across slices: $perFile")
    assert(slices.forall(_.seq == 2L), "every slice stamps the DML's version")

    // reads union the split slices exactly: scan, and the change feed
    assert(spark.table(t).select($"k").as[Long].collect().toSet ===
      (0L until 1000L).filter(_ % 10 >= 8).toSet)
    val dels = spark.table(s"$t.changes")
      .where($"_change_type" === "delete")
      .select($"k", $"_commit_version").as[(Long, Long)].collect()
    assert(dels.length === 800 && dels.forall(_._2 == 2L))
    assert(dels.map(_._1).toSet === (0L until 1000L).filter(_ % 10 < 8).toSet)
    spark.sql(s"DROP TABLE $t")
  }
}
