package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ManifestTable
import graft.sources.v2.VersionedCatalog

/** SHALLOW CLONE (Delta's `CREATE TABLE … SHALLOW CLONE`, Iceberg's
  * snapshot-table action): zero-copy table clones through `ext/` manifest
  * references into the source pool.
  *
  * Contract under test:
  *  - the clone is a METADATA-only commit (its own pool is empty);
  *  - reads (incl. hidden-day pruning and time-addressed planning) see
  *    the source's snapshot exactly;
  *  - the clone DIVERGES: appends land locally, merge-on-read DELETEs
  *    tombstone source-pooled files, the source never changes;
  *  - OPTIMIZE localizes (ext entries leave the manifest; source files
  *    survive untouched);
  *  - the clone's GC / orphan sweep never deletes a file outside its
  *    root;
  *  - positional merge-on-read sources clone (deletes-applied reads,
  *    clone-side maintenance, horizon-fenced change feeds);
  *  - equality-delete backlogs clone: the carried sequence stamps
  *    rank-compact into the clone's version space (the clone commit
  *    allocates above them), so retraction and re-insert survival are
  *    exactly preserved;
  *  - the refusal matrix: clone of a live clone, existing target,
  *    identity layouts.
  *
  * Reference behavior anchor: Delta CLONE semantics (shallow clones
  * reference source files; VACUUM on the source is the documented
  * hazard) — re-expressed over the manifest format.
  */
class CloneSpec extends AnyFunSuite {
  private lazy val wh = java.nio.file.Files.createTempDirectory("graft_clwh").toString
  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.gcl", classOf[VersionedCatalog].getName)
    s.conf.set("spark.sql.catalog.gcl.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gcl.ns")
    s
  }

  private def root(tbl: String) = s"$wh/ns/$tbl"
  private def poolFiles(tbl: String): Seq[String] = {
    val d = s"${root(tbl)}/data"
    if (!new java.io.File(d).exists()) Nil
    else graft.sources.MetaIO.listFilesRec(d).map(_.getPath.toString)
  }

  private def mkSource(tbl: String, partitioned: Boolean = true): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS gcl.ns.$tbl")
    val part = if (partitioned) "PARTITIONED BY (days(ts))" else ""
    spark.sql(s"CREATE TABLE gcl.ns.$tbl (id BIGINT, ts TIMESTAMP_NTZ, v DOUBLE) $part")
    import spark.implicits._
    (0 until 120).map { i =>
      (i.toLong, java.time.LocalDateTime.of(2024, 2, 1 + i % 6, i % 24, 0), i * 1.0)
    }.toDF("id", "ts", "v").createOrReplaceTempView(s"${tbl}_src")
    spark.sql(s"INSERT INTO gcl.ns.$tbl SELECT * FROM ${tbl}_src")
  }

  test("clone is metadata-only and reads the source snapshot exactly") {
    mkSource("s1")
    val srcRows = spark.table("gcl.ns.s1").orderBy("id").collect()
    val v = spark.sql("CALL gcl.system.clone(source => 'ns.s1', target => 'ns.s1c')")
      .collect()(0).getLong(0)
    assert(v >= 1L)
    assert(poolFiles("s1c").isEmpty, "clone wrote data files — not zero-copy")
    assert(ManifestTable.liveEntries(root("s1c"))
      .forall(e => ManifestTable.isExtEntry(e.rel)), "clone entries must be ext/")
    val got = spark.table("gcl.ns.s1c").orderBy("id").collect()
    assert(got.toSeq === srcRows.toSeq)
    // day pruning still fires over ext entries: the filtered plan reads
    // fewer manifest entries than the full table holds
    val n = spark.table("gcl.ns.s1c")
      .where(col("ts") >= lit("2024-02-02").cast("timestamp_ntz") &&
        col("ts") < lit("2024-02-03").cast("timestamp_ntz")).count()
    assert(n === 20L)
    spark.sql("DROP TABLE gcl.ns.s1c"); spark.sql("DROP TABLE gcl.ns.s1")
  }

  test("clone diverges: local appends and MOR deletes never touch the source") {
    mkSource("s2")
    spark.sql("CALL gcl.system.clone(source => 'ns.s2', target => 'ns.s2c')")
    val srcFiles = poolFiles("s2").sorted
    val srcCount = spark.table("gcl.ns.s2").count()
    import spark.implicits._
    Seq((1000L, java.time.LocalDateTime.of(2024, 2, 9, 0, 0), 5.0))
      .toDF("id", "ts", "v").createOrReplaceTempView("s2_extra")
    spark.sql("INSERT INTO gcl.ns.s2c SELECT * FROM s2_extra")
    assert(poolFiles("s2c").nonEmpty, "the append must land in the clone's pool")
    val prev = spark.conf.getOption("spark.graft.delete.mode")
    try {
      spark.conf.set("spark.graft.delete.mode", "merge-on-read")
      graft.plans.MergeInto.sql(spark, "DELETE FROM gcl.ns.s2c WHERE id % 4 = 1")
    } finally prev match {
      case Some(m) => spark.conf.set("spark.graft.delete.mode", m)
      case None => spark.conf.unset("spark.graft.delete.mode")
    }
    // tombstones against SOURCE-pooled files apply on the clone…
    assert(spark.table("gcl.ns.s2c").where(col("id") % 4 === 1).count() === 0L)
    assert(spark.table("gcl.ns.s2c").count() === srcCount + 1 - 30)
    // …and the source is byte-identical (same files, same rows)
    assert(poolFiles("s2").sorted === srcFiles)
    assert(spark.table("gcl.ns.s2").count() === srcCount)
    spark.sql("DROP TABLE gcl.ns.s2c"); spark.sql("DROP TABLE gcl.ns.s2")
  }

  test("OPTIMIZE localizes the clone; source files survive") {
    mkSource("s3")
    spark.sql("CALL gcl.system.clone(source => 'ns.s3', target => 'ns.s3c')")
    val srcFiles = poolFiles("s3").sorted
    val before = spark.table("gcl.ns.s3c").orderBy("id").collect()
    spark.sql("CALL gcl.system.optimize(`table` => 'ns.s3c')")
    assert(ManifestTable.liveEntries(root("s3c"))
      .forall(e => !ManifestTable.isExtEntry(e.rel)),
      "OPTIMIZE must localize every ext entry")
    assert(poolFiles("s3c").nonEmpty)
    assert(poolFiles("s3").sorted === srcFiles, "source pool must be untouched")
    assert(spark.table("gcl.ns.s3c").orderBy("id").collect().toSeq === before.toSeq)
    // a localized clone can be cloned again
    spark.sql("CALL gcl.system.clone(source => 'ns.s3c', target => 'ns.s3cc')")
    assert(spark.table("gcl.ns.s3cc").count() === before.length.toLong)
    spark.sql("DROP TABLE gcl.ns.s3cc"); spark.sql("DROP TABLE gcl.ns.s3c")
    spark.sql("DROP TABLE gcl.ns.s3")
  }

  test("the clone's gc and orphan sweep never delete source files") {
    mkSource("s4")
    spark.sql("ALTER TABLE gcl.ns.s4 SET TBLPROPERTIES('retain'='1')")
    spark.sql("CALL gcl.system.clone(source => 'ns.s4', target => 'ns.s4c')")
    spark.sql("ALTER TABLE gcl.ns.s4c SET TBLPROPERTIES('retain'='1')")
    val srcFiles = poolFiles("s4").sorted
    // churn the clone: localize (drops ext), then expire history + sweep
    spark.sql("CALL gcl.system.optimize(`table` => 'ns.s4c')")
    spark.sql("CALL gcl.system.expire_snapshots(`table` => 'ns.s4c', retain => 1)")
    spark.sql("CALL gcl.system.remove_orphan_files(`table` => 'ns.s4c', " +
      "older_than => '2099-01-01 00:00:00')")
    assert(poolFiles("s4").sorted === srcFiles,
      "clone lifecycle must never reach into the source pool")
    assert(spark.table("gcl.ns.s4c").count() === spark.table("gcl.ns.s4").count())
    spark.sql("DROP TABLE gcl.ns.s4c"); spark.sql("DROP TABLE gcl.ns.s4")
  }

  test("fsck on a clone detects source-side file loss") {
    mkSource("s5", partitioned = false)
    spark.sql("CALL gcl.system.clone(source => 'ns.s5', target => 'ns.s5c')")
    val healthy = spark.sql("CALL gcl.system.fsck(`table` => 'ns.s5c')").collect()(0)
    assert(healthy.getBoolean(8), "fresh clone must fsck healthy")
    // simulate the documented hazard: the SOURCE's lifecycle removes a
    // file the clone still references
    val victim = new java.io.File(
      new org.apache.hadoop.fs.Path(poolFiles("s5").head).toUri.getPath)
    assert(victim.delete())
    val broken = spark.sql("CALL gcl.system.fsck(`table` => 'ns.s5c')").collect()(0)
    assert(broken.getLong(3) >= 1L, "missing source file must surface")
    assert(!broken.getBoolean(8))
    spark.sql("DROP TABLE gcl.ns.s5c"); spark.sql("DROP TABLE gcl.ns.s5")
  }

  test("a positional-MOR source clones: deletes apply through the ext pool") {
    mkSource("s9", partitioned = false)
    // a second source commit pushes the DELETE to source version 3 —
    // ABOVE any version the young clone will have, so carried slice
    // sequences left un-stamped would read as FUTURE events there
    import spark.implicits._
    Seq((500L, java.time.LocalDateTime.of(2024, 2, 8, 0, 0), 5.0))
      .toDF("id", "ts", "v").createOrReplaceTempView("s9_extra")
    spark.sql("INSERT INTO gcl.ns.s9 SELECT * FROM s9_extra")
    val prev = spark.conf.getOption("spark.graft.delete.mode")
    try {
      spark.conf.set("spark.graft.delete.mode", "merge-on-read")
      graft.plans.MergeInto.sql(spark, "DELETE FROM gcl.ns.s9 WHERE id % 5 = 0")
    } finally prev match {
      case Some(m) => spark.conf.set("spark.graft.delete.mode", m)
      case None => spark.conf.unset("spark.graft.delete.mode")
    }
    assert(ManifestTable.hasDeletes(root("s9")), "setup needs a live DV")
    val srcRows = spark.table("gcl.ns.s9").orderBy("id").collect()
    spark.sql("CALL gcl.system.clone(source => 'ns.s9', target => 'ns.s9c')")
    assert(poolFiles("s9c").isEmpty, "still zero-copy with delete artifacts")
    // the clone reads the deletes-APPLIED snapshot exactly
    assert(spark.table("gcl.ns.s9c").orderBy("id").collect().toSeq === srcRows.toSeq)
    assert(spark.table("gcl.ns.s9c").where(col("id") % 5 === 0).count() === 0L)
    // clone-side maintenance folds the carried backlog into a LOCAL blob
    spark.sql("CALL gcl.system.rewrite_deletes(`table` => 'ns.s9c')")
    assert(spark.table("gcl.ns.s9c").orderBy("id").collect().toSeq === srcRows.toSeq)
    // fsck on the delete-carrying clone verifies ext targets + slices
    assert(spark.sql("CALL gcl.system.fsck(`table` => 'ns.s9c')")
      .collect()(0).getBoolean(8), "delete-carrying clone must fsck healthy")
    // the second engine applies the carried tombstones too
    import scala.sys.process._
    val script = new java.io.File("scripts/duckdb_versioned.py").getAbsolutePath
    val out = Seq("python3", script, root("s9c"),
      "SELECT COUNT(*) AS n FROM t").!!
    assert(out.linesIterator.toSeq.last.trim.toLong === srcRows.length.toLong,
      s"duckdb diverged on the delete-carrying clone: $out")
    // a plain STREAM refuses the row-level first snapshot loudly
    assert(graft.sources.ManifestTable.liveProps(root("s9c"))
      .get(graft.sources.ManifestTable.ChangeProp).contains("1"),
      "clone with carried deletes must stamp the change horizon")
    // BATCH change feed: the horizon makes the clone's first version an
    // opaque state (it packs an entire foreign history — no row-level
    // reconstruction is honest), so the feed is EMPTY rather than wrong
    assert(spark.table("gcl.ns.s9c.changes").count() === 0L,
      "the opaque clone state must not fabricate change events")
    // STREAMING change feed: the initial snapshot serves the LIVE rows
    // (deletes applied) as inserts — the surface an incremental consumer
    // actually starts from
    val q = spark.readStream.table("gcl.ns.s9c.changes")
      .writeStream.format("memory").queryName("s9c_cdf")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val snap = spark.table("s9c_cdf").collect()
    assert(snap.forall(_.getString(snap.head.schema.fieldIndex("_change_type")) == "insert"))
    assert(snap.map(_.getLong(0)).sorted.toSeq === srcRows.map(_.getLong(0)).toSeq.sorted,
      "the streaming snapshot must be the deletes-applied live rows")
    // carried slice sequences were re-stamped to the clone's version
    // space: an append advancing the clone PAST the source's delete
    // version must surface ONLY its own inserts — un-stamped source
    // sequences would fabricate delete/update events here
    Seq((600L, java.time.LocalDateTime.of(2024, 2, 8, 1, 0), 6.0),
        (601L, java.time.LocalDateTime.of(2024, 2, 8, 2, 0), 6.1))
      .toDF("id", "ts", "v").createOrReplaceTempView("s9c_extra")
    spark.sql("INSERT INTO gcl.ns.s9c SELECT * FROM s9c_extra")
    spark.sql("INSERT INTO gcl.ns.s9c SELECT id + 10, ts, v FROM s9c_extra")
    val post = spark.table("gcl.ns.s9c.changes").collect()
    assert(post.forall(_.getString(post.head.schema.fieldIndex("_change_type")) == "insert"),
      "clone CDF past the source's delete version must not fabricate events")
    assert(post.length === 4)
    // and fsck stays healthy with the clone at a version BELOW the
    // source's delete version (no 'future sequence' false alarm)
    assert(spark.sql("CALL gcl.system.fsck(`table` => 'ns.s9c')")
      .collect()(0).getBoolean(8))
    spark.sql("DROP TABLE gcl.ns.s9c"); spark.sql("DROP TABLE gcl.ns.s9")
  }

  test("refusal matrix: diverged clone source, existing target (no phantom descriptor)") {
    mkSource("s6", partitioned = false)
    // target exists
    mkSource("s6t", partitioned = false)
    val e1 = intercept[Exception] {
      spark.sql("CALL gcl.system.clone(source => 'ns.s6', target => 'ns.s6t')")
    }
    assert(e1.getMessage.contains("already exists"))
    spark.sql("DROP TABLE gcl.ns.s6t")
    // an UNDIVERGED clone clones (flattened — see the dedicated test);
    // a DIVERGED one (local files mixed with ext references — two pools,
    // one _clone_src slot) is the genuinely unresolvable shape
    spark.sql("CALL gcl.system.clone(source => 'ns.s6', target => 'ns.s6c')")
    import spark.implicits._
    Seq((900L, java.time.LocalDateTime.of(2024, 2, 9, 0, 0), 9.0))
      .toDF("id", "ts", "v").writeTo("gcl.ns.s6c").append() // diverge
    val e2 = intercept[Exception] {
      spark.sql("CALL gcl.system.clone(source => 'ns.s6c', target => 'ns.s6cc')")
    }
    assert(e2.getMessage.contains("DIVERGED"))
    assert(!spark.catalog.tableExists("gcl.ns.s6cc"),
      "refused clone must not leave a descriptor behind")
    spark.sql("DROP TABLE gcl.ns.s6c"); spark.sql("DROP TABLE gcl.ns.s6")
  }

  test("clone of an undiverged clone FLATTENS to the original base: exact reads, healthy fsck, droppable intermediate") {
    mkSource("s7", partitioned = false)
    spark.sql("CALL gcl.system.clone(source => 'ns.s7', target => 'ns.s7c')")
    spark.sql("CALL gcl.system.clone(source => 'ns.s7c', target => 'ns.s7cc')")
    // flattened: the grandchild's base is the ORIGINAL pool, not the
    // intermediate's (which has no pool of its own anyway)
    assert(graft.sources.MetaIO.readString(s"${root("s7cc")}/_clone_src").trim
      === s"${root("s7")}/data")
    assert(poolFiles("s7cc").isEmpty, "clone-of-clone stays metadata-only")
    assert(spark.table("gcl.ns.s7cc").orderBy("id").collect().toSeq ===
      spark.table("gcl.ns.s7").orderBy("id").collect().toSeq)
    val f = spark.sql("CALL gcl.system.fsck(`table` => 'ns.s7cc')").collect()(0)
    assert(f.getBoolean(8), "clone-of-clone must fsck healthy")
    // the INTERMEDIATE can drop — the grandchild never references it
    spark.sql("DROP TABLE gcl.ns.s7c")
    assert(spark.table("gcl.ns.s7cc").count() === 120L)
    // gc isolation: the grandchild's expiry deletes nothing under the base
    val baseFiles = poolFiles("s7").toSet
    spark.sql("CALL gcl.system.expire_snapshots(`table` => 'ns.s7cc', retain => 1)")
    assert(poolFiles("s7").toSet === baseFiles)
    // and it diverges freely like any first-generation clone
    import spark.implicits._
    Seq((999L, java.time.LocalDateTime.of(2024, 2, 9, 0, 0), 9.9))
      .toDF("id", "ts", "v").writeTo("gcl.ns.s7cc").append()
    assert(spark.table("gcl.ns.s7cc").count() === 121L)
    assert(spark.table("gcl.ns.s7").count() === 120L, "base untouched")
    spark.sql("DROP TABLE gcl.ns.s7cc"); spark.sql("DROP TABLE gcl.ns.s7")
  }

  test("equality-delete backlog clones: retraction, re-insert survival, CDF horizon all intact") {
    mkSource("s7", partitioned = false)
    import spark.implicits._
    // two eq-delete commits at DIFFERENT source versions, with a
    // re-insert BETWEEN them: id=5 is retracted by the v2 delete, then
    // re-inserted at v3 (survives — newer sequence), while v4 retracts
    // id=7; the carried relation has three distinct ranks to preserve
    ManifestTable.appendEqualityDeletes(Seq(5L, 7L).toDF("id"), root("s7"), retain = 9) // v2
    Seq((5L, java.time.LocalDateTime.of(2024, 2, 7, 0, 0), 55.0))
      .toDF("id", "ts", "v").createOrReplaceTempView("s7_reins")
    spark.sql("INSERT INTO gcl.ns.s7 SELECT * FROM s7_reins")                           // v3
    ManifestTable.appendEqualityDeletes(Seq(7L).toDF("id"), root("s7"), retain = 9)     // v4
    val srcRows = spark.table("gcl.ns.s7").orderBy("id").collect()
    assert(srcRows.count(_.getLong(0) == 5L) === 1, "setup: re-insert must survive")
    assert(!srcRows.exists(_.getLong(0) == 7L), "setup: id=7 retracted")

    val v = spark.sql("CALL gcl.system.clone(source => 'ns.s7', target => 'ns.s7c')")
      .collect()(0).getLong(0)
    val dstRoot = root("s7c")
    // zero-copy with the eq backlog carried as ext/ entries
    assert(poolFiles("s7c").isEmpty, "eq-backlog clone must stay zero-copy")
    val carried = ManifestTable.liveEntries(dstRoot)
    assert(carried.forall(e => ManifestTable.isExtEntry(e.rel)))
    assert(carried.exists(e => ManifestTable.isEqDeleteEntry(e.rel)))
    // rank-compacted stamps: every carried seq in 1..k, clone commit at k+1
    val k = carried.flatMap(_.seq).max
    assert(carried.flatMap(_.seq).toSet === (1L to k).toSet,
      "carried stamps must rank-compact to a dense 1..k")
    assert(v === k + 1, s"clone commit must allocate above the carried stamps (v=$v k=$k)")
    // reads are deletes-applied and byte-identical to the source
    assert(spark.table("gcl.ns.s7c").orderBy("id").collect().toSeq === srcRows.toSeq)
    // CDF horizon: carried row-level state is fenced — the batch feed is
    // empty, not fabricated
    assert(ManifestTable.liveProps(dstRoot)
      .get(ManifestTable.ChangeProp).contains(v.toString),
      "clone with carried deletes must stamp the change horizon at its own version")
    assert(spark.table("gcl.ns.s7c.changes").count() === 0L)
    // a LATER re-insert of a retracted key survives the carried eq
    // deletes (its commit sequence lands above every carried stamp)
    Seq((7L, java.time.LocalDateTime.of(2024, 2, 8, 0, 0), 77.0))
      .toDF("id", "ts", "v").createOrReplaceTempView("s7c_reins")
    spark.sql("INSERT INTO gcl.ns.s7c SELECT * FROM s7c_reins")
    val after = spark.table("gcl.ns.s7c").where("id = 7").collect()
    assert(after.length === 1 && after(0).getDouble(2) === 77.0,
      "post-clone re-insert must survive the carried eq retraction")
    // the post-horizon CDF window surfaces ONLY the new insert
    val post = spark.table("gcl.ns.s7c.changes").collect()
    assert(post.length === 1 &&
      post(0).getString(post(0).schema.fieldIndex("_change_type")) == "insert")
    // source never moved; fsck healthy on both sides
    assert(spark.table("gcl.ns.s7").orderBy("id").collect().toSeq === srcRows.toSeq)
    assert(spark.sql("CALL gcl.system.fsck(`table` => 'ns.s7c')")
      .collect()(0).getBoolean(8), "fsck must stay healthy on the eq clone")
    // second engine: duckdb resolves the eq-backlog clone — ext/ rels
    // through _clone_src AND the rank-compacted per-row sequence scoping
    // (row_seq < eq_seq) must agree with the Spark read
    locally {
      import scala.sys.process._
      val script = new java.io.File("scripts/duckdb_versioned.py").getAbsolutePath
      val out = Seq("python3", script, dstRoot,
        "SELECT COUNT(*) AS n, SUM(id) AS s FROM t").!!
      val expect = spark.table("gcl.ns.s7c")
        .agg(count(lit(1)), sum(col("id"))).collect()(0)
      assert(out.contains(expect.getLong(0).toString) &&
        out.contains(expect.getLong(1).toString),
        s"duckdb disagrees on the eq clone: $out vs $expect")
    }
    spark.sql("DROP TABLE gcl.ns.s7c"); spark.sql("DROP TABLE gcl.ns.s7")
  }

  test("second engine: duckdb resolves a clone through _clone_src, no Spark") {
    mkSource("s8", partitioned = false)
    spark.sql("CALL gcl.system.clone(source => 'ns.s8', target => 'ns.s8c')")
    import spark.implicits._
    Seq((2000L, java.time.LocalDateTime.of(2024, 2, 9, 0, 0), 7.0))
      .toDF("id", "ts", "v").createOrReplaceTempView("s8_extra")
    spark.sql("INSERT INTO gcl.ns.s8c SELECT * FROM s8_extra") // mixed pools
    import scala.sys.process._
    val script = new java.io.File("scripts/duckdb_versioned.py").getAbsolutePath
    val out = Seq("python3", script, root("s8c"),
      "SELECT COUNT(*) AS n, SUM(id) AS s FROM t").!!
    val nums = out.linesIterator.toSeq.last.trim.split("\\s+")
    val sparkRows = spark.table("gcl.ns.s8c")
      .agg(count(lit(1)), sum("id")).collect()(0)
    assert(nums(0).toLong === sparkRows.getLong(0), s"duckdb count diverged: $out")
    assert(nums(1).toDouble.toLong === sparkRows.getLong(1), s"duckdb sum diverged: $out")
    spark.sql("DROP TABLE gcl.ns.s8c"); spark.sql("DROP TABLE gcl.ns.s8")
  }

  test("descriptor carries over: CHECK constraints and stats ride the clone") {
    mkSource("s7", partitioned = false)
    spark.sql("ALTER TABLE gcl.ns.s7 SET TBLPROPERTIES('check.pos' = 'v >= 0')")
    spark.sql("CALL gcl.system.clone(source => 'ns.s7', target => 'ns.s7c')")
    import spark.implicits._
    Seq((-1L, java.time.LocalDateTime.of(2024, 2, 1, 0, 0), -5.0))
      .toDF("id", "ts", "v").createOrReplaceTempView("s7_bad")
    val e = intercept[Exception] {
      spark.sql("INSERT INTO gcl.ns.s7c SELECT * FROM s7_bad")
    }
    assert(e.getMessage != null)
    // NDV sidecar carried: the clone's stats table reports estimates at v1
    val st = spark.table("gcl.ns.s7c.stats")
    assert(st.where(col("ndv").isNotNull).count() > 0,
      "clone must inherit the source's NDV sketch")
    spark.sql("DROP TABLE gcl.ns.s7c"); spark.sql("DROP TABLE gcl.ns.s7")
  }

  test("a failed clone leaves nothing durable; a foreign _clone_src is never overwritten") {
    mkSource("s9")
    // (a) a pre-existing sidecar from a DIFFERENT base refuses the clone
    //     and survives untouched — overwriting it would re-point a
    //     concurrent clone's committed ext/ entries at the wrong pool
    val dstA = root("s9xa")
    graft.sources.MetaIO.writeAtomic(s"$dstA/_clone_src", "/somewhere/else/data")
    val e = intercept[IllegalArgumentException](
      ManifestTable.cloneTo(root("s9"), dstA))
    assert(e.getMessage.contains("_clone_src"), e.getMessage)
    assert(graft.sources.MetaIO.readString(s"$dstA/_clone_src").trim ===
      "/somewhere/else/data")
    // (b) a clone that fails INSIDE the commit loop (simulated raced
    //     version floor) removes the sidecar it created: nothing durable
    val dstB = root("s9xb")
    graft.sources.MetaIO.writeAtomic(s"$dstB/_MAXV", "5")
    val e2 = intercept[Exception](ManifestTable.cloneTo(root("s9"), dstB))
    assert(e2.getMessage.contains("floor") || e2.getMessage.contains("raced"),
      e2.getMessage)
    assert(!graft.sources.MetaIO.exists(s"$dstB/_clone_src"),
      "a failed clone must not leave its _clone_src behind")
    spark.sql("DROP TABLE gcl.ns.s9")
  }

  test("CALL localize materializes ext references: diverged clone-of-clone unlocks, source gc cannot strand the clone") {
    mkSource("s8")
    spark.sql("CALL gcl.system.clone(source => 'ns.s8', target => 'ns.s8c')")
    // DIVERGE the clone: a local append + a MOR DELETE tombstoning
    // source-pooled files (the artifacts must localize too)
    import spark.implicits._
    Seq((2000L, java.time.LocalDateTime.of(2024, 2, 3, 1, 0), 7.0))
      .toDF("id", "ts", "v").createOrReplaceTempView("s8_extra")
    spark.sql("INSERT INTO gcl.ns.s8c SELECT * FROM s8_extra")
    val prev = spark.conf.getOption("spark.graft.delete.mode")
    try {
      spark.conf.set("spark.graft.delete.mode", "merge-on-read")
      graft.plans.MergeInto.sql(spark, "DELETE FROM gcl.ns.s8c WHERE id % 4 = 1")
    } finally prev match {
      case Some(m) => spark.conf.set("spark.graft.delete.mode", m)
      case None => spark.conf.unset("spark.graft.delete.mode")
    }
    val expect = spark.table("gcl.ns.s8c").orderBy("id").collect().toSeq
    // a DIVERGED clone cannot be cloned — the refusal names localize
    val e = intercept[Exception] {
      spark.sql("CALL gcl.system.clone(source => 'ns.s8c', target => 'ns.s8cc')")
    }
    assert(e.getMessage.contains("localize"), e.getMessage)
    val srcFiles = poolFiles("s8").sorted
    // LOCALIZE: every ext entry's file copies into the clone's own pool
    val res = spark.sql("CALL gcl.system.localize(`table` => 'ns.s8c')").collect()(0)
    assert(res.getLong(1) > 0, "localize must copy the ext files")
    assert(ManifestTable.liveEntries(root("s8c"))
      .forall(e => !ManifestTable.isExtEntry(e.rel)),
      "no ext entries may survive localize")
    assert(poolFiles("s8").sorted === srcFiles, "the source pool is never touched")
    // content identical through the copy (tombstones still apply: the
    // __file identities are path-suffix-stable across the move)
    assert(spark.table("gcl.ns.s8c").orderBy("id").collect().toSeq === expect)
    // fsck healthy; a second localize is a no-op
    assert(graft.sources.v2.Maintenance.fsck(spark, "gcl.ns.s8c")._9)
    assert(spark.sql("CALL gcl.system.localize(`table` => 'ns.s8c')")
      .collect()(0).getLong(1) === 0L)
    // the diverged clone-of-clone now succeeds…
    spark.sql("CALL gcl.system.clone(source => 'ns.s8c', target => 'ns.s8cc')")
    assert(spark.table("gcl.ns.s8cc").orderBy("id").collect().toSeq === expect)
    // …and expiring + sweeping THE SOURCE can no longer strand the clone
    spark.sql("ALTER TABLE gcl.ns.s8 SET TBLPROPERTIES('retain'='1')")
    spark.sql("DROP TABLE gcl.ns.s8") // the hardest source gc there is
    graft.sources.MetaIO.delete(root("s8"), recursive = true)
    assert(spark.table("gcl.ns.s8c").orderBy("id").collect().toSeq === expect)
    assert(graft.sources.v2.Maintenance.fsck(spark, "gcl.ns.s8c")._9,
      "the localized clone must survive the source's deletion")
    spark.sql("DROP TABLE gcl.ns.s8cc"); spark.sql("DROP TABLE gcl.ns.s8c")
  }
}
