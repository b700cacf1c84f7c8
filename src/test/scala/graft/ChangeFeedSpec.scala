package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ManifestTable
import graft.sources.v2.VersionedCatalog

/** Change data feed (`tbl.changes`): row-level changes between versions,
  * reconstructed from the end manifest alone — inserts from data-file
  * commit sequences, deletes from positional/equality delete entries,
  * older deletes suppressed so a row deletes at most once, and atomic
  * tombstone+rewrite commits (merge-on-read UPDATE) surfaced as
  * `update_preimage`/`update_postimage` pairs. Batch and streaming
  * surfaces; file-removing commits bound the feed (horizon) and fail a
  * covering stream window loudly.
  */
class ChangeFeedSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.gcdf", classOf[VersionedCatalog].getName)
    s.conf.set("spark.sql.catalog.gcdf.warehouse",
      Files.createTempDirectory("graft_cdfwh").toString)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gcdf.ns")
    s
  }
  private def root(t: String) =
    s"${spark.conf.get("spark.sql.catalog.gcdf.warehouse")}/ns/$t"

  private def withMorDml[T](body: => T): T = {
    val prev = Seq("spark.graft.delete.mode", "spark.graft.update.mode")
      .map(k => k -> spark.conf.getOption(k))
    Seq("spark.graft.delete.mode", "spark.graft.update.mode")
      .foreach(k => spark.conf.set(k, "merge-on-read"))
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def changes(t: String): DataFrame = spark.table(s"$t.changes")

  test("cherry-picked rows feed as inserts at the PUBLISH version; rollback moves the horizon") {
    import spark.implicits._
    val t = "gcdf.ns.ckfeed"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v STRING)")
    spark.conf.set("spark.graft.versioned.retain", "10")
    try {
      Seq((1L, "a")).toDF("k", "v").writeTo(t).append()                // main v1
      val r = root("ckfeed")
      val v1 = ManifestTable.currentVersion(r).get
      spark.sql(s"CALL gcdf.system.create_branch(`table` => 'ns.ckfeed', name => 'wap')")
      spark.conf.set("spark.graft.write.branch", "wap")
      val staged = try {
        Seq((2L, "b")).toDF("k", "v").writeTo(t).append()              // staged
        ManifestTable.resolveRef(r, "wap").version
      } finally spark.conf.unset("spark.graft.write.branch")
      val pub = spark.sql("CALL gcdf.system.cherrypick_snapshot(" +
        s"`table` => 'ns.ckfeed', version => $staged)").collect()(0).getLong(1)
      // the picked rows arrive NOW: inserts at the publish version, not
      // at the staged one (fresh data sequence — Iceberg's semantics)
      val got = changes(t).select($"k", $"_change_type", $"_commit_version")
        .as[(Long, String, Long)].collect().toSet
      assert(got === Set((1L, "insert", v1), (2L, "insert", pub)))

      // a rollback is file-removing: the feed's horizon moves to it, so a
      // window reaching below fails loudly instead of replaying dead rows
      spark.sql("CALL gcdf.system.rollback_to_version(" +
        s"`table` => 'ns.ckfeed', version => $v1)").collect()
      def messages(e: Throwable): Seq[String] =
        Option(e).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
      val ex = intercept[Exception] {
        spark.read.option("fromVersion", v1.toString).table(s"$t.changes").collect()
      }
      assert(messages(ex).exists(m => m.contains("fromVersion") || m.contains("horizon")),
        s"${messages(ex)}")
    } finally spark.conf.unset("spark.graft.versioned.retain")
    spark.sql(s"DROP TABLE $t")
  }

  test("batch changes: inserts at their commit versions, deletes from tombstones") {
    import spark.implicits._
    val t = "gcdf.ns.basic"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v STRING)")
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").writeTo(t).append()      // v1
    Seq((3L, "c"), (4L, "d")).toDF("k", "v").writeTo(t).append()      // v2
    withMorDml(graft.plans.MergeInto.sql(spark, s"DELETE FROM $t WHERE k IN (2, 3)")) // v3

    val got = changes(t)
      .select($"k", $"v", $"_change_type", $"_commit_version")
      .as[(Long, String, String, Long)].collect().toSet
    assert(got === Set(
      (1L, "a", "insert", 1L), (2L, "b", "insert", 1L),
      (3L, "c", "insert", 2L), (4L, "d", "insert", 2L),
      (2L, "b", "delete", 3L), (3L, "c", "delete", 3L)))
    spark.sql(s"DROP TABLE $t")
  }

  test("merge-on-read UPDATE emits update_preimage/update_postimage pairs at one version") {
    import spark.implicits._
    val t = "gcdf.ns.upd"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v BIGINT)")
    (1L to 6L).map(k => (k, k * 10)).toDF("k", "v").writeTo(t).append()          // v1
    withMorDml(graft.plans.MergeInto.sql(spark, s"UPDATE $t SET v = v + 1 WHERE k <= 2")) // v2

    val got = changes(t).select($"k", $"v", $"_change_type", $"_commit_version")
      .as[(Long, Long, String, Long)].collect().toSet
    // the atomic tombstone+rewrite commit is an UPDATE: old rows are
    // preimages, rewritten rows postimages — the four-valued Delta CDF
    // contract, no within-version join needed to pair old with new
    val expected = (1L to 6L).map(k => (k, k * 10, "insert", 1L)).toSet ++
      Set((1L, 10L, "update_preimage", 2L), (2L, 20L, "update_preimage", 2L),
        (1L, 11L, "update_postimage", 2L), (2L, 21L, "update_postimage", 2L))
    assert(got === expected)
    // and the final table state equals inserts minus deletes
    assert(spark.table(t).as[(Long, Long)].collect().toSet ===
      Set((1L, 11L), (2L, 21L)) ++ (3L to 6L).map(k => (k, k * 10)))
    spark.sql(s"DROP TABLE $t")
  }

  test("equality deletes: older rows emit delete events, same/later commits survive, suppression") {
    import spark.implicits._
    val t = "gcdf.ns.eq"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v STRING)")
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v").writeTo(t).append() // v1
    val r = root("eq")
    withMorDml(graft.plans.MergeInto.sql(spark, s"DELETE FROM $t WHERE k = 2")) // v2 positional
    ManifestTable.appendEqualityDeletes(
      Seq(2L, 3L).toDF("k"), r)                                           // v3 equality
    Seq((3L, "c2")).toDF("k", "v").writeTo(t).append()                    // v4 re-insert

    val got = changes(t).select($"k", $"v", $"_change_type", $"_commit_version")
      .as[(Long, String, String, Long)].collect().toSet
    // k=2 was positionally deleted at v2: the v3 equality delete must NOT
    // re-emit it (suppression); k=3's re-insert at v4 postdates the key
    assert(got === Set(
      (1L, "a", "insert", 1L), (2L, "b", "insert", 1L), (3L, "c", "insert", 1L),
      (2L, "b", "delete", 2L),
      (3L, "c", "delete", 3L),
      (3L, "c2", "insert", 4L)))
    // replaying the feed reproduces the live table
    assert(spark.table(t).as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (3L, "c2")))
    spark.sql(s"DROP TABLE $t")
  }

  test("streaming: initial snapshot applies deletes, then windows deliver row-level changes") {
    import spark.implicits._
    val t = "gcdf.ns.str"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v BIGINT)")
    (1L to 4L).map(k => (k, k * 100)).toDF("k", "v").writeTo(t).append()  // v1
    withMorDml(graft.plans.MergeInto.sql(spark, s"DELETE FROM $t WHERE k = 4")) // v2

    val checkpoint = Files.createTempDirectory("cdf_ck").toString
    val sink = Files.createTempDirectory("cdf_sink").toString + "/out"
    def drain(): Unit = {
      val q = spark.readStream.table(s"$t.changes").writeStream
        .format("parquet").option("path", sink)
        .option("checkpointLocation", checkpoint)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // initial snapshot: live rows only (k=4 already deleted), as inserts
    drain()
    val snap = spark.read.parquet(sink)
      .select($"k", $"v", $"_change_type").as[(Long, Long, String)].collect().toSet
    assert(snap === Set((1L, 100L, "insert"), (2L, 200L, "insert"), (3L, 300L, "insert")))

    // upstream MERGE-shaped churn: an update and an append land as events
    withMorDml(graft.plans.MergeInto.sql(spark, s"UPDATE $t SET v = v + 5 WHERE k = 1")) // v3
    Seq((9L, 900L)).toDF("k", "v").writeTo(t).append()                     // v4
    drain()
    val after = spark.read.parquet(sink)
      .select($"k", $"v", $"_change_type", $"_commit_version")
      .as[(Long, Long, String, Long)].collect().toSet
    assert(after.contains((1L, 100L, "update_preimage", 3L)))
    assert(after.contains((1L, 105L, "update_postimage", 3L)))
    assert(after.contains((9L, 900L, "insert", 4L)))
    // applying the feed (row births minus row deaths) reproduces the table
    val applied = spark.read.parquet(sink)
      .groupBy($"k", $"v")
      .agg(sum(when($"_change_type".isin("insert", "update_postimage"), 1)
        .otherwise(-1)).as("n"))
      .where($"n" > 0).select($"k", $"v").as[(Long, Long)].collect().toSet
    assert(applied === spark.table(t).as[(Long, Long)].collect().toSet)
    spark.sql(s"DROP TABLE $t")
  }

  test("file-removing commits bound the feed: horizon on batch, loud failure on stream") {
    import spark.implicits._
    val t = "gcdf.ns.hz"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v STRING)")
    Seq((1L, "a")).toDF("k", "v").writeTo(t).append()                     // v1
    val checkpoint = Files.createTempDirectory("cdf_ck2").toString
    val sink = Files.createTempDirectory("cdf_sink2").toString + "/out"
    def drain(): Unit = {
      val q = spark.readStream.table(s"$t.changes").writeStream
        .format("parquet").option("path", sink)
        .option("checkpointLocation", checkpoint)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain()
    // copy-on-write DELETE removes a data file: provenance is destroyed
    graft.plans.MergeInto.sql(spark, s"DELETE FROM $t WHERE k = 1")       // v2 (COW)
    Seq((2L, "b")).toDF("k", "v").writeTo(t).append()                     // v3
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] { drain() }
    def messages(e: Throwable): Seq[String] =
      Option(e).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(ex).exists(_.contains("file-REMOVING")), s"${messages(ex)}")

    // batch: only post-horizon changes serve; pre-horizon fromVersion refuses
    val got = changes(t).select($"k", $"_change_type", $"_commit_version")
      .as[(Long, String, Long)].collect().toSet
    assert(got === Set((2L, "insert", 3L)))
    val ex2 = intercept[Exception] {
      spark.read.option("fromVersion", "0").table(s"$t.changes").collect()
    }
    assert(messages(ex2).exists(_.contains("fromVersion")), s"${messages(ex2)}")
    spark.sql(s"DROP TABLE $t")
  }

  test("maxVersionsPerTrigger paces the feed: snapshot at the paced end, then windows") {
    import spark.implicits._
    val t = "gcdf.ns.paced"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT)")
    val prevRetain = spark.conf.getOption("spark.graft.versioned.retain")
    spark.conf.set("spark.graft.versioned.retain", "10")
    try (1 to 4).foreach(i => Seq(i.toLong).toDF("k").writeTo(t).append())
    finally prevRetain match {
      case Some(v) => spark.conf.set("spark.graft.versioned.retain", v)
      case None => spark.conf.unset("spark.graft.versioned.retain")
    }
    val checkpoint = Files.createTempDirectory("cdf_pck").toString
    val sink = Files.createTempDirectory("cdf_psink").toString + "/out"
    val q = spark.readStream
      .option("maxVersionsPerTrigger", "1")
      .table(s"$t.changes").writeStream
      .format("parquet").option("path", sink)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // paced bootstrap: snapshot at v1, then windows (1,2], (2,3], (3,4] —
    // every insert delivered exactly once, in >= 3 checkpointed batches
    val got = spark.read.parquet(sink)
      .select($"k", $"_change_type", $"_commit_version")
      .as[(Long, String, Long)].collect().toSeq
    assert(got.size === 4, s"exactly once per version window: $got")
    assert(got.toSet === (1L to 4L).map(k => (k, "insert", k)).toSet)
    val commits = new java.io.File(s"$checkpoint/commits").list()
      .count(!_.endsWith(".tmp"))
    assert(commits >= 3, s"expected >=3 paced batches, saw $commits")
    spark.sql(s"DROP TABLE $t")
  }

  test("column pruning reaches the change-feed file scan; eq keys widen it only as needed") {
    import spark.implicits._
    val t = "gcdf.ns.prune"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, a STRING, b STRING, c DOUBLE)")
    (1L to 50L).map(i => (i, s"a$i", s"b$i", i * 1.0)).toDF("k", "a", "b", "c")
      .writeTo(t).append()

    // no deletes: projecting (k, _change_type) must not read a/b/c
    val narrow = spark.table(s"$t.changes").select($"k", $"_change_type")
    val scans = narrow.queryExecution.executedPlan.collect {
      case bs: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => bs.scan
    }
    assert(scans.nonEmpty)
    assert(scans.forall { s =>
      val d = s.description()
      d.contains("k") && !d.contains(",a,") && !d.contains(",b,")
    }, s"pruned description: ${scans.map(_.description())}")
    assert(narrow.collect().length === 50)

    // live equality deletes widen the read by their key column ONLY;
    // a projection omitting the key still answers exactly
    ManifestTable.appendEqualityDeletes(Seq(7L, 9L).toDF("k"), root("prune"))
    val got = spark.table(s"$t.changes").select($"a", $"_change_type")
      .as[(String, String)].collect()
    assert(got.count(_._2 == "insert") === 50)
    assert(got.filter(_._2 == "delete").map(_._1).toSet === Set("a7", "a9"))
    spark.sql(s"DROP TABLE $t")
  }

  test("append-only batch windows read VECTORIZED; delete windows fall to row readers") {
    import spark.implicits._
    val t = "gcdf.ns.vec"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v DOUBLE)")
    (1L to 1000L).map(i => (i, i * 0.5)).toDF("k", "v").writeTo(t).append()
    (1001L to 2000L).map(i => (i, i * 0.5)).toDF("k", "v").writeTo(t).append()

    def isColumnar(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.executedPlan.collect {
        case bs: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          bs.supportsColumnar
      }.forall(identity)
    val cleanRead = spark.table(s"$t.changes")
    assert(isColumnar(cleanRead), "append-only change feed must stay vectorized")
    val agg = cleanRead.agg(count(lit(1)), sum($"k"), max($"_commit_version")).collect()(0)
    assert(agg.getLong(0) === 2000L)
    assert(agg.getLong(1) === (1L to 2000L).sum)
    assert(agg.getLong(2) === 2L)

    withMorDml(graft.plans.MergeInto.sql(spark, s"DELETE FROM $t WHERE k <= 10"))
    val mixed = spark.table(s"$t.changes")
    assert(!isColumnar(mixed), "delete slices drop the batch to row readers")
    assert(mixed.where($"_change_type" === "delete").count() === 10)
    spark.sql(s"DROP TABLE $t")
  }

  test("equality-delete emission skips target files whose bounds prove no key match") {
    import spark.implicits._
    val t = "gcdf.ns.eqskip"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v STRING)")
    // two range-clustered files: k in [0,99] and [1000,1099]
    (0L until 100L).map(i => (i, s"v$i")).toDF("k", "v").coalesce(1).writeTo(t).append()
    (1000L until 1100L).map(i => (i, s"v$i")).toDF("k", "v").coalesce(1).writeTo(t).append()
    // keys entirely inside the second file's range
    ManifestTable.appendEqualityDeletes(
      Seq(1005L, 1007L).toDF("k"), root("eqskip"))

    val scan = spark.table(s"$t.changes").queryExecution.executedPlan.collect {
      case bs: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => bs.scan
    }.collectFirst { case s: graft.sources.v2.ChangeFeedScan => s }.get
    val deleteEqParts = scan.toBatch.planInputPartitions().collect {
      case cp: graft.sources.v2.ChangePartition if cp.kind == "delete-eq" => cp
    }
    assert(deleteEqParts.nonEmpty)
    val targetRels = deleteEqParts.flatMap(_.relEnc).distinct
    assert(targetRels.size === 1,
      s"only the in-range file may plan delete-eq slices, got $targetRels")
    // and the result is still exact
    val dels = spark.table(s"$t.changes").where($"_change_type" === "delete")
      .select($"k").as[Long].collect().toSet
    assert(dels === Set(1005L, 1007L))
    spark.sql(s"DROP TABLE $t")
  }

  test("a window's eq-delete commits MERGE into one pass per target file") {
    import spark.implicits._
    val t = "gcdf.ns.eqmerge"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v STRING)")
    (0L until 10L).map(i => (i, s"v$i")).toDF("k", "v").coalesce(1)
      .writeTo(t).append()                                                 // v1 (one file)
    val r = root("eqmerge")
    ManifestTable.appendEqualityDeletes(Seq(2L, 3L).toDF("k"), r)          // v2
    ManifestTable.appendEqualityDeletes(Seq(3L, 4L).toDF("k"), r)          // v3
    ManifestTable.appendEqualityDeletes(Seq(5L).toDF("k"), r)              // v4
    // row position == k (single-partition write); tombstone an
    // ALREADY-eq-deleted row: no second death event may surface
    val rel = ManifestTable.encodedRel(r, ManifestTable.liveEntries(r)
      .map(_.rel).filterNot(ManifestTable.isDeleteEntry).head)
    ManifestTable.appendDeletes(Seq((rel, 2L)).toDF("__file", "__pos"), r) // v5

    // planning: ONE delete-eq slice for the one candidate file, all three
    // window specs merged as stages — partitions ∝ files, not specs×files
    val scan = spark.table(s"$t.changes").queryExecution.executedPlan.collect {
      case bs: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => bs.scan
    }.collectFirst { case s: graft.sources.v2.ChangeFeedScan => s }.get
    val eqParts = scan.toBatch.planInputPartitions().collect {
      case cp: graft.sources.v2.ChangePartition if cp.kind == "delete-eq" => cp
    }
    assert(eqParts.length === 1, s"one merged pass, got ${eqParts.length}")
    assert(eqParts.head.eqStages.count(_.emit) === 3)

    // each row dies once, at its EARLIEST matching spec's version; the
    // v5 tombstone of the v2-dead row emits nothing
    val got = changes(t).select($"k", $"_change_type", $"_commit_version")
      .as[(Long, String, Long)].collect().toSet
    assert(got === (0L until 10L).map((_, "insert", 1L)).toSet ++
      Set((2L, "delete", 2L), (3L, "delete", 2L),
        (4L, "delete", 3L), (5L, "delete", 4L)))
    assert(spark.table(t).select($"k").as[Long].collect().toSet ===
      Set(0L, 1L, 6L, 7L, 8L, 9L))
    spark.sql(s"DROP TABLE $t")
  }

  test("RENAMED-column tables feed changes under logical names") {
    import spark.implicits._
    val t = "gcdf.ns.rn"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v STRING)")
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v").writeTo(t).append() // v1
    spark.sql(s"ALTER TABLE $t RENAME COLUMN v TO label")
    Seq((4L, "d")).toDF("k", "label").writeTo(t).append()                   // v2
    withMorDml(graft.plans.MergeInto.sql(spark, s"DELETE FROM $t WHERE k = 2")) // v3
    // equality delete keys carry the PHYSICAL column name on disk
    ManifestTable.appendEqualityDeletes(Seq(3L).toDF("k"), root("rn"))      // v4

    val got = changes(t).select($"k", $"label", $"_change_type", $"_commit_version")
      .as[(Long, String, String, Long)].collect().toSet
    assert(got === Set(
      (1L, "a", "insert", 1L), (2L, "b", "insert", 1L), (3L, "c", "insert", 1L),
      (4L, "d", "insert", 2L),
      (2L, "b", "delete", 3L), (3L, "c", "delete", 4L)))
    spark.sql(s"DROP TABLE $t")
  }

  test("ORC tables feed changes (externally-written positional tombstones)") {
    import spark.implicits._
    val t = "gcdf.ns.orc"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v STRING) TBLPROPERTIES('format'='orc')")
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
      .coalesce(1).writeTo(t).append()                                      // v1
    val r = root("orc")
    // the single-partition write preserved row order: position == index
    val rel = ManifestTable.encodedRel(r,
      ManifestTable.liveEntries(r).map(_.rel)
        .filterNot(ManifestTable.isDeleteEntry).head)
    ManifestTable.appendDeletes(Seq((rel, 1L)).toDF("__file", "__pos"), r)  // v2
    val got = changes(t).select($"k", $"v", $"_change_type", $"_commit_version")
      .as[(Long, String, String, Long)].collect().toSet
    assert(got === Set(
      (1L, "a", "insert", 1L), (2L, "b", "insert", 1L), (3L, "c", "insert", 1L),
      (2L, "b", "delete", 2L)))
    assert(spark.table(t).select($"k").as[Long].collect().toSet === Set(1L, 3L))
    spark.sql(s"DROP TABLE $t")
  }

  test("scoped horizon: day-scoped OPTIMIZE keeps a day-pruned stream alive, kills an unscoped one") {
    import spark.implicits._
    val t = "gcdf.ns.scope"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, ts TIMESTAMP_NTZ) PARTITIONED BY (days(ts))")
    def rows(day: Int, ks: Range) = ks.map(k =>
      (k.toLong, java.time.LocalDateTime.of(2024, 5, day, 8, 0))).toDF("k", "ts")
    val prevRetain = spark.conf.getOption("spark.graft.versioned.retain")
    spark.conf.set("spark.graft.versioned.retain", "10")
    try {
      rows(1, 0 until 10).union(rows(2, 100 until 110)).writeTo(t).append() // v1
      rows(1, 10 until 20).writeTo(t).append()                              // v2 (day 1 fragments)

      def mkDrain(filtered: Boolean): (() => Unit, String) = {
        val checkpoint = Files.createTempDirectory("cdf_sck").toString
        val sink = Files.createTempDirectory("cdf_ssink").toString + "/out"
        val drain = () => {
          val r0 = spark.readStream
          val r = if (filtered) r0.option("filter", "ts >= '2024-05-02'") else r0
          val q = r.table(s"$t.changes").writeStream
            .format("parquet").option("path", sink)
            .option("checkpointLocation", checkpoint)
            .trigger(Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        (drain, sink)
      }
      val (drainScoped, scopedSink) = mkDrain(filtered = true)
      val (drainAll, _) = mkDrain(filtered = false)
      drainScoped()
      // the scoped initial snapshot covers only the non-excluded day
      assert(spark.read.parquet(scopedSink).select($"k").as[Long].collect().toSet
        === (100L until 110L).toSet)
      drainAll()

      // compaction scoped to day 1: day 2's horizon is untouched
      spark.sql(s"CALL gcdf.system.optimize(`table` => 'ns.scope', " +
        "where_days => '2024-05-01,2024-05-01')")                           // v3
      rows(2, 110 until 115).writeTo(t).append()                           // v4

      // the day-pruned stream keeps going: exactly the new day-2 inserts
      drainScoped()
      val got = spark.read.parquet(scopedSink)
        .select($"k", $"_change_type", $"_commit_version")
        .as[(Long, String, Long)].collect().toSet
      assert(got === (100L until 110L).map((_, "insert", 1L)).toSet ++
        (110L until 115L).map((_, "insert", 4L)).toSet,
        s"scoped stream must deliver only day-2 changes once: $got")

      // the unscoped stream dies loudly at the compaction
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] { drainAll() }
      def messages(e: Throwable): Seq[String] =
        Option(e).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
      assert(messages(ex).exists(_.contains("file-REMOVING")), s"${messages(ex)}")

      // batch: a pushed filter scopes fromVersion=0 past the rewrite; the
      // explicit option does too; unfiltered refuses
      val auto = changes(t).where($"ts" >= "2024-05-02")
      assert(auto.select($"k").as[Long].collect().toSet ===
        ((100L until 115L).toSet))
      val opt = spark.read.option("fromVersion", "0")
        .option("filter", "ts >= '2024-05-02'").table(s"$t.changes")
      assert(opt.select($"k").as[Long].collect().toSet === (100L until 115L).toSet)
      val ex2 = intercept[Exception] {
        spark.read.option("fromVersion", "0").table(s"$t.changes").collect()
      }
      assert(messages(ex2).exists(_.contains("fromVersion")), s"${messages(ex2)}")
    } finally prevRetain match {
      case Some(v) => spark.conf.set("spark.graft.versioned.retain", v)
      case None => spark.conf.unset("spark.graft.versioned.retain")
    }
    spark.sql(s"DROP TABLE $t")
  }

  test("scoped horizon: identity-partition filters scope batch reads past a key-local rewrite") {
    import spark.implicits._
    val t = "gcdf.ns.idscope"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, region STRING, v BIGINT) PARTITIONED BY (region)")
    (0 until 20).map(i => (i.toLong, s"r${i % 2}", i * 1L))
      .toDF("k", "region", "v").writeTo(t).append()                         // v1
    // a copy-on-write DELETE rewrites EVERY key's directory, so the scoped
    // map stamps both keys — a read filtered to r1 must still refuse
    // (conservative direction: scoping unlocks only provably-untouched keys)
    graft.plans.MergeInto.sql(spark, s"DELETE FROM $t WHERE region = 'r0' AND k < 4") // v2 COW
    val ex = intercept[Exception] {
      spark.read.option("fromVersion", "0").table(s"$t.changes")
        .where($"region" === "r1").collect()
    }
    def messages(e: Throwable): Seq[String] =
      Option(e).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(ex).exists(_.contains("fromVersion")), s"${messages(ex)}")
    // post-horizon reads stay exact per key, filters or not
    assert(changes(t).where($"_change_type" === "insert").count() === 0L)
    spark.sql(s"DROP TABLE $t")
  }

  test("identity-partitioned and hidden-day tables feed changes with partition values intact") {
    import spark.implicits._
    val t = "gcdf.ns.parts"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, region STRING, v BIGINT) PARTITIONED BY (region)")
    (0 until 30).map(i => (i.toLong, s"r${i % 3}", i * 1L))
      .toDF("k", "region", "v").writeTo(t).append()                       // v1
    withMorDml(graft.plans.MergeInto.sql(spark, s"DELETE FROM $t WHERE k < 6")) // v2
    val got = changes(t)
    assert(got.where($"_change_type" === "insert").count() === 30)
    val dels = got.where($"_change_type" === "delete")
      .select($"k", $"region").as[(Long, String)].collect().toSet
    assert(dels === (0 until 6).map(i => (i.toLong, s"r${i % 3}")).toSet,
      "deleted rows must carry their directory-derived partition values")
    spark.sql(s"DROP TABLE $t")

    val td = "gcdf.ns.days"
    spark.sql(s"DROP TABLE IF EXISTS $td")
    spark.sql(s"CREATE TABLE $td (k BIGINT, ts TIMESTAMP_NTZ) PARTITIONED BY (days(ts))")
    (0 until 6).map(i => (i.toLong, java.time.LocalDateTime.of(2024, 5, 1 + i % 2, 8, 0)))
      .toDF("k", "ts").writeTo(td).append()
    withMorDml(graft.plans.MergeInto.sql(spark, s"DELETE FROM $td WHERE k = 0"))
    val c = changes(td)
    assert(c.where($"_change_type" === "insert").count() === 6)
    assert(c.where($"_change_type" === "delete").select($"k")
      .as[Long].collect().toSeq === Seq(0L))
    spark.sql(s"DROP TABLE $td")
  }

  test("WAP: staged branch commits feed the BRANCH's changes; main's feed flips at publish") {
    import spark.implicits._
    val t = "gcdf.ns.wap"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v STRING)")
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v").writeTo(t).append()   // v1
    spark.sql(s"CALL gcdf.system.create_branch(`table` => 'ns.wap', name => 'wap')")

    // stage a MOR DELETE and an APPEND on the branch: the manifests claim
    // shared version numbers (v2, v3) but only the branch ref moves
    spark.conf.set("spark.graft.write.branch", "wap")
    try {
      withMorDml(graft.plans.MergeInto.sql(spark, s"DELETE FROM $t WHERE k = 2")) // v2
      Seq((4L, "d")).toDF("k", "v").writeTo(t).append()                          // v3
    } finally spark.conf.unset("spark.graft.write.branch")

    // MAIN is untouched: table rows, live pointer, and the changes feed
    val r = root("wap")
    assert(ManifestTable.currentVersion(r).get === 1L, "main pointer must not move")
    assert(spark.table(t).orderBy($"k").select($"k").as[Long].collect().toSeq
      === Seq(1L, 2L, 3L))
    val mainFeed = changes(t).select($"k", $"_change_type", $"_commit_version")
      .as[(Long, String, Long)].collect().toSet
    assert(mainFeed === Set((1L, "insert", 1L), (2L, "insert", 1L), (3L, "insert", 1L)),
      s"staged branch commits must not enter main's feed: $mainFeed")

    // the BRANCH's feed answers "what would this publish change" — via the
    // read option and via VERSION AS OF '<branch>' on tbl.changes
    val expect = Set(
      (1L, "insert", 1L), (2L, "insert", 1L), (3L, "insert", 1L),
      (2L, "delete", 2L), (4L, "insert", 3L))
    val viaOption = spark.read.option("branch", "wap").table(s"$t.changes")
      .select($"k", $"_change_type", $"_commit_version")
      .as[(Long, String, Long)].collect().toSet
    assert(viaOption === expect, s"branch feed via option: $viaOption")
    val viaAsOf = spark.sql(
      s"SELECT k, _change_type, _commit_version FROM $t.changes VERSION AS OF 'wap'")
      .as[(Long, String, Long)].collect().toSet
    assert(viaAsOf === expect, s"branch feed via VERSION AS OF: $viaAsOf")
    // the branch's table view sees the staged state; a tag is not a branch
    assert(spark.sql(s"SELECT k FROM $t VERSION AS OF 'wap'")
      .as[Long].collect().toSet === Set(1L, 3L, 4L))
    val e = intercept[Exception] {
      spark.read.option("branch", "nope").table(s"$t.changes").collect()
    }
    assert(e.getMessage.contains("no tag or branch"))

    // PUBLISH: fast-forward flips the staged commits into main's feed at
    // their original staged versions
    spark.sql(s"CALL gcdf.system.fast_forward(`table` => 'ns.wap', branch => 'wap')")
    assert(ManifestTable.currentVersion(r).get === 3L)
    assert(spark.table(t).select($"k").as[Long].collect().toSet === Set(1L, 3L, 4L))
    val published = changes(t).select($"k", $"_change_type", $"_commit_version")
      .as[(Long, String, Long)].collect().toSet
    assert(published === expect, s"published feed: $published")
    spark.sql(s"DROP TABLE $t")
  }

  test("WAP: version numbers are never contended or reused across refs") {
    import spark.implicits._
    val t = "gcdf.ns.wapalloc"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v STRING)")
    Seq((1L, "a")).toDF("k", "v").writeTo(t).append()                       // v1
    spark.sql(s"CALL gcdf.system.create_branch(`table` => 'ns.wapalloc', name => 'wap')")
    val r = root("wapalloc")

    // main advances while the branch is staged at v1...
    Seq((2L, "b")).toDF("k", "v").writeTo(t).append()                       // v2 (main)
    Seq((3L, "c")).toDF("k", "v").writeTo(t).append()                       // v3 (main)
    // ...then a BRANCH commit (base = branch head v1) must allocate ABOVE
    // main's pointer — not collide with, or after GC silently reuse,
    // main's v2/v3
    spark.conf.set("spark.graft.write.branch", "wap")
    try Seq((4L, "d")).toDF("k", "v").writeTo(t).append()                   // v4 (branch)
    finally spark.conf.unset("spark.graft.write.branch")
    assert(ManifestTable.resolveRef(r, "wap").version === 4L,
      "branch commit must allocate above main's pointer")
    assert(ManifestTable.currentVersion(r).get === 3L, "main pointer untouched")
    // no cross-talk: the branch sees its base + staged row; main its own
    assert(spark.sql(s"SELECT k FROM $t VERSION AS OF 'wap'")
      .as[Long].collect().toSet === Set(1L, 4L))
    assert(spark.table(t).select($"k").as[Long].collect().toSet === Set(1L, 2L, 3L))

    // a MAIN commit while the branch is staged AHEAD allocates above the
    // ref-pinned staged head instead of contending with a claim it can
    // never reclaim
    Seq((5L, "e")).toDF("k", "v").writeTo(t).append()                       // v5 (main)
    assert(ManifestTable.currentVersion(r).get === 5L,
      "main must allocate above the staged branch head")
    assert(ManifestTable.resolveRef(r, "wap").version === 4L)

    // DROPPING a branch abandons its staged numbers permanently: the next
    // main commit allocates above the dropped head, so VERSION AS OF n on
    // main can never resolve a recycled number to different content
    spark.sql(s"CALL gcdf.system.create_branch(`table` => 'ns.wapalloc', name => 'wap2')")
    spark.conf.set("spark.graft.write.branch", "wap2")
    try Seq((6L, "f")).toDF("k", "v").writeTo(t).append()                   // v6 (branch)
    finally spark.conf.unset("spark.graft.write.branch")
    assert(ManifestTable.resolveRef(r, "wap2").version === 6L)
    spark.sql(s"CALL gcdf.system.drop_ref(`table` => 'ns.wapalloc', name => 'wap2')")
    Seq((7L, "g")).toDF("k", "v").writeTo(t).append()
    assert(ManifestTable.currentVersion(r).get === 7L,
      "a dropped branch's staged version numbers must never be reused")
    spark.sql(s"DROP TABLE $t")
  }

  test("timestamp-addressed change windows resolve against commit instants") {
    import spark.implicits._
    val t = "gcdf.ns.tscdf"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT)")
    val prevRetain = spark.conf.getOption("spark.graft.versioned.retain")
    spark.conf.set("spark.graft.versioned.retain", "10")
    try {
    Seq(1L).toDF("k").writeTo(t).append()                                   // v1
    Seq(2L).toDF("k").writeTo(t).append()                                   // v2
    Seq(3L).toDF("k").writeTo(t).append()                                   // v3
    val r = root("tscdf")
    // pin the commit instants: v1@10:00, v2@11:00, v3@12:00 UTC
    def ms(h: Int) = java.time.Instant.parse(f"2024-05-01T$h%02d:00:00Z").toEpochMilli
    Seq(1 -> 10, 2 -> 11, 3 -> 12).foreach { case (v, h) =>
      graft.sources.MetaIO.setTimes(s"$r/manifests/v=$v.txt", ms(h)) }

    def ks(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select($"k").as[Long].collect().toSet
    // fromTimestamp delivers every commit AT or after the instant
    assert(ks(spark.read.option("fromTimestamp", "2024-05-01T10:30:00Z")
      .table(s"$t.changes")) === Set(2L, 3L))
    assert(ks(spark.read.option("fromTimestamp", "2024-05-01T11:00:00Z")
      .table(s"$t.changes")) === Set(2L, 3L), "at-instant commit included")
    // untilTimestamp caps at the latest commit at-or-before the instant
    assert(ks(spark.read.option("untilTimestamp", "2024-05-01T11:30:00Z")
      .table(s"$t.changes")) === Set(1L, 2L))
    assert(ks(spark.read.option("fromTimestamp", "2024-05-01T10:30:00Z")
      .option("untilTimestamp", "2024-05-01T11:30:00Z")
      .table(s"$t.changes")) === Set(2L))
    // an instant after every commit: empty feed, not an error
    assert(ks(spark.read.option("fromTimestamp", "2024-05-01T13:00:00Z")
      .table(s"$t.changes")) === Set.empty[Long])
    // both axes at once, and pre-history until, fail loudly
    val both = intercept[Exception] {
      spark.read.option("fromTimestamp", "2024-05-01T10:30:00Z")
        .option("fromVersion", "1").table(s"$t.changes").collect()
    }
    assert(both.getMessage.contains("not both"))
    val early = intercept[Exception] {
      spark.read.option("untilTimestamp", "2024-05-01T09:00:00Z")
        .table(s"$t.changes").collect()
    }
    assert(early.getMessage.contains("untilTimestamp"))

    // streaming: startingTimestamp skips the initial snapshot and starts
    // at the first commit at/after the instant
    val ck = Files.createTempDirectory("tscdf_ck").toString
    val sink = Files.createTempDirectory("tscdf_sink").toString + "/out"
    val q = spark.readStream.option("startingTimestamp", "2024-05-01T10:30:00Z")
      .table(s"$t.changes").writeStream
      .format("parquet").option("path", sink)
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(spark.read.parquet(sink).select($"k", $"_commit_version")
      .as[(Long, Long)].collect().toSet === Set((2L, 2L), (3L, 3L)))
    } finally prevRetain match {
      case Some(v) => spark.conf.set("spark.graft.versioned.retain", v)
      case None => spark.conf.unset("spark.graft.versioned.retain")
    }
    spark.sql(s"DROP TABLE $t")
  }

  test("scoped view: a filter excluding the update's DESTINATION sees preimages as deletes") {
    import spark.implicits._
    val t = "gcdf.ns.scopemv"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, region STRING, v BIGINT) " +
      "PARTITIONED BY (region)")
    (0 until 8).map(i => (i.toLong, "r0", i * 10L)).toDF("k", "region", "v")
      .writeTo(t).append()                                                  // v1
    // the UPDATE MOVES rows out of r0: preimages tombstone r0 files, the
    // rewritten rows land under the r1 directory
    withMorDml(graft.plans.MergeInto.sql(spark,
      s"UPDATE $t SET region = 'r1' WHERE k < 3"))                          // v2

    // unscoped feed: the move is an update — pre/postimage pair at v2
    val full = changes(t)
      .select($"k", $"region", $"_change_type", $"_commit_version")
      .as[(Long, String, String, Long)].collect().toSet
    assert(full.filter(_._3 == "update_preimage") ===
      (0L until 3L).map((_, "r0", "update_preimage", 2L)).toSet)
    assert(full.filter(_._3 == "update_postimage") ===
      (0L until 3L).map((_, "r1", "update_postimage", 2L)).toSet)

    // a feed scoped AWAY from the destination (r1 excluded): the moved
    // rows LEFT this view, so the surviving preimages are plain deletes —
    // exactly what a consumer maintaining the scoped view must apply
    val scoped = spark.read.option("filter", "region = 'r0'")
      .table(s"$t.changes")
      .select($"k", $"_change_type", $"_commit_version")
      .as[(Long, String, Long)].collect().toSet
    assert(scoped === (0L until 8L).map((_, "insert", 1L)).toSet ++
      (0L until 3L).map((_, "delete", 2L)).toSet,
      s"scoped feed must retract moved rows as deletes: $scoped")

    // a feed scoped TO the destination sees only the arrivals, still
    // marked update_postimage (the version's commit shape is an update;
    // per-row pairing is only promised when the OLD row is in view).
    // Either marking is a birth event to consumers — what matters, and
    // is pinned here, is that nothing else leaks in
    val dest = spark.read.option("filter", "region = 'r1'")
      .table(s"$t.changes")
      .select($"k", $"_change_type", $"_commit_version")
      .as[(Long, String, Long)].collect().toSet
    assert(dest === (0L until 3L).map((_, "update_postimage", 2L)).toSet,
      s"destination-scoped feed: $dest")
    spark.sql(s"DROP TABLE $t")
  }

  test("avro tables serve append-only change feeds; a delete artifact declines loudly") {
    import spark.implicits._
    val t = "gcdf.ns.avrocdf"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").writeTo(t).using("avro").create() // v1
    Seq((3L, "c")).toDF("k", "v").writeTo(t).append()                          // v2
    val got = changes(t).select($"k", $"_change_type", $"_commit_version")
      .as[(Long, String, Long)].collect().toSet
    assert(got === Set((1L, "insert", 1L), (2L, "insert", 1L), (3L, "insert", 2L)))

    // streaming: initial snapshot, then a catch-up window of new appends
    val ck = Files.createTempDirectory("avro_cdf_ck").toString
    val sink = Files.createTempDirectory("avro_cdf_sink").toString + "/out"
    def drain(): Unit = {
      val q = spark.readStream.table(s"$t.changes").writeStream
        .format("parquet").option("path", sink)
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain()
    assert(spark.read.parquet(sink).select($"k").as[Long].collect().toSet
      === Set(1L, 2L, 3L))
    Seq((4L, "d")).toDF("k", "v").writeTo(t).append()                          // v3
    drain()
    assert(spark.read.parquet(sink)
      .select($"k", $"_change_type", $"_commit_version")
      .as[(Long, String, Long)].collect().toSet
      === Set((1L, "insert", 1L), (2L, "insert", 1L), (3L, "insert", 2L),
        (4L, "insert", 3L)))

    // a delete artifact (external CDC writer shape) kills the feed LOUDLY —
    // row-level deletes cannot be reconstructed for avro data files
    ManifestTable.appendEqualityDeletes(Seq(2L).toDF("k"), root("avrocdf"))
    val e = intercept[Exception] { changes(t).collect() }
    def messages(ex: Throwable): Seq[String] =
      Option(ex).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("append-only")), s"${messages(e)}")
    spark.sql(s"DROP TABLE $t")
  }

  test("SCD2 maintenance folds update images, deletes, and in-batch chains exactly") {
    import spark.implicits._
    val t = "gcdf.ns.scd2src"
    val d = "gcdf.ns.scd2dim"
    Seq(t, d).foreach(x => spark.sql(s"DROP TABLE IF EXISTS $x"))
    spark.sql(s"CREATE TABLE $t (k BIGINT, v STRING)")
    spark.sql(s"CREATE TABLE $d (k BIGINT, v STRING, " +
      "valid_from BIGINT, valid_to BIGINT, is_current BOOLEAN)")
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v").writeTo(t).append() // v1
    val ck = Files.createTempDirectory("scd2_ck").toString
    def drain(): Long = graft.gold.Scd2.maintain(spark, t, d,
      Seq("k"), Seq("v"), ck)
    def dim(): Set[(Long, String, Long, Option[Long], Boolean)] =
      spark.table(d).select($"k", $"v", $"valid_from", $"valid_to", $"is_current")
        .as[(Long, String, Long, Option[Long], Boolean)].collect().toSet

    drain() // initial snapshot: all current at v1
    assert(dim() === Set((1L, "a", 1L, None, true), (2L, "b", 1L, None, true),
      (3L, "c", 1L, None, true)))

    // ONE batch spanning an update, a delete, AND a re-insert of the
    // deleted key: the in-batch chain must close the re-opened rows
    // against in-batch events, not just against the target
    withMorDml {
      graft.plans.MergeInto.sql(spark, s"UPDATE $t SET v = 'B' WHERE k = 2") // v2
      graft.plans.MergeInto.sql(spark, s"DELETE FROM $t WHERE k = 3")        // v3
      Seq((3L, "z")).toDF("k", "v").writeTo(t).append()                      // v4
    }
    drain()
    assert(dim() === Set(
      (1L, "a", 1L, None, true),
      (2L, "b", 1L, Some(2L), false), (2L, "B", 2L, None, true),
      (3L, "c", 1L, Some(3L), false), (3L, "z", 4L, None, true)),
      s"got ${dim()}")

    // a later delete closes the re-inserted row's interval
    withMorDml(graft.plans.MergeInto.sql(spark, s"DELETE FROM $t WHERE k = 1")) // v5
    assert(drain() === 0L, "a well-formed feed reports zero missing closes")
    assert(dim().contains((1L, "a", 1L, Some(5L), false)))
    assert(!dim().exists(r => r._1 == 1L && r._5), "k=1 must have no current row")

    // DRIFT under a routine UPDATE: the dim's current row for k=2 is
    // manually removed; the update's same-version close/open pair is
    // satisfied in the FOLD (the pair commits atomically — the end
    // state is the postimage as current either way), so the batch skips
    // the target probe, reports NOTHING, and SELF-HEALS: the postimage
    // opens the new current row
    withMorDml {
      graft.plans.MergeInto.sql(spark, s"DELETE FROM $d WHERE k = 2 AND is_current")
      graft.plans.MergeInto.sql(spark, s"UPDATE $t SET v = 'BB' WHERE k = 2") // v6
    }
    assert(drain() === 0L,
      "a routine update batch must skip the target probe (same-version pair)")
    assert(dim().exists(r => r._1 == 2L && r._2 == "BB" && r._5),
      "the postimage still opens a current row")

    // DRIFT under a DELETE, default mode: a delete's close has no
    // same-version reopen — it MUST find a target current row, so the
    // missing close is REPORTED instead of silently dropping
    withMorDml {
      graft.plans.MergeInto.sql(spark, s"DELETE FROM $d WHERE k = 3 AND is_current")
      graft.plans.MergeInto.sql(spark, s"DELETE FROM $t WHERE k = 3")        // v7
    }
    assert(drain() === 1L, "default mode reports the missing close")
    assert(!dim().exists(r => r._1 == 3L && r._5), "k=3 must have no current row")

    // DRIFT under a DELETE, strict mode: the batch fails loudly naming
    // the key (re-open k=3 first so a fresh drifted delete exists)
    Seq((3L, "zz")).toDF("k", "v").writeTo(t).append()                       // v8
    assert(drain() === 0L)
    withMorDml {
      graft.plans.MergeInto.sql(spark, s"DELETE FROM $d WHERE k = 3 AND is_current")
      graft.plans.MergeInto.sql(spark, s"DELETE FROM $t WHERE k = 3")        // v9
    }
    spark.conf.set("spark.graft.scd2.onMissingClose", "fail")
    try {
      val e = intercept[Exception] { drain() }
      def messages(ex: Throwable): Seq[String] =
        Option(ex).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
      assert(messages(e).exists(m => m.contains("no current row to close")
        && m.contains("[3,")), messages(e).toString)
      // the failed batch never committed: count mode replays it whole
      spark.conf.set("spark.graft.scd2.onMissingClose", "count")
      assert(drain() === 1L)
      assert(!dim().exists(r => r._1 == 3L && r._5))
    } finally spark.conf.unset("spark.graft.scd2.onMissingClose")
    Seq(t, d).foreach(x => spark.sql(s"DROP TABLE $x"))
  }

  test("the streaming filter is pinned in the checkpoint: a changed restart fails loudly") {
    import spark.implicits._
    val t = "gcdf.ns.fpin"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, region STRING) PARTITIONED BY (region)")
    (0 until 10).map(i => (i.toLong, s"r${i % 2}")).toDF("k", "region")
      .writeTo(t).append()                                                  // v1
    val checkpoint = Files.createTempDirectory("cdf_fpin_ck").toString
    val sink = Files.createTempDirectory("cdf_fpin_sink").toString + "/out"
    def drain(filter: Option[String]): Unit = {
      val r0 = spark.readStream
      val r = filter.fold(r0)(f => r0.option("filter", f))
      val q = r.table(s"$t.changes").writeStream
        .format("parquet").option("path", sink)
        .option("checkpointLocation", checkpoint)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain(Some("region = 'r1'"))
    assert(spark.read.parquet(sink).select($"k").as[Long].collect().toSet
      === Set(1L, 3L, 5L, 7L, 9L))

    // same filter resumes: only the new commit's r1 rows stream
    (10 until 14).map(i => (i.toLong, s"r${i % 2}")).toDF("k", "region")
      .writeTo(t).append()                                                  // v2
    drain(Some("region = 'r1'"))
    assert(spark.read.parquet(sink).select($"k").as[Long].collect().toSet
      === Set(1L, 3L, 5L, 7L, 9L, 11L, 13L))

    // a WEAKENED filter (and a dropped one) must fail loudly, naming both:
    // the r0 history was already consumed as "excluded" by these offsets
    def messages(e: Throwable): Seq[String] =
      Option(e).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    for (changed <- Seq(Some("region = 'r0'"), None)) {
      val ex = intercept[Exception] { drain(changed) }
      val ms = messages(ex)
      assert(ms.exists(m => m.contains("region = 'r1'") &&
        m.contains("cannot change across restarts")), s"$ms")
    }
    spark.sql(s"DROP TABLE $t")
  }

  test("a MOR MERGE feeds per-row insert/update/delete labels (Delta CDC fidelity)") {
    import spark.implicits._
    val t = "gcdf.ns.morlbl"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("k", "s", "v")
      .writeTo(t).tableProperty("write.merge.mode", "merge-on-read")
      .create()                                                             // v1
    // streaming consumer (the SCD2 fold shape): checkpoint established
    // BEFORE the merge so the next drain delivers v2 as a change WINDOW
    val ck = Files.createTempDirectory("graft_morlbl_ck").toString
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
    def drain(): Unit = {
      val q = spark.readStream.table(s"$t.changes")
        .writeStream.option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          rows ++= b.select("k", "_change_type", "_commit_version").collect()
            .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
          ()
        }.start()
      q.awaitTermination()
    }
    drain() // initial snapshot: inserts @ v1
    Seq((2L, 200.0), (3L, 300.0), (9L, 90.0)).toDF("k", "nv")
      .createOrReplaceTempView("morlbl_src")
    graft.plans.MergeInto.sql(spark,
      s"""MERGE INTO $t t USING morlbl_src s ON t.k = s.k
         |WHEN MATCHED AND s.k = 2 THEN UPDATE SET v = s.nv
         |WHEN MATCHED THEN DELETE
         |WHEN NOT MATCHED THEN INSERT (k, s, v) VALUES (s.k, 'i', s.nv)
         |""".stripMargin)                                                  // v2
    // an INSERTED row feeds as a true insert, a REWRITTEN row as an
    // update pre/post pair, a DELETED row as a true delete — all from
    // the ONE atomic merge commit (the pre-r18 feed served everything
    // as update pairs)
    val ch = changes(t).where($"_commit_version" === 2L)
      .select($"k", $"_change_type", $"v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(ch === Set(
      (2L, "update_preimage", 20.0), (2L, "update_postimage", 200.0),
      (3L, "delete", 30.0),
      (9L, "insert", 90.0)), s"got $ch")
    // end state exact
    assert(spark.table(t).orderBy("k").collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq ===
      Seq((1L, "a", 10.0), (2L, "b", 200.0), (9L, "i", 90.0)))
    // the streaming window sees the same per-row labels
    drain() // the v2 window
    assert(rows.filter(_._3 == 2L).toSet === Set(
      (2L, "update_preimage", 2L), (2L, "update_postimage", 2L),
      (3L, "delete", 2L), (9L, "insert", 2L)), s"got ${rows.toSet}")
    // labels survive DELETE MAINTENANCE: a second merge doubles both
    // artifact groups, rewrite_deletes merges each group into its OWN
    // blob, and both windows still label exactly
    Seq((1L, 100.0), (9L, -1.0)).toDF("k", "nv")
      .createOrReplaceTempView("morlbl_src2")
    graft.plans.MergeInto.sql(spark,
      s"""MERGE INTO $t t USING morlbl_src2 s ON t.k = s.k
         |WHEN MATCHED AND s.k = 1 THEN UPDATE SET v = s.nv
         |WHEN MATCHED THEN DELETE
         |""".stripMargin)                                                  // v3
    val r = root("morlbl")
    assert(ManifestTable.liveDeleteEntries(r).size === 4)
    spark.sql(s"CALL gcdf.system.rewrite_deletes(`table` => 'ns.morlbl')")  // v4
    val merged = ManifestTable.liveDeleteEntries(r).map(_.rel)
    assert(merged.size === 2 && merged.count(ManifestTable.isDeleteLabeledDv) === 1,
      s"one plain + one labeled blob after maintenance, got $merged")
    val byV = changes(t).select($"k", $"_change_type", $"_commit_version")
      .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2))).toSet
    assert(byV.filter(_._3 == 2L) === Set(
      (2L, "update_preimage", 2L), (2L, "update_postimage", 2L),
      (3L, "delete", 2L), (9L, "insert", 2L)), s"v2 after maintenance: $byV")
    assert(byV.filter(_._3 == 3L) === Set(
      (1L, "update_preimage", 3L), (1L, "update_postimage", 3L),
      (9L, "delete", 3L)), s"v3 after maintenance: $byV")
    spark.sql(s"DROP TABLE $t")
  }

  test("an explicit untilVersion cannot escape a VERSION AS OF / branch pin") {
    import spark.implicits._
    val t = "gcdf.ns.pincap"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT)")
    Seq(1L).toDF("k").writeTo(t).append()                                   // v1
    spark.sql(s"CALL gcdf.system.create_branch(`table` => 'ns.pincap', name => 'bb')")
    Seq(2L).toDF("k").writeTo(t).append()                                   // v2 (main)

    // branch 'bb' pins v1; an untilVersion pointing past it must be
    // capped at the pin, not silently scan main's later commits
    val viaOption = spark.read.option("branch", "bb").option("untilVersion", "2")
      .table(s"$t.changes").select($"k").as[Long].collect().toSet
    assert(viaOption === Set(1L),
      s"untilVersion must be capped at the branch pin: $viaOption")
    // an untilVersion INSIDE the pin still narrows the read
    Seq(3L).toDF("k").writeTo(t).append()                                   // v3 (main)
    val narrowed = spark.read.option("untilVersion", "2").table(s"$t.changes")
      .select($"k").as[Long].collect().toSet
    assert(narrowed === Set(1L, 2L))
    spark.sql(s"DROP TABLE $t")
  }

  test("change-preserving day-scoped CoW MERGE: per-row labels, carry rows silent, feed continues") {
    import spark.implicits._
    val t = "gcdf.ns.cowcdc"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    // 3 days x 10 rows; changefeed.cow opts this table into published
    // per-row changes for scoped copy-on-write merges
    spark.range(0, 30).select(
        col("id").as("k"),
        expr("timestamp_ntz '2024-03-01 00:00:00' + make_interval(0,0,0,0,0,0, id * 8640)").as("ts"),
        col("id").cast("double").as("v"))
      .writeTo(t)
      .partitionedBy(org.apache.spark.sql.functions.partitioning.days(col("ts")))
      .tableProperty("changefeed.cow", "true")
      .create()                                                          // v1
    val r = root("cowcdc")
    val v1 = ManifestTable.currentVersion(r).get
    val ck = Files.createTempDirectory("graft_cowcdc_ck").toString
    val outDir = Files.createTempDirectory("graft_cowcdc_out").toString
    // a RUNNING consumer drains the initial snapshot first
    def drain(): Unit = {
      val q = spark.readStream.table(s"$t.changes")
        .writeStream.option("checkpointLocation", ck)
        .format("parquet").option("path", outDir)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain()
    assert(spark.read.parquet(outDir).count() === 30L) // snapshot inserts
    // day 3 (ids 20-29): update k=21, DELETE k=23, insert k=99
    Seq((21L, "2024-03-03 00:00:00", 210.0), (23L, "2024-03-03 00:00:00", -1.0),
        (99L, "2024-03-03 12:00:00", 990.0))
      .toDF("k", "tss", "v")
      .select(col("k"), col("tss").cast("timestamp_ntz").as("ts"), col("v"))
      .createOrReplaceTempView("cowcdc_stg")
    graft.plans.MergeInto.sql(spark,
      s"""MERGE INTO $t t USING cowcdc_stg s ON t.k = s.k
         |WHEN MATCHED AND s.v < 0 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED THEN INSERT (k, ts, v) VALUES (s.k, s.ts, s.v)""".stripMargin) // v2
    val v2 = ManifestTable.currentVersion(r).get
    // the scoped rewrite landed: day 3 rewrote, days 1-2 carried
    assert(spark.table(t).count() === 30L) // 30 - 1 delete + 1 insert
    // CHANGE-PRESERVING horizon: the feed serves the merge itself — a
    // batch window from v1 (= v2-1) delivers EXACT per-row events, and
    // feed volume follows the touched rows (4 events), not the
    // partition (10 rows) or the table (30)
    val got = spark.read.option("fromVersion", v1.toString).table(s"$t.changes")
      .select($"k", $"v", $"_change_type", $"_commit_version")
      .as[(Long, Double, String, Long)].collect().toSet
    assert(got === Set(
      (21L, 21.0, "update_preimage", v2),
      (21L, 210.0, "update_postimage", v2),
      (23L, 23.0, "delete", v2),
      (99L, 990.0, "insert", v2)), s"got $got")
    // the RUNNING stream continues across the rewrite (no loud break)
    // and delivers the same four events
    drain()
    val streamed = spark.read.parquet(outDir)
      .where($"_commit_version" === v2)
      .select($"k", $"_change_type").as[(Long, String)].collect().toSet
    assert(streamed === Set((21L, "update_preimage"), (21L, "update_postimage"),
      (23L, "delete"), (99L, "insert")), s"streamed $streamed")
    // untouched rows of the TOUCHED day (carry class) and carried days
    // emit nothing — already implied by the exact sets above
    // fsck stays healthy with CDC sidecars present
    val fsck = graft.sources.v2.Maintenance.fsck(spark, s"gcdf.ns.cowcdc")
    assert(fsck._9, s"fsck must stay healthy with CDC sidecars: $fsck")
    // SCD2-style fold equivalence: the accumulated feed reproduces the table
    val folded = spark.read.parquet(outDir)
      .select($"k", $"v",
        when($"_change_type".isin("insert", "update_postimage"), 1)
          .otherwise(-1).as("b"))
      .groupBy($"k", $"v").agg(sum($"b").as("n")).where($"n" > 0)
      .select($"k", $"v").as[(Long, Double)].collect().toSet
    assert(folded === spark.table(t).select($"k", $"v")
      .as[(Long, Double)].collect().toSet)
    spark.sql(s"DROP TABLE $t")
  }
}
