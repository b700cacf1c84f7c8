package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ManifestTable
import graft.sources.v2.VersionedCatalog

/** Partial-progress OPTIMIZE (Iceberg's `rewrite_data_files` with
  * `partial-progress.enabled` / `max-commits`): the rewrite of a
  * day-keyed table chunks into up to N independent day-scoped commits,
  * so a crash keeps finished chunks and each commit conflicts only with
  * writes to its own days. */
class PartialOptimizeSpec extends AnyFunSuite {
  private lazy val wh = java.nio.file.Files.createTempDirectory("graft_powh").toString
  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.gpo", classOf[VersionedCatalog].getName)
    s.conf.set("spark.sql.catalog.gpo.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gpo.ns")
    s
  }

  private def mk(tbl: String, days: Int, rowsPerDay: Int): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS gpo.ns.$tbl")
    spark.sql(s"CREATE TABLE gpo.ns.$tbl (id BIGINT, ts TIMESTAMP_NTZ, v DOUBLE) " +
      "PARTITIONED BY (days(ts))")
    spark.sql(s"ALTER TABLE gpo.ns.$tbl SET TBLPROPERTIES('retain'='10')")
    import spark.implicits._
    (0 until days * rowsPerDay).map { i =>
      (i.toLong, java.time.LocalDateTime.of(2024, 3, 1 + i % days, i % 24, 0), i * 1.0)
    }.toDF("id", "ts", "v").createOrReplaceTempView(s"${tbl}_src")
    // several appends → several files per day (ingest fragmentation)
    (0 until 3).foreach { b =>
      spark.sql(s"INSERT INTO gpo.ns.$tbl SELECT * FROM ${tbl}_src " +
        s"WHERE CAST(id / $days AS BIGINT) % 3 = $b") // batch ⟂ day
    }
  }

  test("max_commits chunks the rewrite into independent day-scoped commits") {
    mk("p1", days = 6, rowsPerDay = 50)
    val root = s"$wh/ns/p1"
    val v0 = ManifestTable.currentVersion(root).get
    val before = spark.table("gpo.ns.p1").orderBy("id").collect()
    val filesBefore = ManifestTable.liveEntries(root).size
    assert(filesBefore > 6, s"setup must fragment (got $filesBefore files)")
    val vEnd = spark.sql(
      "CALL gpo.system.optimize(`table` => 'ns.p1', max_commits => 3)")
      .collect()(0).getLong(0)
    // three independent commits landed (one per chunk)
    assert(vEnd === v0 + 3, s"expected 3 chunk commits, v0=$v0 vEnd=$vEnd")
    // compacted: one file per day
    assert(ManifestTable.liveEntries(root).size === 6)
    assert(spark.table("gpo.ns.p1").orderBy("id").collect().toSeq === before.toSeq)
    // intermediate chunk states are real retained snapshots — each holds
    // the full row count (untouched days carried by reference)
    (v0 to vEnd).foreach { v =>
      assert(spark.sql(s"SELECT COUNT(*) FROM gpo.ns.p1 VERSION AS OF $v")
        .collect()(0).getLong(0) === before.length.toLong, s"version $v lost rows")
    }
    spark.sql("DROP TABLE gpo.ns.p1")
  }

  test("a concurrent append to an untouched day survives chunked optimize") {
    mk("p2", days = 4, rowsPerDay = 40)
    val root = s"$wh/ns/p2"
    val n0 = spark.table("gpo.ns.p2").count()
    // interleave: chunk commits land one at a time; an append BETWEEN the
    // CALL's commits is modeled by appending after the pin but before the
    // CALL finishes is not deterministic from SQL — instead verify the
    // conflict contract directly: append to a day, then run a chunked
    // optimize pinned BEFORE the append; the appended day's chunk must
    // fail its unchanged-check while other chunks land.
    import spark.implicits._
    // run chunked optimize normally first (sanity), then race semantics
    spark.sql("CALL gpo.system.optimize(`table` => 'ns.p2', max_commits => 2)")
    assert(spark.table("gpo.ns.p2").count() === n0)
    // now the raced shape: pin, concurrent append, day-replace under the pin
    val (v0, raw) = {
      val m = ManifestTable.readRawPinned(spark, root)
      (m._1, m._2)
    }
    Seq((9999L, java.time.LocalDateTime.of(2024, 3, 2, 1, 0), 1.0))
      .toDF("id", "ts", "v").createOrReplaceTempView("p2_extra")
    spark.sql("INSERT INTO gpo.ns.p2 SELECT * FROM p2_extra") // touches 2024-03-02
    val slice = raw.where(col(ManifestTable.DayCol).cast("string") === "2024-03-02")
      .drop(ManifestTable.DayCol)
    intercept[java.util.ConcurrentModificationException] {
      ManifestTable.replaceDays(slice, root, Set("2024-03-02"), "ts",
        retain = 10, expectedVersion = Some(v0))
    }
    // an untouched day replaces fine under the same stale pin
    val slice2 = raw.where(col(ManifestTable.DayCol).cast("string") === "2024-03-03")
      .drop(ManifestTable.DayCol)
    ManifestTable.replaceDays(slice2, root, Set("2024-03-03"), "ts",
      retain = 10, expectedVersion = Some(v0))
    assert(spark.table("gpo.ns.p2").count() === n0 + 1)
    spark.sql("DROP TABLE gpo.ns.p2")
  }

  test("a concurrent MOR delete to a chunk's day conflicts loudly (no silent resurrection)") {
    mk("p3", days = 3, rowsPerDay = 40)
    val root = s"$wh/ns/p3"
    val (v0, raw) = {
      val m = ManifestTable.readRawPinned(spark, root)
      (m._1, m._2)
    }
    // a merge-on-read DELETE lands between the pin and the chunk commit:
    // the day's FILE set is untouched (only a __deletes/ entry appears),
    // which the pre-fix check could not see — rewriting the day from the
    // pinned rows would silently resurrect the deleted rows
    val prev = spark.conf.getOption("spark.graft.delete.mode")
    try {
      spark.conf.set("spark.graft.delete.mode", "merge-on-read")
      graft.plans.MergeInto.sql(spark,
        "DELETE FROM gpo.ns.p3 WHERE id % 3 = 0 AND ts < TIMESTAMP_NTZ '2024-03-02 00:00:00'")
    } finally prev match {
      case Some(m) => spark.conf.set("spark.graft.delete.mode", m)
      case None => spark.conf.unset("spark.graft.delete.mode")
    }
    val nAfterDelete = spark.table("gpo.ns.p3").count()
    val slice = raw.where(col(ManifestTable.DayCol).cast("string") === "2024-03-01")
      .drop(ManifestTable.DayCol)
    intercept[java.util.ConcurrentModificationException] {
      ManifestTable.replaceDays(slice, root, Set("2024-03-01"), "ts",
        retain = 10, expectedVersion = Some(v0))
    }
    // the delete survives; and a chunk over an UNAFFECTED day still lands
    assert(spark.table("gpo.ns.p3").count() === nAfterDelete)
    val slice2 = raw.where(col(ManifestTable.DayCol).cast("string") === "2024-03-03")
      .drop(ManifestTable.DayCol)
    ManifestTable.replaceDays(slice2, root, Set("2024-03-03"), "ts",
      retain = 10, expectedVersion = Some(v0))
    assert(spark.table("gpo.ns.p3").count() === nAfterDelete)
    spark.sql("DROP TABLE gpo.ns.p3")
  }

  test("where_days composes with zorder_by: selected days z-cluster, others untouched") {
    spark.sql("DROP TABLE IF EXISTS gpo.ns.pz")
    spark.sql("CREATE TABLE gpo.ns.pz (id BIGINT, ts TIMESTAMP_NTZ, x BIGINT, y BIGINT) " +
      "PARTITIONED BY (days(ts))")
    spark.sql("ALTER TABLE gpo.ns.pz SET TBLPROPERTIES('retain'='10')")
    import spark.implicits._
    (0 until 4000).map { i =>
      (i.toLong, java.time.LocalDateTime.of(2024, 4, 1 + i % 2, i % 24, 0),
        (i % 97).toLong, (i * 31 % 89).toLong)
    }.toDF("id", "ts", "x", "y").createOrReplaceTempView("pz_src")
    (0 until 3).foreach(b => spark.sql(
      s"INSERT INTO gpo.ns.pz SELECT * FROM pz_src WHERE CAST(id/2 AS BIGINT) % 3 = $b"))
    val root = s"$wh/ns/pz"
    def relsOfDay(d: String): Set[String] = ManifestTable.liveEntries(root)
      .map(_.rel).filter(_.startsWith(s"__day=$d/")).toSet
    def areaFrac(d: String): Double = {
      val fs = relsOfDay(d).toSeq
      fs.map { f =>
        val r = spark.read.parquet(s"$root/data/$f")
          .agg(min("x"), max("x"), min("y"), max("y")).collect()(0)
        ((r.getLong(1) - r.getLong(0)).toDouble / 96.0) *
          ((r.getLong(3) - r.getLong(2)).toDouble / 88.0)
      }.sum / fs.size
    }
    val day2Before = relsOfDay("2024-04-02")
    val before = areaFrac("2024-04-01")
    val total = spark.table("gpo.ns.pz").agg(sum("x")).collect()(0).getLong(0)
    // target ~4 output files for the day so each covers ~1/4 of the plane
    val dayBytes = ManifestTable.liveEntries(root)
      .filter(_.rel.startsWith("__day=2024-04-01/"))
      .map(e => graft.sources.FileStats.byteSize(
        graft.sources.FileStats.decode(e.stats.getOrElse(""))).map(_._1).getOrElse(0L)).sum
    graft.sources.v2.Maintenance.optimize(spark, "gpo.ns.pz",
      targetFileBytes = math.max(1L, dayBytes / 4),
      zorderBy = Seq("x", "y"), whereDays = Some(("2024-04-01", "2024-04-01")))
    assert(relsOfDay("2024-04-02") === day2Before, "other days must carry untouched")
    val after = areaFrac("2024-04-01")
    assert(relsOfDay("2024-04-01").size >= 2)
    assert(after < 0.6 && after < before * 0.75,
      f"day not z-clustered: area fraction $after%.2f (was $before%.2f)")
    // WITHIN-FILE Morton order must survive the pool write (the file
    // writer's own partition sort is not order-stable; the rewrite's
    // order re-applies inside writePool) — recompute the z key with the
    // slice's bounds and assert monotonic rows per file
    val dayDf = spark.table("gpo.ns.pz")
      .where(col("ts") >= lit("2024-04-01").cast("timestamp_ntz") &&
        col("ts") < lit("2024-04-02").cast("timestamp_ntz"))
    val mm = dayDf.agg(min("x"), max("x"), min("y"), max("y")).collect()(0)
    def bucket(v: Long, lo: Long, hi: Long): Long = {
      val span = math.max((hi - lo).toDouble, java.lang.Double.MIN_NORMAL)
      math.min(255L, math.max(0L, math.floor((v - lo) / span * 256).toLong))
    }
    def morton(x: Long, y: Long): Long = {
      val bx = bucket(x, mm.getLong(0), mm.getLong(1))
      val by = bucket(y, mm.getLong(2), mm.getLong(3))
      (0 until 8).map(b =>
        (((bx >> b) & 1L) << (b * 2)) + (((by >> b) & 1L) << (b * 2 + 1))).sum
    }
    relsOfDay("2024-04-01").foreach { f =>
      val zs = spark.read.parquet(s"$root/data/$f").select("x", "y")
        .collect().map(r => morton(r.getLong(0), r.getLong(1)))
      assert(zs.zip(zs.drop(1)).forall { case (a, b) => a <= b },
        s"file $f lost its within-file Morton order")
    }
    assert(spark.table("gpo.ns.pz").agg(sum("x")).collect()(0).getLong(0) === total)
    spark.sql("DROP TABLE gpo.ns.pz")
  }

  test("max_commits refuses to compose with where_days and non-day layouts") {
    mk("p4", days = 2, rowsPerDay = 10)
    val e1 = intercept[Exception] {
      spark.sql("CALL gpo.system.optimize(`table` => 'ns.p4', " +
        "where_days => '2024-03-01,2024-03-02', max_commits => 4)")
    }
    assert(e1.getMessage.contains("does not compose"))
    spark.sql("DROP TABLE gpo.ns.p4")
    spark.sql("CREATE TABLE gpo.ns.p4f (id BIGINT, v DOUBLE)") // flat
    spark.sql("INSERT INTO gpo.ns.p4f VALUES (1, 1.0)")
    val e2 = intercept[Exception] {
      spark.sql("CALL gpo.system.optimize(`table` => 'ns.p4f', max_commits => 4)")
    }
    assert(e2.getMessage.contains("days() layout"))
    spark.sql("DROP TABLE gpo.ns.p4f")
  }
}
