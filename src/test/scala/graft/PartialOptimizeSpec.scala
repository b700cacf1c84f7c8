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

  test("chunked optimize survives the table's OWN retention (pinned base must outlive the chunk window)") {
    // deliberately NO retain property: under the default policy the
    // pinned base manifest would be expired by the second chunk commit
    // and every later chunk's unchanged-check would crash reading it —
    // the chunk commits must keep the whole window alive themselves
    spark.sql("DROP TABLE IF EXISTS gpo.ns.pr")
    spark.sql("CREATE TABLE gpo.ns.pr (id BIGINT, ts TIMESTAMP_NTZ, v DOUBLE) " +
      "PARTITIONED BY (days(ts))")
    import spark.implicits._
    (0 until 400).map { i =>
      (i.toLong, java.time.LocalDateTime.of(2024, 5, 1 + i % 8, i % 24, 0), i * 1.0)
    }.toDF("id", "ts", "v").createOrReplaceTempView("pr_src")
    (0 until 3).foreach(b => spark.sql(
      s"INSERT INTO gpo.ns.pr SELECT * FROM pr_src WHERE CAST(id/8 AS BIGINT) % 3 = $b"))
    val before = spark.table("gpo.ns.pr").orderBy("id").collect()
    val root = s"$wh/ns/pr"
    val v0 = ManifestTable.currentVersion(root).get
    val vEnd = spark.sql(
      "CALL gpo.system.optimize(`table` => 'ns.pr', max_commits => 4)")
      .collect()(0).getLong(0)
    assert(vEnd === v0 + 4, s"expected 4 chunk commits, v0=$v0 vEnd=$vEnd")
    assert(spark.table("gpo.ns.pr").orderBy("id").collect().toSeq === before.toSeq)
    spark.sql("DROP TABLE gpo.ns.pr")
  }

  test("the run's pin tag protects the base from a CONCURRENT writer's retention") {
    // the chunk commits widen their own retention, but a concurrent
    // append commits under the TABLE's policy — without the pin its gc
    // would expire the pinned base between chunks and every remaining
    // chunk's unchanged-check would crash reading it. The optimize run
    // tags its base; this pins the mechanics deterministically: tag v0,
    // let an append's gc run under default retention, and both the base
    // manifest and a day-replace against the stale pin must survive.
    spark.sql("DROP TABLE IF EXISTS gpo.ns.ppin")
    spark.sql("CREATE TABLE gpo.ns.ppin (id BIGINT, ts TIMESTAMP_NTZ, v DOUBLE) " +
      "PARTITIONED BY (days(ts))")
    import spark.implicits._
    (0 until 200).map { i =>
      (i.toLong, java.time.LocalDateTime.of(2024, 6, 1 + i % 4, i % 24, 0), i * 1.0)
    }.toDF("id", "ts", "v").createOrReplaceTempView("ppin_src")
    spark.sql("INSERT INTO gpo.ns.ppin SELECT * FROM ppin_src")
    val root = s"$wh/ns/ppin"
    val (v0, raw) = ManifestTable.readRawPinned(spark, root)
    ManifestTable.createTag(root, "__optimize_pin_spec", Some(v0))
    // two appends under the table's DEFAULT retention (2): without the
    // pin, v0 would expire here
    (0 until 2).foreach { i =>
      Seq((900L + i, java.time.LocalDateTime.of(2024, 6, 9, 0, 0), 9.0))
        .toDF("id", "ts", "v").createOrReplaceTempView("ppin_extra")
      spark.sql("INSERT INTO gpo.ns.ppin SELECT * FROM ppin_extra")
    }
    assert(ManifestTable.manifest(root, v0).nonEmpty,
      "the tagged base manifest must survive concurrent writers' gc")
    // a chunk against the stale pin still lands: its day (2024-06-01)
    // was untouched by the appends
    val slice = raw.where(col(ManifestTable.DayCol).cast("string") === "2024-06-01")
      .drop(ManifestTable.DayCol)
    ManifestTable.replaceDays(slice, root, Set("2024-06-01"), "ts",
      retain = 2, expectedVersion = Some(v0))
    assert(spark.table("gpo.ns.ppin").count() === 202L)
    ManifestTable.dropRef(root, "__optimize_pin_spec")
    spark.sql("DROP TABLE gpo.ns.ppin")
  }

  test("max_commits refuses non-day layouts") {
    spark.sql("CREATE TABLE gpo.ns.p4f (id BIGINT, v DOUBLE)") // flat
    spark.sql("INSERT INTO gpo.ns.p4f VALUES (1, 1.0)")
    val e2 = intercept[Exception] {
      spark.sql("CALL gpo.system.optimize(`table` => 'ns.p4f', max_commits => 4)")
    }
    assert(e2.getMessage.contains("identity layout"))
    spark.sql("DROP TABLE gpo.ns.p4f")
  }

  test("IDENTITY layouts chunk per partition key (the gold ano/mes shape), concurrent workers included") {
    // the reference's gold tables are identity-partitioned (ano, mes) —
    // at 100 TB their rewrite needs the same resumable chunked commits
    // the day layout has; chunks scope per KEY through replaceKeys
    spark.sql("DROP TABLE IF EXISTS gpo.ns.pid")
    spark.sql("CREATE TABLE gpo.ns.pid (id BIGINT, ano INT, mes INT, v DOUBLE) " +
      "PARTITIONED BY (ano, mes)")
    spark.sql("ALTER TABLE gpo.ns.pid SET TBLPROPERTIES('retain'='10')")
    import spark.implicits._
    (0 until 1200).map { i =>
      (i.toLong, 2023 + (i / 6) % 2, 1 + i % 6, i * 1.0)
    }.toDF("id", "ano", "mes", "v").createOrReplaceTempView("pid_src")
    (0 until 3).foreach(b => spark.sql(
      s"INSERT INTO gpo.ns.pid SELECT * FROM pid_src WHERE CAST(id/12 AS BIGINT) % 3 = $b"))
    val root = s"$wh/ns/pid"
    def byKey = ManifestTable.liveEntries(root)
      .groupBy(e => e.rel.split('/').dropRight(1).mkString("/"))
    assert(byKey.size === 12 && byKey.values.forall(_.size === 3),
      "setup: 12 (ano,mes) keys, 3 files each")
    val before = spark.table("gpo.ns.pid").orderBy("id").collect()
    val v0 = ManifestTable.currentVersion(root).get
    val vEnd = spark.sql(
      "CALL gpo.system.optimize(`table` => 'ns.pid', max_commits => 4, " +
        "max_concurrent_rewrites => 3)").collect()(0).getLong(0)
    assert(vEnd === v0 + 4, s"expected 4 chunk commits, v0=$v0 vEnd=$vEnd")
    assert(byKey.size === 12 && byKey.values.forall(_.size === 1),
      s"every key compacted to one file, got ${byKey.view.mapValues(_.size).toMap}")
    assert(spark.table("gpo.ns.pid").orderBy("id").collect().toSeq === before.toSeq)
    // every intermediate chunk commit is a full-count retained snapshot
    (v0 to vEnd).foreach { v =>
      assert(spark.sql(s"SELECT COUNT(*) FROM gpo.ns.pid VERSION AS OF $v")
        .collect()(0).getLong(0) === 1200L, s"version $v lost rows")
    }
    // identity filters still prune after the rewrite (values re-derive
    // from the rewritten directory names)
    assert(spark.table("gpo.ns.pid").where("ano = 2024 AND mes = 3").count()
      === before.count(r => r.getInt(1) == 2024 && r.getInt(2) == 3))
    spark.sql("DROP TABLE gpo.ns.pid")
  }

  test("where_keys compacts ONLY the selected identity keys — exact and prefix forms") {
    spark.sql("DROP TABLE IF EXISTS gpo.ns.pwk")
    spark.sql("CREATE TABLE gpo.ns.pwk (id BIGINT, ano INT, mes INT, v DOUBLE) " +
      "PARTITIONED BY (ano, mes)")
    spark.sql("ALTER TABLE gpo.ns.pwk SET TBLPROPERTIES('retain'='10')")
    import spark.implicits._
    (0 until 600).map { i =>
      (i.toLong, 2023 + (i / 3) % 2, 1 + i % 3, i * 1.0)
    }.toDF("id", "ano", "mes", "v").createOrReplaceTempView("pwk_src")
    (0 until 3).foreach(b => spark.sql(
      s"INSERT INTO gpo.ns.pwk SELECT * FROM pwk_src WHERE CAST(id/6 AS BIGINT) % 3 = $b"))
    val root = s"$wh/ns/pwk"
    def filesOf(key: String): Int = ManifestTable.liveEntries(root)
      .count(e => e.rel.startsWith(s"$key/"))
    assert(filesOf("ano=2023/mes=1") === 3 && filesOf("ano=2024/mes=2") === 3)
    val before = spark.table("gpo.ns.pwk").orderBy("id").collect()
    // exact key: only that directory compacts
    spark.sql("CALL gpo.system.optimize(`table` => 'ns.pwk', " +
      "where_keys => 'ano=2023/mes=1')")
    assert(filesOf("ano=2023/mes=1") === 1, "selected key compacts")
    assert(filesOf("ano=2023/mes=2") === 3 && filesOf("ano=2024/mes=1") === 3,
      "unselected keys carry untouched")
    // prefix: every key under ano=2024 compacts, 2023 untouched
    spark.sql("CALL gpo.system.optimize(`table` => 'ns.pwk', " +
      "where_keys => 'ano=2024', max_commits => 2)")
    assert((1 to 3).forall(m => filesOf(s"ano=2024/mes=$m") == 1),
      "prefix selects every key under it")
    assert(filesOf("ano=2023/mes=2") === 3 && filesOf("ano=2023/mes=3") === 3)
    assert(spark.table("gpo.ns.pwk").orderBy("id").collect().toSeq === before.toSeq)
    // where_keys on a non-identity table refuses
    val e = intercept[Exception] {
      spark.sql("CALL gpo.system.optimize(`table` => 'ns.pwk_none', " +
        "where_keys => 'x=1')")
    } // (missing table fails resolution first — use a real day table)
    mk("pwkd", days = 2, rowsPerDay = 5)
    val e2 = intercept[Exception] {
      spark.sql("CALL gpo.system.optimize(`table` => 'ns.pwkd', " +
        "where_keys => 'x=1')")
    }
    assert(e2.getMessage.contains("identity partition directories"))
    spark.sql("DROP TABLE gpo.ns.pwkd"); spark.sql("DROP TABLE gpo.ns.pwk")
  }

  test("identity chunking: concurrent writes conflict per KEY, untouched keys sail through") {
    spark.sql("DROP TABLE IF EXISTS gpo.ns.pidc")
    spark.sql("CREATE TABLE gpo.ns.pidc (id BIGINT, grp STRING, v DOUBLE) " +
      "PARTITIONED BY (grp)")
    spark.sql("ALTER TABLE gpo.ns.pidc SET TBLPROPERTIES('retain'='10')")
    import spark.implicits._
    (0 until 300).map(i => (i.toLong, s"g${i % 3}", i * 1.0))
      .toDF("id", "grp", "v").createOrReplaceTempView("pidc_src")
    (0 until 2).foreach(_ =>
      spark.sql("INSERT INTO gpo.ns.pidc SELECT * FROM pidc_src"))
    val root = s"$wh/ns/pidc"
    val v0 = ManifestTable.currentVersion(root).get
    val n0 = spark.table("gpo.ns.pidc").count()
    // a concurrent append lands in g0 AFTER the pin
    Seq((9999L, "g0", 1.0)).toDF("id", "grp", "v")
      .createOrReplaceTempView("pidc_extra")
    spark.sql("INSERT INTO gpo.ns.pidc SELECT * FROM pidc_extra")
    // replacing the RACED key under the stale pin fails loudly…
    val slice0 = ManifestTable.readKeysPinned(spark, root, v0, Set("grp=g0"))
    intercept[java.util.ConcurrentModificationException] {
      ManifestTable.replaceKeys(slice0, root, Set("grp=g0"),
        partitionCols = Seq("grp"), retain = 10, expectedVersion = Some(v0))
    }
    // …while an untouched key replaces fine under the same stale pin
    val slice1 = ManifestTable.readKeysPinned(spark, root, v0, Set("grp=g1"))
    ManifestTable.replaceKeys(slice1, root, Set("grp=g1"),
      partitionCols = Seq("grp"), retain = 10, expectedVersion = Some(v0))
    assert(spark.table("gpo.ns.pidc").count() === n0 + 1)
    spark.sql("DROP TABLE gpo.ns.pidc")
  }

  test("max_commits composes with where_days: only the selected range chunks, others carry untouched") {
    mk("p5", days = 6, rowsPerDay = 40)
    val root = s"$wh/ns/p5"
    def relsOfDay(d: String): Set[String] = ManifestTable.liveEntries(root)
      .map(_.rel).filter(_.startsWith(s"__day=$d/")).toSet
    val d5Before = relsOfDay("2024-03-05")
    val d6Before = relsOfDay("2024-03-06")
    val before = spark.table("gpo.ns.p5").orderBy("id").collect()
    val v0 = ManifestTable.currentVersion(root).get
    val vEnd = spark.sql(
      "CALL gpo.system.optimize(`table` => 'ns.p5', " +
        "where_days => '2024-03-01,2024-03-04', max_commits => 2)")
      .collect()(0).getLong(0)
    assert(vEnd === v0 + 2, s"expected 2 chunk commits, v0=$v0 vEnd=$vEnd")
    (1 to 4).foreach(d => assert(relsOfDay(s"2024-03-0$d").size === 1,
      s"day 2024-03-0$d not compacted"))
    assert(relsOfDay("2024-03-05") === d5Before)
    assert(relsOfDay("2024-03-06") === d6Before)
    assert(spark.table("gpo.ns.p5").orderBy("id").collect().toSeq === before.toSeq)
    spark.sql("DROP TABLE gpo.ns.p5")
  }

  test("max_commits composes with zorder_by: chunked commits, per-file Morton order preserved per chunk") {
    spark.sql("DROP TABLE IF EXISTS gpo.ns.pzc")
    spark.sql("CREATE TABLE gpo.ns.pzc (id BIGINT, ts TIMESTAMP_NTZ, x BIGINT, y BIGINT) " +
      "PARTITIONED BY (days(ts))")
    spark.sql("ALTER TABLE gpo.ns.pzc SET TBLPROPERTIES('retain'='10')")
    import spark.implicits._
    (0 until 6000).map { i =>
      (i.toLong, java.time.LocalDateTime.of(2024, 4, 1 + i % 3, i % 24, 0),
        (i % 97).toLong, (i * 31 % 89).toLong)
    }.toDF("id", "ts", "x", "y").createOrReplaceTempView("pzc_src")
    (0 until 3).foreach(b => spark.sql(
      s"INSERT INTO gpo.ns.pzc SELECT * FROM pzc_src WHERE CAST(id/3 AS BIGINT) % 3 = $b"))
    val root = s"$wh/ns/pzc"
    def relsOfDay(d: String): Set[String] = ManifestTable.liveEntries(root)
      .map(_.rel).filter(_.startsWith(s"__day=$d/")).toSet
    val total = spark.table("gpo.ns.pzc").agg(sum("x")).collect()(0).getLong(0)
    val v0 = ManifestTable.currentVersion(root).get
    val dayBytes = ManifestTable.liveEntries(root)
      .filter(_.rel.startsWith("__day=2024-04-01/"))
      .map(e => graft.sources.FileStats.byteSize(
        graft.sources.FileStats.decode(e.stats.getOrElse(""))).map(_._1).getOrElse(0L)).sum
    // one chunk per day so each chunk's z bounds are the day's own — the
    // probe below recomputes them exactly. max_commits well above the
    // day count forces the byte-greedy packer to split every day (chunk
    // budget ≪ any day's bytes); 3 days still means exactly 3 commits.
    val vEnd = graft.sources.v2.Maintenance.optimize(spark, "gpo.ns.pzc",
      targetFileBytes = math.max(1L, dayBytes / 4),
      zorderBy = Seq("x", "y"), maxCommits = 12)
    assert(vEnd === v0 + 3, s"expected 3 chunk commits, v0=$v0 vEnd=$vEnd")
    // every intermediate chunk commit is a full-count retained snapshot
    (v0 to vEnd).foreach { v =>
      assert(spark.sql(s"SELECT COUNT(*) FROM gpo.ns.pzc VERSION AS OF $v")
        .collect()(0).getLong(0) === 6000L, s"version $v lost rows")
    }
    for (d <- Seq("2024-04-01", "2024-04-02", "2024-04-03")) {
      val files = relsOfDay(d)
      assert(files.size >= 2, s"day $d: z-order should split into ranged files")
      // recompute the z key with the CHUNK's (= day's) bounds and assert
      // within-file Morton monotonicity — the PartialOptimizeSpec probe
      val dayDf = spark.table("gpo.ns.pzc")
        .where(col("ts") >= lit(d).cast("timestamp_ntz") &&
          col("ts") < lit(java.time.LocalDate.parse(d).plusDays(1).toString)
            .cast("timestamp_ntz"))
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
      files.foreach { f =>
        val zs = spark.read.parquet(s"$root/data/$f").select("x", "y")
          .collect().map(r => morton(r.getLong(0), r.getLong(1)))
        assert(zs.zip(zs.drop(1)).forall { case (a, b) => a <= b },
          s"file $f of day $d lost its within-file Morton order")
      }
      // and the files hold DISJOINT z ranges (range placement worked)
      val ranges = files.toSeq.map { f =>
        val zs = spark.read.parquet(s"$root/data/$f").select("x", "y")
          .collect().map(r => morton(r.getLong(0), r.getLong(1)))
        (zs.min, zs.max, f)
      }.sortBy(_._1)
      ranges.zip(ranges.drop(1)).foreach { case ((_, hi, f1), (lo, _, f2)) =>
        assert(hi <= lo, s"day $d: z ranges of $f1 and $f2 overlap")
      }
    }
    assert(spark.table("gpo.ns.pzc").agg(sum("x")).collect()(0).getLong(0) === total)
    spark.sql("DROP TABLE gpo.ns.pzc")
  }

  test("identity key-scoped OPTIMIZE composes with zorder_by: resumable z-order for the gold ano/mes layout") {
    spark.sql("DROP TABLE IF EXISTS gpo.ns.pzi")
    spark.sql("CREATE TABLE gpo.ns.pzi (id BIGINT, ano INT, mes INT, x BIGINT, y BIGINT) " +
      "PARTITIONED BY (ano, mes)")
    spark.sql("ALTER TABLE gpo.ns.pzi SET TBLPROPERTIES('retain'='12')")
    import spark.implicits._
    (0 until 6000).map { i =>
      (i.toLong, 2024, 1 + i % 3, (i % 97).toLong, (i * 31 % 89).toLong)
    }.toDF("id", "ano", "mes", "x", "y").createOrReplaceTempView("pzi_src")
    (0 until 3).foreach(b => spark.sql(
      s"INSERT INTO gpo.ns.pzi SELECT * FROM pzi_src WHERE CAST(id/3 AS BIGINT) % 3 = $b"))
    val root = s"$wh/ns/pzi"
    def relsOfKey(mes: Int): Set[String] = ManifestTable.liveEntries(root)
      .map(_.rel).filter(_.startsWith(s"ano=2024/mes=$mes/")).toSet
    val total = spark.table("gpo.ns.pzi").agg(sum("x")).collect()(0).getLong(0)
    val v0 = ManifestTable.currentVersion(root).get
    val keyBytes = ManifestTable.liveEntries(root)
      .filter(_.rel.startsWith("ano=2024/mes=1/"))
      .map(e => graft.sources.FileStats.byteSize(
        graft.sources.FileStats.decode(e.stats.getOrElse(""))).map(_._1).getOrElse(0L)).sum
    // max_commits well above the key count forces one chunk per key, so
    // each chunk's z bounds are the KEY's own — the probe below
    // recomputes them exactly; 3 keys still means exactly 3 commits
    val vEnd = graft.sources.v2.Maintenance.optimize(spark, "gpo.ns.pzi",
      targetFileBytes = math.max(1L, keyBytes / 4),
      zorderBy = Seq("x", "y"), maxCommits = 12)
    assert(vEnd === v0 + 3, s"expected 3 chunk commits, v0=$v0 vEnd=$vEnd")
    // every intermediate chunk commit is a full-count retained snapshot
    // (crash-resumability: finished chunks are durable)
    (v0 to vEnd).foreach { v =>
      assert(spark.sql(s"SELECT COUNT(*) FROM gpo.ns.pzi VERSION AS OF $v")
        .collect()(0).getLong(0) === 6000L, s"version $v lost rows")
    }
    for (mes <- 1 to 3) {
      val files = relsOfKey(mes)
      assert(files.size >= 2, s"key mes=$mes: z-order should split into ranged files")
      // recompute the z key with the CHUNK's (= key's) bounds and assert
      // within-file Morton monotonicity — the same probe as the day twin
      val keyDf = spark.table("gpo.ns.pzi").where(col("mes") === mes)
      val mm = keyDf.agg(min("x"), max("x"), min("y"), max("y")).collect()(0)
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
      val ranges = files.toSeq.map { f =>
        val zs = spark.read.parquet(s"$root/data/$f").select("x", "y")
          .collect().map(r => morton(r.getLong(0), r.getLong(1)))
        assert(zs.zip(zs.drop(1)).forall { case (a, b) => a <= b },
          s"file $f of key mes=$mes lost its within-file Morton order")
        (zs.min, zs.max, f)
      }.sortBy(_._1)
      ranges.zip(ranges.drop(1)).foreach { case ((_, hi, f1), (lo, _, f2)) =>
        assert(hi <= lo, s"key mes=$mes: z ranges of $f1 and $f2 overlap")
      }
    }
    // identity values re-derive from the rewritten directory names and
    // the data is byte-identical
    assert(spark.table("gpo.ns.pzi").agg(sum("x")).collect()(0).getLong(0) === total)
    assert(spark.table("gpo.ns.pzi").where("mes = 2").count() === 2000L)
    // zorder_by also composes with where_keys: re-cluster ONE key only
    val others = (1 to 3).map(m => m -> relsOfKey(m)).toMap
    graft.sources.v2.Maintenance.optimize(spark, "gpo.ns.pzi",
      targetFileBytes = math.max(1L, keyBytes / 2),
      zorderBy = Seq("x", "y"), whereKeys = Seq("ano=2024/mes=2"))
    assert(relsOfKey(1) === others(1) && relsOfKey(3) === others(3),
      "where_keys + zorder_by must leave unselected keys untouched")
    assert(relsOfKey(2) !== others(2))
    assert(spark.table("gpo.ns.pzi").agg(sum("x")).collect()(0).getLong(0) === total)
    spark.sql("DROP TABLE gpo.ns.pzi")
  }

  test("max_concurrent_rewrites runs chunks in parallel; commits serialize through the conflict check") {
    mk("p6", days = 8, rowsPerDay = 40)
    val root = s"$wh/ns/p6"
    val before = spark.table("gpo.ns.p6").orderBy("id").collect()
    val v0 = ManifestTable.currentVersion(root).get
    val vEnd = spark.sql(
      "CALL gpo.system.optimize(`table` => 'ns.p6', max_commits => 4, " +
        "max_concurrent_rewrites => 3)").collect()(0).getLong(0)
    // all four chunk commits landed despite racing: the optimistic commit
    // loop serialized the version claims and every disjoint-day
    // unchanged-check passed on rebase
    assert(vEnd === v0 + 4, s"expected 4 chunk commits, v0=$v0 vEnd=$vEnd")
    assert(ManifestTable.liveEntries(root).size === 8) // one file per day
    assert(spark.table("gpo.ns.p6").orderBy("id").collect().toSeq === before.toSeq)
    (v0 to vEnd).foreach { v =>
      assert(spark.sql(s"SELECT COUNT(*) FROM gpo.ns.p6 VERSION AS OF $v")
        .collect()(0).getLong(0) === before.length.toLong, s"version $v lost rows")
    }
    spark.sql("DROP TABLE gpo.ns.p6")
  }
}
