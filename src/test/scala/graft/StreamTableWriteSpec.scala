package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{ManifestTable, MetaIO}
import graft.sources.v2.VersionedCatalog

/** Native streaming writes (`writeStream.toTable`): each epoch's tasks
  * stage parquet directly, the epoch commit is ONE manifest append with
  * an epoch marker, restarts are exactly-once, and Complete mode maps to
  * an overwrite commit per epoch. The versioned table is a first-class
  * streaming SINK, not just a foreachBatch target.
  */
class StreamTableWriteSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.gstw", classOf[VersionedCatalog].getName)
    s.conf.set("spark.sql.catalog.gstw.warehouse",
      Files.createTempDirectory("graft_stwwh").toString)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gstw.ns")
    s
  }

  test("append stream lands epochs as manifest commits, exactly once across restarts") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val t = "gstw.ns.sink"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v STRING)")
    val checkpoint = Files.createTempDirectory("stw_ck").toString

    val mem = MemoryStream[(Long, String)]
    mem.addData((1L, "a"), (2L, "b"))
    val q1 = mem.toDF().toDF("k", "v").writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .toTable(t)
    q1.awaitTermination()
    assert(spark.table(t).as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "b")))

    // second run from the same checkpoint: only the new batch lands
    mem.addData((3L, "c"))
    val q2 = mem.toDF().toDF("k", "v").writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .toTable(t)
    q2.awaitTermination()
    val rows = spark.table(t).as[(Long, String)].collect().toSeq
    assert(rows.size === 3, s"no re-delivery across restarts: $rows")
    assert(rows.toSet === Set((1L, "a"), (2L, "b"), (3L, "c")))

    // each epoch is one manifest commit with the epoch marker inside it
    val root = s"${spark.conf.get("spark.sql.catalog.gstw.warehouse")}/ns/sink"
    assert(ManifestTable.liveProps(root).keys.exists(_.startsWith("stream.")),
      "the epoch marker must ride the commit")
    // staged files were moved, not copied: stage dir is gone
    assert(MetaIO.listStatus(s"$root/stage").isEmpty, "stage must be cleaned up")
    spark.sql(s"DROP TABLE $t")
  }

  test("complete mode replaces the snapshot per epoch; history stays time-travelable") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val t = "gstw.ns.agg"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (v STRING, n BIGINT)")
    val checkpoint = Files.createTempDirectory("stw_ck2").toString

    val mem = MemoryStream[String]
    def run(): Unit = {
      val q = mem.toDF().toDF("v").groupBy($"v").agg(count(lit(1)).as("n"))
        .writeStream
        .outputMode(OutputMode.Complete())
        .option("checkpointLocation", checkpoint)
        .trigger(Trigger.AvailableNow())
        .toTable(t)
      q.awaitTermination()
    }
    mem.addData("x", "x", "y")
    run()
    assert(spark.table(t).as[(String, Long)].collect().toMap ===
      Map("x" -> 2L, "y" -> 1L))
    mem.addData("y")
    run()
    assert(spark.table(t).as[(String, Long)].collect().toMap ===
      Map("x" -> 2L, "y" -> 2L), "complete mode must REPLACE the snapshot")
    // the previous epoch's result is still a retained version
    val root = s"${spark.conf.get("spark.sql.catalog.gstw.warehouse")}/ns/agg"
    val prev = ManifestTable.versions(root).dropRight(1).last
    assert(ManifestTable.readVersion(spark, root, prev)
      .as[(String, Long)].collect().toMap === Map("x" -> 2L, "y" -> 1L))
    spark.sql(s"DROP TABLE $t")
  }

  test("identity-partitioned sink writes batch-identical dirs; pruning works on streamed files") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val t = "gstw.ns.partd"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, region STRING, v DOUBLE) PARTITIONED BY (region)")
    val mem = MemoryStream[(Long, String, Double)]
    mem.addData((0 until 90).map(i => (i.toLong, s"r${i % 3}", i * 1.0)): _*)
    val q = mem.toDF().toDF("k", "region", "v").writeStream
      .option("checkpointLocation", Files.createTempDirectory("stw_ck3").toString)
      .trigger(Trigger.AvailableNow())
      .toTable(t)
    q.awaitTermination()
    assert(spark.table(t).groupBy($"region").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ===
      Map("r0" -> 30L, "r1" -> 30L, "r2" -> 30L))
    // streamed files landed under region= dirs the pruner understands
    val root = s"${spark.conf.get("spark.sql.catalog.gstw.warehouse")}/ns/partd"
    assert(ManifestTable.liveEntries(root).forall(_.rel.startsWith("region=")))
    def files(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
      }.map(graft.sources.v2.GraftScans.innermost).collect {
        case p: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan =>
          p.fileIndex.inputFiles.length
      }.sum
    val one = spark.table(t).where($"region" === "r1")
    assert(one.count() === 30 && files(one) < files(spark.table(t)))
    spark.sql(s"DROP TABLE $t")
  }

  test("hidden-day sink derives __day dirs from TIMESTAMP_NTZ; day pruning works") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val t = "gstw.ns.dayd"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, ts TIMESTAMP_NTZ) PARTITIONED BY (days(ts))")
    val mem = MemoryStream[(Long, Long)] // (k, day index)
    mem.addData((0 until 60).map(i => (i.toLong, (i % 3).toLong)): _*)
    val q = mem.toDF().toDF("k", "d")
      .select($"k", (lit("2024-05-01 06:00:00").cast("timestamp_ntz")
        + expr("make_interval(0,0,0,d,0,0,0)")).as("ts"))
      .writeStream
      .option("checkpointLocation", Files.createTempDirectory("stw_ck4").toString)
      .trigger(Trigger.AvailableNow())
      .toTable(t)
    q.awaitTermination()
    assert(spark.table(t).count() === 60)
    val root = s"${spark.conf.get("spark.sql.catalog.gstw.warehouse")}/ns/dayd"
    assert(ManifestTable.liveDays(root) ===
      Set("2024-05-01", "2024-05-02", "2024-05-03"))
    val win = spark.table(t).where($"ts" < lit("2024-05-02 00:00:00").cast("timestamp_ntz"))
    assert(win.count() === 20)

    // NULL day sources land in the hive default dir, batch-identical
    val mem2 = MemoryStream[Long]
    mem2.addData(999L)
    val q2 = mem2.toDF().toDF("k")
      .select($"k", lit(null).cast("timestamp_ntz").as("ts"))
      .writeStream
      .option("checkpointLocation", Files.createTempDirectory("stw_ck4b").toString)
      .trigger(Trigger.AvailableNow())
      .toTable(t)
    q2.awaitTermination()
    assert(ManifestTable.liveEntries(root).exists(
      _.rel.startsWith("__day=__HIVE_DEFAULT_PARTITION__/")),
      "null day must land in the hive default dir")
    assert(spark.table(t).where($"ts".isNull).count() === 1)
    assert(spark.table(t).count() === 61)
    spark.sql(s"DROP TABLE $t")
  }

  test("complete mode draining to an EMPTY result commits a readable empty snapshot") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val t = "gstw.ns.aggz"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (v STRING, n BIGINT)")
    val checkpoint = Files.createTempDirectory("stw_ckz").toString
    val mem = MemoryStream[String]
    def run(): Unit = {
      // only groups seen exactly once survive — the result set SHRINKS to
      // empty when the second epoch makes every group's count exceed 1
      val q = mem.toDF().toDF("v").groupBy($"v").agg(count(lit(1)).as("n"))
        .where($"n" === 1)
        .writeStream
        .outputMode(OutputMode.Complete())
        .option("checkpointLocation", checkpoint)
        .trigger(Trigger.AvailableNow())
        .toTable(t)
      q.awaitTermination()
    }
    mem.addData("x", "x", "y")
    run()
    assert(spark.table(t).as[(String, Long)].collect().toMap === Map("y" -> 1L))
    mem.addData("y")
    run()
    // the empty epoch must be READABLE as an empty snapshot (not the stale
    // previous result, not a broken zero-entry manifest)
    assert(spark.table(t).count() === 0,
      "an empty Complete epoch replaces the snapshot with an empty one")
    assert(spark.table(t).schema.fieldNames.toSeq === Seq("v", "n"))
    // a later non-empty epoch continues normally
    mem.addData("z")
    run()
    assert(spark.table(t).as[(String, Long)].collect().toMap === Map("z" -> 1L))
    spark.sql(s"DROP TABLE $t")
  }

  test("ORC and AVRO tables are streaming sinks too; stats and exactly-once hold") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    for (fmt <- Seq("orc", "avro")) {
      val t = s"gstw.ns.sink_$fmt"
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql(s"CREATE TABLE $t (k BIGINT, v STRING) TBLPROPERTIES('format'='$fmt')")
      val checkpoint = Files.createTempDirectory(s"stw_$fmt").toString
      val mem = MemoryStream[(Long, String)]
      def run(): Unit = {
        val q = mem.toDF().toDF("k", "v").writeStream
          .option("checkpointLocation", checkpoint)
          .trigger(Trigger.AvailableNow())
          .toTable(t)
        q.awaitTermination()
      }
      mem.addData((1L, "a"), (2L, "b"))
      run()
      mem.addData((3L, "c"))
      run()
      val rows = spark.table(t).as[(Long, String)].collect().toSeq
      assert(rows.size === 3, s"$fmt: no re-delivery across restarts: $rows")
      assert(rows.toSet === Set((1L, "a"), (2L, "b"), (3L, "c")))
      // pool files carry the format's extension (manifest read dispatch)
      val root = s"${spark.conf.get("spark.sql.catalog.gstw.warehouse")}/ns/sink_$fmt"
      assert(ManifestTable.liveEntries(root).forall(_.rel.endsWith(s".$fmt")))
      // committed entries carry stats (footer/tail for orc, the writer
      // sidecar for avro) — the metadata-only COUNT proves the row counts
      val cnt = spark.table(t).agg(count(lit(1)))
      assert(cnt.collect()(0).getLong(0) === 3L)
      spark.sql(s"DROP TABLE $t")
    }
  }

  test("hidden bucket sink writes batch-identical __part dirs; bucket pruning works on streamed files") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ts = "gstw.ns.bkts"
    val tb = "gstw.ns.bktb"
    for (t <- Seq(ts, tb)) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql(s"CREATE TABLE $t (k BIGINT, v DOUBLE) PARTITIONED BY (bucket(8, k))")
    }
    val rows = (0 until 200).map(i => (i.toLong, i * 1.0))
    // batch leg: the reference derivation
    rows.toDF("k", "v").writeTo(tb).append()
    // streaming leg: the task-side derivation must land the SAME dirs
    val mem = MemoryStream[(Long, Double)]
    mem.addData(rows: _*)
    val q = mem.toDF().toDF("k", "v").writeStream
      .option("checkpointLocation", Files.createTempDirectory("stw_ck5").toString)
      .trigger(Trigger.AvailableNow())
      .toTable(ts)
    q.awaitTermination()
    def dirsOf(t: String): Map[String, Set[Long]] = {
      val root = s"${spark.conf.get("spark.sql.catalog.gstw.warehouse")}/ns/${t.split('.').last}"
      ManifestTable.liveEntries(root).map(_.rel).groupBy(r => r.split('/').head)
        .view.mapValues(_ => Set.empty[Long]).toMap
    }
    assert(dirsOf(ts).keySet === dirsOf(tb).keySet,
      "streamed bucket dirs must equal the batch writer's")
    // per-bucket contents identical between legs
    val root = s"${spark.conf.get("spark.sql.catalog.gstw.warehouse")}/ns/bkts"
    val rootB = s"${spark.conf.get("spark.sql.catalog.gstw.warehouse")}/ns/bktb"
    def perDir(r: String): Map[String, Set[Long]] =
      ManifestTable.liveEntries(r).map(_.rel).groupBy(_.split('/').head)
        .map { case (d, rels) =>
          d -> rels.flatMap(rel => spark.read.parquet(s"$r/data/$rel")
            .select($"k").as[Long].collect()).toSet }
    assert(perDir(root) === perDir(rootB))
    // bucket-equality pruning fires on the streamed files
    def files(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
      }.map(graft.sources.v2.GraftScans.innermost).collect {
        case p: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan =>
          p.fileIndex.inputFiles.length
      }.sum
    val one = spark.table(ts).where($"k" === 7L)
    assert(one.count() === 1)
    assert(files(one) < files(spark.table(ts)), "bucket pruning must drop dirs")
    for (t <- Seq(ts, tb)) spark.sql(s"DROP TABLE $t")
  }

  test("hidden months sink derives wall-clock __part dirs; month pruning works") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val t = "gstw.ns.mon"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, ts TIMESTAMP_NTZ) PARTITIONED BY (months(ts))")
    val mem = MemoryStream[(Long, Long)] // (k, month index)
    mem.addData((0 until 60).map(i => (i.toLong, (i % 3).toLong)): _*)
    val q = mem.toDF().toDF("k", "m")
      .select($"k", (lit("2024-03-15 06:00:00").cast("timestamp_ntz")
        + expr("make_interval(0,m,0,0,0,0,0)")).as("ts"))
      .writeStream
      .option("checkpointLocation", Files.createTempDirectory("stw_ck6").toString)
      .trigger(Trigger.AvailableNow())
      .toTable(t)
    q.awaitTermination()
    val root = s"${spark.conf.get("spark.sql.catalog.gstw.warehouse")}/ns/mon"
    assert(ManifestTable.liveEntries(root).map(_.rel.split('/').head).toSet ===
      Set("__part=2024-03", "__part=2024-04", "__part=2024-05"))
    val win = spark.table(t)
      .where($"ts" >= lit("2024-04-01 00:00:00").cast("timestamp_ntz")
        && $"ts" < lit("2024-05-01 00:00:00").cast("timestamp_ntz"))
    assert(win.count() === 20)
    spark.sql(s"DROP TABLE $t")
  }

  test("CHECK constraints enforce on the streaming sink; a violating epoch aborts") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val t = "gstw.ns.cksink"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v BIGINT)")
    Seq((1L, 1L)).toDF("k", "v").writeTo(t).append()
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES('check.vpos'='v > 0')")
    val checkpoint = Files.createTempDirectory("stw_ck_ck").toString
    val mem = MemoryStream[(Long, Long)]
    def drain(): Unit = {
      val q = mem.toDF().toDF("k", "v").writeStream
        .option("checkpointLocation", checkpoint)
        .trigger(Trigger.AvailableNow())
        .toTable(t)
      q.awaitTermination()
    }
    mem.addData((2L, 5L))
    drain()
    assert(spark.table(t).select($"k").as[Long].collect().toSet === Set(1L, 2L))

    // a violating row fails its EPOCH loudly; nothing commits
    mem.addData((3L, -1L))
    def messages(e: Throwable): Seq[String] =
      Option(e).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    val ex = intercept[Exception] { drain() }
    assert(messages(ex).exists(_.contains("CHECK constraint 'vpos'")),
      s"${messages(ex)}")
    assert(spark.table(t).select($"k").as[Long].collect().toSet === Set(1L, 2L),
      "the aborted epoch must leave the table untouched")

    // FUNCTION-bearing constraints resolve through the real analyzer —
    // not just bare column references
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES('check.vmag'='abs(v) < 100')")
    val ck2 = Files.createTempDirectory("stw_ck_ck2").toString
    val mem2 = MemoryStream[(Long, Long)]
    def drain2(): Unit = {
      val q = mem2.toDF().toDF("k", "v").writeStream
        .option("checkpointLocation", ck2)
        .trigger(Trigger.AvailableNow())
        .toTable(t)
      q.awaitTermination()
    }
    mem2.addData((4L, 50L))
    drain2()
    assert(spark.table(t).select($"k").as[Long].collect().toSet === Set(1L, 2L, 4L))
    mem2.addData((5L, 500L)) // abs(500) >= 100 violates 'vmag'
    val ex2 = intercept[Exception] { drain2() }
    assert(messages(ex2).exists(_.contains("CHECK constraint 'vmag'")),
      s"${messages(ex2)}")
    assert(spark.table(t).select($"k").as[Long].collect().toSet === Set(1L, 2L, 4L))
    spark.sql(s"DROP TABLE $t")
  }

  test("WAP: streaming epochs stage on the write branch, exactly once; publish flips them") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val t = "gstw.ns.wapsink"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v STRING)")
    Seq((0L, "base")).toDF("k", "v").writeTo(t).append()                    // v1
    spark.sql(s"CALL gstw.system.create_branch(`table` => 'ns.wapsink', name => 'wap')")
    val root = s"${spark.conf.get("spark.sql.catalog.gstw.warehouse")}/ns/wapsink"
    val checkpoint = Files.createTempDirectory("stw_wap_ck").toString

    val mem = MemoryStream[(Long, String)]
    def drain(): Unit = {
      val q = mem.toDF().toDF("k", "v").writeStream
        .option("checkpointLocation", checkpoint)
        .trigger(Trigger.AvailableNow())
        .toTable(t)
      q.awaitTermination()
    }
    spark.conf.set("spark.graft.write.branch", "wap")
    try {
      mem.addData((1L, "a"), (2L, "b"))
      drain()                                                               // v2 (branch)
      // main untouched; the branch carries base + epoch rows and the marker
      assert(ManifestTable.currentVersion(root).get === 1L, "main must not move")
      assert(spark.table(t).select($"k").as[Long].collect().toSet === Set(0L))
      assert(spark.sql(s"SELECT k FROM $t VERSION AS OF 'wap'")
        .as[Long].collect().toSet === Set(0L, 1L, 2L))
      assert(ManifestTable.writeBaseProps(root).keys.exists(_.startsWith("stream.")),
        "the epoch marker must ride the BRANCH commit")

      // restart from the same checkpoint: the replayed epoch is detected
      // from the BRANCH head (not main, which has no marker) — no
      // double-append; the genuinely new batch lands once
      drain()
      mem.addData((3L, "c"))
      drain()                                                               // v3 (branch)
      val staged = spark.sql(s"SELECT k FROM $t VERSION AS OF 'wap'")
        .as[Long].collect().toSeq
      assert(staged.size === 4, s"exactly-once under WAP staging: $staged")
      assert(staged.toSet === Set(0L, 1L, 2L, 3L))
      assert(ManifestTable.currentVersion(root).get === 1L)
    } finally spark.conf.unset("spark.graft.write.branch")

    // publish: main flips to the audited streamed snapshot
    spark.sql(s"CALL gstw.system.fast_forward(`table` => 'ns.wapsink', branch => 'wap')")
    assert(spark.table(t).select($"k").as[Long].collect().toSet === Set(0L, 1L, 2L, 3L))
    spark.sql(s"DROP TABLE $t")
  }
}
