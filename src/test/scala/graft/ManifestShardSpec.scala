package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{ManifestTable, MetaIO}
import graft.sources.v2.VersionedCatalog

/** Manifest-list scaling: manifests shard into immutable per-partition-key
  * files, commits carry untouched shards as lines (never read), scans drop
  * whole shards by key before opening any, and per-key merge-on-commit
  * bounds the list — the properties that keep commit bytes ∝ touched data
  * and plan time ∝ selected shards at any table size.
  */
class ManifestShardSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.gshard", classOf[VersionedCatalog].getName)
    s.conf.set("spark.sql.catalog.gshard.warehouse",
      Files.createTempDirectory("graft_shardwh").toString)
    s
  }

  private def withConf(kvs: (String, String)*)(body: => Unit): Unit = {
    val prev = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def manifestText(root: String, v: Long): String =
    MetaIO.readString(s"$root/manifests/v=$v.txt")

  private def ts(d: Int, h: Int = 12) = java.time.LocalDateTime.of(2024, 3, d, h, 0)

  test("past the inline budget, entries fold into per-key shards; reads and day ops stay exact") {
    import spark.implicits._
    // distribution=none keeps the deliberate 12-file fan-out (the default
    // hash clustering would collapse it to one file per day)
    withConf("spark.graft.manifest.inlineEntries" -> "4",
        "spark.graft.write.distribution" -> "none") {
      val root = Files.createTempDirectory("shard_fold").toString + "/t"
      val rows = (1 to 12).map(i => (i.toLong, ts(1 + (i - 1) % 3)))
      ManifestTable.commit(rows.toDF("k", "ts").repartition(12), root,
        retain = 10, partitionDayOf = Some("ts"))

      val (refs, inline) = ManifestTable.manifestIndex(root, 1)
      assert(inline.isEmpty, "folded manifest must hold no loose entries")
      assert(refs.map(_.key).toSet ===
        Set("__day=2024-03-01", "__day=2024-03-02", "__day=2024-03-03"))
      assert(refs.map(_.n).sum === ManifestTable.manifest(root, 1).size)
      assert(refs.forall(_.ext == "parquet"))
      assert(ManifestTable.read(spark, root).count() === 12)
      assert(ManifestTable.liveDays(root).size === 3)
      assert(ManifestTable.formatOf(root).contains("parquet"))

      // day ops stay exact over shards: drop one day at the manifest
      ManifestTable.dropDays(root, Set("2024-03-03"), retain = 10)
      assert(ManifestTable.read(spark, root).count() === 8)
      assert(ManifestTable.liveDays(root) === Set("2024-03-01", "2024-03-02"))
    }
  }

  test("append carries shard refs as LINES: untouched shards are not rewritten or reread") {
    import spark.implicits._
    withConf("spark.graft.manifest.inlineEntries" -> "4",
        "spark.graft.write.distribution" -> "none") {
      val root = Files.createTempDirectory("shard_carry").toString + "/t"
      val rows = (1 to 12).map(i => (i.toLong, ts(1 + (i - 1) % 3)))
      ManifestTable.commit(rows.toDF("k", "ts").repartition(12), root,
        retain = 10, partitionDayOf = Some("ts"))
      val (refs1, _) = ManifestTable.manifestIndex(root, 1)

      ManifestTable.append(Seq((99L, ts(1))).toDF("k", "ts").coalesce(1), root,
        retain = 10, partitionDayOf = Some("ts"))
      val (refs2, inline2) = ManifestTable.manifestIndex(root, 2)
      assert(refs2 === refs1, "append must carry every shard ref verbatim")
      assert(inline2.size === 1, "the appended file stays a loose inline entry")
      // commit METADATA bytes ∝ appended data: the new manifest is the old
      // refs plus one entry line — no shard file was rewritten
      assert(ManifestTable.read(spark, root).count() === 13)

      // the loose entries fold once they outgrow the budget, merging with
      // the day's existing shard only when the per-key cap trips
      (0 until 5).foreach { i =>
        ManifestTable.append(Seq((200L + i, ts(2))).toDF("k", "ts").coalesce(1),
          root, retain = 10, partitionDayOf = Some("ts"))
      }
      val live = ManifestTable.currentVersion(root).get
      val (refsN, inlineN) = ManifestTable.manifestIndex(root, live)
      assert(inlineN.size <= 4)
      assert(refsN.map(_.n).sum + inlineN.size === 18)
      assert(ManifestTable.read(spark, root).count() === 18)
    }
  }

  test("per-key merge-on-commit bounds the manifest list length") {
    import spark.implicits._
    withConf("spark.graft.manifest.inlineEntries" -> "0",
             "spark.graft.manifest.maxShardsPerKey" -> "2") {
      val root = Files.createTempDirectory("shard_merge").toString + "/t"
      (1 to 5).foreach { i =>
        if (i == 1)
          ManifestTable.commit(Seq((i.toLong, ts(1))).toDF("k", "ts").coalesce(1),
            root, retain = 10, partitionDayOf = Some("ts"))
        else
          ManifestTable.append(Seq((i.toLong, ts(1))).toDF("k", "ts").coalesce(1),
            root, retain = 10, partitionDayOf = Some("ts"))
        val live = ManifestTable.currentVersion(root).get
        val (refs, _) = ManifestTable.manifestIndex(root, live)
        val perKey = refs.groupBy(_.key).values.map(_.size)
        assert(perKey.forall(_ <= 2),
          s"per-key refs must stay bounded, got ${refs.map(_.key)}")
      }
      assert(ManifestTable.read(spark, root).count() === 5)
      assert(ManifestTable.manifest(root,
        ManifestTable.currentVersion(root).get).size === 5)
    }
  }

  test("scans prune whole shards by key: out-of-range shards are never opened") {
    withConf("spark.graft.manifest.inlineEntries" -> "4") {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS gshard.ns")
      spark.sql("DROP TABLE IF EXISTS gshard.ns.pv")
      spark.sql("CREATE TABLE gshard.ns.pv (id BIGINT, ts TIMESTAMP_NTZ, v DOUBLE) " +
        "PARTITIONED BY (days(ts))")
      import spark.implicits._
      (0 until 200).map { i =>
        (i.toLong, java.time.LocalDateTime.of(2024, 3, 1 + i % 10, i % 24, 0), i * 1.0)
      }.toDF("id", "ts", "v").createOrReplaceTempView("pv_src")
      spark.sql("INSERT INTO gshard.ns.pv SELECT * FROM pv_src")

      val root = VersionedCatalog.warehouseOf("gshard").get + "/ns/pv"
      val (refs, inline) = ManifestTable.manifestIndex(root, 1)
      assert(inline.isEmpty && refs.size >= 10, "setup must produce one shard per day")

      // hide an OUT-OF-RANGE day's shard: a planner that materialized the
      // whole manifest would throw; shard-level pruning never opens it
      val victim = refs.find(_.key == "__day=2024-03-09").get
      val shardPath = java.nio.file.Paths.get(root, "manifests", victim.rel)
      val aside = shardPath.resolveSibling(shardPath.getFileName.toString + ".aside")
      Files.move(shardPath, aside)
      try {
        val got = spark.sql(
          "SELECT id FROM gshard.ns.pv " +
            "WHERE ts >= TIMESTAMP_NTZ '2024-03-03 00:00:00' " +
            "AND ts < TIMESTAMP_NTZ '2024-03-05 00:00:00'")
          .collect().map(_.getLong(0)).sorted
        val expected = (0 until 200).filter(i => i % 10 == 2 || i % 10 == 3)
          .map(_.toLong).sorted
        assert(got.toSeq === expected)
      } finally Files.move(aside, shardPath)
      spark.sql("DROP TABLE gshard.ns.pv")
    }
  }

  test("second engine: duckdb follows the manifest list through shard files") {
    import spark.implicits._
    withConf("spark.graft.manifest.inlineEntries" -> "2") {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS gshard.ns")
      spark.sql("DROP TABLE IF EXISTS gshard.ns.dk")
      (0L until 100L).map(i => (i, s"s$i")).toDF("k", "s")
        .repartition(5).writeTo("gshard.ns.dk").create()
      val root = VersionedCatalog.warehouseOf("gshard").get + "/ns/dk"
      val (refs, _) = ManifestTable.manifestIndex(root, 1)
      assert(refs.nonEmpty, "setup must produce a sharded manifest")

      import scala.sys.process._
      val script = new java.io.File("scripts/duckdb_versioned.py").getAbsolutePath
      val out = Seq("python3", script, root,
        "SELECT COUNT(*) AS n, SUM(k) AS s FROM t").!!
      val nums = out.linesIterator.toSeq.last.trim.split("\\s+")
      assert(nums(0).toLong === 100L, s"duckdb row count diverged: $out")
      assert(nums(1).toDouble.toLong === 4950L, s"duckdb sum diverged: $out")
      spark.sql("DROP TABLE gshard.ns.dk")
    }
  }

  test("concurrent appenders rebase on a SHARDED table: both land, refs union, no shard rewritten") {
    import spark.implicits._
    withConf("spark.graft.manifest.inlineEntries" -> "0") {
      val root = Files.createTempDirectory("shard_race").toString + "/t"
      ManifestTable.commit(
        (1 to 8).map(i => (i.toLong, ts(1 + i % 2))).toDF("k", "ts").repartition(8),
        root, retain = 10, partitionDayOf = Some("ts"))
      val (refs1, _) = ManifestTable.manifestIndex(root, 1)
      assert(refs1.nonEmpty)

      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = (1 to 2).map { i =>
        new Thread(() => {
          try ManifestTable.append(
            Seq((100L + i, ts(3))).toDF("k", "ts").coalesce(1),
            root, retain = 10, partitionDayOf = Some("ts"))
          catch { case t: Throwable => errs.add(t) }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(errs.isEmpty, s"concurrent appends on a sharded base must both land: $errs")
      assert(ManifestTable.currentVersion(root).contains(3L))
      val (refsLive, _) = ManifestTable.manifestIndex(root, 3)
      // the loser's rebase carried the winner's refs: v1's shards are in
      // the live manifest untouched and both new rows are present
      assert(refs1.forall(refsLive.contains),
        "rebase must carry the base shards verbatim")
      assert(ManifestTable.read(spark, root).count() === 10)
      assert(ManifestTable.read(spark, root)
        .where(col("k") >= 100L).count() === 2)
    }
  }

  test("incremental GC: expiring snapshots drop their orphaned files and dead-only shards") {
    import spark.implicits._
    withConf("spark.graft.manifest.inlineEntries" -> "0",
             "spark.graft.manifest.orphanFileGraceMs" -> "0") {
      val root = Files.createTempDirectory("shard_gc").toString + "/t"
      ManifestTable.commit(Seq((1L, ts(1))).toDF("k", "ts").coalesce(1), root,
        retain = 1, partitionDayOf = Some("ts"))
      val v1Files = ManifestTable.manifest(root, 1)
      val (v1Refs, _) = ManifestTable.manifestIndex(root, 1)
      // a full overwrite with retain=1 expires v1 on commit: its files and
      // its now-unreferenced shards must both be gone, without any
      // full-pool listing on the commit path
      ManifestTable.commit(Seq((2L, ts(2))).toDF("k", "ts").coalesce(1), root,
        retain = 1, partitionDayOf = Some("ts"))
      v1Files.foreach { rel =>
        assert(!MetaIO.exists(s"$root/data/$rel"), s"expired file $rel must be GC'd")
      }
      v1Refs.foreach { r =>
        assert(!MetaIO.exists(s"$root/manifests/${r.rel}"),
          s"dead-only shard ${r.rel} must be GC'd")
      }
      assert(ManifestTable.read(spark, root).count() === 1)
    }
  }
}
