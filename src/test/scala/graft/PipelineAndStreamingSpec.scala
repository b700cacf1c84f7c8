package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Medallion
import graft.sources.Formats
import graft.streaming.MicroBatch

class PipelineAndStreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("medallion: bronze CSV batches -> silver merge -> gold fanout") {
    val work = Files.createTempDirectory("medallion").toString
    val bronze = s"$work/bronze"; val silver = s"$work/silver/events"; val gold = s"$work/gold"

    // two overlapping batches: ids ≡ 0,1 (mod 3) then ids ≡ 1,2 (mod 3)
    Medallion.landBronzeBatch(spark, sf, bronze, "b1", 3, 0)
    Medallion.landBronzeBatch(spark, sf, bronze, "b1b", 3, 1)
    val n1 = Medallion.bronzeToSilver(spark, bronze, silver)
    Medallion.landBronzeBatch(spark, sf, bronze, "b2", 3, 2)
    val n2 = Medallion.bronzeToSilver(spark, bronze, silver)

    val total = Tables.events(spark, sf).count()
    assert(n2 === total, s"after both batches silver must hold all $total events")
    assert(n1 < n2)
    // idempotence: re-running with no new bronze keeps the count
    assert(Medallion.bronzeToSilver(spark, bronze, silver) === total)

    val outs = Medallion.silverToGold(spark, silver, gold)
    assert(outs.keySet === Set("parquet", "orc", "avro"))
    // parquet leg is partitioned by ano/mes and readable
    val back = spark.read.parquet(outs("parquet"))
    assert(back.count() > 0)
    assert(back.columns.toSet ===
      Set("ano", "mes", "user_id", "volume", "total_transacoes"))
  }

  test("fanout: identical data in parquet/orc/avro, partitioned") {
    val work = Files.createTempDirectory("fanout").toString
    val df = Tables.orders(spark, sf).withColumn("yr", year(col("o_orderdate")))
    val outs = Formats.fanout(df, work, "orders", partitionCols = Seq("yr"))
    val n = df.count()
    outs.foreach { case (fmt, path) =>
      assert(spark.read.format(fmt).load(path).count() === n, s"$fmt row count")
    }
    // partition dirs exist on disk
    assert(new java.io.File(outs("parquet")).listFiles.exists(_.getName.startsWith("yr=")))
  }

  test("partitioned read prunes partitions: filter lands in PartitionFilters") {
    val work = Files.createTempDirectory("prune").toString
    val df = Tables.orders(spark, sf).withColumn("yr", year(col("o_orderdate")))
    val outs = Formats.fanout(df, work, "orders", partitionCols = Seq("yr"))
    val q = spark.read.parquet(outs("parquet")).where(col("yr") === 1997)
    val plan = q.queryExecution.executedPlan.toString
    // the yr predicate must prune at the partition level, not post-scan
    assert(plan.contains("PartitionFilters") && plan.contains("yr"),
      "partition filter missing:\n" + plan.take(600))
    val expected = df.where(col("yr") === 1997).count()
    assert(q.count() === expected && expected > 0)
  }

  test("catalog fanout tables: existence probe + DDL + saveAsTable") {
    val df = Tables.region(spark, sf)
    val names = Formats.fanoutTables(spark, df, "graft_test", "region")
    names.foreach { n =>
      assert(spark.catalog.tableExists(n))
      assert(spark.table(n).count() === df.count())
    }
    // idempotent: second run drops and recreates
    Formats.fanoutTables(spark, df, "graft_test", "region")
    names.foreach(n => assert(spark.table(n).count() === df.count()))
  }

  test("bucketed tables: co-located join plans without a shuffle exchange") {
    val li  = Tables.lineitem(spark, sf).select("l_orderkey", "l_extendedprice")
    val ord = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
    Formats.writeBucketed(spark, li, "graft_test", "li_b", 8, Seq("l_orderkey"))
    Formats.writeBucketed(spark, ord.withColumnRenamed("o_orderkey", "l_orderkey"),
      "graft_test", "ord_b", 8, Seq("l_orderkey"))

    val joined = spark.table("graft_test.li_b")
      .join(spark.table("graft_test.ord_b"), Seq("l_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      "bucketed join must not shuffle:\n" + plan.take(800))
    assert(joined.count() === li.count())   // every lineitem matches its order
  }

  test("streaming: watermarked windowed aggregate over a memory stream") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")

    val q = MicroBatch.windowedTypeMetrics(events, "1 hour", "30 minutes")
      .writeStream.format("memory").queryName("win_out")
      .outputMode("append").start()
    def t(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    mem.addData((t(1, 10), "click", 10.0), (t(1, 20), "click", 5.0), (t(1, 30), "view", 1.0))
    q.processAllAvailable()
    mem.addData((t(5, 0), "click", 2.0))   // advances watermark past hour 1
    q.processAllAvailable()
    mem.addData((t(6, 0), "view", 1.0))    // next batch emits closed windows
    q.processAllAvailable()
    val rows = spark.table("win_out").collect()
    q.stop()
    // hour-1 windows are closed and emitted: click n=2 volume=15, view n=1
    assert(rows.exists(r => r.getAs[String]("event_type") == "click"
      && r.getAs[Long]("n") == 2L
      && math.abs(r.getAs[Double]("volume") - 15.0) < 1e-9))
    assert(rows.exists(r => r.getAs[String]("event_type") == "view"))
  }

  test("streaming: file-source readStream drives the windowed aggregate") {
    val work = Files.createTempDirectory("stream_files").toString
    val in = s"$work/in"
    // land the real events table as the stream's first file batch
    // (watermarks need TIMESTAMP, not the table's NTZ)
    val batch = Tables.events(spark, sf)
      .select(col("ts").cast("timestamp").as("ts"), col("event_type"), col("value"))
    batch.write.mode("overwrite").parquet(in)

    val stream = spark.readStream.schema(batch.schema).parquet(in)
    val q = MicroBatch.windowedTypeMetrics(stream, "1 day", "1 hour")
      .writeStream.format("memory").queryName("file_win_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // append mode only emits watermark-closed windows; with a single batch
    // the final window stays open, so compare against the batch-mode
    // equivalent for the closed prefix
    val streamed = spark.table("file_win_out")
      .select(col("window.start").as("ws"), col("event_type"), col("n"), col("volume"))
      .collect().map(_.toSeq).toSet
    val batchEq = MicroBatch.windowedTypeMetrics(batch, "1 day", "1 hour")
      .select(col("window.start").as("ws"), col("event_type"), col("n"), col("volume"))
    val maxTs = batch.agg(max(col("ts"))).first().getAs[java.sql.Timestamp](0)
    val closed = batchEq.where(
      col("ws") + expr("INTERVAL 1 DAY") <= lit(maxTs) - expr("INTERVAL 1 HOUR"))
      .collect().map(_.toSeq).toSet
    assert(closed.nonEmpty && closed.subsetOf(streamed))
  }

  test("streaming: foreachBatch upsert sink merges micro-batches by key") {
    import spark.implicits._
    val work = Files.createTempDirectory("stream_upsert").toString
    val target = s"$work/events"; val ckpt = s"$work/ckpt"

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    mem.addData((1L, "a"), (2L, "b"))
    val q1 = MicroBatch.upsertSink(mem.toDF().toDF("k", "v"), target, Seq("k"), ckpt)
    q1.awaitTermination()

    mem.addData((2L, "B"), (3L, "c"))
    val q2 = MicroBatch.upsertSink(mem.toDF().toDF("k", "v"), target, Seq("k"), ckpt)
    q2.awaitTermination()

    val got = graft.sources.Versioned.read(spark, target).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "a", 2L -> "B", 3L -> "c"))
  }

  test("streaming: append sink lands micro-batches as manifest commits, replay-idempotent") {
    import spark.implicits._
    val work = Files.createTempDirectory("stream_append").toString
    val target = s"$work/tbl"; val ckpt = s"$work/ckpt"

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    mem.addData((1L, "a"), (2L, "b"))
    MicroBatch.appendSink(mem.toDF().toDF("k", "v"), target, "app1", ckpt)
      .awaitTermination()
    mem.addData((3L, "c"))
    MicroBatch.appendSink(mem.toDF().toDF("k", "v"), target, "app1", ckpt)
      .awaitTermination()

    val got = graft.sources.ManifestTable.read(spark, target)
    assert(got.count() === 3)
    // the live manifest carries the batch marker forward
    val props = graft.sources.ManifestTable.liveProps(target)
    assert(props.get("stream.app1.batch").exists(_.toLong >= 1L))

    // a replay of an already-committed batch id is skipped entirely
    val replay = Seq((9L, "dup")).toDF("k", "v")
    val lastBatch = props("stream.app1.batch").toLong
    assert(!MicroBatch.appendBatchIdempotent(replay, target, "app1", lastBatch))
    assert(graft.sources.ManifestTable.read(spark, target).count() === 3)
    // a NEW batch id commits
    assert(MicroBatch.appendBatchIdempotent(replay, target, "app1", lastBatch + 1))
    assert(graft.sources.ManifestTable.read(spark, target).count() === 4)
    // independent sinks (other appId) keep their own marker
    assert(MicroBatch.appendBatchIdempotent(
      Seq((10L, "x")).toDF("k", "v"), target, "app2", 0L))
    assert(graft.sources.ManifestTable.liveProps(target).keySet
      -- Set(graft.sources.ManifestTable.OpProp)
      === Set("stream.app1.batch", "stream.app2.batch"))
  }

  test("streaming: an empty first micro-batch never bricks a new table root") {
    import spark.implicits._
    val target = Files.createTempDirectory("stream_empty").toString + "/tbl"
    val empty = Seq.empty[(Long, java.sql.Timestamp, String)].toDF("k", "ts", "v")
    // day-partitioned empty write produces zero pool files; committing an
    // empty manifest would make every later read fail — must be skipped
    assert(!MicroBatch.appendBatchIdempotent(empty, target, "app", 0L, Some("ts")))
    assert(!graft.sources.ManifestTable.exists(target))
    // the first real batch then initializes the table normally
    val batch = Seq((1L, java.sql.Timestamp.valueOf("2024-03-01 10:00:00"), "a"))
      .toDF("k", "ts", "v")
    assert(MicroBatch.appendBatchIdempotent(batch, target, "app", 1L, Some("ts")))
    assert(graft.sources.ManifestTable.read(spark, target).count() === 1)
    // an empty LATER batch is fine: marker-only commit keeps ids monotonic
    assert(MicroBatch.appendBatchIdempotent(empty, target, "app", 2L, Some("ts")))
    assert(graft.sources.ManifestTable.read(spark, target).count() === 1)
    assert(graft.sources.ManifestTable.liveProps(target)("stream.app.batch") === "2")
  }

  test("streaming: mapGroupsWithState running totals") {
    import spark.implicits._
    val events = Seq((1L, 10.0), (1L, 5.0), (2L, 2.0))
      .toDF("user_id", "value")
    val out = MicroBatch.runningUserTotals(spark, events).collect()
      .map(a => a.user_id -> ((a.n_events, a.total_value))).toMap
    assert(out(1L) === ((2L, 15.0)))
    assert(out(2L) === ((1L, 2.0)))
  }

  test("streaming: session_window sessionization closes sessions at the gap") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val events = mem.toDF().toDF("ts", "user_id", "value")
    val q = MicroBatch.sessionizedStream(events, "30 minutes", "10 minutes")
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    def t(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // user 7: two events 10 min apart (one session), then silence
    mem.addData((t(1, 0), 7L, 1.0), (t(1, 10), 7L, 2.0))
    q.processAllAvailable()
    mem.addData((t(4, 0), 7L, 5.0))   // watermark passes; first session closes
    q.processAllAvailable()
    mem.addData((t(8, 0), 9L, 1.0))
    q.processAllAvailable()
    val rows = spark.table("sess_out").collect()
    q.stop()
    val s = rows.filter(_.getAs[Long]("user_id") == 7L)
    assert(s.exists(r => r.getAs[Long]("n_events") == 2L
      && math.abs(r.getAs[Double]("volume") - 3.0) < 1e-9
      && r.getAs[java.sql.Timestamp]("se").getTime
        - r.getAs[java.sql.Timestamp]("ss").getTime == 40 * 60 * 1000)) // 10 min span + 30 min gap
  }

  test("streaming: AvailableNow file-stream aggregate equals the batch recompute") {
    val streamed = MicroBatch.streamTumblingVolume(spark, sf).collect()
      .map(r => (r.getAs[java.time.LocalDateTime]("ws"),
        r.getAs[Long]("n_events"), r.getAs[Double]("volume"))).sortBy(_._1.toString).toSeq
    val batch = Tables.events(spark, sf)
      .groupBy(window(col("ts"), "3 hours"))
      .agg(count(lit(1)).as("n"), graft.Dsl.dsum(col("value")).as("v"))
      .select(col("window.start").as("ws"), col("n"), col("v"))
      .collect()
      .map(r => (r.getAs[java.time.LocalDateTime]("ws"),
        r.getAs[Long]("n"), r.getAs[Double]("v"))).sortBy(_._1.toString).toSeq
    assert(streamed === batch, "streaming and batch must agree bit-for-bit")
  }

  test("streaming: dropDuplicatesWithinWatermark keeps first arrival per key") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    val events = mem.toDF().toDF("ts", "event_id", "payload")
    val q = MicroBatch.streamingDedup(events, Seq("event_id"), "10 minutes")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    def t(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    mem.addData((t(1, 0), 100L, "first"), (t(1, 1), 100L, "dup"),
      (t(1, 2), 101L, "other"))
    q.processAllAvailable()
    mem.addData((t(1, 5), 100L, "late-dup"))
    q.processAllAvailable()
    val rows = spark.table("dedup_out").collect()
    q.stop()
    assert(rows.count(_.getAs[Long]("event_id") == 100L) === 1)
    assert(rows.find(_.getAs[Long]("event_id") == 100L).get
      .getAs[String]("payload") === "first")
    assert(rows.count(_.getAs[Long]("event_id") == 101L) === 1)
  }
}
