package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.v2.VersionedCatalog

/** Streaming reads of versioned tables: the commit log is the stream.
  * Each micro-batch consumes the files appended between two versions
  * (cost ∝ new data), checkpoints resume exactly-once at the version
  * boundary, and a window containing row-level changes fails loudly
  * unless the reader opted into ignoreChanges — Delta's append-only
  * streaming contract, re-expressed over the manifest log.
  */
class StreamTableReadSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.gstr", classOf[VersionedCatalog].getName)
    s.conf.set("spark.sql.catalog.gstr.warehouse",
      Files.createTempDirectory("graft_strwh").toString)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gstr.ns")
    s
  }

  private def drain(t: String, checkpoint: String, sink: String,
                    extra: Map[String, String] = Map.empty): Unit = {
    var reader = spark.readStream
    extra.foreach { case (k, v) => reader = reader.option(k, v) }
    val q = reader.table(t).writeStream
      .format("parquet").option("path", sink)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("stream follows appends across restarts, exactly once per version window") {
    import spark.implicits._
    val t = "gstr.ns.appends"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v STRING)")
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").writeTo(t).append()
    Seq((3L, "c")).toDF("k", "v").writeTo(t).append()

    val checkpoint = Files.createTempDirectory("str_ck").toString
    val sink = Files.createTempDirectory("str_sink").toString + "/out"
    drain(t, checkpoint, sink)
    assert(spark.read.parquet(sink).as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "b"), (3L, "c")))

    // two more commits land; a restarted stream consumes ONLY them
    Seq((4L, "d")).toDF("k", "v").writeTo(t).append()
    Seq((5L, "e")).toDF("k", "v").writeTo(t).append()
    drain(t, checkpoint, sink)
    val all = spark.read.parquet(sink).as[(Long, String)].collect().toSeq
    assert(all.size === 5, s"no re-delivery on restart: $all")
    assert(all.toSet === Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e")))
    spark.sql(s"DROP TABLE $t")
  }

  test("identity-partitioned tables stream with partition values intact") {
    import spark.implicits._
    val t = "gstr.ns.parts"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, region STRING, v DOUBLE) PARTITIONED BY (region)")
    (0 until 60).map(i => (i.toLong, s"r${i % 3}", i * 1.0))
      .toDF("k", "region", "v").writeTo(t).append()
    val checkpoint = Files.createTempDirectory("str_ck2").toString
    val sink = Files.createTempDirectory("str_sink2").toString + "/out"
    drain(t, checkpoint, sink)
    val got = spark.read.parquet(sink)
    assert(got.count() === 60)
    assert(got.groupBy($"region").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ===
      Map("r0" -> 20L, "r1" -> 20L, "r2" -> 20L))
    assert(got.agg(sum($"v")).head.getDouble(0) === (0 until 60).map(_.toDouble).sum)
    spark.sql(s"DROP TABLE $t")
  }

  test("maxVersionsPerTrigger paces a backlog drain in commit-sized batches") {
    import spark.implicits._
    val t = "gstr.ns.paced"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v STRING)")
    val prevRetain = spark.conf.getOption("spark.graft.versioned.retain")
    spark.conf.set("spark.graft.versioned.retain", "10")
    try (1 to 6).foreach(i =>
      Seq((i.toLong, s"v$i")).toDF("k", "v").writeTo(t).append())
    finally prevRetain match {
      case Some(v) => spark.conf.set("spark.graft.versioned.retain", v)
      case None => spark.conf.unset("spark.graft.versioned.retain")
    }

    val checkpoint = Files.createTempDirectory("str_ck4").toString
    val sink = Files.createTempDirectory("str_sink4").toString + "/out"
    drain(t, checkpoint, sink, Map("maxVersionsPerTrigger" -> "2"))
    assert(spark.read.parquet(sink).count() === 6,
      "AvailableNow must still drain the full backlog, just in paced batches")
    // the checkpoint advanced through intermediate offsets (3 batches of
    // 2 versions each), not one giant window
    val commits = new java.io.File(s"$checkpoint/commits").list()
      .count(!_.endsWith(".tmp"))
    assert(commits >= 3, s"expected >=3 paced batches, saw $commits commits")
    spark.sql(s"DROP TABLE $t")
  }

  test("a window with row-level changes fails loudly; ignoreChanges streams the appends") {
    import spark.implicits._
    val t = "gstr.ns.changed"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v STRING)")
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").writeTo(t).append()
    val checkpoint = Files.createTempDirectory("str_ck3").toString
    val sink = Files.createTempDirectory("str_sink3").toString + "/out"
    drain(t, checkpoint, sink)

    graft.plans.MergeInto.sql(spark, s"DELETE FROM $t WHERE k = 1")
    Seq((9L, "z")).toDF("k", "v").writeTo(t).append()

    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(t, checkpoint, sink)
    }
    assert(ex.getMessage.contains("ignoreChanges") ||
      Option(ex.getCause).exists(_.getMessage.contains("ignoreChanges")),
      s"must name the escape hatch: ${ex.getMessage}")

    drain(t, checkpoint, sink, Map("ignoreChanges" -> "true"))
    val rows = spark.read.parquet(sink).as[(Long, String)].collect().toSet
    assert(rows.contains((9L, "z")), "appended file must stream under ignoreChanges")
    spark.sql(s"DROP TABLE $t")
  }

  test("RENAMED-column tables stream: physical files, logical consumer order") {
    import spark.implicits._
    val t = "gstr.ns.renamed"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v STRING)")
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").writeTo(t).append()
    spark.sql(s"ALTER TABLE $t RENAME COLUMN v TO label")
    Seq((3L, "c")).toDF("k", "label").writeTo(t).append()
    val sink = Files.createTempDirectory("str_sinkr").toString + "/out"
    drain(t, Files.createTempDirectory("str_ckr").toString, sink)
    assert(spark.read.parquet(sink).select($"k", $"label")
      .as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    spark.sql(s"DROP TABLE $t")
  }

  test("avro tables stream through the manifest scan") {
    import spark.implicits._
    val t = "gstr.ns.avro"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v STRING) TBLPROPERTIES('format'='avro')")
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").writeTo(t).append()
    Seq((3L, "c")).toDF("k", "v").writeTo(t).append()
    val sink = Files.createTempDirectory("str_sinka").toString + "/out"
    val ck = Files.createTempDirectory("str_cka").toString
    drain(t, ck, sink)
    assert(spark.read.parquet(sink).as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    // restart consumes only the new commit
    Seq((4L, "d")).toDF("k", "v").writeTo(t).append()
    drain(t, ck, sink)
    assert(spark.read.parquet(sink).count() === 4)
    spark.sql(s"DROP TABLE $t")
  }

  test("an INITIAL batch over live merge-on-read deletes fails loudly (no raw re-delivery)") {
    import spark.implicits._
    val t = "gstr.ns.mordel"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v STRING)")
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v").writeTo(t).append()
    val prevMode = spark.conf.getOption("spark.graft.delete.mode")
    spark.conf.set("spark.graft.delete.mode", "merge-on-read")
    try graft.plans.MergeInto.sql(spark, s"DELETE FROM $t WHERE k = 2")
    finally prevMode match {
      case Some(m) => spark.conf.set("spark.graft.delete.mode", m)
      case None => spark.conf.unset("spark.graft.delete.mode")
    }

    // a FRESH stream (no checkpoint history) must not silently stream the
    // tombstoned file raw — the batch path applies the delete, the plain
    // streaming source cannot
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(t, Files.createTempDirectory("str_ck5").toString,
        Files.createTempDirectory("str_sink5").toString + "/out")
    }
    def messages(e: Throwable): Seq[String] =
      Option(e).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(ex).exists(_.contains("ignoreChanges")),
      s"must name the escape hatch: ${messages(ex)}")

    // the opt-in streams the files raw (deleted row re-delivers, documented)
    val sink = Files.createTempDirectory("str_sink6").toString + "/out"
    drain(t, Files.createTempDirectory("str_ck6").toString, sink,
      Map("ignoreChanges" -> "true"))
    assert(spark.read.parquet(sink).count() === 3)
    spark.sql(s"DROP TABLE $t")
  }
}
