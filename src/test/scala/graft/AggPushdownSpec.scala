package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.v2.VersionedCatalog

/** Metadata-only aggregates: an unfiltered COUNT / MIN / MAX over a
  * versioned table is answered from the manifest's per-file row counts
  * and exact bounds — the executed plan contains a GraftAggScan and ZERO
  * file reads. Anything the metadata can't prove (filters, MOR deletes,
  * stats-less legacy entries) falls back to the normal scan with
  * identical results. At 100 TB this is count(*) in milliseconds.
  */
class AggPushdownSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.gagg", classOf[VersionedCatalog].getName)
    s.conf.set("spark.sql.catalog.gagg.warehouse",
      Files.createTempDirectory("graft_aggwh").toString)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gagg.ns")
    s
  }

  private def usedMetadataOnly(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.executedPlan.collect { case b: BatchScanExec => b.scan }
      .exists(_.description().startsWith("GraftAggScan["))

  test("count/min/max answer from the manifest with zero files opened") {
    import spark.implicits._
    val t = "gagg.ns.stats"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, s STRING, v DOUBLE, d DECIMAL(12,2))")
    (1 to 500).map(i => (i.toLong, s"s${"%03d".format(i)}", i * 0.5, BigDecimal(i) / 4))
      .toDF("k", "s", "v", "d").repartition(7).writeTo(t).append()
    (501 to 800).map(i => (i.toLong, s"s${"%03d".format(i % 700)}", i * 0.5, BigDecimal(i) / 4))
      .toDF("k", "s", "v", "d").writeTo(t).append()

    val agg = spark.table(t).agg(
      count(lit(1)).as("n"), min($"k").as("mn"), max($"k").as("mx"),
      min($"s").as("smn"), max($"v").as("vmx"), max($"d").as("dmx"))
    val row = agg.collect()(0)
    assert(usedMetadataOnly(agg), s"plan must be the metadata scan:\n${agg.queryExecution.executedPlan}")
    assert(row.getLong(0) === 800L)
    assert(row.getLong(1) === 1L && row.getLong(2) === 800L)
    assert(row.getString(3) === "s000") // i=700 in the second append wraps to s000
    assert(row.getDouble(4) === 400.0)
    assert(row.getDecimal(5) === new java.math.BigDecimal("200.00"))
    spark.sql(s"DROP TABLE $t")
  }

  test("count(col) uses null counts; all-null column yields NULL min") {
    import spark.implicits._
    val t = "gagg.ns.nulls"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v DOUBLE)")
    (1 to 100).map(i => (i.toLong, if (i % 4 == 0) Some(i * 1.0) else None))
      .toDF("k", "v").writeTo(t).append()
    val agg = spark.table(t).agg(count($"v").as("nv"), count(lit(1)).as("n"))
    assert(usedMetadataOnly(agg))
    val r = agg.collect()(0)
    assert(r.getLong(0) === 25L && r.getLong(1) === 100L)

    val t2 = "gagg.ns.allnull"
    spark.sql(s"DROP TABLE IF EXISTS $t2")
    spark.sql(s"CREATE TABLE $t2 (k BIGINT, v DOUBLE)")
    (1 to 50).map(i => (i.toLong, None: Option[Double])).toDF("k", "v").writeTo(t2).append()
    val agg2 = spark.table(t2).agg(min($"v").as("mn"), count($"v").as("nv"))
    assert(usedMetadataOnly(agg2))
    val r2 = agg2.collect()(0)
    assert(r2.isNullAt(0) && r2.getLong(1) === 0L)
    spark.sql(s"DROP TABLE $t")
    spark.sql(s"DROP TABLE $t2")
  }

  test("filters, deletes, and unsupported aggregates fall back with identical results") {
    import spark.implicits._
    val t = "gagg.ns.fall"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v DOUBLE)")
    (1 to 200).map(i => (i.toLong, i * 1.0)).toDF("k", "v").writeTo(t).append()

    // filter present: Spark never offers the pushdown (filters are residual)
    val filtered = spark.table(t).where($"k" > 100).agg(count(lit(1)).as("n"))
    assert(!usedMetadataOnly(filtered))
    assert(filtered.collect()(0).getLong(0) === 100L)

    // avg is not provable from bounds: whole aggregate falls back
    val avg_ = spark.table(t).agg(count(lit(1)).as("n"), avg($"v").as("a"))
    assert(!usedMetadataOnly(avg_))
    assert(avg_.collect()(0).getLong(0) === 200L)

    // a live MOR delete makes per-file counts overcounts: fall back
    graft.plans.MergeInto.sql(spark, s"DELETE FROM $t WHERE k % 10 = 0")
    val afterDelete = spark.table(t).agg(count(lit(1)).as("n"))
    val n = afterDelete.collect()(0).getLong(0)
    assert(n === 180L, s"deletes must be honored (got $n)")
    spark.sql(s"DROP TABLE $t")
  }

  test("identity partition columns answer MIN/MAX from directory values; COUNT(*) from rows") {
    import spark.implicits._
    val t = "gagg.ns.parts"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, region STRING, v DOUBLE) PARTITIONED BY (region)")
    (1 to 120).map(i => (i.toLong, s"r${i % 3}", i * 1.0)).toDF("k", "region", "v")
      .writeTo(t).append()
    val cnt = spark.table(t).agg(count(lit(1)).as("n"))
    assert(usedMetadataOnly(cnt))
    assert(cnt.collect()(0).getLong(0) === 120L)
    // region lives in directory names: each directory pins the exact
    // value for every row inside, so bounds synthesize from the listing
    val mm = spark.table(t).agg(min($"region").as("mn"), max($"region").as("mx"))
    assert(usedMetadataOnly(mm))
    val r = mm.collect()(0)
    assert(r.getString(0) === "r0" && r.getString(1) === "r2")
    spark.sql(s"DROP TABLE $t")
  }

  test("time travel aggregates answer from the pinned version's manifest") {
    import spark.implicits._
    val t = "gagg.ns.tt"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT)")
    (1 to 60).map(_.toLong).toDF("k").writeTo(t).append()
    (61 to 100).map(_.toLong).toDF("k").writeTo(t).append()
    val pinned = spark.sql(s"SELECT COUNT(*) AS n, MAX(k) AS mx FROM $t VERSION AS OF 1")
    assert(usedMetadataOnly(pinned))
    val r = pinned.collect()(0)
    assert(r.getLong(0) === 60L && r.getLong(1) === 60L)
    val live = spark.table(t).agg(count(lit(1))).collect()(0).getLong(0)
    assert(live === 100L)
    spark.sql(s"DROP TABLE $t")
  }

  test("NaN doubles on an ORC table: MIN/MAX fall back and answer NaN correctly") {
    import spark.implicits._
    val t = "gagg.ns.orcnan"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v DOUBLE) TBLPROPERTIES('format'='orc')")
    // NaN as the FIRST value of one file: ORC seeds min/max with it and
    // ignores NaN afterwards — footer bounds are untrustworthy either way,
    // so the double column must carry no bounds and MAX must fall back to
    // the real scan (Spark's MAX over NaN-containing data is NaN)
    Seq((1L, Double.NaN), (2L, 1.0), (3L, 5.0)).toDF("k", "v")
      .coalesce(1).writeTo(t).append()
    val agg = spark.table(t).agg(max($"v").as("mx"), min($"v").as("mn"))
    val row = agg.collect()(0)
    assert(!usedMetadataOnly(agg),
      "NaN-poisoned ORC double bounds must decline the metadata answer")
    assert(row.getDouble(0).isNaN, "Spark MAX over NaN data is NaN")
    // COUNT and the BIGINT column still answer metadata-only
    val cnt = spark.table(t).agg(count(lit(1)).as("n"), max($"k").as("mk"))
    assert(usedMetadataOnly(cnt))
    assert(cnt.collect()(0).getLong(0) === 3L)
    spark.sql(s"DROP TABLE $t")
  }

  test("GROUP BY identity partition columns answers from per-directory manifest stats") {
    import spark.implicits._
    val t = "gagg.ns.grp"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, region STRING, v DOUBLE) PARTITIONED BY (region)")
    (0 until 300).map(i => (i.toLong, s"r${i % 3}", i * 0.5))
      .toDF("k", "region", "v").writeTo(t).append()
    (300 until 400).map(i => (i.toLong, s"r${i % 2}", i * 0.5))
      .toDF("k", "region", "v").writeTo(t).append()

    val agg = spark.table(t).groupBy($"region")
      .agg(count(lit(1)).as("n"), min($"k").as("mn"), max($"k").as("mx"))
    assert(usedMetadataOnly(agg),
      s"grouped plan must be the metadata scan:\n${agg.queryExecution.executedPlan}")
    val got = agg.collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val expected = (0 until 300).map(i => (s"r${i % 3}", i.toLong)) ++
      (300 until 400).map(i => (s"r${i % 2}", i.toLong))
    val byRegion = expected.groupBy(_._1).map { case (rg, xs) =>
      rg -> ((xs.size.toLong, xs.map(_._2).min, xs.map(_._2).max)) }
    assert(got === byRegion)

    // MIN/MAX OF the partition column itself also answers from the dirs
    val agg2 = spark.table(t).agg(min($"region").as("mn"), max($"region").as("mx"))
    assert(usedMetadataOnly(agg2))
    assert(agg2.collect()(0).toSeq === Seq("r0", "r2"))

    // a filter keeps the pushdown OFF and the fallback identical
    val filtered = spark.table(t).where($"k" >= 100).groupBy($"region")
      .agg(count(lit(1)).as("n"))
    assert(!usedMetadataOnly(filtered))
    val gotF = filtered.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gotF === expected.filter(_._2 >= 100).groupBy(_._1).view.mapValues(_.size.toLong).toMap)

    // grouping by a NON-partition column falls back with identical results
    val agg3 = spark.table(t).groupBy(($"k" % 2).as("p")).agg(count(lit(1)).as("n"))
    assert(!usedMetadataOnly(agg3))
    assert(agg3.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ===
      Map(0L -> 200L, 1L -> 200L))
    spark.sql(s"DROP TABLE $t")
  }

  test("grouped pushdown over MULTIPLE identity columns folds per directory pair") {
    import spark.implicits._
    val t = "gagg.ns.grp2"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, y INT, m INT, v DOUBLE) PARTITIONED BY (y, m)")
    (0 until 240).map(i => (i.toLong, 2023 + i % 2, 1 + i % 3, i * 1.0))
      .toDF("k", "y", "m", "v").writeTo(t).append()
    val agg = spark.table(t).groupBy($"y", $"m")
      .agg(count(lit(1)).as("n"), max($"k").as("mx"))
    assert(usedMetadataOnly(agg),
      s"two-column grouped plan must be the metadata scan:\n${agg.queryExecution.executedPlan}")
    val got = agg.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val expected = (0 until 240).groupBy(i => (2023 + i % 2, 1 + i % 3))
      .view.mapValues(_.size.toLong).toMap
    assert(got === expected)
    spark.sql(s"DROP TABLE $t")
  }

  test("grouped pushdown handles the null (hive default) partition exactly") {
    import spark.implicits._
    val t = "gagg.ns.grpn"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, region STRING, v DOUBLE) PARTITIONED BY (region)")
    Seq((1L, "east", 1.0), (2L, null, 2.0), (3L, null, 3.0), (4L, "west", 4.0))
      .toDF("k", "region", "v").writeTo(t).append()
    val agg = spark.table(t).groupBy($"region")
      .agg(count(lit(1)).as("n"), count($"region").as("nr"))
    assert(usedMetadataOnly(agg),
      s"null partition must still push down:\n${agg.queryExecution.executedPlan}")
    val got = agg.collect().map(r =>
      Option(r.getString(0)) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(Some("east") -> ((1L, 1L)), Some("west") -> ((1L, 1L)),
      None -> ((2L, 0L))))
    spark.sql(s"DROP TABLE $t")
  }

  test("avro tables push down too (writer-side stats carry row counts)") {
    import spark.implicits._
    val t = "gagg.ns.av"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v DOUBLE) USING avro")
    (1 to 300).map(i => (i.toLong, i * 2.0)).toDF("k", "v").repartition(5).writeTo(t).append()
    val agg = spark.table(t).agg(count(lit(1)).as("n"), max($"k").as("mx"))
    assert(usedMetadataOnly(agg),
      s"avro metadata aggregate:\n${agg.queryExecution.executedPlan}")
    val r = agg.collect()(0)
    assert(r.getLong(0) === 300L && r.getLong(1) === 300L)
    spark.sql(s"DROP TABLE $t")
  }

  test("GROUP BY a day-derived key answers from per-file ts bounds (hidden days)") {
    import spark.implicits._
    val t = "gagg.ns.days"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, ts TIMESTAMP) PARTITIONED BY (days(ts))")
    def ts(d: String, h: Int) = java.sql.Timestamp.valueOf(s"$d ${"%02d".format(h)}:00:00")
    val rows = Seq(
      (1L, ts("2024-01-03", 1)), (2L, ts("2024-01-03", 23)),
      (3L, ts("2024-01-04", 12)), (4L, ts("2024-02-07", 8)),
      (5L, ts("2024-02-07", 9)), (6L, ts("2025-03-08", 0)))
    rows.take(4).toDF("k", "ts").writeTo(t).append()
    rows.drop(4).toDF("k", "ts").writeTo(t).append()

    // to_date(ts): each file's bounds collapse to its __day date
    val agg = spark.table(t).groupBy(to_date($"ts").as("day"))
      .agg(count(lit(1)).as("n"), max($"k").as("mx"))
    assert(usedMetadataOnly(agg),
      s"day-grouped plan must be the metadata scan:\n${agg.queryExecution.executedPlan}")
    val got = agg.collect().map(r => r.getDate(0).toString -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map("2024-01-03" -> ((2L, 2L)), "2024-01-04" -> ((1L, 3L)),
      "2024-02-07" -> ((2L, 5L)), "2025-03-08" -> ((1L, 6L))))

    // year/month extract pins at COARSER granularity than the day dirs
    val ym = spark.table(t).groupBy(year($"ts").as("y"), month($"ts").as("m"))
      .agg(count(lit(1)).as("n"))
    assert(usedMetadataOnly(ym))
    assert(ym.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap ===
      Map((2024, 1) -> 3L, (2024, 2) -> 2L, (2025, 3) -> 1L))
    spark.sql(s"DROP TABLE $t")

    // an UNPARTITIONED single file spanning two days cannot pin: the
    // normal scan runs with identical results
    val t2 = "gagg.ns.flatdays"
    spark.sql(s"DROP TABLE IF EXISTS $t2")
    spark.sql(s"CREATE TABLE $t2 (k BIGINT, ts TIMESTAMP)")
    rows.toDF("k", "ts").coalesce(1).writeTo(t2).append()
    val fb = spark.table(t2).groupBy(to_date($"ts").as("day")).agg(count(lit(1)).as("n"))
    assert(!usedMetadataOnly(fb), "a two-day file must decline the metadata answer")
    assert(fb.collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap ===
      Map("2024-01-03" -> 2L, "2024-01-04" -> 1L, "2024-02-07" -> 2L, "2025-03-08" -> 1L))
    spark.sql(s"DROP TABLE $t2")
  }

  test("GROUP BY year/month on a months layout; day grouping declines there") {
    import spark.implicits._
    val t = "gagg.ns.months"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, ts TIMESTAMP) PARTITIONED BY (months(ts))")
    val rows = Seq(
      (1L, "2024-01-03 10:00:00"), (2L, "2024-01-29 11:00:00"),
      (3L, "2024-02-07 12:00:00"), (4L, "2025-03-08 13:00:00"))
      .map { case (k, s) => (k, java.sql.Timestamp.valueOf(s)) }
    rows.toDF("k", "ts").writeTo(t).append()
    val ym = spark.table(t).groupBy(year($"ts").as("y"), month($"ts").as("m"))
      .agg(count(lit(1)).as("n"), min($"k").as("mn"))
    assert(usedMetadataOnly(ym),
      s"months-grouped plan must be the metadata scan:\n${ym.queryExecution.executedPlan}")
    assert(ym.collect().map(r => (r.getInt(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3)))).toMap ===
      Map((2024, 1) -> ((2L, 1L)), (2024, 2) -> ((1L, 3L)), (2025, 3) -> ((1L, 4L))))
    // a month dir spans many days: exact-date grouping declines, falls back
    val byDay = spark.table(t).groupBy(to_date($"ts").as("d")).agg(count(lit(1)).as("n"))
    assert(!usedMetadataOnly(byDay))
    assert(byDay.collect().length === 4)
    spark.sql(s"DROP TABLE $t")
  }

  test("GROUP BY a string prefix pins on a truncate layout; shifted substrings decline") {
    import spark.implicits._
    val t = "gagg.ns.pfx"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (s STRING, v BIGINT) PARTITIONED BY (truncate(3, s))")
    Seq(("alpha", 1L), ("alps", 2L), ("beta", 3L), ("bet", 4L), (null, 5L))
      .toDF("s", "v").writeTo(t).append()
    val agg = spark.table(t).groupBy(substring($"s", 1, 3).as("p"))
      .agg(count(lit(1)).as("n"), max($"v").as("mx"))
    assert(usedMetadataOnly(agg),
      s"prefix-grouped plan must be the metadata scan:\n${agg.queryExecution.executedPlan}")
    val got = agg.collect().map(r => Option(r.getString(0)) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(Some("alp") -> ((2L, 2L)), Some("bet") -> ((2L, 4L)),
      None -> ((1L, 5L))))
    // substring not anchored at 1 is not prefix-monotone: falls back
    val shifted = spark.table(t).groupBy(substring($"s", 2, 2).as("p")).agg(count(lit(1)).as("n"))
    assert(!usedMetadataOnly(shifted))
    assert(shifted.collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap ===
      Map(Some("lp") -> 2L, Some("et") -> 2L, None -> 1L))
    spark.sql(s"DROP TABLE $t")
  }

  test("GROUP BY a bare column pins when every file holds one value") {
    import spark.implicits._
    val t = "gagg.ns.onefile"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (src STRING, v BIGINT)")
    Seq(("web", 1L), ("web", 2L)).toDF("src", "v").coalesce(1).writeTo(t).append()
    Seq(("api", 3L)).toDF("src", "v").coalesce(1).writeTo(t).append()
    Seq((null: String, 4L)).toDF("src", "v").coalesce(1).writeTo(t).append()
    val agg = spark.table(t).groupBy($"src").agg(count(lit(1)).as("n"), max($"v").as("mx"))
    assert(usedMetadataOnly(agg),
      s"single-value files must pin their group:\n${agg.queryExecution.executedPlan}")
    assert(agg.collect().map(r => Option(r.getString(0)) -> ((r.getLong(1), r.getLong(2)))).toMap ===
      Map(Some("web") -> ((2L, 2L)), Some("api") -> ((1L, 3L)), None -> ((1L, 4L))))
    // a file mixing two values (or value + null) cannot pin: fall back
    Seq(("web", 5L), ("api", 6L)).toDF("src", "v").coalesce(1).writeTo(t).append()
    val fb = spark.table(t).groupBy($"src").agg(count(lit(1)).as("n"))
    assert(!usedMetadataOnly(fb))
    assert(fb.collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap ===
      Map(Some("web") -> 3L, Some("api") -> 2L, None -> 1L))
    spark.sql(s"DROP TABLE $t")
  }
}
