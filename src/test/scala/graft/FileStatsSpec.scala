package graft

import org.apache.spark.sql.sources
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.FileStats
import graft.sources.FileStats.ColStats

/** Pure-logic coverage of the per-file stats codec and the conservative
  * may-contain verdicts that drive plan-time file skipping. */
class FileStatsSpec extends AnyFunSuite {

  private def st(entries: (String, ColStats)*): Map[String, ColStats] =
    entries.map { case (k, v) => k.toLowerCase -> v }.toMap

  test("encode/decode round-trip, including names and values needing escaping") {
    val stats = Map(
      "value" -> ColStats('d', Some("0.5"), Some("99.25"), Some(0L)),
      "weird:name;x" -> ColStats('s', Some("a:b;c"), Some("z=%"), None),
      "allnull" -> ColStats('l', None, None, Some(42L)))
    val decoded = FileStats.decode(FileStats.encode(stats))
    assert(decoded === stats.map { case (k, v) => k.toLowerCase -> v })
    // garbage never throws, never prunes
    assert(FileStats.decode("not-a-stat") === Map.empty)
  }

  test("range verdicts: files provably outside the predicate are prunable, boundary files stay") {
    val s = st("v" -> ColStats('d', Some("10.0"), Some("20.0"), Some(0L)))
    assert(!FileStats.mayContain(s, sources.GreaterThan("v", Double.box(20.0))))
    assert(FileStats.mayContain(s, sources.GreaterThanOrEqual("v", Double.box(20.0))))
    assert(!FileStats.mayContain(s, sources.LessThan("v", Double.box(10.0))))
    assert(FileStats.mayContain(s, sources.LessThanOrEqual("v", Double.box(10.0))))
    assert(!FileStats.mayContain(s, sources.EqualTo("v", Double.box(9.99))))
    assert(FileStats.mayContain(s, sources.EqualTo("v", Double.box(15.0))))
    assert(!FileStats.mayContain(s, sources.In("v", Array(Double.box(1.0), Double.box(30.0)))))
    assert(FileStats.mayContain(s, sources.In("v", Array(Double.box(1.0), Double.box(12.0)))))
    // And prunes if either side proves empty; Or needs both
    assert(!FileStats.mayContain(s, sources.And(
      sources.GreaterThan("v", Double.box(20.0)), sources.IsNotNull("v"))))
    assert(FileStats.mayContain(s, sources.Or(
      sources.GreaterThan("v", Double.box(20.0)), sources.LessThan("v", Double.box(15.0)))))
    // case-insensitive column lookup
    assert(!FileStats.mayContain(s, sources.GreaterThan("V", Double.box(25.0))))
  }

  test("null verdicts: zero-null files prune IsNull, all-null files prune comparisons") {
    val noNulls = st("v" -> ColStats('l', Some("1"), Some("5"), Some(0L)))
    assert(!FileStats.mayContain(noNulls, sources.IsNull("v")))
    assert(FileStats.mayContain(noNulls, sources.IsNotNull("v")))
    val allNull = st("v" -> ColStats('l', None, None, Some(7L)))
    assert(FileStats.mayContain(allNull, sources.IsNull("v")))
    assert(!FileStats.mayContain(allNull, sources.IsNotNull("v")))
    assert(!FileStats.mayContain(allNull, sources.EqualTo("v", Long.box(3L))))
  }

  test("unknowns never prune: missing column, missing bounds, type mismatch, unmodeled filter") {
    val s = st("v" -> ColStats('l', Some("1"), Some("5"), Some(0L)))
    assert(FileStats.mayContain(s, sources.GreaterThan("other", Long.box(99L))))
    assert(FileStats.mayContain(s, sources.GreaterThan("v", "not-a-long")))
    assert(FileStats.mayContain(s, sources.Not(sources.EqualTo("v", Long.box(3L)))))
    val unbounded = st("v" -> ColStats('l', None, None, None))
    assert(FileStats.mayContain(unbounded, sources.GreaterThan("v", Long.box(99L))))
  }

  test("NaN comparison values never prune: footer min/max may exclude NaN rows") {
    // A file whose footer bounds are [10, 20] can still hold NaN rows when
    // written by engines that exclude NaN from min/max — so any NaN-valued
    // comparison must leave the file in the scan.
    val s = st("v" -> ColStats('d', Some("10.0"), Some("20.0"), Some(0L)))
    assert(FileStats.mayContain(s, sources.EqualTo("v", Double.box(Double.NaN))))
    assert(FileStats.mayContain(s, sources.GreaterThan("v", Double.box(Double.NaN))))
    assert(FileStats.mayContain(s, sources.LessThan("v", Float.box(Float.NaN))))
    assert(FileStats.mayContain(s,
      sources.In("v", Array(Double.box(Double.NaN), Double.box(99.0)))))
    // non-NaN values through the same path still prune
    assert(!FileStats.mayContain(s, sources.EqualTo("v", Double.box(99.0))))
  }

  test("legacy NaN BOUNDS (not just NaN probes) never prune") {
    // a manifest written before the ORC NaN decline may carry NaN min/max;
    // NaN compares greater than everything under Double.compare, so a NaN
    // min would wrongly prune LessThan — the bound must give no verdict
    val s = st("v" -> ColStats('d', Some("NaN"), Some("NaN"), Some(0L)))
    assert(FileStats.mayContain(s, sources.LessThan("v", Double.box(5.0))))
    assert(FileStats.mayContain(s, sources.GreaterThan("v", Double.box(5.0))))
    assert(FileStats.mayContain(s, sources.EqualTo("v", Double.box(5.0))))
  }

  test("ORC double stats decline bounds when the file holds NaN (sum poison)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("orc_nan").toString
    // NaN FIRST so ORC seeds min/max with it, and NaN mid-stream for the
    // thereafter-ignored case — both must decline via the NaN-propagating sum
    Seq(Double.NaN, 1.0, 5.0).toDF("v").coalesce(1).write.orc(s"$dir/a")
    Seq(1.0, Double.NaN, 5.0).toDF("v").coalesce(1).write.orc(s"$dir/b")
    Seq(1.0, 5.0).toDF("v").coalesce(1).write.orc(s"$dir/c")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType)))
    val conf = spark.sparkContext.hadoopConfiguration
    def statsOf(sub: String): Map[String, ColStats] = {
      val f = new java.io.File(s"$dir/$sub").listFiles()
        .find(_.getName.endsWith(".orc")).get
      FileStats.decode(FileStats.collect(f.toString, "orc", schema, conf).getOrElse(""))
    }
    for (sub <- Seq("a", "b")) {
      val vs = statsOf(sub).get("v")
      assert(vs.forall(c => c.min.isEmpty && c.max.isEmpty),
        s"NaN-containing orc file $sub must carry no double bounds: $vs")
    }
    // the clean file keeps exact bounds — the decline is NaN-scoped
    val clean = statsOf("c")("v")
    assert(clean.min.contains("1.0") && clean.max.contains("5.0"))
  }

  test("string verdicts: ASCII ordering, prefix pruning") {
    val s = st("name" -> ColStats('s', Some("alpha"), Some("miles"), Some(0L)))
    assert(!FileStats.mayContain(s, sources.EqualTo("name", "zeta")))
    assert(FileStats.mayContain(s, sources.EqualTo("name", "delta")))
    assert(!FileStats.mayContain(s, sources.StringStartsWith("name", "z")))
    assert(FileStats.mayContain(s, sources.StringStartsWith("name", "m")))
    assert(FileStats.mayContain(s, sources.StringStartsWith("name", "al")))
    // min shares the prefix boundary case: min > prefix but starts with it
    val s2 = st("name" -> ColStats('s', Some("preB"), Some("zz"), Some(0L)))
    assert(FileStats.mayContain(s2, sources.StringStartsWith("name", "pre")))
  }

  test("timestamp/date/decimal domains compare in their own timelines") {
    val micros = java.time.Instant.parse("2024-01-15T00:00:00Z")
      .getEpochSecond * 1000000L
    val ts = st("t" -> ColStats('t', Some((micros - 5000000L).toString),
      Some((micros - 1000000L).toString), Some(0L)))
    assert(!FileStats.mayContain(ts,
      sources.GreaterThanOrEqual("t", java.sql.Timestamp.from(
        java.time.Instant.parse("2024-01-15T00:00:00Z")))))
    assert(FileStats.mayContain(ts,
      sources.LessThan("t", java.sql.Timestamp.from(
        java.time.Instant.parse("2024-01-15T00:00:00Z")))))
    val ntz = st("t" -> ColStats('n', Some("0"), Some("1000000"), Some(0L)))
    assert(!FileStats.mayContain(ntz, sources.GreaterThan("t",
      java.time.LocalDateTime.of(1970, 1, 1, 0, 0, 10))))
    val dt = st("d" -> ColStats('a', Some("19700"), Some("19710"), Some(0L)))
    assert(!FileStats.mayContain(dt, sources.LessThan("d",
      java.time.LocalDate.ofEpochDay(19700))))
    assert(FileStats.mayContain(dt, sources.EqualTo("d",
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(19705).toString))))
    val dec = st("m" -> ColStats('m', Some("1.50"), Some("2.50"), Some(0L)))
    assert(!FileStats.mayContain(dec, sources.GreaterThan("m",
      new java.math.BigDecimal("2.50"))))
    assert(FileStats.mayContain(dec, sources.EqualTo("m",
      new java.math.BigDecimal("1.75"))))
  }
}
