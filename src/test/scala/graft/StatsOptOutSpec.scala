package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{ManifestTable, NdvStats}
import graft.sources.v2.VersionedCatalog

/** Per-table statistics opt-outs — the `stats.ndv` / `stats.histogram`
  * TBLPROPERTIES: the commit-time sketch tier (HLL NDV + KLL histograms
  * riding every pool write's Observation) is a WRITE tax, and a
  * write-mostly table should be able to decline it without flipping the
  * session default for every other table. */
class StatsOptOutSpec extends AnyFunSuite {
  private lazy val wh = Files.createTempDirectory("graft_sowh").toString
  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.gso", classOf[VersionedCatalog].getName)
    s.conf.set("spark.sql.catalog.gso.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gso.ns")
    s
  }
  private def root(t: String) = s"$wh/ns/$t"
  private def sketchOf(t: String): Map[String, Array[Byte]] =
    NdvStats.resolve(root(t), ManifestTable.currentVersion(root(t)).get)
      .map(_.sketches).getOrElse(Map.empty)
  private def kllKeys(m: Map[String, Array[Byte]]): Set[String] =
    m.keySet.filter(_.endsWith(NdvStats.KllSuffix))

  test("stats.ndv=false skips the whole sketch tier for THIS table only") {
    import spark.implicits._
    val df = (0L until 5000L).map(k => (k, k * 0.5)).toDF("k", "v")
    df.writeTo("gso.ns.on").create()
    df.writeTo("gso.ns.off").tableProperty("stats.ndv", "false").create()
    assert(sketchOf("on").nonEmpty, "default writes carry the sketch")
    assert(kllKeys(sketchOf("on")).nonEmpty, "and the KLL histogram tier")
    assert(sketchOf("off").isEmpty,
      "stats.ndv=false must skip the sketch for this table")
    spark.sql("DROP TABLE gso.ns.on"); spark.sql("DROP TABLE gso.ns.off")
  }

  test("stats.histogram=false keeps NDV but drops the KLL tier; ALTER flips both ways") {
    import spark.implicits._
    val df = (0L until 5000L).map(k => (k, k * 0.5)).toDF("k", "v")
    df.writeTo("gso.ns.nh").tableProperty("stats.histogram", "false").create()
    val s1 = sketchOf("nh")
    assert(s1.nonEmpty && kllKeys(s1).isEmpty,
      s"histogram-off writes keep NDV, drop KLL (got keys ${s1.keySet})")
    // UNSET restores the default: the next append sketches KLL again
    spark.sql("ALTER TABLE gso.ns.nh UNSET TBLPROPERTIES('stats.histogram')")
    df.writeTo("gso.ns.nh").append()
    assert(kllKeys(sketchOf("nh")).nonEmpty, "UNSET restores the KLL tier")
    // SET pushes it back off for later writes
    spark.sql("ALTER TABLE gso.ns.nh SET TBLPROPERTIES('stats.ndv'='false')")
    assert(ManifestTable.statsOpts(root("nh"))._1 === Some(false))
    spark.sql("DROP TABLE gso.ns.nh")
  }

  test("fused-agg sketches union consistently with hll_sketch_agg across writer generations") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // same logical values through BOTH writers: the fused write-path
    // aggregate (this round) and the per-column hll_sketch_agg shape
    // (compute_stats, and every sidecar written by earlier generations).
    // The union must count each distinct value ONCE — if the feeds
    // hashed differently (string bytes vs toString, raw vs hashed
    // doubles), the same value would double-count after a cross-
    // generation merge and every NDV would silently inflate.
    val df = (0 until 4000).map(i =>
      (i.toLong % 700, s"s${i % 450}", (i % 300) * 1.25, i % 2 == 0))
      .toDF("k", "s", "d", "b")
    // legacy shape: hll_sketch_agg over the SAME feed transformation
    val legacy = df.agg(
        hll_sketch_agg(col("k")).as("k"),
        hll_sketch_agg(col("s")).as("s"),
        hll_sketch_agg(when(col("d").isNotNull, xxhash64(col("d")))).as("d"),
        hll_sketch_agg(when(col("b").isNotNull, xxhash64(col("b")))).as("b"))
      .collect()(0)
    val legacyMap = Seq("k", "s", "d", "b").zipWithIndex
      .map { case (c, i) => c -> legacy.getAs[Array[Byte]](i) }.toMap
    // fused shape: write the same rows through a pool write and read the
    // sidecar the observation harvested
    df.writeTo("gso.ns.union").create()
    val fused = sketchOf("union").filter(!_._1.endsWith(NdvStats.KllSuffix))
    assert(fused.keySet === Set("k", "s", "d", "b"))
    for (c <- Seq("k", "s", "d", "b")) {
      val exact = df.select(col(c)).distinct().count()
      val solo = NdvStats.estimate(fused(c))
      val merged = NdvStats.estimate(
        NdvStats.merge(Map(c -> legacyMap(c)), Map(c -> fused(c)))(c))
      // HLL error at lgK=12 is ~1.6%; a feed mismatch would DOUBLE the
      // merged estimate — assert within 5% of exact, far below 2x
      assert(math.abs(solo - exact) <= exact * 0.05,
        s"$c: fused NDV $solo vs exact $exact")
      assert(math.abs(merged - exact) <= exact * 0.05,
        s"$c: cross-generation union double-counts ($merged vs $exact)")
    }
    spark.sql("DROP TABLE gso.ns.union")
  }

  test("invalid values refuse before any metadata persists") {
    import spark.implicits._
    val e = intercept[Exception] {
      Seq((1L, 1.0)).toDF("k", "v").writeTo("gso.ns.bad")
        .tableProperty("stats.ndv", "maybe").create()
    }
    assert(e.getMessage.contains("true or false"))
    assert(VersionedCatalog.readMeta(root("bad")).isEmpty)
  }

  test("KLL sampling is hash-selected: periodic write orders cannot collapse the histogram") {
    import graft.functions.GraftStatsAgg
    // ~1/stride of rows keep, deterministically
    val kept = (0L until 100000L).filter(GraftStatsAgg.sampleAt(_, 4))
    assert(math.abs(kept.size - 25000) < 1500, s"kept ${kept.size} of 100000")
    // the failure mode of the old fixed-phase `ordinal % 4 == 0`: a
    // column derived `id % 4` written in order sampled ONE residue class
    // (a single-value histogram). The hash selection must see them all,
    // in near-equal proportion.
    val byResidue = kept.groupBy(_ % 4).view.mapValues(_.size).toMap
    assert(byResidue.keySet === Set(0L, 1L, 2L, 3L), s"$byResidue")
    assert(byResidue.values.min * 10 > byResidue.values.max * 7,
      s"residue classes must sample near-uniformly: $byResidue")
    // and the same holds for any small period sharing a factor with 4
    Seq(2, 8, 12).foreach { p =>
      val classes = kept.groupBy(_ % p).view.mapValues(_.size).toMap
      assert(classes.size === p, s"period $p collapsed: $classes")
    }
  }
}
