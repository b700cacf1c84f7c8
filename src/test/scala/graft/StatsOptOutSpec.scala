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

  test("invalid values refuse before any metadata persists") {
    import spark.implicits._
    val e = intercept[Exception] {
      Seq((1L, 1.0)).toDF("k", "v").writeTo("gso.ns.bad")
        .tableProperty("stats.ndv", "maybe").create()
    }
    assert(e.getMessage.contains("true or false"))
    assert(VersionedCatalog.readMeta(root("bad")).isEmpty)
  }
}
