package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.v2.{GraftRuntimeFilterScan, GraftScans, VersionedCatalog}

/** Runtime filtering (dynamic partition pruning) on the versioned catalog:
  * a star join's dim-side filter reaches the FACT table's manifest at
  * runtime — Spark executes the (broadcast) build side, hands the key set
  * to the scan via SupportsRuntimeV2Filtering, and the scan re-runs
  * manifest pruning, so only the files whose partition values can join
  * are ever opened. Without this, a 100 TB fact scan with no static
  * predicate reads everything and lets the join discard 90 % of it.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.grf", classOf[VersionedCatalog].getName)
    s.conf.set("spark.sql.catalog.grf.warehouse",
      java.nio.file.Files.createTempDirectory("graft_rfwh").toString)
    s.sql("CREATE NAMESPACE IF NOT EXISTS grf.ns")
    s
  }

  /** Files the EXECUTED scan read — the wrapper's CURRENT delegate holds
    * the runtime-narrowed listing. Descends through AQE's re-optimized
    * stages (plain collect stops at AdaptiveSparkPlanExec / QueryStageExec
    * boundaries). */
  private def scanned(df: org.apache.spark.sql.DataFrame): Int = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scansOf(p: SparkPlan): Seq[org.apache.spark.sql.connector.read.Scan] = p match {
      case a: AdaptiveSparkPlanExec => scansOf(a.executedPlan)
      case _ => p.collect {
        case b: BatchScanExec => Seq(b.scan)
        case q: QueryStageExec => scansOf(q.plan)
        case a: AdaptiveSparkPlanExec => scansOf(a.executedPlan)
      }.flatten
    }
    scansOf(df.queryExecution.executedPlan)
      .collect { case w: GraftRuntimeFilterScan => GraftScans.innermost(w) }
      .collect { case p: ParquetScan => p.fileIndex.inputFiles.length }.sum
  }

  test("identity-partitioned fact: dim filter prunes fact files at runtime") {
    import spark.implicits._
    val t = "grf.ns.fact_id"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, region STRING, v DOUBLE) PARTITIONED BY (region)")
    val regions = (0 until 8).map(i => s"r$i")
    (0L until 800L).map(i => (i, regions((i % 8).toInt), i * 0.5))
      .toDF("k", "region", "v").writeTo(t).append()
    val root = s"${spark.conf.get("spark.sql.catalog.grf.warehouse")}/ns/fact_id"
    val totalFiles = graft.sources.ManifestTable.liveEntries(root).size

    // the dim must be a REAL source with a surviving selective filter —
    // a local relation folds the predicate away and PartitionPruning
    // sees no reason to insert a DPP subquery
    val dimDir = java.nio.file.Files.createTempDirectory("rf_dim").toString
    Seq(("r1", "keep"), ("r2", "keep"), ("r5", "drop"))
      .toDF("r", "verdict").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).where($"verdict" === "keep")
    val joined = spark.table(t).join(broadcast(dim), $"region" === $"r")
      .groupBy($"region").agg(count(lit(1)).as("n"), sum($"v").as("sv"))

    val rows = joined.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(rows === Map("r1" -> 100L, "r2" -> 100L))

    val read = scanned(joined)
    assert(read > 0 && read * 3 <= totalFiles,
      s"runtime pruning ineffective: read $read of $totalFiles files " +
        s"(plan:\n${joined.queryExecution.executedPlan})")
    spark.sql(s"DROP TABLE $t")
  }

  test("bucket-partitioned fact: runtime IN-set prunes via the bucket transform") {
    import spark.implicits._
    val t = "grf.ns.fact_bk"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, v DOUBLE) PARTITIONED BY (bucket(16, k))")
    spark.range(2000).select($"id".as("k"), ($"id" * 1.0).as("v")).writeTo(t).append()
    val root = s"${spark.conf.get("spark.sql.catalog.grf.warehouse")}/ns/fact_bk"
    val totalFiles = graft.sources.ManifestTable.liveEntries(root).size

    val dimDir = java.nio.file.Files.createTempDirectory("rf_dimb").toString
    Seq((7L, "y"), (7L + 16L, "y"), (3L, "n")).toDF("dk", "keep")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).where($"keep" === "y")
    val joined = spark.table(t).join(broadcast(dim), $"k" === $"dk")
      .agg(count(lit(1)).as("n"), sum($"v").as("sv"))
    assert(joined.collect()(0).getLong(0) === 2L)

    val read = scanned(joined)
    assert(read > 0 && read * 2 <= totalFiles,
      s"bucket runtime pruning ineffective: read $read of $totalFiles files")
    spark.sql(s"DROP TABLE $t")
  }

  test("runtime filtering never relaxes static pruning and composes with it") {
    import spark.implicits._
    val t = "grf.ns.fact_mix"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (k BIGINT, region STRING, v DOUBLE) PARTITIONED BY (region)")
    val regions = (0 until 4).map(i => s"s$i")
    (0L until 400L).map(i => (i, regions((i % 4).toInt), i * 1.0))
      .toDF("k", "region", "v").writeTo(t).append()

    val dim = Seq("s1", "s2").toDF("r")
    // static predicate keeps s1+s3; runtime keeps s1+s2 → intersection s1
    val joined = spark.table(t).where($"region" isin ("s1", "s3"))
      .join(broadcast(dim), $"region" === $"r")
      .groupBy($"region").agg(count(lit(1)).as("n"))
    val got = joined.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got === Map("s1" -> 100L))
    spark.sql(s"DROP TABLE $t")
  }
}
