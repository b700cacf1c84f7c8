package graft.sources.v2

import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.functions._

import graft.{Dsl, Tables}
import graft.sources.Versioned

/** Driver-contract queries exercising the V2 catalog end-to-end. Each
  * invocation builds its own UUID-named table (Verify runs queries
  * concurrently on one session) inside a shared tmp warehouse; content
  * derives deterministically from the testdata tables so the DuckDB
  * oracles reproduce the results from the raw parquet.
  */
object V2Queries {

  /** Catalog name used by the contract queries. */
  val Cat = "graft_cat"

  private lazy val warehouse: String = {
    val p = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_v2_warehouse")
    java.nio.file.Files.createDirectories(p)
    p.toString
  }

  /** Idempotently register the catalog on the session (catalog plugins
    * resolve lazily from conf, so a runtime set works). */
  def ensureCatalog(spark: SparkSession): Unit = synchronized {
    spark.conf.set(s"spark.sql.catalog.$Cat", classOf[VersionedCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$Cat.warehouse", warehouse)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $Cat.q")
  }

  private def newName(prefix: String): String =
    s"${prefix}_${UUID.randomUUID().toString.replace("-", "").take(12)}"

  /** Filter window shared with the oracle (whole days inside the events
    * table's January span). */
  val PruneFrom = "2024-01-10 00:00:00"
  val PruneUntil = "2024-01-20 00:00:00"

  private def eventsSlim(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))

  /** The file set the V2 scan will actually read, from the optimized plan
    * (plan-time only — nothing is executed). */
  private def scanFiles(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.scan
    }.collect { case p: ParquetScan => p.fileIndex.inputFiles.toSeq }.flatten

  /** Hidden-partition pruning through the catalog: a day-partitioned
    * versioned table of events is created via the V2 CTAS path, read back
    * through `spark.table`, and aggregated under a ts-range predicate.
    * The `prune_ok` verdict asserts — at PLAN time, from the scan's file
    * listing — that the manifest pruning removed the out-of-range day
    * files and kept only in-range ones (the oracle pins it TRUE), so a
    * pruning regression fails the hash compare, not just a benchmark. */
  def versionedScanPrune(spark: SparkSession, dir: String): DataFrame = {
    ensureCatalog(spark)
    val tbl = s"$Cat.q.${newName("ev")}"
    eventsSlim(spark, dir)
      .writeTo(tbl)
      .partitionedBy(org.apache.spark.sql.functions.partitioning.days(col("ts")))
      .create()

    val t = spark.table(tbl)
    val windowed = t
      .where(col("ts") >= lit(PruneFrom).cast("timestamp_ntz")
        && col("ts") < lit(PruneUntil).cast("timestamp_ntz"))
    val agg = windowed
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), Dsl.dsum(col("value")).as("volume"))

    val prunedFiles = scanFiles(windowed)
    val allFiles = scanFiles(t)
    val fromDay = PruneFrom.take(10)
    val untilDay = PruneUntil.take(10)
    val inRange = prunedFiles.forall { f =>
      val day = f.split("__day=")(1).take(10)
      day >= fromDay && day <= untilDay
    }
    val pruneOk = prunedFiles.nonEmpty && inRange &&
      prunedFiles.size < allFiles.size
    agg.withColumn("prune_ok", lit(pruneOk))
  }

  /** Watermark splitting the two committed snapshots (and the oracle's
    * recomputation of each). */
  val TtCutoff = "2024-01-15 00:00:00"

  /** Native SQL time travel through the catalog: snapshot 1 holds the
    * pre-cutoff events, snapshot 2 appends the rest; `VERSION AS OF`
    * reads both through Spark's own time-travel resolution and the
    * oracle recomputes each snapshot from the raw events. */
  def versionedTimeTravel(spark: SparkSession, dir: String): DataFrame = {
    ensureCatalog(spark)
    val tbl = s"$Cat.q.${newName("tt")}"
    val ev = eventsSlim(spark, dir)
    val cutoff = lit(TtCutoff).cast("timestamp_ntz")
    ev.where(col("ts") < cutoff).writeTo(tbl).create()           // v1
    ev.where(col("ts") >= cutoff).writeTo(tbl).append()          // v2

    def snap(v: Int): DataFrame =
      spark.sql(s"SELECT * FROM $tbl VERSION AS OF $v")
        .agg(count(lit(1)).as("n_rows"), Dsl.dsum(col("value")).as("total_value"))
        .select(lit(v).as("snapshot"), col("n_rows"), col("total_value"))
    snap(1).unionAll(snap(2))
  }

  /** End-to-end incremental gold maintenance off the snapshot log: the
    * CDC feed is PRODUCED by [[Versioned.diff]] between two retained
    * snapshots (not handed in), folded into the materialized partials of
    * snapshot 1 ([[graft.pipeline.Incremental]]'s combine shape), and the
    * refreshed gold table is committed as a versioned snapshot. The
    * oracle is the full recompute over the raw events — incremental
    * maintenance must be invisible in the result. */
  def incrementalGoldFromCdc(spark: SparkSession, dir: String): DataFrame = {
    val base = System.getProperty("java.io.tmpdir")
    val id = newName("cdc")
    val silverRoot = s"$base/graft_${id}_silver"
    val goldRoot = s"$base/graft_${id}_gold"
    val cutoff = lit(TtCutoff).cast("timestamp_ntz")

    val ev = eventsSlim(spark, dir)
    Versioned.commit(ev.where(col("ts") < cutoff), silverRoot)   // v1
    Versioned.commit(ev, silverRoot)                             // v2 = v1 + delta

    // CDC off the snapshot log: v1 ⊂ v2 keyed by event_id ⇒ inserts only
    val cdc = Versioned.diff(spark, silverRoot, 1L, 2L, Seq("event_id"))
    val delta = cdc
      .where(col("change_type") === "insert")
      .select(col("after.user_id").as("user_id"),
        col("after.event_type").as("event_type"),
        col("after.value").as("value"))

    def partial(df: DataFrame, isDelta: Boolean): DataFrame =
      df.groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          Dsl.dsumDec(col("value")).as("sum_dec"),
          (if (isDelta) count(lit(1)) else lit(0L)).as("n_delta"))

    val state = partial(
      Versioned.readVersion(spark, silverRoot, 1L)
        .select(col("user_id"), col("event_type"), col("value")),
      isDelta = false)
    val refreshed = state.unionByName(partial(delta, isDelta = true))
      .groupBy(col("user_id"), col("event_type"))
      .agg(sum(col("n")).as("n_events"),
        sum(col("sum_dec")).cast("double").as("total_value"),
        sum(col("n_delta")).as("n_delta"))

    Versioned.commit(refreshed, goldRoot)
    Versioned.read(spark, goldRoot)
  }

  object oracle {
    val versionedScanPrune: String =
      s"""SELECT event_type, COUNT(*) AS n_events,
         |  ${Dsl.sql.dsum("value")} AS volume, TRUE AS prune_ok
         |FROM events
         |WHERE ts >= TIMESTAMP '$PruneFrom' AND ts < TIMESTAMP '$PruneUntil'
         |GROUP BY 1""".stripMargin

    val versionedTimeTravel: String =
      s"""SELECT 1 AS snapshot, COUNT(*) AS n_rows,
         |  ${Dsl.sql.dsum("value")} AS total_value
         |FROM events WHERE ts < TIMESTAMP '$TtCutoff'
         |UNION ALL
         |SELECT 2 AS snapshot, COUNT(*) AS n_rows,
         |  ${Dsl.sql.dsum("value")} AS total_value
         |FROM events""".stripMargin

    /** Full recompute — the incremental path must be invisible. */
    val incrementalGoldFromCdc: String =
      s"""SELECT user_id, event_type, COUNT(*) AS n_events,
         |  ${Dsl.sql.dsum("value")} AS total_value,
         |  CAST(SUM(CASE WHEN ts >= TIMESTAMP '$TtCutoff' THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_delta
         |FROM events GROUP BY 1, 2""".stripMargin
  }
}
