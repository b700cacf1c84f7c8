package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.gold.Analytics
import graft.silver.{Ingest, Merge}
import graft.sources.{Formats, Versioned}

/** End-to-end medallion orchestration — the reference's three DAGs as one
  * callable pipeline (SURVEY §3): bronze CSV batches → incremental
  * watermark filter + dedup + merge into silver → gold full-refresh
  * analytics fan-out.
  *
  * The reference's control flow is imperative Python over table configs;
  * here it is imperative Scala over DataFrames, with all data movement in
  * Spark plans. Each stage is idempotent (MERGE semantics / full refresh),
  * mirroring the reference's exactly-once-per-batch behavior.
  */
object Medallion {

  /** Bronze: land a batch of events as partitioned, headered CSV
    * (`dags/1_generate_bronze_batch.py:142-149` shape). */
  def landBronzeBatch(spark: SparkSession, dir: String, base: String,
                      batchId: String, mod: Int, rem: Int): Unit = {
    val batch = Tables.events(spark, dir)
      .where(col("event_id") % mod === rem)
      .withColumn("ingestion_timestamp", current_timestamp())
    Formats.writeCsvPartitioned(batch, base, "events", batchId)
  }

  /** Silver: read all bronze batches (CSV glob + inferSchema), keep rows
    * newer than the silver watermark, dedup the staging batch, and MERGE
    * into the silver table. Returns the merged row count
    * (`dags/2_bronze_to_silver.py:177-298` shape).
    *
    * The MERGE result is committed through [[Versioned]] — immutable
    * snapshot dir + atomic pointer flip — the object-store-safe stand-in
    * for the reference's Iceberg snapshot commit: the snapshot being read
    * (watermark scan + merge input) is never touched by the write, and a
    * crash mid-commit leaves the old pointer intact. */
  def bronzeToSilver(spark: SparkSession, bronzeBase: String, silverRoot: String): Long = {
    val bronze = Formats.readCsvGlob(spark, bronzeBase, "events")

    val silverExists = Versioned.exists(silverRoot)
    val incremental =
      if (!silverExists) bronze
      else {
        val wm = Versioned.read(spark, silverRoot)
          .agg(max(col("ingestion_timestamp"))).first().get(0)
        if (wm == null) bronze else Ingest.newerThanWatermark(bronze, "ingestion_timestamp", wm)
      }

    val staging = Ingest.dedupLatest(incremental, Seq("event_id"), "ingestion_timestamp", "event_id")

    val merged =
      if (!silverExists) staging
      else Merge.upsert(Versioned.read(spark, silverRoot), staging, Seq("event_id"))

    Versioned.commit(merged, silverRoot)
    Versioned.read(spark, silverRoot).count()
  }

  /** Gold: full-refresh analytics over a silver events table, fanned out
    * per format with partitioned writes
    * (`dags/3_silver_to_gold.py:162-195` shape). */
  def silverToGold(spark: SparkSession, silverRoot: String, goldBase: String): Map[String, String] = {
    val events = Versioned.read(spark, silverRoot)
    events.createOrReplaceTempView("silver_events")   // S12 temp-view staging
    val monthly = spark.sql(
      """SELECT year(ts) AS ano, month(ts) AS mes, user_id,
        |       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS volume,
        |       COUNT(*) AS total_transacoes
        |FROM silver_events WHERE ts IS NOT NULL GROUP BY 1, 2, 3""".stripMargin)
    val out = Formats.fanout(monthly, goldBase, "monthly_balance", partitionCols = Seq("ano", "mes"))
    spark.catalog.dropTempView("silver_events")
    out
  }
}
