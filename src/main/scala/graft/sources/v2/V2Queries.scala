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

  /** Restore a thread's pre-clone active session (clones pin themselves
    * active for the duration of a plan-verdict query — see
    * [[cboBroadcastJoin]] — and must not leak onto the pool thread). */
  private def restoreActive(prev: Option[SparkSession]): Unit = prev match {
    case Some(s0) => SparkSession.setActiveSession(s0)
    case None => SparkSession.clearActiveSession()
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

  /** The staged batch BOTH merge-scoping oracles use — purchase div-5
    * rows (matched updates) plus their +1e9-id clones at value+1
    * (inserts) — and the one MERGE statement over it. Shared so the two
    * queries' fixtures and their recompute formula
    * ([[oracle.mergeScopeRecompute]]) can never silently diverge. */
  private def purchaseStagedBatch(ev: DataFrame): DataFrame = {
    val staged = ev.where(col("event_type") === "purchase" &&
      col("event_id") % 5 === 0)
    staged.unionByName(staged.select(
      (col("event_id") + 1000000000L).as("event_id"), col("ts"),
      col("user_id"), col("event_type"),
      (col("value") + 1.0d).as("value")))
  }

  private def mergeScopeStmt(tbl: String, srcView: String): String =
    s"""MERGE INTO $tbl t USING $srcView s
       |ON t.event_type = s.event_type AND t.event_id = s.event_id
       |WHEN MATCHED THEN UPDATE SET value = s.value * 3
       |WHEN NOT MATCHED THEN INSERT *""".stripMargin

  /** The file set the V2 scan will actually read, from the optimized plan
    * (plan-time only — nothing is executed). */
  private def scanFiles(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.scan
    }.map(GraftScans.innermost)
      .collect { case p: ParquetScan => p.fileIndex.inputFiles.toSeq }.flatten

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
    try {
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
      // materialize (small aggregate) so the finally can drop the table —
      // repeated Verify/Bench runs leave the shared warehouse size flat
      agg.withColumn("prune_ok", lit(pruneOk)).localCheckpoint(true)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  /** COLUMN STATISTICS driving cost-based join planning — the CBO
    * integration Iceberg feeds from Puffin NDV sketches and manifest
    * bounds ([[ColumnStatsReport]]). A padded dimension is CTAS'd with
    * its key HASH-spread across files (so file-level pruning cannot
    * shrink the `k < 20` scan — only ESTIMATION can), then the same
    * filtered join is planned twice against a broadcast threshold set
    * between the dimension's raw size and its filtered estimate:
    *
    *  - `spark.sql.cbo.enabled=true`: FilterEstimation reads the scan's
    *    reported min/max/rowCount, shrinks the filtered side under the
    *    threshold, and the PLANNED join is a broadcast-hash join;
    *  - CBO off: the filter keeps its child's size and the planner picks
    *    a sort-merge join.
    *
    * The `cbo_ok` verdict pins that flip (oracle TRUE): losing the
    * statistics feed fails the hash compare. At 100 TB this decision is
    * a broadcast versus a full shuffle of the fact side. */
  def cboBroadcastJoin(spark0: SparkSession, dir: String): DataFrame = {
    // planner-conf flips run on a CLONED session: Verify executes queries
    // concurrently on one SparkSession, and a shared-session cbo/threshold
    // flip mid-plan would randomly poison ANOTHER query's plan verdict.
    // The clone must also be the thread's ACTIVE session — SQLConf.get
    // (what .stats and planner rules read outside executePhase) resolves
    // through it, so without the pin the clone's conf flips are invisible
    // to the very estimates the verdict calibrates against.
    val spark = spark0.newSession()
    ensureCatalog(spark)
    val tbl = s"$Cat.q.${newName("cbo")}"
    // pin INSIDE the try window: a throw before the finally must not
    // leak the clone as the pool thread's active session
    val prevActive = SparkSession.getActiveSession
    SparkSession.setActiveSession(spark)
    try {
      Tables.events(spark, dir)
        .select((col("event_id") % 5000).cast("long").as("k")).distinct()
        .withColumn("pad", md5(col("k").cast("string")))
        .writeTo(tbl).create()

      val fact = eventsSlim(spark, dir)
        .withColumn("k", (col("event_id") % 5000).cast("long"))
      def planned(cbo: Boolean): DataFrame = {
        spark.conf.set("spark.sql.cbo.enabled", cbo.toString)
        fact.join(spark.table(tbl).where(col("k") < lit(20L)), "k")
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_events"), Dsl.dsum(col("value")).as("volume"))
      }
      def joinKinds(df: DataFrame): Seq[String] =
        df.queryExecution.sparkPlan.collect {
          case p if p.nodeName.contains("Join") => p.nodeName }
      // threshold between the dim's raw size and its ~0.4-2% filtered
      // estimate — only the statistics feed can cross it
      spark.conf.set("spark.sql.cbo.enabled", "false")
      val raw = spark.table(tbl).queryExecution.optimizedPlan.stats.sizeInBytes
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        math.max(raw.toLong / 4L, 1024L).toString)
      val withCbo = joinKinds(planned(cbo = true))
      val without = joinKinds(planned(cbo = false))
      val cboOk = withCbo.exists(_.contains("BroadcastHashJoin")) &&
        without.exists(_.contains("SortMergeJoin")) &&
        !without.exists(_.contains("BroadcastHashJoin"))
      planned(cbo = true).withColumn("cbo_ok", lit(cboOk)).localCheckpoint(true)
    } finally { // restore FIRST: a failing DROP must not leak the clone
      restoreActive(prevActive)
      scala.util.Try(spark.sql(s"DROP TABLE IF EXISTS $tbl"))
    }
  }

  /** HISTOGRAM statistics driving skewed-predicate selectivity — the
    * tier above [[cboBroadcastJoin]]'s NDV+bounds feed. A dimension with
    * a HEAVY-TAILED column is CTAS'd (99% of keys hold v < 100, 1%
    * spread over [100, ~10M) — hash-spread files, so only ESTIMATION can
    * shrink a `v >= 1000` scan), then the same filtered join is planned
    * twice WITH CBO ON both times:
    *
    *  - histograms on (commit-time KLL quantiles through
    *    `ColumnStatistics.histogram()`): FilterEstimation reads the
    *    equi-height bins, sees the tail is ~1%, and BROADCASTS the
    *    filtered side;
    *  - `spark.graft.stats.histogram=false`: min/max-only estimation
    *    interpolates the range UNIFORMLY — (10M-1000)/10M ≈ everything
    *    passes — and the planner keeps a sort-merge join.
    *
    * The `hist_ok` verdict pins the flip (oracle TRUE). At 100 TB a
    * skewed predicate mis-estimated by orders of magnitude is the
    * difference between broadcasting a few MB and shuffling the fact
    * table against a "filtered" side the size of the dimension. */
  def cboHistogramJoin(spark0: SparkSession, dir: String): DataFrame = {
    val spark = spark0.newSession() // conf isolation — see cboBroadcastJoin
    ensureCatalog(spark)
    val tbl = s"$Cat.q.${newName("hist")}"
    val prevActive = SparkSession.getActiveSession
    SparkSession.setActiveSession(spark)
    try {
      Tables.events(spark, dir)
        .select((col("event_id") % 5000).cast("long").as("k")).distinct()
        .withColumn("v",
          when(col("k") % 100 < 99, col("k") % 100)
            .otherwise(lit(100L) + (col("k") % 1000) * lit(9973L)))
        .withColumn("pad", md5(col("k").cast("string")))
        .writeTo(tbl).create()

      val fact = eventsSlim(spark, dir)
        .withColumn("k", (col("event_id") % 5000).cast("long"))
      spark.conf.set("spark.sql.cbo.enabled", "true")
      def planned(hist: Boolean): DataFrame = {
        if (hist) spark.conf.unset("spark.graft.stats.histogram")
        else spark.conf.set("spark.graft.stats.histogram", "false")
        fact.join(spark.table(tbl).where(col("v") >= lit(1000L)), "k")
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_events"), Dsl.dsum(col("value")).as("volume"))
      }
      def joinKinds(df: DataFrame): Seq[String] =
        df.queryExecution.sparkPlan.collect {
          case p if p.nodeName.contains("Join") => p.nodeName }
      // threshold between the histogram's ~1% tail estimate and the
      // uniform ~100% one — only the histogram can cross it
      val histSize = spark.table(tbl).where(col("v") >= lit(1000L))
        .queryExecution.optimizedPlan.stats.sizeInBytes
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        math.max(histSize.toLong * 8L, 1024L).toString)
      val withHist = joinKinds(planned(hist = true))
      val without = joinKinds(planned(hist = false))
      val histOk = withHist.exists(_.contains("BroadcastHashJoin")) &&
        without.exists(_.contains("SortMergeJoin")) &&
        !without.exists(_.contains("BroadcastHashJoin"))
      planned(hist = true).withColumn("hist_ok", lit(histOk)).localCheckpoint(true)
    } finally { // restore FIRST: a failing DROP must not leak the clone
      restoreActive(prevActive)
      scala.util.Try(spark.sql(s"DROP TABLE IF EXISTS $tbl"))
    }
  }

  /** SORT-ORDER metadata through the planner — Iceberg's
    * `write.sort-order` + preserve-data-grouping, the natural sequel to
    * [[spjJoin]]: two tables identity-partitioned on the join key and
    * DECLARED sorted on `ts` (`sort.order` table property — every pool
    * write sorts within each file and stamps the entry,
    * [[graft.sources.FileStats.SortKey]]) merge-join on
    * (key, ts) with ZERO exchanges AND ZERO sorts:
    *
    *  - storage-partitioned join elides the exchanges (the join keys are
    *    a superset of the partition key — sound co-partitioning, gated
    *    by `requireAllClusterKeysForCoPartition=false`);
    *  - `SupportsReportOrdering` (reported only when every key holds ONE
    *    stamped sorted file, planned whole-file — see
    *    [[VersionedScanBuilder.reportableOrdering]]) elides both SMJ
    *    sorts.
    *
    * The `sorted_ok` verdict pins the plan (oracle TRUE): a merge join
    * present, no Sort and no shuffle below it. At 100 TB this is two
    * co-located sorted fact tables joining with NEITHER a shuffle NOR a
    * sort — the plan a hand-tuned pipeline would stage manually. */
  def sortedMergeJoin(spark0: SparkSession, dir: String): DataFrame = {
    val spark = spark0.newSession() // conf isolation — see cboBroadcastJoin
    ensureCatalog(spark)
    val a = s"$Cat.q.${newName("smja")}"
    val b = s"$Cat.q.${newName("smjb")}"
    val prevActive = SparkSession.getActiveSession
    SparkSession.setActiveSession(spark)
    try {
      // both sides: 8 regions (identity partition), sorted on ts; the
      // hash write distribution lands one file per region
      def side(t: String, mult: Int): Unit =
        eventsSlim(spark, dir)
          .select((col("event_id") % 8).as("region"),
            ((col("event_id") * mult) % 10000).as("ts"), col("value"))
          .writeTo(t)
          .partitionedBy(col("region"))
          .tableProperty("sort.order", "ts")
          .create()
      side(a, 37)
      side(b, 61)
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
      val joined = spark.table(a)
        .join(spark.table(b).withColumnRenamed("value", "value_b"),
          Seq("region", "ts"))
        .groupBy(col("region"))
        .agg(count(lit(1)).as("n_pairs"),
          Dsl.dsum(col("value")).as("volume_a"),
          Dsl.dsum(col("value_b")).as("volume_b"))
      // finalize the adaptive plan, then audit the merge-join subtree
      joined.collect()
      val nodes = GraftScans.executedNodes(joined.queryExecution.executedPlan)
      val below = nodes.dropWhile(!_.nodeName.contains("SortMergeJoin"))
      val sortedOk = below.nonEmpty &&
        !below.exists(_.isInstanceOf[org.apache.spark.sql.execution.SortExec]) &&
        !below.exists(
          _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike])
      joined.withColumn("sorted_ok", lit(sortedOk)).localCheckpoint(true)
    } finally { // restore FIRST: a failing DROP must not leak the clone
      restoreActive(prevActive)
      scala.util.Try(spark.sql(s"DROP TABLE IF EXISTS $a"))
      scala.util.Try(spark.sql(s"DROP TABLE IF EXISTS $b"))
    }
  }

  /** Per-file column-stats pruning through the catalog: events are
    * range-clustered on `value` into a handful of files (CTAS with a
    * repartitionByRange, so each file covers a narrow value band and the
    * commit's footer-derived min/max stats are tight), then an aggregate
    * under a `value >= T` predicate runs. The `prune_ok` verdict asserts
    * — at PLAN time, from the scan's file listing — that stats pruning
    * dropped at least one file while keeping at least one (the oracle
    * pins it TRUE), so a stats regression fails the hash compare. This is
    * the non-partition-predicate file skipping the reference's tables get
    * from Iceberg manifests (`dags/2_bronze_to_silver.py:245-258`). */
  def statsPruneScan(spark: SparkSession, dir: String): DataFrame = {
    ensureCatalog(spark)
    val tbl = s"$Cat.q.${newName("sp")}"
    try {
      eventsSlim(spark, dir)
        .repartitionByRange(8, col("value"))
        .writeTo(tbl).create()

      val t = spark.table(tbl)
      val filtered = t.where(col("value") >= lit(50.0))
      val agg = filtered
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"), Dsl.dsum(col("value")).as("volume"))

      val prunedFiles = scanFiles(filtered)
      val allFiles = scanFiles(t)
      val pruneOk = prunedFiles.nonEmpty && prunedFiles.size < allFiles.size
      agg.withColumn("prune_ok", lit(pruneOk)).localCheckpoint(true)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  /** Hidden months(ts) partitioning through the catalog — the Iceberg
    * transform family beyond days (reference gold partitions by month,
    * `dags/3_silver_to_gold.py:193`). The testdata events all live in
    * January, so a deterministic six-month spread is synthesized from
    * event_id via make_timestamp (reproducible in DuckDB); the table is
    * CTAS'd PARTITIONED BY (months(mts)) and a two-month ts-range
    * aggregate runs. The verdict asserts, at plan time, that the scan's
    * file listing kept ONLY the two months' directories (oracle pins
    * TRUE). */
  def monthsPruneScan(spark: SparkSession, dir: String): DataFrame = {
    ensureCatalog(spark)
    val tbl = s"$Cat.q.${newName("mp")}"
    try {
      Tables.events(spark, dir)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
          expr("make_timestamp_ntz(2024, CAST(event_id % 6 + 1 AS INT), " +
            "CAST(event_id % 28 + 1 AS INT), CAST(event_id % 24 AS INT), " +
            "CAST(event_id % 60 AS INT), 0)").as("mts"))
        .writeTo(tbl)
        .partitionedBy(org.apache.spark.sql.functions.partitioning.months(col("mts")))
        .create()

      val t = spark.table(tbl)
      val windowed = t
        .where(col("mts") >= lit("2024-02-01 00:00:00").cast("timestamp_ntz")
          && col("mts") < lit("2024-04-01 00:00:00").cast("timestamp_ntz"))
      val agg = windowed
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"), Dsl.dsum(col("value")).as("volume"))

      val prunedFiles = scanFiles(windowed)
      val allFiles = scanFiles(t)
      val inRange = prunedFiles.forall { f =>
        val m = f.split("__part=")(1).take(7)
        m == "2024-02" || m == "2024-03"
      }
      val pruneOk = prunedFiles.nonEmpty && inRange &&
        prunedFiles.size < allFiles.size
      agg.withColumn("prune_ok", lit(pruneOk)).localCheckpoint(true)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  /** IDENTITY partition columns through CTAS — the reference gold's
    * `PARTITIONED BY (ano, mes)` shape. events are CTAS'd partitioned by
    * the identity column event_type (values live in directory names, not
    * files), an equality filter runs, and the verdict asserts the scan's
    * listing kept only that value's directory. The aggregate also proves
    * the partition values survive the directory round-trip. */
  def identityPartitionScan(spark: SparkSession, dir: String): DataFrame = {
    ensureCatalog(spark)
    val tbl = s"$Cat.q.${newName("ip")}"
    try {
      eventsSlim(spark, dir)
        .writeTo(tbl)
        .partitionedBy(col("event_type"))
        .create()

      val t = spark.table(tbl)
      val one = t.where(col("event_type") === "purchase")
      val agg = one
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"), Dsl.dsum(col("value")).as("volume"))

      val prunedFiles = scanFiles(one)
      val allFiles = scanFiles(t)
      val pruneOk = prunedFiles.nonEmpty &&
        prunedFiles.forall(_.contains("event_type=purchase")) &&
        prunedFiles.size < allFiles.size
      agg.withColumn("prune_ok", lit(pruneOk)).localCheckpoint(true)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  /** Merge-on-read DELETE through the catalog (Iceberg's
    * write.delete.mode=merge-on-read): events are CTAS'd across several
    * files, a scattered-row DELETE runs in merge-on-read mode, and the
    * `mor_ok` verdict asserts the commit REWROTE ZERO DATA FILES (the
    * data entry set is unchanged and a positional-delete entry appeared)
    * while the post-delete aggregate — read through the tombstone-
    * applying scan — matches the oracle's recompute. */
  def morDeleteScan(spark: SparkSession, dir: String): DataFrame = {
    ensureCatalog(spark)
    val short = newName("mor")
    val tbl = s"$Cat.q.$short"
    try {
      // the DML mode is a TABLE property (Iceberg's write.delete.mode
      // TBLPROPERTIES), never shared session state — concurrent queries
      // on other tables cannot flip this one's path mid-flight
      eventsSlim(spark, dir).repartition(4).writeTo(tbl)
        .tableProperty("write.delete.mode", "merge-on-read").create()
      val root = s"${spark.conf.get(s"spark.sql.catalog.$Cat.warehouse")}/q/$short"
      def dataRels = graft.sources.ManifestTable
        .liveEntries(root).map(_.rel)
        .filterNot(graft.sources.ManifestTable.isDeleteEntry)
      val before = dataRels.toSet

      graft.plans.MergeInto.sql(spark,
        s"DELETE FROM $tbl WHERE user_id % 10 = 3")

      val morOk = dataRels.toSet == before &&
        graft.sources.ManifestTable.hasDeletes(root)
      val agg = spark.table(tbl)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"), Dsl.dsum(col("value")).as("volume"))
      agg.withColumn("mor_ok", lit(morOk)).localCheckpoint(true)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  /** Merge-on-read MERGE through the catalog (Iceberg's
    * write.merge.mode=merge-on-read, declared as a TABLE property): the
    * even events are CTAS'd as the target, the div-3 events MERGE in —
    * conditional UPDATE, conditional DELETE, INSERT * — and the `mor_ok`
    * verdict asserts the commit REWROTE ZERO pre-merge data files (the
    * old entry set survives intact; rewritten+inserted rows land as NEW
    * files beside positional tombstones). The aggregate reads through
    * the tombstone-applying scan; the oracle recomputes the post-merge
    * state flat from the raw events. */
  def morMergeScan(spark: SparkSession, dir: String): DataFrame = {
    ensureCatalog(spark)
    val short = newName("mmg")
    val tbl = s"$Cat.q.$short"
    try {
      val ev = eventsSlim(spark, dir)
      ev.where(col("event_id") % 2 === 0).repartition(4).writeTo(tbl)
        .tableProperty("write.merge.mode", "merge-on-read").create()
      val root = s"${spark.conf.get(s"spark.sql.catalog.$Cat.warehouse")}/q/$short"
      val before = graft.sources.ManifestTable.liveEntries(root).map(_.rel)
        .filterNot(graft.sources.ManifestTable.isDeleteEntry).toSet

      ev.where(col("event_id") % 3 === 0).createOrReplaceTempView(s"${short}_src")
      graft.plans.MergeInto.sql(spark,
        s"""MERGE INTO $tbl t USING ${short}_src s ON t.event_id = s.event_id
           |WHEN MATCHED AND s.user_id % 2 = 0 THEN UPDATE SET value = s.value * 2
           |WHEN MATCHED THEN DELETE
           |WHEN NOT MATCHED THEN INSERT *
           |""".stripMargin)

      val after = graft.sources.ManifestTable.liveEntries(root).map(_.rel)
        .filterNot(graft.sources.ManifestTable.isDeleteEntry).toSet
      val morOk = before.subsetOf(after) && after.size > before.size &&
        graft.sources.ManifestTable.hasDeletes(root)
      spark.table(tbl)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"), Dsl.dsum(col("value")).as("volume"))
        .withColumn("mor_ok", lit(morOk)).localCheckpoint(true)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  /** Source-key runtime pruning of a MOR MERGE's target read (the r18
    * headline scale fix — the reference's own silver upsert is a small
    * staging batch MERGEd into an ever-growing Iceberg table every 12
    * minutes, `/root/reference/dags/2_bronze_to_silver.py:278-293`): the
    * full events land in an identity-partitioned MOR table, then a
    * staging batch touching ONE of the five event types (updates for its
    * div-5 rows, inserts with fresh ids) merges in. The merge's target
    * read prunes at the MANIFEST by the staging batch's join-key values
    * ([[graft.plans.MergeInto]] sourceKeyFilters → morRead), and the
    * `prune_ok` verdict asserts FROM THE EXECUTED PLAN (the scan file
    * set the merge's classification job actually opened, recorded per
    * root in `MergeInto.lastMergeScan`) that under half the live data
    * files were read. The aggregate reads the post-merge state through
    * the tombstone-applying scan; the oracle recomputes it flat — so the
    * hash gate proves pruning changed NOTHING about the result, only the
    * files paid for. At 100 TB this is the difference between a
    * touched-partition read and a full-table read per MERGE. */
  def morMergePrune(spark: SparkSession, dir: String): DataFrame = {
    ensureCatalog(spark)
    val short = newName("mmp")
    val tbl = s"$Cat.q.$short"
    try {
      val ev = eventsSlim(spark, dir)
      ev.repartition(3).writeTo(tbl)
        .partitionedBy(col("event_type"))
        .tableProperty("write.merge.mode", "merge-on-read")
        .create()
      val root = s"${spark.conf.get(s"spark.sql.catalog.$Cat.warehouse")}/q/$short"
      purchaseStagedBatch(ev).createOrReplaceTempView(s"${short}_src")
      graft.plans.MergeInto.sql(spark, mergeScopeStmt(tbl, s"${short}_src"))
      val (opened, total) = Option(graft.plans.MergeInto.lastMergeScan.get(root))
        .getOrElse((Long.MaxValue, 0L))
      val pruneOk = opened > 0 && total > 0 && opened * 2 <= total
      spark.table(tbl).groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"), Dsl.dsum(col("value")).as("volume"))
        .withColumn("prune_ok", lit(pruneOk)).localCheckpoint(true)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  /** Copy-on-write MERGE scoped to the MATCHED identity keys — the CoW
    * twin of [[morMergePrune]] (same reference shape: a small staging
    * batch into a partitioned table): the full events land in an
    * identity-partitioned table with DEFAULT (copy-on-write) DML modes,
    * a staging batch touching ONE of the five event types merges in, and
    * the `scope_ok` verdict asserts from the MANIFEST that every
    * untouched key kept its EXACT pre-merge file set (only the matched
    * key's partition rewrote) while the aggregate hash-matches DuckDB's
    * flat recompute. At 100 TB this keeps the default-mode MERGE's
    * rewrite cost proportional to the touched partitions, not the
    * table. */
  def cowMergeKeyscope(spark: SparkSession, dir: String): DataFrame = {
    ensureCatalog(spark)
    val short = newName("cks")
    val tbl = s"$Cat.q.$short"
    try {
      val ev = eventsSlim(spark, dir)
      ev.repartition(3).writeTo(tbl).partitionedBy(col("event_type")).create()
      val root = s"${spark.conf.get(s"spark.sql.catalog.$Cat.warehouse")}/q/$short"
      def relsByKey: Map[String, Set[String]] =
        graft.sources.ManifestTable.liveEntries(root).map(_.rel)
          .groupBy(graft.sources.ManifestTable.keyOf)
          .map { case (k, v) => k -> v.toSet }
      val before = relsByKey
      purchaseStagedBatch(ev).createOrReplaceTempView(s"${short}_src")
      graft.plans.MergeInto.sql(spark, mergeScopeStmt(tbl, s"${short}_src"))
      val after = relsByKey
      val touched = "event_type=purchase"
      val scopeOk = before.keySet.filterNot(_ == touched)
        .forall(k => after.get(k).contains(before(k))) &&
        after.get(touched).exists(_ != before(touched))
      spark.table(tbl).groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"), Dsl.dsum(col("value")).as("volume"))
        .withColumn("scope_ok", lit(scopeOk)).localCheckpoint(true)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  /** Copy-on-write MERGE on a DAY-partitioned table with a BOUNDED
    * discovery probe — the r19 close of the verdict's last full-table
    * read on the MERGE path: events land day-partitioned (days(ts),
    * default CoW modes), a staging batch confined to TWO days merges in,
    * and the probe that discovers the touched days pre-filters its
    * target side by the batch's join-key values
    * ([[graft.plans.MergeInto]] sourceKeyPredicate), which the manifest
    * per-file stats pruning answers. `dayscope_ok` asserts BOTH halves:
    * from the EXECUTED probe plan (`lastMergeScan`) that under half the
    * live files were opened for discovery, and from the MANIFEST that
    * every untouched day carried its exact pre-merge file set. The
    * aggregate hash-matches DuckDB's flat recompute, so the scoping
    * changed nothing about the result — only the files paid for. At
    * 100 TB this is the reference's every-12-minutes silver upsert NOT
    * paying two full-table joins per statement. */
  def cowMergeDayscope(spark: SparkSession, dir: String): DataFrame = {
    ensureCatalog(spark)
    val short = newName("cds")
    val tbl = s"$Cat.q.$short"
    try {
      val ev = eventsSlim(spark, dir)
      ev.repartition(3).writeTo(tbl)
        .partitionedBy(org.apache.spark.sql.functions.partitioning.days(col("ts")))
        .create()
      val root = s"${spark.conf.get(s"spark.sql.catalog.$Cat.warehouse")}/q/$short"
      def relsByDay: Map[String, Set[String]] =
        graft.sources.ManifestTable.liveEntries(root).map(_.rel)
          .groupBy(graft.sources.ManifestTable.keyOf)
          .map { case (k, v) => k -> v.toSet }
      val before = relsByDay
      // staged batch confined to days 10-11: purchase div-5 rows
      // (matched updates) plus +1e9-id clones at the SAME ts (inserts
      // landing in the same two days)
      val inWin = col("ts") >= lit("2024-01-10").cast("timestamp_ntz") &&
        col("ts") < lit("2024-01-12").cast("timestamp_ntz")
      val staged0 = ev.where(col("event_type") === "purchase" &&
        col("event_id") % 5 === 0 && inWin)
      staged0.unionByName(staged0.select(
          (col("event_id") + 1000000000L).as("event_id"), col("ts"),
          col("user_id"), col("event_type"),
          (col("value") + 1.0d).as("value")))
        .createOrReplaceTempView(s"${short}_src")
      graft.plans.MergeInto.sql(spark,
        s"""MERGE INTO $tbl t USING ${short}_src s
           |ON t.event_id = s.event_id AND t.ts = s.ts
           |WHEN MATCHED THEN UPDATE SET value = s.value * 3
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      val (opened, total) = Option(graft.plans.MergeInto.lastMergeScan.get(root))
        .getOrElse((Long.MaxValue, 0L))
      val probeOk = opened > 0 && total > 0 && opened * 2 <= total
      val after = relsByDay
      // the staged batch's ACTUAL day set (deterministic source): at tiny
      // SFs the 2-day window may hold rows of only one day, and a day no
      // row touches must CARRY, not churn — hard-coding both days made
      // the verdict wrong at sf0.001, not the engine
      val touched = staged0.select(to_date(col("ts")).cast("string")).distinct()
        .collect().map(r => s"__day=${r.getString(0)}").toSet
      val scopeOk = before.keySet.filterNot(touched).forall(k =>
          after.get(k).contains(before(k))) &&
        touched.forall(k => after.get(k).exists(_ != before.getOrElse(k, Set.empty)))
      spark.table(tbl).groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"), Dsl.dsum(col("value")).as("volume"))
        .withColumn("dayscope_ok", lit(probeOk && scopeOk)).localCheckpoint(true)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  /** Per-row CDF through a change-preserving day-scoped CoW MERGE — the
    * copy-on-write twin of `cdf_update_images` (r19): a day-partitioned
    * table with `changefeed.cow=true` takes a scoped MERGE whose clauses
    * update, DELETE and insert, and the change feed window from the
    * pre-merge version serves EXACT per-row events (update pre/post
    * pairs, true deletes, true inserts) — rows no clause fired on and
    * untouched days emit NOTHING, so feed volume follows the touched
    * rows (Delta CDC's contract) even though the commit physically
    * REPLACED whole partitions. The very act of reading from v1 proves
    * the change-preserving horizon (a plain replace would refuse); the
    * oracle recomputes every event class flat from the raw events. */
  def cdfCowMerge(spark: SparkSession, dir: String): DataFrame = {
    ensureCatalog(spark)
    val short = newName("ccm")
    val tbl = s"$Cat.q.$short"
    try {
      val ev = eventsSlim(spark, dir)
      ev.repartition(3).writeTo(tbl)
        .partitionedBy(org.apache.spark.sql.functions.partitioning.days(col("ts")))
        .tableProperty("changefeed.cow", "true")
        .create()                                                         // v1
      val root = s"${spark.conf.get(s"spark.sql.catalog.$Cat.warehouse")}/q/$short"
      val v1 = graft.sources.ManifestTable.currentVersion(root).get
      val inWin = col("ts") >= lit("2024-01-10").cast("timestamp_ntz") &&
        col("ts") < lit("2024-01-12").cast("timestamp_ntz")
      val staged0 = ev.where(col("event_type") === "purchase" &&
        col("event_id") % 5 === 0 && inWin)
      staged0.unionByName(staged0.select(
          (col("event_id") + 1000000000L).as("event_id"), col("ts"),
          col("user_id"), col("event_type"),
          (col("value") + 1.0d).as("value")))
        .createOrReplaceTempView(s"${short}_src")
      graft.plans.MergeInto.sql(spark,
        s"""MERGE INTO $tbl t USING ${short}_src s
           |ON t.event_id = s.event_id AND t.ts = s.ts
           |WHEN MATCHED AND s.event_id % 10 = 0 THEN DELETE
           |WHEN MATCHED THEN UPDATE SET value = s.value * 3
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)               // v2
      spark.read.option("fromVersion", v1.toString).table(s"$tbl.changes")
        .groupBy(col("_change_type").as("change_type"))
        .agg(count(lit(1)).as("n_events"), Dsl.dsum(col("value")).as("volume"))
        .localCheckpoint(true)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  /** Deletes-only maintenance as an oracle-gated query — Iceberg's
    * `rewrite_position_delete_files` procedure shape: two scattered-row
    * MOR DELETEs leave two positional delete files; `CALL
    * rewrite_deletes` merges them into ONE without rewriting any data
    * file, and `tbl.deletes` (the delete-backlog metadata table)
    * reflects the shrink. The `rw_ok` verdict asserts the data entry set
    * is untouched, the backlog went 2 → 1 (procedure result row and
    * manifest agree), and the metadata table reports the one merged
    * positional file; the aggregate re-reads through the merged
    * tombstones and must match the oracle's recompute of BOTH deletes. */
  def rewriteDeletesScan(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.ManifestTable
    ensureCatalog(spark)
    val short = newName("rwd")
    val tbl = s"$Cat.q.$short"
    try {
      eventsSlim(spark, dir).repartition(4).writeTo(tbl)
        .tableProperty("write.delete.mode", "merge-on-read").create()
      val root = s"${spark.conf.get(s"spark.sql.catalog.$Cat.warehouse")}/q/$short"
      def dataRels = ManifestTable.liveEntries(root).map(_.rel)
        .filterNot(ManifestTable.isDeleteEntry)
      val before = dataRels.toSet

      graft.plans.MergeInto.sql(spark, s"DELETE FROM $tbl WHERE user_id % 10 = 3")
      graft.plans.MergeInto.sql(spark, s"DELETE FROM $tbl WHERE user_id % 10 = 7")
      val delBefore = ManifestTable.liveDeleteEntries(root).size
      val res = spark
        .sql(s"CALL $Cat.system.rewrite_deletes(`table` => 'q.$short')")
        .collect()(0)
      val delAfter = ManifestTable.liveDeleteEntries(root).size
      val metaDel = spark.table(s"$tbl.deletes").collect()

      val rwOk = dataRels.toSet == before &&
        delBefore == 2 && delAfter == 1 &&
        res.getLong(1) == 2L && res.getLong(2) == 1L &&
        metaDel.length == 1 && metaDel(0).getString(1) == "positional"
      val agg = spark.table(tbl)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"), Dsl.dsum(col("value")).as("volume"))
      agg.withColumn("rw_ok", lit(rwOk)).localCheckpoint(true)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  /** EQUALITY-delete retraction through the catalog — Iceberg v2's
    * equality deletes, the shape a CDC/Flink writer emits when it cannot
    * know row positions: every event of a retracted user_id cohort is
    * deleted by KEY (no data read, no positions computed), then half the
    * cohort's rows are RE-APPENDED — the commit-sequence scoping must let
    * the newer rows survive the older delete. The `eq_ok` verdict asserts
    * the delete commit rewrote ZERO data files and an equality-delete
    * entry appeared; the aggregate reads through the V2 scan (whose
    * projection lacks the key column — exercising the widen-and-project
    * path) and the oracle recomputes the retraction + re-insert from the
    * raw events. */
  def eqDeleteScan(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.ManifestTable
    ensureCatalog(spark)
    val short = newName("eqd")
    val tbl = s"$Cat.q.$short"
    try {
      val ev = eventsSlim(spark, dir)
      ev.repartition(4).writeTo(tbl).create()                        // seq 1
      val root = s"${spark.conf.get(s"spark.sql.catalog.$Cat.warehouse")}/q/$short"
      def dataRels = ManifestTable.liveEntries(root).map(_.rel)
        .filterNot(ManifestTable.isDeleteEntry)
      val before = dataRels.toSet

      val keys = ev.where(col("user_id") % 10 === 3)
        .select(col("user_id")).distinct()
      ManifestTable.appendEqualityDeletes(keys, root)                // seq 2
      val eqOk = dataRels.toSet == before &&
        ManifestTable.liveDeleteEntries(root)
          .exists(e => ManifestTable.isEqDeleteEntry(e.rel))

      ev.where(col("user_id") % 10 === 3 && col("event_id") % 2 === 0)
        .writeTo(tbl).append()                                       // seq 3

      val agg = spark.table(tbl)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"), Dsl.dsum(col("value")).as("volume"))
      agg.withColumn("eq_ok", lit(eqOk)).localCheckpoint(true)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  /** Partition SPEC EVOLUTION as an oracle-gated query (Iceberg's
    * per-snapshot partition specs): the table starts `days(ts)`,
    * `CALL evolve_partition` switches it to `months(ts)` with a
    * descriptor write only, and the post-cutoff events append under the
    * NEW layout while the old files keep theirs. A ts-window spanning
    * the cutoff then runs; the verdict asserts — at plan time — that the
    * scan kept only in-window `__day=` dirs plus the window's `__part=`
    * month, that BOTH layouts contributed files, and that pruning
    * removed out-of-window days. The oracle recomputes from the raw
    * events — evolution must be invisible in the data. */
  def specEvolutionScan(spark: SparkSession, dir: String): DataFrame = {
    ensureCatalog(spark)
    val short = newName("pe")
    val tbl = s"$Cat.q.$short"
    try {
      val ev = eventsSlim(spark, dir)
      val cutoff = lit(TtCutoff).cast("timestamp_ntz")
      ev.where(col("ts") < cutoff)
        .writeTo(tbl)
        .partitionedBy(org.apache.spark.sql.functions.partitioning.days(col("ts")))
        .create()
      spark.sql(s"CALL $Cat.system.evolve_partition(`table` => 'q.$short', " +
        "spec => 'months(ts)')")
      ev.where(col("ts") >= cutoff).writeTo(tbl).append()

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
      val okDirs = prunedFiles.forall { f =>
        if (f.contains("__day=")) {
          val day = f.split("__day=")(1).take(10)
          day >= fromDay && day <= untilDay
        } else if (f.contains("__part=")) {
          f.split("__part=")(1).take(7) == fromDay.take(7)
        } else false
      }
      val bothLayouts = prunedFiles.exists(_.contains("__day=")) &&
        prunedFiles.exists(_.contains("__part="))
      val pruneOk = prunedFiles.nonEmpty && okDirs && bothLayouts &&
        prunedFiles.size < allFiles.size
      agg.withColumn("prune_ok", lit(pruneOk)).localCheckpoint(true)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  /** Metadata-only TYPE WIDENING as an oracle-gated query: the table is
    * created with an INT id column off the even events, `ALTER COLUMN …
    * TYPE BIGINT` widens it with a descriptor write and nothing else, and
    * the odd events append values BEYOND the int range. The aggregate
    * reads INT32 files and INT64 files through one BIGINT schema (the
    * vectorized readers promote natively); the oracle recomputes from the
    * raw events — evolution must be invisible in the data. */
  def typeWideningScan(spark: SparkSession, dir: String): DataFrame = {
    ensureCatalog(spark)
    val tbl = s"$Cat.q.${newName("tw")}"
    try {
      val ev = eventsSlim(spark, dir)
      ev.where(col("event_id") % 2 === 0)
        .select((col("event_id") % 1000000).cast("int").as("id"),
          col("event_type"), col("value"))
        .writeTo(tbl).create()
      spark.sql(s"ALTER TABLE $tbl ALTER COLUMN id TYPE BIGINT")
      ev.where(col("event_id") % 2 === 1)
        .select((col("event_id") % 1000000 + 3000000000L).as("id"),
          col("event_type"), col("value"))
        .writeTo(tbl).append()

      spark.table(tbl)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"), sum(col("id")).as("id_sum"),
          Dsl.dsum(col("value")).as("volume"))
        .localCheckpoint(true)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  /** TIER-2 type widening as an oracle-gated query — the Iceberg v3
    * `ALTER COLUMN TYPE` decimal matrix: a DECIMAL(9,0) column widens to
    * DECIMAL(20,0) (precision growth at fixed scale) and an INT id to
    * DECIMAL(10,0), both metadata-only; the second generation appends
    * values only the wide types can hold. The aggregate reads the narrow
    * (INT32/decimal-as-int) and wide generations through one declared
    * schema — the vectorized readers promote natively — and the decimal
    * sums are pinned as STRINGS so the oracle compares exact values, not
    * engine-specific result precisions. */
  def typeWideningDecimalScan(spark: SparkSession, dir: String): DataFrame = {
    ensureCatalog(spark)
    val tbl = s"$Cat.q.${newName("twd")}"
    try {
      val ev = eventsSlim(spark, dir)
      ev.where(col("event_id") % 2 === 0)
        .select(col("event_type"),
          (col("event_id") % 1000000).cast("int").as("id"),
          (col("event_id") % 100000).cast("decimal(9,0)").as("amt"),
          col("value"))
        .writeTo(tbl).create()
      spark.sql(s"ALTER TABLE $tbl ALTER COLUMN amt TYPE DECIMAL(20,0)")
      spark.sql(s"ALTER TABLE $tbl ALTER COLUMN id TYPE DECIMAL(10,0)")
      ev.where(col("event_id") % 2 === 1)
        .select(col("event_type"),
          (col("event_id") % 1000000 + 3000000000L).cast("decimal(10,0)").as("id"),
          (col("event_id") % 100000 + 1000000000000000L).cast("decimal(20,0)").as("amt"),
          col("value"))
        .writeTo(tbl).append()

      spark.table(tbl)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("id")).cast("string").as("id_sum"),
          sum(col("amt")).cast("string").as("amt_sum"),
          Dsl.dsum(col("value")).as("volume"))
        .localCheckpoint(true)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  /** Runtime filtering — dynamic partition pruning through the catalog
    * (Iceberg's SparkBatchQueryScan shape): events land in an
    * identity-partitioned fact table, the dim side is a REAL source with
    * a selective filter (two of five event types), and the star join's
    * fact scan must narrow its FILE LISTING at runtime from the dim's key
    * set — no static predicate on the fact side at all. The `dpp_ok`
    * verdict asserts, from the EXECUTED plan, that the runtime-filtered
    * scan read under half the live files; the aggregate rides through the
    * oracle's recompute. At 100 TB this is the difference between a full
    * fact scan and reading only the joinable partitions. */
  def runtimePruneJoin(spark: SparkSession, dir: String): DataFrame = {
    ensureCatalog(spark)
    val short = newName("rpj")
    val tbl = s"$Cat.q.$short"
    try {
      eventsSlim(spark, dir)
        .writeTo(tbl).partitionedBy(col("event_type")).create()
      val root = s"${spark.conf.get(s"spark.sql.catalog.$Cat.warehouse")}/q/$short"
      val totalFiles = graft.sources.ManifestTable.liveEntries(root).size

      val dim = Tables.events(spark, dir)
        .select(col("event_type").as("et")).distinct()
        .where(col("et").isin("purchase", "view"))
      val joined = spark.table(tbl)
        .join(org.apache.spark.sql.functions.broadcast(dim),
          col("event_type") === col("et"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"), Dsl.dsum(col("value")).as("volume"))
      val out = joined.localCheckpoint(true) // executes the join

      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def scansOf(p: SparkPlan): Seq[org.apache.spark.sql.connector.read.Scan] = p match {
        case a: AdaptiveSparkPlanExec => scansOf(a.executedPlan)
        case _ => p.collect {
          case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => Seq(b.scan)
          case q: QueryStageExec => scansOf(q.plan)
          case a: AdaptiveSparkPlanExec => scansOf(a.executedPlan)
        }.flatten
      }
      val scannedFiles = scansOf(joined.queryExecution.executedPlan)
        .collect { case w: GraftRuntimeFilterScan => GraftScans.innermost(w) }
        .collect { case p: ParquetScan => p.fileIndex.inputFiles.length }.sum
      val dppOk = scannedFiles > 0 && scannedFiles * 2 <= totalFiles
      out.withColumn("dpp_ok", lit(dppOk))
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  /** Storage-partitioned join — two versioned tables identity-partitioned
    * by `event_type` (the raw events and a per-type total) joined and
    * re-aggregated ON the partition column, with broadcast disabled so the
    * join would otherwise sort-merge. Each scan reports
    * KeyGroupedPartitioning with one input partition per key, so
    * EnsureRequirements elides BOTH join exchanges and the post-join
    * aggregate's — the `spj_ok` verdict asserts, from the EXECUTED plan,
    * that zero shuffles ran. At 100 TB this is a co-partitioned fact join
    * with no data movement at all. */
  def spjJoin(spark0: SparkSession, dir: String): DataFrame = {
    val spark = spark0.newSession() // conf isolation — see cboBroadcastJoin
    ensureCatalog(spark)
    val ta = s"$Cat.q.${newName("spja")}"
    val tb = s"$Cat.q.${newName("spjb")}"
    val confs = Seq("spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prevActive = SparkSession.getActiveSession
    SparkSession.setActiveSession(spark)
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      eventsSlim(spark, dir).writeTo(ta).partitionedBy(col("event_type")).create()
      Tables.events(spark, dir).groupBy(col("event_type"))
        .agg(count(lit(1)).as("type_total"))
        .writeTo(tb).partitionedBy(col("event_type")).create()
      val joined = spark.table(ta).join(spark.table(tb), "event_type")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"), Dsl.dsum(col("value")).as("volume"),
          max(col("type_total")).as("type_total"))
      val out = joined.localCheckpoint(true) // executes the join
      val spjOk = GraftScans.executedNodes(joined.queryExecution.executedPlan)
        .count(_.isInstanceOf[
          org.apache.spark.sql.execution.exchange.ShuffleExchangeLike]) == 0
      out.withColumn("spj_ok", lit(spjOk))
    } finally { // restore FIRST: a failing DROP must not leak the clone
      restoreActive(prevActive)
      scala.util.Try(spark.sql(s"DROP TABLE IF EXISTS $ta"))
      scala.util.Try(spark.sql(s"DROP TABLE IF EXISTS $tb"))
    }
  }

  /** Streaming read of a versioned table — the commit log as the stream:
    * events land in the table across TWO commits, a micro-batch stream
    * (`readStream.table`, AvailableNow) consumes the appended files per
    * version window, and the streamed rows aggregate per event type. The
    * oracle recomputes the same aggregate flat over events, so the hash
    * gate proves the stream delivered every appended row exactly once.
    * At 100 TB each trigger's cost follows the NEW data, never the
    * table. */
  def streamVersionedRead(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    ensureCatalog(spark)
    val tbl = s"$Cat.q.${newName("strv")}"
    val mem = "stream_vread_" + newName("m").replace(".", "_")
    try {
      val ev = eventsSlim(spark, dir)
      ev.where(col("event_id") % 2 === 0).writeTo(tbl).create()
      ev.where(col("event_id") % 2 === 1).writeTo(tbl).append()
      val q = spark.readStream.table(tbl)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"), Dsl.dsum(col("value")).as("volume"))
        .writeStream
        .trigger(Trigger.AvailableNow())
        .format("memory").queryName(mem)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete())
        .start()
      q.awaitTermination()
      spark.table(mem).localCheckpoint(true)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  /** Metadata-only aggregates — an unfiltered COUNT(*)/COUNT(col)/MIN/MAX
    * over the versioned table answers from the manifest's per-file row
    * counts and exact bounds ([[AggPushdown]]); the `agg_meta_ok` verdict
    * asserts the EXECUTED plan used the one-row GraftAggScan (zero data
    * files opened), and the oracle recomputes every value flat. At 100 TB
    * this is count(*) in milliseconds instead of a full scan. */
  def aggPushdownScan(spark: SparkSession, dir: String): DataFrame = {
    ensureCatalog(spark)
    val tbl = s"$Cat.q.${newName("aggp")}"
    try {
      eventsSlim(spark, dir).repartition(6).writeTo(tbl).create()
      val agg = spark.table(tbl).agg(
        count(lit(1)).as("n_rows"),
        count(col("user_id")).as("n_users_nonnull"),
        min(col("event_id")).as("min_id"), max(col("event_id")).as("max_id"),
        min(col("value")).as("min_value"), max(col("value")).as("max_value"))
      val out = agg.localCheckpoint(true)
      val metaOnly = agg.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
      }.exists(_.description().startsWith("GraftAggScan["))
      out.withColumn("agg_meta_ok", lit(metaOnly))
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  /** Partition-GROUPED metadata-only aggregates: GROUP BY the identity
    * partition column answers from per-directory manifest stats — each
    * directory pins its group value exactly and the per-file row counts
    * and bounds fold within it; the executed plan is the rows-scan
    * (`GraftAggScan`), zero data files opened. At 100 TB this is a
    * per-partition rollup in milliseconds. The `agg_meta_ok` verdict
    * asserts the plan; the oracle recomputes every group flat. */
  def aggPushdownGroupScan(spark: SparkSession, dir: String): DataFrame = {
    ensureCatalog(spark)
    val tbl = s"$Cat.q.${newName("aggg")}"
    try {
      eventsSlim(spark, dir).writeTo(tbl).partitionedBy(col("event_type")).create()
      val agg = spark.table(tbl).groupBy(col("event_type")).agg(
        count(lit(1)).as("n_rows"),
        min(col("event_id")).as("min_id"), max(col("event_id")).as("max_id"),
        min(col("value")).as("min_value"), max(col("value")).as("max_value"))
      val out = agg.localCheckpoint(true)
      val metaOnly = agg.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
      }.exists(_.description().startsWith("GraftAggScan["))
      out.withColumn("agg_meta_ok", lit(metaOnly))
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  /** HIDDEN-TRANSFORM grouped metadata-only aggregates: GROUP BY a
    * day-derived key (`to_date(ts)`) over a days(ts)-partitioned table
    * answers from per-file manifest stats. No directory value is trusted
    * (dir names carry the WRITER's zone) — instead each file's ts bounds
    * are cast to dates in the reader's session zone, and cast-to-date is
    * monotone, so bounds collapsing to one date pin every row of the
    * file. Hidden-day layouts pin by construction; the executed plan is
    * the rows-scan (`GraftAggScan`), zero data files opened. The
    * `agg_meta_ok` verdict asserts the plan; the oracle recomputes every
    * day flat. */
  def aggPushdownDayScan(spark: SparkSession, dir: String): DataFrame = {
    ensureCatalog(spark)
    val tbl = s"$Cat.q.${newName("aggd")}"
    try {
      eventsSlim(spark, dir).writeTo(tbl)
        .partitionedBy(org.apache.spark.sql.functions.partitioning.days(col("ts")))
        .create()
      val agg = spark.table(tbl).groupBy(to_date(col("ts")).as("day")).agg(
        count(lit(1)).as("n_rows"),
        min(col("event_id")).as("min_id"), max(col("event_id")).as("max_id"),
        min(col("value")).as("min_value"), max(col("value")).as("max_value"))
      val out = agg.localCheckpoint(true)
      val metaOnly = agg.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
      }.exists(_.description().startsWith("GraftAggScan["))
      out.withColumn("agg_meta_ok", lit(metaOnly))
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  /** TRUNCATE-transform grouped metadata-only aggregates: GROUP BY an
    * anchored string prefix (`substring(col, 1, w)`) over a
    * truncate(w, col)-partitioned table answers from per-file manifest
    * stats — prefixes are monotone under string order, so a file whose
    * min/max share the w-prefix pins every row, and truncate layouts pin
    * by construction. The `agg_meta_ok` verdict asserts the executed
    * plan is the metadata rows-scan (`GraftAggScan`, zero data files
    * opened); the oracle recomputes every prefix group flat. */
  def aggPushdownPrefixScan(spark: SparkSession, dir: String): DataFrame = {
    ensureCatalog(spark)
    val tbl = s"$Cat.q.${newName("aggp")}"
    try {
      spark.sql(s"CREATE TABLE $tbl (p_partkey BIGINT, p_brand STRING, " +
        "p_retailprice DOUBLE) PARTITIONED BY (truncate(7, p_brand))")
      graft.Tables.part(spark, dir)
        .select(col("p_partkey"), col("p_brand"), col("p_retailprice"))
        .writeTo(tbl).append()
      val agg = spark.table(tbl)
        .groupBy(substring(col("p_brand"), 1, 7).as("brand_prefix"))
        .agg(count(lit(1)).as("n_parts"),
          min(col("p_partkey")).as("min_key"), max(col("p_partkey")).as("max_key"),
          min(col("p_retailprice")).as("min_price"),
          max(col("p_retailprice")).as("max_price"))
      val out = agg.localCheckpoint(true)
      val metaOnly = agg.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
      }.exists(_.description().startsWith("GraftAggScan["))
      out.withColumn("agg_meta_ok", lit(metaOnly))
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  /** Catalog SQL VIEWS ([[graft.plans.Views]]): a filtered projection
    * view with COLUMN ALIASES is created over the events table, a
    * second view AGGREGATES through the first (nesting — each read
    * re-resolves lazily against current table state), and the query
    * selects through both. The oracle recomputes the whole lineage flat
    * from events, so the hash gate proves definition storage, alias
    * application, and nested expansion are all exact. */
  def catalogViewAgg(spark: SparkSession, dir: String): DataFrame = {
    ensureCatalog(spark)
    val tbl = s"$Cat.q.${newName("vwt")}"
    val vw = s"$Cat.q.${newName("vw")}"
    val vw2 = s"$Cat.q.${newName("vwa")}"
    try {
      eventsSlim(spark, dir).writeTo(tbl).create()
      graft.plans.MergeInto.sql(spark,
        s"CREATE VIEW $vw (etype, val) AS " +
          s"SELECT event_type, value FROM $tbl WHERE user_id % 10 <> 3")
      graft.plans.MergeInto.sql(spark,
        s"CREATE VIEW $vw2 AS SELECT etype, COUNT(*) AS n_events, " +
          s"${Dsl.sql.dsum("val")} AS volume FROM $vw GROUP BY etype")
      graft.plans.MergeInto.sql(spark,
        s"SELECT etype AS event_type, n_events, volume FROM $vw2")
        .localCheckpoint(true)
    } finally {
      graft.plans.MergeInto.sql(spark, s"DROP VIEW IF EXISTS $vw2")
      graft.plans.MergeInto.sql(spark, s"DROP VIEW IF EXISTS $vw")
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
    }
  }

  /** Native streaming SINK — `writeStream.toTable` on a versioned table:
    * the events parquet streams in via the file source, every epoch's
    * task files land through the engine's STREAMING_WRITE (staged
    * parquet → one manifest commit with the epoch marker), and the
    * committed table aggregates per event type. The oracle recomputes
    * flat from events, so the hash gate proves the sink delivered every
    * row exactly once. */
  def streamTableSink(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    ensureCatalog(spark)
    val tbl = s"$Cat.q.${newName("stws")}"
    val checkpoint = java.nio.file.Files.createTempDirectory("graft_stws_ck").toString
    try {
      spark.sql(s"""CREATE TABLE $tbl
                    (event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT,
                     event_type STRING, value DOUBLE)""")
      val schema = spark.read.parquet(s"$dir/events.parquet").schema
      val q = spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir)
        .select(col("event_id"),
          expr(graft.Tables.tsNormExpr(schema("ts").dataType)).as("ts"),
          col("user_id"), col("event_type"), col("value"))
        .writeStream
        .option("checkpointLocation", checkpoint)
        .trigger(Trigger.AvailableNow())
        .toTable(tbl)
      q.awaitTermination()
      spark.table(tbl)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"), Dsl.dsum(col("value")).as("volume"))
        .localCheckpoint(true)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  /** Iceberg-style column defaults, metadata-only (`ADD COLUMN ... DEFAULT`):
    * three file generations of one table — written BEFORE the ADD (reads the
    * pinned initial default), written with explicit values, and written by an
    * INSERT omitting the defaulted columns after `SET DEFAULT` moved the
    * write default — aggregated by the defaulted columns, so each
    * generation's default behavior lands in its own oracle-checked group.
    * No data file is read or rewritten by any of the DDLs: old files simply
    * lack the columns physically and Spark's readers substitute the
    * EXISTS_DEFAULT at scan time. */
  def columnDefaultsScan(spark: SparkSession, dir: String): DataFrame = {
    ensureCatalog(spark)
    val short = newName("cd")
    val tbl = s"$Cat.q.$short"
    try {
      val ev = eventsSlim(spark, dir)
      ev.where(col("event_id") % 2 === 0)
        .select(col("event_id"), col("event_type"), col("value"))
        .writeTo(tbl).create()
      spark.sql(s"ALTER TABLE $tbl ADD COLUMN region STRING DEFAULT 'emea'")
      spark.sql(s"ALTER TABLE $tbl ADD COLUMN boost INT DEFAULT 7")
      ev.where(col("event_id") % 4 === 1)
        .select(col("event_id"), col("event_type"), col("value"),
          lit("apac").as("region"), lit(3).as("boost"))
        .writeTo(tbl).append()
      spark.sql(s"ALTER TABLE $tbl ALTER COLUMN boost SET DEFAULT 11")
      ev.where(col("event_id") % 4 === 3)
        .select(col("event_id"), col("event_type"), col("value"))
        .createOrReplaceTempView(s"${short}_stage")
      spark.sql(
        s"INSERT INTO $tbl (event_id, event_type, value) SELECT * FROM ${short}_stage")
      spark.table(tbl)
        .groupBy(col("region"), col("boost"))
        .agg(count(lit(1)).as("n_events"), Dsl.dsum(col("value")).as("volume"))
        .localCheckpoint(true)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  /** Metadata tables (`tbl.files` / `tbl.snapshots` / `tbl.partitions` —
    * Iceberg's inspection surface) as an oracle-gated query: a
    * day-partitioned table of events is CTAS'd and the `meta_ok` verdict
    * cross-checks every metadata relation against the PHYSICAL truth —
    * `.files` row count and byte total against a direct filesystem
    * listing of the manifest, `.snapshots`' current version against the
    * pointer, `.partitions`' directory set against the live day set. The
    * data aggregate rides along so the hash compare also proves the
    * metadata surface didn't disturb normal reads. */
  def filesMetadataScan(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.{ManifestTable, MetaIO}
    ensureCatalog(spark)
    val short = newName("fm")
    val tbl = s"$Cat.q.$short"
    try {
      eventsSlim(spark, dir)
        .writeTo(tbl)
        .partitionedBy(org.apache.spark.sql.functions.partitioning.days(col("ts")))
        .create()
      val root = s"${spark.conf.get(s"spark.sql.catalog.$Cat.warehouse")}/q/$short"

      val entries = ManifestTable.liveEntries(root)
      val physCount = entries.size.toLong
      val physBytes = entries.map(e => MetaIO.size(s"$root/data/${e.rel}")).sum

      val files = spark.table(s"$tbl.files")
      val fRow = files.agg(count(lit(1)), sum(col("size_bytes"))).collect()(0)
      val filesOk = fRow.getLong(0) == physCount && fRow.getLong(1) == physBytes &&
        files.where(col("is_delete_file")).count() == 0

      val snapsOk = spark.table(s"$tbl.snapshots")
        .where(col("is_current")).select(col("version")).collect()
        .map(_.getLong(0)).toSeq == ManifestTable.currentVersion(root).toSeq

      val partsOk = spark.table(s"$tbl.partitions")
        .select(col("partition")).collect().map(_.getString(0)).toSet ==
        ManifestTable.liveDays(root).map(d => s"${ManifestTable.DayCol}=$d")

      spark.table(tbl)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_events"), Dsl.dsum(col("value")).as("volume"))
        .withColumn("meta_ok", lit(filesOk && snapsOk && partsOk))
        .localCheckpoint(true)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
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
    try {
      val ev = eventsSlim(spark, dir)
      val cutoff = lit(TtCutoff).cast("timestamp_ntz")
      ev.where(col("ts") < cutoff).writeTo(tbl).create()           // v1
      ev.where(col("ts") >= cutoff).writeTo(tbl).append()          // v2

      def snap(v: Int): DataFrame =
        spark.sql(s"SELECT * FROM $tbl VERSION AS OF $v")
          .agg(count(lit(1)).as("n_rows"), Dsl.dsum(col("value")).as("total_value"))
          .select(lit(v).as("snapshot"), col("n_rows"), col("total_value"))
      snap(1).unionAll(snap(2)).localCheckpoint(true)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  /** Named-ref time travel through SQL — Iceberg's tags/branches in
    * `VERSION AS OF`: snapshot 1 is tagged `baseline` via the CALL
    * surface, snapshot 2 appends the rest and a branch `audit` is created
    * at the live head. Both refs are then read BY NAME through Spark's
    * own time-travel resolution (string literals route to the catalog's
    * ref lookup; all-digit literals stay snapshot ids), and the oracle
    * recomputes each ref's snapshot from the raw events. The tag also
    * pins snapshot 1 against retention GC — a swept manifest would fail
    * the read outright. */
  def tagTimeTravel(spark: SparkSession, dir: String): DataFrame = {
    ensureCatalog(spark)
    val short = newName("tg")
    val tbl = s"$Cat.q.$short"
    try {
      val ev = eventsSlim(spark, dir)
      val cutoff = lit(TtCutoff).cast("timestamp_ntz")
      ev.where(col("ts") < cutoff).writeTo(tbl).create()           // v1
      spark.sql(s"CALL $Cat.system.create_tag(`table` => 'q.$short', name => 'baseline')")
      ev.where(col("ts") >= cutoff).writeTo(tbl).append()          // v2
      spark.sql(s"CALL $Cat.system.create_branch(`table` => 'q.$short', name => 'audit')")

      def snap(ref: String): DataFrame =
        spark.sql(s"SELECT * FROM $tbl VERSION AS OF '$ref'")
          .agg(count(lit(1)).as("n_rows"), Dsl.dsum(col("value")).as("total_value"))
          .select(lit(ref).as("ref"), col("n_rows"), col("total_value"))
      snap("baseline").unionAll(snap("audit")).localCheckpoint(true)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
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
    try {

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
    // materialized so the finally can reclaim both table roots
    Versioned.read(spark, goldRoot).localCheckpoint(true)
    } finally {
      graft.sources.MetaIO.delete(silverRoot, recursive = true)
      graft.sources.MetaIO.delete(goldRoot, recursive = true)
    }
  }

  /** Exact-typed columns of the cross-format checksum (same discipline as
    * [[graft.sources.Formats.formatIntegrityCheck]]: no doubles in a
    * cross-system checksum). */
  private val FanoutCols = Seq("l_orderkey", "l_partkey", "l_suppkey",
    "l_linenumber", "l_returnflag", "l_linestatus", "l_shipdate")

  /** "Same data, three formats, one catalog" — the reference's
    * raison d'être (`dags/2_bronze_to_silver.py:164,245-248`: every table
    * written per format, format parametrized per table) lifted to CATALOG
    * tables: lineitem is CTAS'd into three versioned catalog tables, one
    * per storage format (`USING parquet|orc|avro` routes the manifest's
    * data files), read back through `spark.table` — i.e. through the V2
    * scan of each leg — and checksummed order-independently. The oracle
    * recomputes the checksum from the source parquet and pins
    * `formats_match` TRUE, so a single corrupted value in any leg's
    * write or read path fails the hash compare. */
  def catalogFormatFanout(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    import graft.operators.Dedup
    ensureCatalog(spark)
    val src = graft.Tables.lineitem(spark, dir).select(FanoutCols.map(col): _*)
    val fmts = Seq("parquet", "orc", "avro")
    val tbls = fmts.map(f => f -> s"$Cat.q.${newName(s"ff_$f")}").toMap
    try {
      // the three CTAS legs are independent (distinct tables, one shared
      // immutable source): run them as concurrent jobs so each leg's
      // write/commit tail back-fills the others' idle cores (guide §2.6 —
      // actions are only sequential because driver code calls them
      // sequentially). Spark's scheduler is thread-safe; Verify already
      // drives this session from a 4-thread pool.
      val pool = java.util.concurrent.Executors.newFixedThreadPool(fmts.size)
      try {
        import scala.concurrent.{Await, ExecutionContext, Future}
        implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
        Await.result(
          Future.sequence(fmts.map(f => Future {
            src.writeTo(tbls(f)).using(f).create()
          })),
          scala.concurrent.duration.Duration(10, "min"))
      } finally pool.shutdown()

      def checksum(df: DataFrame, tag: String): DataFrame = df
        .select(Dedup.md5Long(
          concat_ws("|", FanoutCols.map(c => col(c).cast("string")): _*)).as("h"))
        .agg(count(lit(1)).as(s"${tag}_rows"),
          sum(col("h").cast(DecimalType(38, 0))).cast("string").as(s"${tag}_sum"))

      val legs = fmts.map(f => checksum(spark.table(tbls(f)), f))
        .reduce(_ crossJoin _)
      val out = legs.select(
        col("parquet_rows").as("n_rows"), col("parquet_sum").as("checksum"),
        (col("parquet_rows") === col("orc_rows") && col("orc_rows") === col("avro_rows")
          && col("parquet_sum") === col("orc_sum") && col("orc_sum") === col("avro_sum"))
          .as("formats_match"))
      // materialize BEFORE the finally drops the tables (one tiny row)
      out.localCheckpoint(true)
    } finally tbls.values.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  /** Metadata-only RENAME COLUMN as an oracle-gated query: a
    * day-partitioned catalog table of pre-cutoff events is created, BOTH
    * the partition-source timestamp and the value column are renamed
    * (descriptor write only — the reference documents rename as an
    * Iceberg headline capability, `README.md:332-340`), the post-cutoff
    * rows are appended under the NEW logical names, and the aggregate
    * runs through the renamed columns with a ts-range filter that still
    * prunes at the manifest. Old files (physical names) and new files
    * must both resolve; the oracle recomputes from the raw events. */
  def renamedColumnScan(spark: SparkSession, dir: String): DataFrame = {
    ensureCatalog(spark)
    val tbl = s"$Cat.q.${newName("rn")}"
    val cutoff = lit(TtCutoff).cast("timestamp_ntz")
    val ev = eventsSlim(spark, dir)
    try {
      ev.where(col("ts") < cutoff)
        .writeTo(tbl)
        .partitionedBy(org.apache.spark.sql.functions.partitioning.days(col("ts")))
        .create()
      spark.sql(s"ALTER TABLE $tbl RENAME COLUMN value TO amount")
      spark.sql(s"ALTER TABLE $tbl RENAME COLUMN ts TO event_ts")
      ev.where(col("ts") >= cutoff)
        .withColumnRenamed("value", "amount").withColumnRenamed("ts", "event_ts")
        .writeTo(tbl).append()

      val out = spark.table(tbl)
        .where(col("event_ts") >= lit(PruneFrom).cast("timestamp_ntz")
          && col("event_ts") < lit(PruneUntil).cast("timestamp_ntz"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"), Dsl.dsum(col("amount")).as("total_amount"))
      out.localCheckpoint(true)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  /** `MERGE WITH SCHEMA EVOLUTION` as an oracle-gated query: the target
    * starts WITHOUT the source's `n_orders` column; the evolving merge
    * adds it metadata-only (the same descriptor write ALTER TABLE uses),
    * updates matched customers and inserts unmatched ones. The oracle
    * recomputes the post-merge state with explicit join algebra — the
    * evolution must be invisible in the data. */
  def mergeSchemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    ensureCatalog(spark)
    val tbl = s"$Cat.q.${newName("se")}"
    val sName = newName("se_src")
    try {
      graft.Tables.customer(spark, dir)
        .where(col("c_custkey") % 3 =!= 0)
        .select(col("c_custkey"), col("c_acctbal"))
        .writeTo(tbl).create()
      // the source key shares the target's name: evolution adds every
      // source column the target lacks, and only n_orders should be new
      graft.Tables.orders(spark, dir)
        .groupBy(col("o_custkey").as("c_custkey"))
        .agg(count(lit(1)).as("n_orders"))
        .createOrReplaceTempView(sName)
      graft.plans.MergeInto.sql(spark,
        s"""MERGE WITH SCHEMA EVOLUTION INTO $tbl t
           |USING $sName s ON t.c_custkey = s.c_custkey
           |WHEN MATCHED THEN UPDATE SET n_orders = s.n_orders
           |WHEN NOT MATCHED THEN INSERT (c_custkey, c_acctbal, n_orders)
           |  VALUES (s.c_custkey, CAST(0.0 AS DOUBLE), s.n_orders)
           |""".stripMargin)
      spark.table(tbl).localCheckpoint(true)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      spark.catalog.dropTempView(sName)
    }
  }

  /** The SQL CALL maintenance surface as an oracle-gated query: a
    * day-partitioned catalog table is built FRAGMENTED (two interleaved
    * halves, ≥2 files per day), `CALL cat.system.optimize` packs it with
    * a z-order clustering, and the same ts-windowed aggregate runs over
    * the packed layout. The oracle recomputes from the raw events and
    * pins `files_packed` TRUE — maintenance must change the layout and
    * NOTHING else. */
  def callOptimizeScan(spark: SparkSession, dir: String): DataFrame = {
    ensureCatalog(spark)
    val short = newName("opt")
    val tbl = s"$Cat.q.$short"
    try {
      val ev = eventsSlim(spark, dir)
      ev.where(col("event_id") % 2 === 0)
        .writeTo(tbl)
        .partitionedBy(org.apache.spark.sql.functions.partitioning.days(col("ts")))
        .create()
      ev.where(col("event_id") % 2 === 1).writeTo(tbl).append()
      val root = s"${spark.conf.get(s"spark.sql.catalog.$Cat.warehouse")}/q/$short"
      val before = graft.sources.ManifestTable
        .manifest(root, graft.sources.ManifestTable.currentVersion(root).get).size

      spark.sql(s"CALL $Cat.system.optimize(`table` => 'q.$short', " +
        "zorder_by => 'user_id,value')")

      val after = graft.sources.ManifestTable
        .manifest(root, graft.sources.ManifestTable.currentVersion(root).get).size
      val out = spark.table(tbl)
        .where(col("ts") >= lit(PruneFrom).cast("timestamp_ntz")
          && col("ts") < lit(PruneUntil).cast("timestamp_ntz"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"), Dsl.dsum(col("value")).as("volume"))
        .withColumn("files_packed", lit(after < before))
      out.localCheckpoint(true)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  /** Chunked OPTIMIZE on an IDENTITY layout as an oracle-gated query —
    * the reference's gold tables are identity-partitioned (`ano, mes`),
    * and at 100 TB their rewrite needs the same resumable
    * partial-progress commits the day layout has. Three fragmented
    * appends land 3 files per event_type key; `CALL optimize(max_commits
    * => 3, max_concurrent_rewrites => 2)` compacts per KEY through the
    * key-replace path. `chunk_ok` pins: exactly 3 independent commits
    * landed, every key compacted to ONE file, and identity pruning still
    * fires post-rewrite (a one-key filter opens exactly one file). The
    * aggregate is the oracle's flat recompute. */
  def callOptimizeIdentityScan(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.ManifestTable
    ensureCatalog(spark)
    val short = newName("opk")
    val tbl = s"$Cat.q.$short"
    try {
      val ev = eventsSlim(spark, dir)
      (0 until 3).foreach { b =>
        val part = ev.where(col("event_id") % 3 === b)
        if (b == 0)
          part.writeTo(tbl).partitionedBy(col("event_type")).create()
        else part.writeTo(tbl).append()
      }
      val root = s"${spark.conf.get(s"spark.sql.catalog.$Cat.warehouse")}/q/$short"
      def perKey = ManifestTable.liveEntries(root)
        .groupBy(e => e.rel.split('/').dropRight(1).mkString("/"))
      val fragmented = perKey.values.forall(_.size == 3)
      val v0 = ManifestTable.currentVersion(root).get

      val vEnd = spark.sql(s"CALL $Cat.system.optimize(`table` => 'q.$short', " +
        "max_commits => 3, max_concurrent_rewrites => 2)")
        .collect()(0).getLong(0)

      val compacted = perKey.values.forall(_.size == 1)
      val pruned = scanFiles(spark.table(tbl)
        .where(col("event_type") === "purchase")).size == 1
      // 1..max_commits independent commits: the byte-greedy packer may
      // legally emit FEWER chunks than max_commits for near-equal key
      // sizes — pin the contract, not the fixture's packing accident
      val chunkOk = fragmented && vEnd > v0 && vEnd <= v0 + 3 &&
        compacted && pruned
      spark.table(tbl)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"), Dsl.dsum(col("value")).as("volume"))
        .withColumn("chunk_ok", lit(chunkOk)).localCheckpoint(true)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  /** Rollback (Delta RESTORE / Iceberg `rollback_to_snapshot`) as an
    * oracle-gated query: two good appends build the table, a
    * contaminating append and a copy-on-write DELETE then damage it, and
    * `CALL rollback_to_version` restores the good snapshot as a NEW
    * commit — pure metadata, no data file read or rewritten, which is
    * what makes recovering a 100 TB table a one-manifest operation. The
    * final aggregate equals the flat recompute over ALL events (the
    * oracle); `rb_ok` pins the mechanics: the procedure reports
    * (damaged head, restored target, new head) with the new head ABOVE
    * the damaged one, history stays addressable (`VERSION AS OF` the
    * damaged snapshot still reads its contaminated count), and the
    * rollback stamped the change horizon so a change feed can never
    * silently replay rows the rollback un-inserted. */
  def rollbackScan(spark: SparkSession, dir: String): DataFrame = {
    ensureCatalog(spark)
    val short = newName("rb")
    val tbl = s"$Cat.q.$short"
    try {
      val ev = eventsSlim(spark, dir)
      ev.where(col("event_id") % 2 === 0).writeTo(tbl).create()          // v1
      spark.sql(s"ALTER TABLE $tbl SET TBLPROPERTIES('retain'='10')")
      ev.where(col("event_id") % 2 === 1).writeTo(tbl).append()          // v2
      val root = s"${spark.conf.get(s"spark.sql.catalog.$Cat.warehouse")}/q/$short"
      val good = graft.sources.ManifestTable.currentVersion(root).get
      val goodCount = spark.table(tbl).count()
      ev.where(col("event_id") % 100 === 7)                              // damage:
        .withColumn("value", -col("value") * 1000)                       //  bad append
        .writeTo(tbl).append()
      graft.plans.MergeInto.sql(spark,                                   //  CoW delete
        s"DELETE FROM $tbl WHERE user_id % 5 = 0")
      val damagedV = graft.sources.ManifestTable.currentVersion(root).get
      val damagedCount = spark.table(tbl).count()

      val r = spark.sql(s"CALL $Cat.system.rollback_to_version(" +
        s"`table` => 'q.$short', version => $good)").collect()(0)
      val newV = r.getLong(2)
      val restored = r.getLong(0) == damagedV && r.getLong(1) == good &&
        newV > damagedV && spark.table(tbl).count() == goodCount
      val histOk = spark.sql(
        s"SELECT COUNT(*) AS n FROM $tbl VERSION AS OF $damagedV")
        .collect()(0).getLong(0) == damagedCount
      val horizonOk = graft.sources.ManifestTable.liveProps(root)
        .get(graft.sources.ManifestTable.ChangeProp).exists(_.toLong == newV)
      spark.table(tbl)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"), Dsl.dsum(col("value")).as("volume"))
        .withColumn("rb_ok", lit(restored && histOk && horizonOk))
        .localCheckpoint(true)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  /** Table integrity check (FSCK) as an oracle-gated query: a
    * merge-on-read DELETE leaves the table in its churned shape (data
    * files + a deletion-vector entry), `CALL fsck` then verifies the
    * live snapshot's physical invariants — distributed file-existence
    * probe, DV index decode, sequence sanity — without reading data.
    * `fsck_ok` pins a healthy verdict with the expected entry counts;
    * the aggregate (and its oracle) prove the checked table still
    * answers queries exactly. */
  def fsckScan(spark: SparkSession, dir: String): DataFrame = {
    ensureCatalog(spark)
    val short = newName("fsk")
    val tbl = s"$Cat.q.$short"
    try {
      eventsSlim(spark, dir).repartition(4).writeTo(tbl)
        .tableProperty("write.delete.mode", "merge-on-read").create()
      graft.plans.MergeInto.sql(spark,
        s"DELETE FROM $tbl WHERE user_id % 10 = 3")
      val r = spark.sql(s"CALL $Cat.system.fsck(`table` => 'q.$short')")
        .collect()(0)
      val ok = r.getBoolean(8) && r.getLong(3) == 0 && r.getLong(6) == 0 &&
        r.getLong(1) >= 4 && r.getLong(2) >= 1
      spark.table(tbl)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"), Dsl.dsum(col("value")).as("volume"))
        .withColumn("fsck_ok", lit(ok))
        .localCheckpoint(true)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  /** SHALLOW CLONE (Delta's `CREATE TABLE … SHALLOW CLONE`) as an
    * oracle-gated query: a day-partitioned source clones by METADATA
    * ONLY (`clone_ok` pins the zero-copy mechanics — the clone's own
    * pool is empty right after the CALL, and a day-filtered scan of the
    * pure-ext clone still opens a strict subset of the files, so every
    * pruning tier survives the external references), then DIVERGES: an
    * append lands in the clone's local pool and a merge-on-read DELETE
    * tombstones rows of the SOURCE-pooled files — while the source's
    * own count never moves. The final aggregate (insert ∪ clone − the
    * deleted cohort) is what the oracle recomputes flat. */
  def cloneScan(spark: SparkSession, dir: String): DataFrame = {
    ensureCatalog(spark)
    val short = newName("cls")
    val src = s"$Cat.q.$short"
    val dst = s"$Cat.q.${short}_c"
    try {
      val ev = eventsSlim(spark, dir)
      // write.delete.mode rides the source's TBLPROPERTIES and CARRIES
      // through the clone (cloneTable copies the meta verbatim) — the
      // clone's MOR DELETE below needs no session-conf mutation
      ev.where(col("event_id") % 3 =!= 0).writeTo(src)
        .partitionedBy(org.apache.spark.sql.functions.partitioning.days(col("ts")))
        .tableProperty("write.delete.mode", "merge-on-read")
        .create()
      val srcCount = spark.table(src).count()
      spark.sql(s"CALL $Cat.system.clone(source => 'q.$short', " +
        s"target => 'q.${short}_c')")
      val wh = spark.conf.get(s"spark.sql.catalog.$Cat.warehouse")
      val dstRoot = s"$wh/q/${short}_c"
      // zero-copy: right after the CALL the clone's pool holds NO files
      val emptyPool = !graft.sources.MetaIO.exists(s"$dstRoot/data") ||
        graft.sources.MetaIO.listFilesRec(s"$dstRoot/data").isEmpty
      // pruning over pure-ext entries: a one-day window opens fewer
      // files than the full table (both plan-time only)
      val allFiles = scanFiles(spark.table(dst)).size
      val dayFiles = scanFiles(spark.table(dst).where(
        col("ts") >= lit(PruneFrom).cast("timestamp") &&
          col("ts") < lit(PruneUntil).cast("timestamp"))).size
      val pruned = dayFiles > 0 && dayFiles < allFiles
      // divergence: local append + merge-on-read delete on the clone
      // (mode inherited from the source's table property)…
      ev.where(col("event_id") % 3 === 0).writeTo(dst).append()
      graft.plans.MergeInto.sql(spark,
        s"DELETE FROM $dst WHERE user_id % 7 = 2")
      // …while the source never moves
      val isolated = spark.table(src).count() == srcCount
      spark.table(dst)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"), Dsl.dsum(col("value")).as("volume"))
        .withColumn("clone_ok", lit(emptyPool && pruned && isolated))
        .localCheckpoint(true)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $dst")
      spark.sql(s"DROP TABLE IF EXISTS $src")
    }
  }

  /** Writer-side bloom filters as an oracle-gated query: a table
    * declared `bloom.columns=user_id,event_type` row-group-filters a
    * point lookup on an ABSENT in-range key to ZERO candidates —
    * min/max stats cannot claim that (the probe value sorts inside
    * every file's bounds), only the exact structures the declaration
    * buys: the writer bloom, or the dictionary when parquet judges it
    * smaller and keeps it instead (small dictionaries subsume blooms —
    * the bloom-specifically path is pinned by BloomColumnsSpec and the
    * ScaleBench point on cardinalities where a dictionary cannot
    * survive). `bloom_ok` runs parquet-mr's own row-group filtering per
    * pool file; the aggregate is the oracle's flat recompute of a
    * PRESENT key's lookup. */
  def bloomPointScan(spark: SparkSession, dir: String): DataFrame = {
    ensureCatalog(spark)
    val short = newName("blm")
    val tbl = s"$Cat.q.$short"
    try {
      spark.sql(s"CREATE TABLE $tbl (event_id BIGINT, ts TIMESTAMP_NTZ, " +
        "user_id BIGINT, event_type STRING, value DOUBLE) " +
        "TBLPROPERTIES('bloom.columns'='user_id,event_type', 'bloom.ndv'='100000')")
      eventsSlim(spark, dir).repartition(4).writeTo(tbl).append()
      val root = s"${spark.conf.get(s"spark.sql.catalog.$Cat.warehouse")}/q/$short"
      val conf = spark.sparkContext.hadoopConfiguration
      // 'evseznt' sorts INSIDE [click, view] at every scale factor, so
      // stats keep the row group and only bloom/dictionary can drop it
      val pred = org.apache.parquet.filter2.predicate.FilterApi.eq(
        org.apache.parquet.filter2.predicate.FilterApi.binaryColumn("event_type"),
        org.apache.parquet.io.api.Binary.fromString("evseznt"))
      val files = graft.sources.ManifestTable.liveEntries(root)
      val bloomOk = files.nonEmpty && files.forall { e =>
        val (cand, total) = graft.sources.ParquetProbe.filteredCount(
          new org.apache.hadoop.fs.Path(s"$root/data/${e.rel}"), conf, pred)
        cand == 0L && total > 0L
      }
      spark.table(tbl)
        .where(col("user_id") === 7L) // pushed equality: the lookup shape
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"), Dsl.dsum(col("value")).as("volume"))
        .withColumn("bloom_ok", lit(bloomOk))
        .localCheckpoint(true)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  /** Cherry-pick (Iceberg's `cherrypick_snapshot`) as an oracle-gated
    * query — the selective half of write-audit-publish: a WAP branch
    * stages an audited append AND a junk append; `CALL
    * cherrypick_snapshot` republishes only the audited one onto main as
    * a pure-metadata commit (files re-referenced, never read). The final
    * main aggregate equals the flat recompute over base ∪ audited cohort
    * (the oracle — junk never published); `ck_ok` pins the mechanics:
    * the new commit lands above the branch head, the branch itself never
    * moves, and a second cherry-pick of the same commit declines loudly
    * instead of doubling rows. */
  def cherrypickScan(spark: SparkSession, dir: String): DataFrame = {
    ensureCatalog(spark)
    val short = newName("ck")
    val tbl = s"$Cat.q.$short"
    try {
      val ev = eventsSlim(spark, dir)
      ev.where(col("event_id") % 2 === 0).writeTo(tbl).create()          // main v1
      spark.sql(s"ALTER TABLE $tbl SET TBLPROPERTIES('retain'='10')")
      val root = s"${spark.conf.get(s"spark.sql.catalog.$Cat.warehouse")}/q/$short"
      spark.sql(s"CALL $Cat.system.create_branch(`table` => 'q.$short', " +
        "name => 'audit')")
      // spark.graft.write.branch is SESSION-scoped; queries run
      // concurrently on one session (Verify's pool), so the staging
      // writes go through a CLONED session — the conf never exists on
      // the shared one, and a parallel query's commit can't be hijacked
      // onto the audit branch
      val wap = spark.newSession()
      ensureCatalog(wap) // fresh session state: re-register the catalog
      wap.conf.set("spark.graft.write.branch", "audit")
      val evW = eventsSlim(wap, dir)
      evW.where(col("event_id") % 4 === 1).writeTo(tbl).append()         // audited
      val audited = graft.sources.ManifestTable.resolveRef(root, "audit").version
      evW.where(col("event_id") % 4 === 3)                               // junk —
        .withColumn("value", -col("value") * 1000)                       //  never
        .writeTo(tbl).append()                                           //  published
      val stagedHead = graft.sources.ManifestTable.resolveRef(root, "audit").version

      val r = spark.sql(s"CALL $Cat.system.cherrypick_snapshot(" +
        s"`table` => 'q.$short', version => $audited)").collect()(0)
      val picked = r.getLong(0) == audited && r.getLong(1) > stagedHead &&
        graft.sources.ManifestTable.resolveRef(root, "audit").version == stagedHead
      val dupDeclined = scala.util.Try(spark.sql(
        s"CALL $Cat.system.cherrypick_snapshot(" +
          s"`table` => 'q.$short', version => $audited)").collect())
        .failed.toOption.exists(_.getMessage.contains("already present"))
      spark.table(tbl)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"), Dsl.dsum(col("value")).as("volume"))
        .withColumn("ck_ok", lit(picked && dupDeclined))
        .localCheckpoint(true)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  /** Change data feed as an oracle-gated query — Delta CDF / Iceberg
    * changelog shape (`tbl.changes`): events land across two append
    * commits, a merge-on-read DELETE retracts a cohort, and the change
    * relation is aggregated per (change type, event type). The `cv_ok`
    * verdict asserts row-level provenance: every insert carries one of
    * the two append versions and every delete the DELETE's version. The
    * oracle recomputes inserts (all events) and deletes (the cohort)
    * flat. */
  def tableChangesScan(spark: SparkSession, dir: String): DataFrame = {
    ensureCatalog(spark)
    val tbl = s"$Cat.q.${newName("cdf")}"
    try {
      val ev = eventsSlim(spark, dir)
      ev.where(col("event_id") % 2 === 0).repartition(3).writeTo(tbl)
        .tableProperty("write.delete.mode", "merge-on-read").create()          // v1
      ev.where(col("event_id") % 2 === 1).writeTo(tbl).append()                // v2
      graft.plans.MergeInto.sql(spark, s"DELETE FROM $tbl WHERE user_id % 10 = 3") // v3
      val ch = spark.table(s"$tbl.changes")
      val vers = ch.select(col("_change_type"), col("_commit_version"))
        .distinct().collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val cvOk = vers == Set(("insert", 1L), ("insert", 2L), ("delete", 3L))
      ch.groupBy(col("_change_type"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), Dsl.dsum(col("value")).as("volume"))
        .withColumn("cv_ok", lit(cvOk)).localCheckpoint(true)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  /** Streaming change feed maintaining a downstream GOLD aggregate under
    * upstream MERGE-shaped churn — the incremental pattern the plain
    * append-only stream must refuse: the first run snapshots the table
    * into a stateful per-type aggregate (signed counts/sums over
    * insert/delete events); a merge-on-read UPDATE then doubles a
    * cohort's values WITHOUT rewriting data files, and the restarted
    * stream consumes only the row-level change events, folding them into
    * the checkpointed state. The oracle recomputes the post-update
    * aggregate flat — a hash match proves the incremental maintenance is
    * exact. */
  def streamCdfGold(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    ensureCatalog(spark)
    val tbl = s"$Cat.q.${newName("cdfg")}"
    val mem = "stream_cdf_" + newName("m").replace(".", "_")
    val checkpoint = java.nio.file.Files.createTempDirectory("graft_cdfg_ck").toString
    try {
      eventsSlim(spark, dir).writeTo(tbl)
        .tableProperty("write.update.mode", "merge-on-read").create()       // v1
      def drain(): Unit = {
        // row births (+): inserts and update postimages; row deaths (−):
        // deletes and update preimages — the four-valued CDF contract
        val birth = col("_change_type").isin("insert", "update_postimage")
        val signedN = when(birth, 1).otherwise(-1)
        val signedV = when(birth, col("value")).otherwise(-col("value"))
        val q = spark.readStream.table(s"$tbl.changes")
          .groupBy(col("event_type"))
          .agg(sum(signedN).cast("bigint").as("n_events"),
            sum(Dsl.money(signedV)).cast("double").as("volume"))
          .writeStream
          .option("checkpointLocation", checkpoint)
          .trigger(Trigger.AvailableNow())
          .format("memory").queryName(mem)
          .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete())
          .start()
        q.awaitTermination()
      }
      drain() // initial snapshot into the aggregate state
      graft.plans.MergeInto.sql(spark,
        s"UPDATE $tbl SET value = value * 2 WHERE user_id % 10 = 3")        // v2
      drain() // only the change events stream; state folds them in
      spark.table(mem).localCheckpoint(true)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  /** CDF update pre/post images — Delta CDF's four-valued `_change_type`
    * contract: a merge-on-read UPDATE (one atomic tombstone+rewrite
    * commit) surfaces its old rows as `update_preimage` and its
    * rewritten rows as `update_postimage`, both at the update's version,
    * so SCD2/audit consumers get old→new pairing without a
    * within-version self-join. The `img_ok` verdict asserts row-level
    * provenance: inserts only at the create version, both image types
    * only at the update's, and NO plain delete events at all. The oracle
    * recomputes all three cohorts flat. */
  def cdfUpdateImages(spark: SparkSession, dir: String): DataFrame = {
    ensureCatalog(spark)
    val tbl = s"$Cat.q.${newName("cdfu")}"
    try {
      eventsSlim(spark, dir).repartition(3).writeTo(tbl)
        .tableProperty("write.update.mode", "merge-on-read").create()       // v1
      graft.plans.MergeInto.sql(spark,
        s"UPDATE $tbl SET value = value * 2 WHERE user_id % 10 = 3")        // v2
      val ch = spark.table(s"$tbl.changes")
      val vers = ch.select(col("_change_type"), col("_commit_version"))
        .distinct().collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val imgOk = vers == Set(("insert", 1L),
        ("update_preimage", 2L), ("update_postimage", 2L))
      ch.groupBy(col("_change_type"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), Dsl.dsum(col("value")).as("volume"))
        .withColumn("img_ok", lit(imgOk)).localCheckpoint(true)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  /** SCD2 dimension maintained INCREMENTALLY from CDF update images —
    * the end-to-end consumer of the four-valued change feed
    * ([[graft.gold.Scd2]]): a customer dimension is snapshotted into
    * all-current rows, then a merge-on-read UPDATE (preimage/postimage
    * pair) closes-and-reopens the touched keys' intervals and a
    * merge-on-read DELETE closes without a reopen, each consumed as
    * row-level change events through the streaming checkpoint — never a
    * flat recompute. The oracle recomputes the full SCD2 table flat from
    * the raw customers, so the hash match proves interval chaining,
    * attribute versioning, and current-row maintenance are all exact. */
  def streamScd2Gold(spark: SparkSession, dir: String): DataFrame = {
    ensureCatalog(spark)
    val src = s"$Cat.q.${newName("s2src")}"
    val tgt = s"$Cat.q.${newName("s2dim")}"
    val ck = java.nio.file.Files.createTempDirectory("graft_scd2_ck").toString
    try {
      // stats.ndv=false on BOTH fixtures: the documented write-mostly
      // opt-out (r18 bisect — the fused sketch tier taxed each of the
      // query's six small commits ~0.15 s, ~1 s of the whole query, for
      // statistics nothing here reads; a per-batch-rewritten SCD2
      // dimension is exactly the write-mostly shape the table-level
      // opt-out exists for)
      graft.Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
        .writeTo(src)
        .tableProperty("write.update.mode", "merge-on-read")
        .tableProperty("write.delete.mode", "merge-on-read")
        .tableProperty("stats.ndv", "false")
        .create()                                                           // v1
      // the dimension is UNPARTITIONED, so a CoW MERGE rewrites the whole
      // table every micro-batch — merge-on-read turns each batch into
      // tombstones + appended rows, cost following the touched keys
      spark.sql(s"CREATE TABLE $tgt (c_custkey BIGINT, c_mktsegment STRING, " +
        "c_acctbal DOUBLE, valid_from BIGINT, valid_to BIGINT, is_current BOOLEAN) " +
        "TBLPROPERTIES ('stats.ndv'='false')")
      def drain(): Unit = graft.gold.Scd2.maintain(spark, src, tgt,
        Seq("c_custkey"), Seq("c_mktsegment", "c_acctbal"), ck)
      drain() // initial snapshot: every customer opens at v1
      graft.plans.MergeInto.sql(spark,
        s"UPDATE $src SET c_acctbal = c_acctbal + 100 WHERE c_custkey % 10 = 3") // v2
      drain() // preimages close at v2, postimages reopen at v2
      graft.plans.MergeInto.sql(spark,
        s"DELETE FROM $src WHERE c_custkey % 10 = 7")                            // v3
      drain() // closes at v3, no reopen
      spark.table(tgt).localCheckpoint(true)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $src")
      spark.sql(s"DROP TABLE IF EXISTS $tgt")
    }
  }

  object oracle {
    /** The statistics feed must be invisible in the data: recompute the
      * filtered join from raw events, plan-flip verdict pinned TRUE. */
    val cboBroadcastJoin: String =
      s"""SELECT event_type, COUNT(*) AS n_events,
         |  ${Dsl.sql.dsum("value")} AS volume, TRUE AS cbo_ok
         |FROM (SELECT event_type, value, event_id % 5000 AS k FROM events) e
         |JOIN (SELECT DISTINCT event_id % 5000 AS k FROM events) d USING (k)
         |WHERE k < 20
         |GROUP BY 1""".stripMargin

    /** The sort-order/SPJ plan work must be invisible in the DATA:
      * recompute the co-partitioned join from raw events, plan verdict
      * pinned TRUE. */
    val sortedMergeJoin: String =
      s"""SELECT region, COUNT(*) AS n_pairs,
         |  ${Dsl.sql.dsum("a_value")} AS volume_a,
         |  ${Dsl.sql.dsum("value_b")} AS volume_b, TRUE AS sorted_ok
         |FROM (SELECT event_id % 8 AS region, (event_id * 37) % 10000 AS ts,
         |        value AS a_value FROM events) a
         |JOIN (SELECT event_id % 8 AS region, (event_id * 61) % 10000 AS ts,
         |        value AS value_b FROM events) b
         |  USING (region, ts)
         |GROUP BY 1""".stripMargin

    /** The histogram tier must be invisible in the DATA (selectivity
      * statistics never change results): recompute the tail-filtered
      * join from raw events, plan verdict pinned TRUE. */
    val cboHistogramJoin: String =
      s"""SELECT event_type, COUNT(*) AS n_events,
         |  ${Dsl.sql.dsum("value")} AS volume, TRUE AS hist_ok
         |FROM (SELECT event_type, value, event_id % 5000 AS k FROM events) e
         |JOIN (SELECT k,
         |        CASE WHEN k % 100 < 99 THEN k % 100
         |             ELSE 100 + (k % 1000) * 9973 END AS v
         |      FROM (SELECT DISTINCT event_id % 5000 AS k FROM events)) d
         |  USING (k)
         |WHERE d.v >= 1000
         |GROUP BY 1""".stripMargin

    /** Stats pruning must be invisible in the data: recompute from the
      * raw events, layout verdict pinned TRUE. */
    val statsPruneScan: String =
      s"""SELECT event_type, COUNT(*) AS n_events,
         |  ${Dsl.sql.dsum("value")} AS volume, TRUE AS prune_ok
         |FROM events
         |WHERE value >= 50.0
         |GROUP BY 1""".stripMargin

    /** Month spread recomputed from event_id; transform must be invisible
      * in the data, layout verdict pinned TRUE. */
    val monthsPruneScan: String =
      s"""SELECT event_type, COUNT(*) AS n_events,
         |  ${Dsl.sql.dsum("value")} AS volume, TRUE AS prune_ok
         |FROM (
         |  SELECT event_type, value,
         |    make_timestamp(2024, CAST(event_id % 6 + 1 AS INT),
         |      CAST(event_id % 28 + 1 AS INT), CAST(event_id % 24 AS INT),
         |      CAST(event_id % 60 AS INT), 0) AS mts
         |  FROM events)
         |WHERE mts >= TIMESTAMP '2024-02-01 00:00:00'
         |  AND mts < TIMESTAMP '2024-04-01 00:00:00'
         |GROUP BY 1""".stripMargin

    /** Identity partitioning must be invisible in the data. */
    val identityPartitionScan: String =
      s"""SELECT event_type, COUNT(*) AS n_events,
         |  ${Dsl.sql.dsum("value")} AS volume, TRUE AS prune_ok
         |FROM events
         |WHERE event_type = 'purchase'
         |GROUP BY 1""".stripMargin

    /** Merge-on-read must be invisible in the data: recompute the
      * post-delete aggregate, layout verdict pinned TRUE. */
    val morDeleteScan: String =
      s"""SELECT event_type, COUNT(*) AS n_events,
         |  ${Dsl.sql.dsum("value")} AS volume, TRUE AS mor_ok
         |FROM events
         |WHERE user_id % 10 <> 3
         |GROUP BY 1""".stripMargin

    /** The MOR MERGE's post-state recomputed flat: even events survive
      * unless a matched delete took them (div-3 with odd user), matched
      * updates (div-3, even user) double their value, odd div-3 events
      * insert; the zero-rewrite verdict pinned TRUE. */
    val morMergeScan: String =
      s"""SELECT event_type, COUNT(*) AS n_events,
         |  ${Dsl.sql.dsum("CASE WHEN event_id % 2 = 0 AND event_id % 3 = 0 " +
           "AND user_id % 2 = 0 THEN value * 2 ELSE value END")} AS volume,
         |  TRUE AS mor_ok
         |FROM events
         |WHERE (event_id % 2 = 0
         |        AND NOT (event_id % 3 = 0 AND user_id % 2 = 1))
         |   OR (event_id % 2 = 1 AND event_id % 3 = 0)
         |GROUP BY 1""".stripMargin

    /** The shared merge-scoping recompute ([[purchaseStagedBatch]]'s
      * post-state, flat): purchase div-5 rows tripled (matched UPDATE),
      * their +1e9-id clones inserted with value+1, everything else
      * untouched; the per-query PLAN/MANIFEST verdict pinned TRUE —
      * scoping must be invisible in the DATA. One formula for both
      * twins so they can never silently diverge. */
    private def mergeScopeRecompute(verdict: String): String =
      s"""SELECT event_type, COUNT(*) AS n_events,
         |  ${Dsl.sql.dsum("value")} AS volume, TRUE AS $verdict
         |FROM (
         |  SELECT event_type,
         |    CASE WHEN event_type = 'purchase' AND event_id % 5 = 0
         |         THEN value * 3 ELSE value END AS value
         |  FROM events
         |  UNION ALL
         |  SELECT event_type, value + 1 AS value FROM events
         |  WHERE event_type = 'purchase' AND event_id % 5 = 0)
         |GROUP BY 1""".stripMargin

    /** Under-half-the-files EXECUTED-plan verdict (merge-on-read). */
    val morMergePrune: String = mergeScopeRecompute("prune_ok")

    /** Untouched-keys-carry MANIFEST verdict (copy-on-write). */
    val cowMergeKeyscope: String = mergeScopeRecompute("scope_ok")

    /** Per-row CDF of a change-preserving CoW scoped merge: every event
      * class recomputed flat from the raw events over the staged window
      * (matched div-10 rows delete, other matched rows update pre/post,
      * +1e9-id clones insert) — rows no clause fired on contribute NO
      * event. */
    val cdfCowMerge: String = {
      val win = "event_type = 'purchase' AND event_id % 5 = 0 " +
        "AND ts >= TIMESTAMP '2024-01-10 00:00:00' " +
        "AND ts < TIMESTAMP '2024-01-12 00:00:00'"
      s"""SELECT change_type, COUNT(*) AS n_events,
         |  ${Dsl.sql.dsum("value")} AS volume
         |FROM (
         |  SELECT 'update_preimage' AS change_type, value FROM events
         |  WHERE $win AND event_id % 10 <> 0
         |  UNION ALL
         |  SELECT 'update_postimage', value * 3 FROM events
         |  WHERE $win AND event_id % 10 <> 0
         |  UNION ALL
         |  SELECT 'delete', value FROM events
         |  WHERE $win AND event_id % 10 = 0
         |  UNION ALL
         |  SELECT 'insert', value + 1 FROM events
         |  WHERE $win)
         |GROUP BY 1""".stripMargin
    }

    /** Day-scoped CoW merge with a bounded discovery probe: the same
      * update/insert recompute confined to the staged two-day window;
      * probe-pruning + untouched-days-carry verdict pinned TRUE. */
    val cowMergeDayscope: String =
      s"""SELECT event_type, COUNT(*) AS n_events,
         |  ${Dsl.sql.dsum("value")} AS volume, TRUE AS dayscope_ok
         |FROM (
         |  SELECT event_type,
         |    CASE WHEN event_type = 'purchase' AND event_id % 5 = 0
         |              AND ts >= TIMESTAMP '2024-01-10 00:00:00'
         |              AND ts < TIMESTAMP '2024-01-12 00:00:00'
         |         THEN value * 3 ELSE value END AS value
         |  FROM events
         |  UNION ALL
         |  SELECT event_type, value + 1 AS value FROM events
         |  WHERE event_type = 'purchase' AND event_id % 5 = 0
         |    AND ts >= TIMESTAMP '2024-01-10 00:00:00'
         |    AND ts < TIMESTAMP '2024-01-12 00:00:00')
         |GROUP BY 1""".stripMargin

    /** A deletes-only rewrite must be invisible in the data: recompute
      * BOTH merged deletes' retractions, maintenance verdict pinned
      * TRUE. */
    val rewriteDeletesScan: String =
      s"""SELECT event_type, COUNT(*) AS n_events,
         |  ${Dsl.sql.dsum("value")} AS volume, TRUE AS rw_ok
         |FROM events
         |WHERE user_id % 10 <> 3 AND user_id % 10 <> 7
         |GROUP BY 1""".stripMargin

    /** Retraction + sequence-scoped re-insert recomputed from the raw
      * events; layout verdict pinned TRUE. */
    val eqDeleteScan: String =
      s"""SELECT event_type, COUNT(*) AS n_events,
         |  ${Dsl.sql.dsum("value")} AS volume, TRUE AS eq_ok
         |FROM (
         |  SELECT event_type, value FROM events WHERE user_id % 10 <> 3
         |  UNION ALL
         |  SELECT event_type, value FROM events
         |  WHERE user_id % 10 = 3 AND event_id % 2 = 0)
         |GROUP BY 1""".stripMargin

    /** Spec evolution must be invisible in the data: same recompute as
      * the plain prune scan, layout verdict pinned TRUE. */
    val specEvolutionScan: String =
      s"""SELECT event_type, COUNT(*) AS n_events,
         |  ${Dsl.sql.dsum("value")} AS volume, TRUE AS prune_ok
         |FROM events
         |WHERE ts >= TIMESTAMP '$PruneFrom' AND ts < TIMESTAMP '$PruneUntil'
         |GROUP BY 1""".stripMargin

    /** Pre- and post-widening generations recomputed from the raw events
      * (SUM over BIGINT pinned to BIGINT — DuckDB sums to HUGEINT). */
    val typeWideningScan: String =
      s"""SELECT event_type, COUNT(*) AS n_events,
         |  CAST(SUM(CASE WHEN event_id % 2 = 0 THEN event_id % 1000000
         |    ELSE event_id % 1000000 + 3000000000 END) AS BIGINT) AS id_sum,
         |  ${Dsl.sql.dsum("value")} AS volume
         |FROM events
         |GROUP BY 1""".stripMargin

    /** Both decimal-widened generations recomputed from the raw events;
      * decimal sums compared as exact strings (engines disagree on the
      * RESULT precision of SUM(DECIMAL), never on the value). */
    val typeWideningDecimalScan: String =
      s"""SELECT event_type, COUNT(*) AS n_events,
         |  CAST(SUM(CASE WHEN event_id % 2 = 0
         |    THEN CAST(event_id % 1000000 AS DECIMAL(10,0))
         |    ELSE CAST(event_id % 1000000 + 3000000000 AS DECIMAL(10,0)) END)
         |    AS VARCHAR) AS id_sum,
         |  CAST(SUM(CASE WHEN event_id % 2 = 0
         |    THEN CAST(event_id % 100000 AS DECIMAL(20,0))
         |    ELSE CAST(event_id % 100000 + 1000000000000000 AS DECIMAL(20,0)) END)
         |    AS VARCHAR) AS amt_sum,
         |  ${Dsl.sql.dsum("value")} AS volume
         |FROM events
         |GROUP BY 1""".stripMargin

    /** Every metadata-derived aggregate recomputed flat; the
      * metadata-only verdict pinned TRUE. */
    val aggPushdownScan: String =
      s"""SELECT COUNT(*) AS n_rows, COUNT(user_id) AS n_users_nonnull,
         |  MIN(event_id) AS min_id, MAX(event_id) AS max_id,
         |  MIN(value) AS min_value, MAX(value) AS max_value,
         |  TRUE AS agg_meta_ok
         |FROM events""".stripMargin

    /** Every per-group metadata-derived aggregate recomputed flat; the
      * metadata-only verdict pinned TRUE. */
    val aggPushdownGroupScan: String =
      s"""SELECT event_type, COUNT(*) AS n_rows,
         |  MIN(event_id) AS min_id, MAX(event_id) AS max_id,
         |  MIN(value) AS min_value, MAX(value) AS max_value,
         |  TRUE AS agg_meta_ok
         |FROM events
         |GROUP BY 1""".stripMargin

    /** The nested-view lineage recomputed flat from events. */
    val catalogViewAgg: String =
      s"""SELECT event_type, COUNT(*) AS n_events,
         |  ${Dsl.sql.dsum("value")} AS volume
         |FROM events
         |WHERE user_id % 10 <> 3
         |GROUP BY 1""".stripMargin

    /** Every per-prefix metadata-derived aggregate recomputed flat; the
      * metadata-only verdict pinned TRUE. */
    val aggPushdownPrefixScan: String =
      s"""SELECT substring(p_brand, 1, 7) AS brand_prefix, COUNT(*) AS n_parts,
         |  MIN(p_partkey) AS min_key, MAX(p_partkey) AS max_key,
         |  MIN(p_retailprice) AS min_price, MAX(p_retailprice) AS max_price,
         |  TRUE AS agg_meta_ok
         |FROM part
         |GROUP BY 1""".stripMargin

    /** Every per-day metadata-derived aggregate recomputed flat; the
      * metadata-only verdict pinned TRUE. */
    val aggPushdownDayScan: String =
      s"""SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_rows,
         |  MIN(event_id) AS min_id, MAX(event_id) AS max_id,
         |  MIN(value) AS min_value, MAX(value) AS max_value,
         |  TRUE AS agg_meta_ok
         |FROM events
         |GROUP BY 1""".stripMargin

    /** Inserts are every event (both appends), deletes the retracted
      * cohort; provenance verdict pinned TRUE. */
    /** The checked table still answers exactly: all events minus the
      * retracted cohort; the health verdict pinned TRUE. */
    val fsckScan: String =
      s"""SELECT event_type, COUNT(*) AS n_events,
         |  ${Dsl.sql.dsum("value")} AS volume, TRUE AS fsck_ok
         |FROM events WHERE user_id % 10 <> 3
         |GROUP BY 1""".stripMargin

    /** One user's events, grouped by type — the bloom-indexed point
      * lookup recomputed flat; the footer verdict pinned TRUE. */
    val bloomPointScan: String =
      s"""SELECT event_type, COUNT(*) AS n_events,
         |  ${Dsl.sql.dsum("value")} AS volume, TRUE AS bloom_ok
         |FROM events WHERE user_id = 7
         |GROUP BY 1""".stripMargin

    /** The clone ends as the cloned cohort ∪ the local append (= all
      * events) minus the merge-on-read-deleted keys; zero-copy/pruning/
      * isolation verdicts pinned TRUE. */
    val cloneScan: String =
      s"""SELECT event_type, COUNT(*) AS n_events,
         |  ${Dsl.sql.dsum("value")} AS volume, TRUE AS clone_ok
         |FROM events WHERE user_id % 7 <> 2
         |GROUP BY 1""".stripMargin

    /** Main ends as base (even ids) ∪ the audited cohort (ids ≡ 1 mod 4);
      * the junk cohort stays on the branch. Verdict pinned TRUE. */
    val cherrypickScan: String =
      s"""SELECT event_type, COUNT(*) AS n_events,
         |  ${Dsl.sql.dsum("value")} AS volume, TRUE AS ck_ok
         |FROM events WHERE event_id % 2 = 0 OR event_id % 4 = 1
         |GROUP BY 1""".stripMargin

    /** The rollback restores the union of the two good appends — i.e.
      * every event — and the verdict column is pinned TRUE. */
    val rollbackScan: String =
      s"""SELECT event_type, COUNT(*) AS n_events,
         |  ${Dsl.sql.dsum("value")} AS volume, TRUE AS rb_ok
         |FROM events GROUP BY 1""".stripMargin

    val tableChangesScan: String =
      s"""SELECT _change_type, event_type, COUNT(*) AS n_events,
         |  ${Dsl.sql.dsum("value")} AS volume, TRUE AS cv_ok
         |FROM (
         |  SELECT 'insert' AS _change_type, event_type, value FROM events
         |  UNION ALL
         |  SELECT 'delete', event_type, value FROM events WHERE user_id % 10 = 3)
         |GROUP BY 1, 2""".stripMargin

    /** Inserts are every event at their pre-update values; the updated
      * cohort appears once as preimage (old value) and once as postimage
      * (doubled value); the provenance verdict pinned TRUE. */
    val cdfUpdateImages: String =
      s"""SELECT _change_type, event_type, COUNT(*) AS n_events,
         |  ${Dsl.sql.dsum("value")} AS volume, TRUE AS img_ok
         |FROM (
         |  SELECT 'insert' AS _change_type, event_type, value FROM events
         |  UNION ALL
         |  SELECT 'update_preimage', event_type, value FROM events
         |  WHERE user_id % 10 = 3
         |  UNION ALL
         |  SELECT 'update_postimage', event_type, value * 2 FROM events
         |  WHERE user_id % 10 = 3)
         |GROUP BY 1, 2""".stripMargin

    /** The incrementally-maintained aggregate must equal the flat
      * post-update recompute (cohort values doubled). */
    val streamCdfGold: String =
      s"""SELECT event_type, COUNT(*) AS n_events,
         |  ${Dsl.sql.dsum("CASE WHEN user_id % 10 = 3 THEN value * 2 ELSE value END")}
         |    AS volume
         |FROM events
         |GROUP BY 1""".stripMargin

    /** The incrementally-maintained SCD2 dimension recomputed flat: one
      * current row per surviving customer, a closed+reopened pair for
      * the v2-updated cohort, a closed row (no reopen) for the
      * v3-deleted cohort. */
    val streamScd2Gold: String =
      s"""SELECT c_custkey, c_mktsegment, c_acctbal,
         |  CAST(1 AS BIGINT) AS valid_from, CAST(NULL AS BIGINT) AS valid_to,
         |  TRUE AS is_current
         |FROM customer WHERE c_custkey % 10 <> 3 AND c_custkey % 10 <> 7
         |UNION ALL
         |SELECT c_custkey, c_mktsegment, c_acctbal,
         |  CAST(1 AS BIGINT), CAST(2 AS BIGINT), FALSE
         |FROM customer WHERE c_custkey % 10 = 3
         |UNION ALL
         |SELECT c_custkey, c_mktsegment, c_acctbal + 100,
         |  CAST(2 AS BIGINT), CAST(NULL AS BIGINT), TRUE
         |FROM customer WHERE c_custkey % 10 = 3
         |UNION ALL
         |SELECT c_custkey, c_mktsegment, c_acctbal,
         |  CAST(1 AS BIGINT), CAST(3 AS BIGINT), FALSE
         |FROM customer WHERE c_custkey % 10 = 7""".stripMargin

    /** The sink-committed per-type aggregate recomputed flat. */
    val streamTableSink: String =
      s"""SELECT event_type, COUNT(*) AS n_events,
         |  ${Dsl.sql.dsum("value")} AS volume
         |FROM events
         |GROUP BY 1""".stripMargin

    /** The streamed per-type aggregate recomputed flat over events. */
    val streamVersionedRead: String =
      s"""SELECT event_type, COUNT(*) AS n_events,
         |  ${Dsl.sql.dsum("value")} AS volume
         |FROM events
         |GROUP BY 1""".stripMargin

    /** The co-partitioned join recomputed flat; the zero-shuffle verdict
      * pinned TRUE. */
    val spjJoin: String =
      s"""SELECT e.event_type, COUNT(*) AS n_events,
         |  ${Dsl.sql.dsum("e.value")} AS volume,
         |  MAX(t.type_total) AS type_total, TRUE AS spj_ok
         |FROM events e
         |JOIN (SELECT event_type, COUNT(*) AS type_total
         |      FROM events GROUP BY 1) t USING (event_type)
         |GROUP BY 1""".stripMargin

    /** The dim filter recomputed statically; the runtime-pruning verdict
      * pinned TRUE. */
    val runtimePruneJoin: String =
      s"""SELECT event_type, COUNT(*) AS n_events,
         |  ${Dsl.sql.dsum("value")} AS volume, TRUE AS dpp_ok
         |FROM events
         |WHERE event_type IN ('purchase', 'view')
         |GROUP BY 1""".stripMargin

    /** Each file generation's default behavior recomputed from the raw
      * events: evens predate the ADD (initial defaults 'emea'/7),
      * `%4=1` carried explicit values ('apac'/3), `%4=3` was inserted
      * without the defaulted columns after SET DEFAULT moved boost to 11. */
    val columnDefaultsScan: String =
      s"""SELECT CASE WHEN event_id % 4 = 1 THEN 'apac' ELSE 'emea' END AS region,
         |  CAST(CASE WHEN event_id % 2 = 0 THEN 7
         |    WHEN event_id % 4 = 1 THEN 3 ELSE 11 END AS INTEGER) AS boost,
         |  COUNT(*) AS n_events, ${Dsl.sql.dsum("value")} AS volume
         |FROM events
         |GROUP BY 1, 2""".stripMargin

    /** The metadata surface must be invisible in the data; every
      * metadata-vs-physical verdict pinned TRUE. */
    val filesMetadataScan: String =
      s"""SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_events,
         |  ${Dsl.sql.dsum("value")} AS volume, TRUE AS meta_ok
         |FROM events
         |GROUP BY 1""".stripMargin

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

    /** Each named ref's snapshot recomputed from the raw events: the tag
      * pins the pre-cutoff half, the branch heads at the full set. */
    val tagTimeTravel: String =
      s"""SELECT 'baseline' AS ref, COUNT(*) AS n_rows,
         |  ${Dsl.sql.dsum("value")} AS total_value
         |FROM events WHERE ts < TIMESTAMP '$TtCutoff'
         |UNION ALL
         |SELECT 'audit' AS ref, COUNT(*) AS n_rows,
         |  ${Dsl.sql.dsum("value")} AS total_value
         |FROM events""".stripMargin

    /** One checksum from the source parquet, verdict TRUE — identical
      * md5-derived hash sum to the engine's three legs. */
    val catalogFormatFanout: String = {
      val args = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_returnflag", "l_linestatus", "l_shipdate")
        .map(c => s"CAST($c AS VARCHAR)").mkString(", ")
      s"""SELECT COUNT(*) AS n_rows,
         |  CAST(SUM(CAST(${graft.operators.Dedup.md5LongSql(s"concat_ws('|', $args)")} AS DECIMAL(38,0)))
         |    AS VARCHAR) AS checksum,
         |  TRUE AS formats_match
         |FROM lineitem""".stripMargin
    }

    /** The rename must be invisible to the data: recompute from the raw
      * events under the original names. */
    val renamedColumnScan: String =
      s"""SELECT event_type, COUNT(*) AS n_events,
         |  ${Dsl.sql.dsum("value")} AS total_amount
         |FROM events
         |WHERE ts >= TIMESTAMP '$PruneFrom' AND ts < TIMESTAMP '$PruneUntil'
         |GROUP BY 1""".stripMargin

    /** Maintenance must be invisible in the data: recompute the windowed
      * aggregate from the raw events, layout verdict pinned TRUE. */
    val callOptimizeScan: String =
      s"""SELECT event_type, COUNT(*) AS n_events,
         |  ${Dsl.sql.dsum("value")} AS volume, TRUE AS files_packed
         |FROM events
         |WHERE ts >= TIMESTAMP '$PruneFrom' AND ts < TIMESTAMP '$PruneUntil'
         |GROUP BY 1""".stripMargin

    /** The chunked identity rewrite must be invisible in the data:
      * recompute the per-type aggregate flat, chunk verdict pinned
      * TRUE. */
    val callOptimizeIdentityScan: String =
      s"""SELECT event_type, COUNT(*) AS n_events,
         |  ${Dsl.sql.dsum("value")} AS volume, TRUE AS chunk_ok
         |FROM events
         |GROUP BY 1""".stripMargin

    /** Post-merge state with explicit join algebra under the original
      * (pre-evolution) names — evolution must be invisible in the data. */
    val mergeSchemaEvolution: String =
      """WITH t AS (
        |  SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey % 3 <> 0
        |),
        |s AS (
        |  SELECT o_custkey AS custkey, COUNT(*) AS n_orders FROM orders GROUP BY 1
        |)
        |SELECT t.c_custkey, t.c_acctbal, s.n_orders
        |FROM t LEFT JOIN s ON t.c_custkey = s.custkey
        |UNION ALL
        |SELECT s.custkey AS c_custkey, CAST(0.0 AS DOUBLE) AS c_acctbal, s.n_orders
        |FROM s LEFT JOIN t ON t.c_custkey = s.custkey
        |WHERE t.c_custkey IS NULL""".stripMargin

    /** Full recompute — the incremental path must be invisible. */
    val incrementalGoldFromCdc: String =
      s"""SELECT user_id, event_type, COUNT(*) AS n_events,
         |  ${Dsl.sql.dsum("value")} AS total_value,
         |  CAST(SUM(CASE WHEN ts >= TIMESTAMP '$TtCutoff' THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_delta
         |FROM events GROUP BY 1, 2""".stripMargin
  }
}
