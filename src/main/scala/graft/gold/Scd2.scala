package graft.gold

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** SCD2 dimension maintenance driven by a change data feed — the
  * reference's silver MERGE → gold lineage
  * (`/root/reference/dags/2_bronze_to_silver.py:278-293`) as an
  * INCREMENTAL job: a streaming `tbl.changes` consumer folds the feed's
  * four-valued `_change_type` events into a type-2 slowly-changing
  * dimension. Each key's history is a chain of validity intervals
  * `[valid_from, valid_to)` in commit versions, with at most one open
  * (`is_current`) row per key:
  *
  *  - `insert` / `update_postimage` OPEN a row at their commit version;
  *  - `update_preimage` / `delete` CLOSE the key's open row at theirs —
  *    an update therefore closes-and-reopens atomically (both images
  *    carry one version), a delete closes without a reopen.
  *
  * Per micro-batch the fold is fully relational: in-batch open→close
  * chaining is a window `lead` over each key's opens plus an
  * `array_min(filter(deaths, > valid_from))` for delete-closes, and the
  * handoff to history already in the target is ONE `MERGE INTO` whose
  * source unions the batch's timeline rows with one close instruction
  * per key (`min` close version). The MERGE matches only close
  * instructions against only current rows, so the statement is
  * first-match-deterministic and the multi-match guard holds.
  *
  * Scale notes (100 TB): the fold shuffles once on the dimension key
  * (window + groupBy share it); the MERGE is one equi-join on the key
  * with the batch side small enough to broadcast under AQE. Target
  * rewrite cost is copy-on-write per batch — the standard lakehouse SCD2
  * shape — and the change feed delivers only touched rows, so a batch's
  * cost follows upstream churn, never dimension size. Restart safety
  * rides the stream checkpoint: offsets are table versions, and the
  * change-feed filter pin refuses a restart under altered scoping.
  */
object Scd2 extends org.apache.spark.internal.Logging {

  private val CloseV = "__scd2_close_v"
  private val IsClose = "__scd2_is_close"

  /** Fold ONE change-feed micro-batch into a MERGE source: the batch's
    * timeline rows (opens, already chained in-batch) tagged
    * `__scd2_is_close = false`, plus one close instruction per key that
    * had an in-batch `update_preimage`/`delete` (its EARLIEST such
    * version — later in-batch events chain against in-batch opens, not
    * against the target). */
  private[graft] def foldBatch(batch: DataFrame, keyCols: Seq[String],
                               attrCols: Seq[String]): DataFrame = {
    val keys = keyCols.map(col)
    val birth = col("_change_type").isin("insert", "update_postimage")
    val death = col("_change_type").isin("update_preimage", "delete")

    val opens = batch.where(birth)
      .select(keyCols.map(col) ++ attrCols.map(col) :+
        col("_commit_version").as("valid_from"): _*)
      .withColumn("__next_open",
        lead(col("valid_from"), 1).over(
          Window.partitionBy(keys: _*).orderBy(col("valid_from"))))

    // per-key DELETE versions: a delete closes without a reopen, so it is
    // invisible to the open-chain lead; an update's preimage needs no
    // entry here — its postimage IS the next open at the same version
    val deaths = batch.where(col("_change_type") === "delete")
      .groupBy(keys: _*)
      .agg(collect_list(col("_commit_version")).as("__deaths"))

    val timeline = opens.join(deaths, keyCols, "left")
      .withColumn("__death_after",
        expr("array_min(filter(__deaths, x -> x > valid_from))"))
      .withColumn("valid_to", least(col("__next_open"), col("__death_after")))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__next_open", "__deaths", "__death_after")

    val attrTypes = attrCols.map(c => c -> batch.schema(c).dataType)
    val openSrc = timeline
      .withColumn(CloseV, lit(null).cast("bigint"))
      .withColumn(IsClose, lit(false))
    val closeSrc = batch.where(death)
      .groupBy(keys: _*).agg(min(col("_commit_version")).as(CloseV))
      .select(keyCols.map(col) ++
        attrTypes.map { case (c, t) => lit(null).cast(t).as(c) } ++
        Seq(lit(null).cast("bigint").as("valid_from"),
          lit(null).cast("bigint").as("valid_to"),
          lit(null).cast("boolean").as("is_current"),
          col(CloseV), lit(true).as(IsClose)): _*)
    openSrc.unionByName(closeSrc)
  }

  private val Probe = "__scd2_probe"

  /** Closes that MUST match a target current row — no in-batch open AT
    * OR before the close version. A routine update's close commits
    * ATOMICALLY with its same-version postimage open, so the pair is
    * satisfied by construction: whatever the target held, the batch's
    * end state is the postimage as the current row, and probing the
    * target buys nothing — which lets a routine update batch skip the
    * target probe ENTIRELY (deletes and out-of-order closes, the shapes
    * where a missing target row silently loses the close, still probe).
    * Returns
    * the EXACT missing count plus up to `sample` offending key rows.
    * Cost shape: `probeSet` comes from the already-materialized fold
    * (zero recompute), and the target side is ONE column-pruned read of
    * its current keys, semi-joined down before the anti-join. NO
    * broadcast hints: a routine batch's probe set is tiny and AQE
    * broadcasts it on its own, but the diagnostic case — a reset
    * checkpoint replaying millions of closes — is exactly when a forced
    * broadcast would OOM the driver; the planner must stay free to pick
    * a shuffled join there. */
  private[graft] def missingCloses(spark: SparkSession, targetTable: String,
                                   probeSet: DataFrame, keyCols: Seq[String],
                                   sample: Int = 10): (Long, Array[Row]) = {
    val keys = keyCols.map(col)
    val unsatisfied = probeSet
      .select(keyCols.map(col) :+ col(CloseV).as("close_version"): _*)
    val matched = spark.table(targetTable).where(col("is_current"))
      .join(unsatisfied.select(keys: _*).distinct(), keyCols, "left_semi")
      .select(keys: _*).distinct()
    val orphans = unsatisfied.join(matched, keyCols, "left_anti")
      .localCheckpoint(true)
    (orphans.count(), orphans.limit(sample).collect())
  }

  /** Apply one folded micro-batch to the target dimension with a single
    * atomic MERGE: close instructions close the key's current row, the
    * batch's timeline rows append. A close with nothing to close (an
    * out-of-contract feed — drifted checkpoint, manual target edit) is
    * COUNTED loudly instead of vanishing: the default mode logs the keys
    * and reports the count, `spark.graft.scd2.onMissingClose=fail`
    * fails the batch naming them. Returns the count.
    *
    * Cost shape: the fold materializes ONCE (a localCheckpoint the MERGE
    * and the probe both read — the pre-fusion version recomputed the
    * fold for the probe chain and again inside the MERGE), with probe
    * membership computed as a window column of the fold itself. A batch
    * with no probe closes — pure inserts (the initial snapshot) AND
    * routine update batches, whose same-version close/open pairs are
    * satisfied in the fold — skips the target probe entirely off one
    * cheap checkpoint-local scan; only delete-bearing (or out-of-order)
    * batches pay the column-pruned read of the target's current keys,
    * then the MERGE's own read. */
  private[graft] def applyBatch(spark: SparkSession, targetTable: String,
                                batch: DataFrame, keyCols: Seq[String],
                                attrCols: Seq[String]): Long = {
    val view = "__graft_scd2_src"
    val keys = keyCols.map(col)
    val mode = scala.util.Try(
      spark.conf.get("spark.graft.scd2.onMissingClose", "count")).getOrElse("count")
    // strict >: a same-version open (the routine update's postimage)
    // satisfies its close in the fold — whatever the target held, the
    // batch's end state is the postimage as the current row — so the
    // DEFAULT mode narrows its drift detection to deletes and
    // out-of-order closes and skips the target probe for routine update
    // batches entirely. A current row lost OUT OF BAND (manual edit,
    // drifted checkpoint) is then silently absorbed by the next routine
    // update of its key; `onMissingClose=fail` re-widens the probe to
    // same-version closes (>=) so that drift stays loud — the strict
    // mode pays the per-batch target probe the fast mode skips. See
    // [[missingCloses]].
    val folded = foldBatch(batch, keyCols, attrCols)
      .withColumn("__first_open",
        min(when(!col(IsClose), col("valid_from")))
          .over(Window.partitionBy(keys: _*)))
      .withColumn(Probe, col(IsClose) &&
        (col("__first_open").isNull ||
          (if (mode == "fail") col("__first_open") >= col(CloseV)
           else col("__first_open") > col(CloseV))))
      .drop("__first_open")
      .localCheckpoint(true) // ONE materialization: probe + MERGE source
    folded.drop(Probe).createOrReplaceTempView(view)
    try {
      val probeSet = folded.where(col(Probe))
      val (nMissing, sampleRows) =
        if (probeSet.isEmpty) (0L, Array.empty[Row]) // checkpoint-local scan
        else missingCloses(spark, targetTable, probeSet, keyCols)
      if (nMissing > 0) {
        val shown = sampleRows.mkString(", ") +
          (if (nMissing > sampleRows.length) ", …" else "")
        if (mode == "fail")
          throw new IllegalStateException(
            s"SCD2 batch for $targetTable carries $nMissing close event(s) " +
              s"with no current row to close (keys: $shown) — the feed and " +
              "the target have drifted (checkpoint reset? manual edit?); set " +
              "spark.graft.scd2.onMissingClose=count to record-and-continue")
        logWarning(s"SCD2 batch for $targetTable: $nMissing close event(s) " +
          s"matched no current row and will not apply (keys: $shown)")
      }
      val onKeys = keyCols.map(k => s"t.$k = s.$k").mkString(" AND ")
      val insCols = (keyCols ++ attrCols ++
        Seq("valid_from", "valid_to", "is_current")).mkString(", ")
      val insVals = (keyCols ++ attrCols ++
        Seq("valid_from", "valid_to", "is_current")).map("s." + _).mkString(", ")
      graft.plans.MergeInto.sql(spark,
        s"""MERGE INTO $targetTable t USING $view s
           |ON $onKeys AND t.is_current = true AND s.$IsClose = true
           |WHEN MATCHED THEN UPDATE SET valid_to = s.$CloseV, is_current = false
           |WHEN NOT MATCHED AND s.$IsClose = false THEN
           |  INSERT ($insCols) VALUES ($insVals)""".stripMargin)
      nMissing
    } finally spark.catalog.dropTempView(view)
  }

  /** Run the maintenance to exhaustion of the available changes
    * (`Trigger.AvailableNow`): stream `sourceTable.changes` from the
    * checkpoint's offsets and fold every micro-batch into `targetTable`.
    * The first run snapshots the source (delivered as inserts) into
    * all-current rows; subsequent runs consume only row-level changes.
    * Returns the total missing-close count observed across the run's
    * batches (0 for a well-formed feed; see [[applyBatch]]).
    *
    * Drift-detection surface by mode: the default
    * (`spark.graft.scd2.onMissingClose=count`) probes the target only
    * for DELETE and out-of-order closes — a routine update's
    * same-version close/open pair is satisfied in the fold, so a
    * current row lost OUT OF BAND is silently absorbed by that key's
    * next routine update. `onMissingClose=fail` widens the probe to
    * same-version closes, keeping every drift loud at the cost of a
    * column-pruned target-key read per update batch. */
  def maintain(spark: SparkSession, sourceTable: String, targetTable: String,
               keyCols: Seq[String], attrCols: Seq[String],
               checkpoint: String): Long = {
    val missing = new java.util.concurrent.atomic.AtomicLong(0L)
    val q = spark.readStream.table(s"$sourceTable.changes")
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: Dataset[Row], _: Long) =>
        missing.addAndGet(
          applyBatch(b.sparkSession, targetTable, b.toDF(), keyCols, attrCols))
        ()
      }
      .start()
    q.awaitTermination()
    missing.get()
  }
}
