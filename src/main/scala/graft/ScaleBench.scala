package graft

import org.apache.spark.sql.SparkSession

import graft.bronze.Generate

/** Scale diagnostic: generate N reference-shaped transactions entirely in
  * the engine (shuffle-free, executor-parallel) and run the reference gold
  * monthly_balance over them — measures engine throughput well past the
  * test fixtures' size — plus the training-pipeline path: MinHash-LSH
  * dedup over a generated corpus with planted duplicates.
  * Usage: runMain graft.ScaleBench [rows] [docs]
  */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    val rows  = if (args.nonEmpty) args(0).toLong else 50000000L
    val nDocs = if (args.length > 1) args(1).toLong else 1000000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.GraftLocalFs.install(spark)

    val types = Generate.dTransactionTypes(spark)
    val txns = Generate.fTransactions(spark, rows, nContracts = rows / 100)
      .repartition(64)   // spread generation across cores

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scale] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    val n = time(s"generate+count $rows")(txns.count())
    val t0 = System.nanoTime()
    val groups = Generate.referenceMonthlyBalance(txns, types).count()
    val aggSecs = (System.nanoTime() - t0) / 1e9
    println(f"[scale] rows=$n groups=$groups agg_secs=$aggSecs%.1f rows_per_sec=${(n / aggSecs).toLong}")

    // MinHash-LSH dedup at corpus scale: ~60-word docs from a hashed
    // vocabulary (codegen'd generation, no driver data); every 10th doc
    // duplicates its predecessor, so expected pairs ≈ nDocs/10. One
    // bucket-key shuffle regardless of corpus size.
    import org.apache.spark.sql.functions._
    val nWords = 60
    val vocab  = 50000
    val wordCols = (0 until nWords).map(i =>
      concat(lit("w"), pmod(xxhash64(col("seed"), lit(i)), lit(vocab)).cast("string")))
    val docs = spark.range(nDocs)
      .select(col("id").as("doc_id"),
        expr("CASE WHEN id % 10 = 9 THEN id - 1 ELSE id END").as("seed"))
      .select(col("doc_id"), concat_ws(" ", wordCols: _*).as("text"))
      .repartition(64)
    val d0 = System.nanoTime()
    val pairs = graft.operators.Dedup.minHashLshOn(docs).count()
    val dedupSecs = (System.nanoTime() - d0) / 1e9
    println(f"[scale] docs=$nDocs dup_pairs=$pairs dedup_secs=$dedupSecs%.1f docs_per_sec=${(nDocs / dedupSecs).toLong}")

    // curation path at corpus scale, over a persisted corpus dir (the ops
    // take a dir): pack + scrub + rebalance are the map-heavy passes that
    // dominate wall-clock in a real pipeline run.
    val corpusDir = java.nio.file.Files.createTempDirectory("scale_docs").toString
    docs.withColumn("lang",
        element_at(array(lit("en"), lit("es"), lit("de"), lit("fr"), lit("zh")),
          (pmod(xxhash64(col("doc_id")), lit(5)) + 1).cast("int")))
      .withColumn("source", lit("gen"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$corpusDir/documents.parquet")
    // noop sink, as in Bench: a count() would let Catalyst prune the
    // actual projection work (regexes, packing arithmetic) out of the plan
    import org.apache.spark.sql.DataFrame
    for ((label, q) <- Seq[(String, () => DataFrame)](
      ("pack_sequences", () => graft.operators.Curation.packSequences(spark, corpusDir, shards = 64)),
      ("pii_scrub", () => graft.functions.Text.piiScrub(spark, corpusDir)),
      ("lang_rebalance", () => graft.operators.Curation.langRebalance(spark, corpusDir)),
      ("quality_gate", () => graft.operators.Curation.qualityGate(spark, corpusDir)))) {
      val c0 = System.nanoTime()
      q().write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - c0) / 1e9
      println(f"[scale] $label secs=$secs%.1f docs_per_sec=${(nDocs / secs).toLong}")
    }
    // scale-pattern ops over generated keys — the shapes whose 100 TB
    // behavior the plans promise: a map-only bloom probe (filter pushed
    // into the scan, zero joins/shuffles of the probe side), Misra-Gries
    // heavy hitters (bounded state + candidate-pruned exact count), and
    // the SCD2 build (one key shuffle, per-key windows).
    val probeRows = rows / 5
    val dimKeys = 100000
    // ~2 M bits for 100 k keys → <1% fp; stored one 32-bit word per long,
    // so the closure ships 65536 longs = 512 KB (256 KB of meaningful bits)
    val mBits = 1 << 21
    val dim = spark.range(dimKeys).select((col("id") * 7L).as("key"))
    val words = graft.operators.Bloom.bitsArray(dim, "key", mBits, 3)
    val b0 = System.nanoTime()
    val survivors = spark.range(probeRows).select(col("id").as("key"))
      .where(graft.operators.Bloom.mightContain(col("key"), words, mBits, 3))
      .count()
    val bloomSecs = (System.nanoTime() - b0) / 1e9
    println(f"[scale] bloom_probe rows=$probeRows survivors=$survivors secs=$bloomSecs%.1f rows_per_sec=${(probeRows / bloomSecs).toLong}")

    import spark.implicits._
    val hh0 = System.nanoTime()
    val items = spark.range(probeRows).select(
      when(col("id") % 10 === 0, concat(lit("hot_"), (expr("id div 10") % 5).cast("string")))
        .otherwise(concat(lit("cold_"), (col("id") % 1000000).cast("string")))
        .as("key")).as[String]
    val hitters = graft.operators.Frequency.heavyHitters(items, cap = 64).count()
    val hhSecs = (System.nanoTime() - hh0) / 1e9
    println(f"[scale] heavy_hitters rows=$probeRows hitters=$hitters secs=$hhSecs%.1f rows_per_sec=${(probeRows / hhSecs).toLong}")

    // two-phase exact median at 10M+ rows: the bounded-window rewrite's
    // scale point — generated (flag, 2-decimal price) rows; no window
    // partition ever exceeds one price bucket's distinct values
    val medRows = math.max(rows / 5, 10000000L)
    val m0 = System.nanoTime()
    val li = spark.range(medRows).select(
      concat(lit("F"), pmod(xxhash64(col("id")), lit(3)).cast("string")).as("l_returnflag"),
      (pmod(xxhash64(col("id"), lit(7)), lit(10000000L)).cast("double") / 100.0)
        .as("l_extendedprice"))
    val med = graft.gold.Extended.exactMedianOn(
      graft.gold.Extended.cumulativeHistogramOn(li)).count()
    val medSecs = (System.nanoTime() - m0) / 1e9
    println(f"[scale] exact_median rows=$medRows groups=$med secs=$medSecs%.1f rows_per_sec=${(medRows / medSecs).toLong}")

    val s0 = System.nanoTime()
    val evts = spark.range(probeRows).select(
      (col("id") % 1000000L).as("user_id"),
      expr("timestamp_micros(1704067200000000 + id * 1000)").cast("timestamp_ntz").as("ts"),
      col("id").as("event_id"),
      concat(lit("t"), pmod(xxhash64(col("id")), lit(5)).cast("string")).as("event_type"))
    graft.silver.Changelog.scd2On(evts).write.format("noop").mode("overwrite").save()
    val scdSecs = (System.nanoTime() - s0) / 1e9
    println(f"[scale] scd2_build rows=$probeRows secs=$scdSecs%.1f rows_per_sec=${(probeRows / scdSecs).toLong}")

    // V2 catalog manifest-prune scan at >=10M rows across 128 hidden days:
    // plan-time pruning must hold when the manifest lists THOUSANDS of
    // files — a 10-day window should touch ~10/128 of them and the scan
    // time should follow the touched files, not the table.
    val catRows = math.max(rows / 5, 10000000L)
    val nDays = 128
    val wh = java.nio.file.Files.createTempDirectory("scale_cat_wh").toString
    spark.conf.set("spark.sql.catalog.scale_cat",
      classOf[graft.sources.v2.VersionedCatalog].getName)
    spark.conf.set("spark.sql.catalog.scale_cat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS scale_cat.b")
    // the manifest/scan-metadata points below model the 100 TB shape —
    // MANY files per partition key — so write them unclustered; the
    // clustered_write point further down measures the hash distribution
    // itself and flips the conf back
    spark.conf.set("spark.graft.write.distribution", "none")
    val evCat = spark.range(catRows).select(
      col("id").as("event_id"),
      expr(s"timestamp_micros(1704067200000000 + (id % $nDays) * 86400000000" +
        " + (id % 86400) * 1000000)").cast("timestamp_ntz").as("ts"),
      (col("id") % 100000L).as("user_id"),
      (pmod(xxhash64(col("id")), lit(100000)).cast("double") / 100.0).as("value"))
    val cw0 = System.nanoTime()
    evCat.writeTo("scale_cat.b.ev")
      .partitionedBy(org.apache.spark.sql.functions.partitioning.days(col("ts")))
      .create()
    println(f"[scale] catalog_ctas rows=$catRows days=$nDays secs=${(System.nanoTime() - cw0) / 1e9}%.1f")

    // WRITE-PATH OVERHEAD BUDGET: what each per-write statistics tier
    // costs on an append-shaped CTAS — commit-time HLL NDV + KLL
    // histograms (one fused Observation pass riding the write job),
    // per-file footer stats, writer-side blooms. The per-table
    // stats.ndv/stats.histogram properties are the opt-out dial; this
    // point is the budget check that keeps the tax honest (target:
    // full-stats within ~10% of the stats-off floor).
    {
      val taxRows = math.max(catRows / 4, 2000000L)
      val evTax = spark.range(taxRows).select(
        col("id").as("event_id"),
        expr("timestamp_micros(1704067200000000 + (id % 16) * 86400000000" +
          " + (id % 86400) * 1000000)").cast("timestamp_ntz").as("ts"),
        (col("id") % 100000L).as("user_id"),
        (pmod(xxhash64(col("id")), lit(100000)).cast("double") / 100.0).as("value"))
      def ctasSecs(tbl: String, props: Map[String, String]): Double = {
        val w0 = System.nanoTime()
        val w = evTax.writeTo(s"scale_cat.b.$tbl")
        props.foldLeft(w) { case (x, (k, v)) => x.tableProperty(k, v) }.create()
        (System.nanoTime() - w0) / 1e9
      }
      val offSecs = ctasSecs("wt_off",
        Map("stats.ndv" -> "false"))                       // the floor
      val histOffSecs = ctasSecs("wt_nohist",
        Map("stats.histogram" -> "false"))                 // HLL only
      val fullSecs = ctasSecs("wt_full", Map.empty)        // HLL + KLL
      val bloomSecs = ctasSecs("wt_bloom",
        Map("bloom.columns" -> "user_id", "bloom.ndv" -> "100000"))
      def pct(s: Double) = (s / offSecs - 1.0) * 100.0
      println(f"[scale] write_tax rows=$taxRows off_secs=$offSecs%.1f " +
        f"hll_secs=$histOffSecs%.1f (+${pct(histOffSecs)}%.0f%%) " +
        f"full_secs=$fullSecs%.1f (+${pct(fullSecs)}%.0f%%) " +
        f"bloom_secs=$bloomSecs%.1f (+${pct(bloomSecs)}%.0f%%)")
      Seq("wt_off", "wt_nohist", "wt_full", "wt_bloom")
        .foreach(t => spark.sql(s"DROP TABLE scale_cat.b.$t"))
    }

    // PARALLEL PARTIAL-PROGRESS OPTIMIZE: N day-chunks rewritten by M
    // concurrent workers (Iceberg's partial-progress +
    // max-concurrent-file-group-rewrites), commits serialized through
    // the optimistic commit loop — sequential chunks leave the cluster
    // idle between a chunk's write tail and its commit; concurrent
    // workers keep it saturated. Identical fragmented tables, same
    // chunk plan, only the worker count differs.
    {
      val optRows = math.max(catRows / 2, 4000000L)
      def mkFragmented(tbl: String): Unit = {
        val df = spark.range(optRows).select(
          col("id").as("event_id"),
          expr("timestamp_micros(1704067200000000 + (id % 32) * 86400000000" +
            " + (id % 86400) * 1000000)").cast("timestamp_ntz").as("ts"),
          (col("id") % 100000L).as("user_id"),
          (pmod(xxhash64(col("id")), lit(100000)).cast("double") / 100.0).as("value"))
        df.writeTo(s"scale_cat.b.$tbl")
          .partitionedBy(org.apache.spark.sql.functions.partitioning.days(col("ts")))
          .create()
        (0 until 2).foreach(_ => df.writeTo(s"scale_cat.b.$tbl").append())
      }
      def chunkedOptimize(tbl: String, workers: Int): Double = {
        val o0 = System.nanoTime()
        graft.sources.v2.Maintenance.optimize(spark, s"scale_cat.$tbl",
          maxCommits = 8, maxConcurrentRewrites = workers)
        (System.nanoTime() - o0) / 1e9
      }
      mkFragmented("opt_seq"); mkFragmented("opt_par")
      val seqSecs = chunkedOptimize("b.opt_seq", 1)
      val parSecs = chunkedOptimize("b.opt_par", 4)
      val filesAfter = graft.sources.ManifestTable
        .liveEntries(s"$wh/b/opt_par").size
      println(f"[scale] optimize_chunks rows=$optRows chunks=8 files_after=$filesAfter " +
        f"seq_secs=$seqSecs%.1f par4_secs=$parSecs%.1f speedup=${seqSecs / parSecs}%.2fx")
      Seq("opt_seq", "opt_par").foreach(t => spark.sql(s"DROP TABLE scale_cat.b.$t"))
    }

    // MERGE TARGET PRUNING AT SCALE: a small staging batch (one of 16
    // identity partitions, ~1/80 of the rows) MERGEs into a big
    // merge-on-read table, pruned (source-key manifest pruning) vs
    // unpruned — the r18 headline fix for the reference's every-12-min
    // silver upsert. Same table shape, same statement; only the prune
    // conf differs. The plan-level files-opened ratio rides the
    // lastMergeScan registry (executed-plan evidence, same as the
    // mor_merge_prune oracle).
    {
      val mrgRows = math.max(catRows / 2, 4000000L)
      def mkTarget(tbl: String): Unit = spark.range(mrgRows).select(
          col("id").as("k"),
          concat(lit("g"), (col("id") % 16).cast("string")).as("grp"),
          (pmod(xxhash64(col("id")), lit(100000)).cast("double") / 100.0).as("v"))
        .writeTo(s"scale_cat.b.$tbl").partitionedBy(col("grp"))
        .tableProperty("write.merge.mode", "merge-on-read").create()
      mkTarget("mrg_p"); mkTarget("mrg_u")
      spark.range(mrgRows).where(col("id") % 16 === 3 && col("id") % 5 === 0)
        .select(col("id").as("k"), lit("g3").as("grp"), lit(-1.0d).as("v"))
        .createOrReplaceTempView("mrg_stage")
      def runMerge(tbl: String, prune: Boolean): Double = {
        spark.conf.set("spark.graft.merge.targetPrune", prune.toString)
        val t0 = System.nanoTime()
        try graft.plans.MergeInto.sql(spark,
          s"MERGE INTO scale_cat.b.$tbl t USING mrg_stage s " +
            "ON t.grp = s.grp AND t.k = s.k " +
            "WHEN MATCHED THEN UPDATE SET v = s.v " +
            "WHEN NOT MATCHED THEN INSERT (k, grp, v) VALUES (s.k, s.grp, s.v)")
        finally spark.conf.unset("spark.graft.merge.targetPrune")
        (System.nanoTime() - t0) / 1e9
      }
      // Option-wrap the registry lookup: a merge that silently declined
      // the merge-on-read path records nothing, and a bare tuple
      // destructuring would NPE with an opaque bench crash instead of
      // this require's diagnosis
      def scanOf(tbl: String): (Long, Long) =
        Option(graft.plans.MergeInto.lastMergeScan.get(s"$wh/b/$tbl")).getOrElse(
          sys.error(s"merge on scale_cat.b.$tbl recorded no executed-plan scan " +
            "evidence — did it decline the merge-on-read path?"))
      val prunedSecs = runMerge("mrg_p", prune = true)
      val (pOpen, pTotal) = scanOf("mrg_p")
      val unprunedSecs = runMerge("mrg_u", prune = false)
      val (uOpen, uTotal) = scanOf("mrg_u")
      println(f"[scale] merge_prune rows=$mrgRows pruned_secs=$prunedSecs%.1f " +
        f"(files $pOpen/$pTotal) unpruned_secs=$unprunedSecs%.1f " +
        f"(files $uOpen/$uTotal) speedup=${unprunedSecs / prunedSecs}%.2fx")
      require(pOpen * 8 <= pTotal,
        "merge target pruning failed to drop unmatched partitions at scale")
      Seq("mrg_p", "mrg_u").foreach(t => spark.sql(s"DROP TABLE scale_cat.b.$t"))
    }
    val totalFiles = graft.sources.ManifestTable.manifest(s"$wh/b/ev", 1).size
    val windowed = spark.table("scale_cat.b.ev")
      .where(col("ts") >= lit("2024-01-11 00:00:00").cast("timestamp_ntz")
        && col("ts") < lit("2024-01-21 00:00:00").cast("timestamp_ntz"))
    val scannedFiles = windowed.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r.scan
    }.map(graft.sources.v2.GraftScans.innermost).collect {
      case p: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan =>
        p.fileIndex.inputFiles.length
    }.sum
    val cs0 = System.nanoTime()
    val catAgg = windowed.agg(count(lit(1)), sum(col("value"))).collect()(0)
    val catSecs = (System.nanoTime() - cs0) / 1e9
    println(f"[scale] catalog_prune_scan files_total=$totalFiles files_scanned=$scannedFiles " +
      f"rows_in_window=${catAgg.getLong(0)} secs=$catSecs%.2f " +
      f"pruned_frac=${1.0 - scannedFiles.toDouble / totalFiles}%.3f")
    require(scannedFiles * 8 < totalFiles,
      "manifest pruning failed to drop out-of-window files at scale")

    // manifest-list scaling: append ONE row into the thousands-of-files
    // table and measure the METADATA bytes the commit wrote. Shard refs
    // carry as manifest-list lines (contents never read), so commit
    // metadata cost follows the ref count + appended entries — never the
    // full file listing the pre-sharding format rewrote per commit.
    val evRoot = s"$wh/b/ev"
    val (refsEv, inlineEv) = graft.sources.ManifestTable.manifestIndex(evRoot, 1)
    val shardBytes = refsEv.map(r =>
      graft.sources.MetaIO.size(s"$evRoot/manifests/${r.rel}")).sum
    def manifestMetaBytes: Long =
      graft.sources.MetaIO.listFilesRec(s"$evRoot/manifests").map(_.getLen).sum
    val bytesBefore = manifestMetaBytes
    val ap0 = System.nanoTime()
    spark.sql("INSERT INTO scale_cat.b.ev VALUES " +
      "(900000001, TIMESTAMP_NTZ '2024-01-02 01:02:03', 7, 1.5)")
    val apSecs = (System.nanoTime() - ap0) / 1e9
    val bytesDelta = manifestMetaBytes - bytesBefore
    println(f"[scale] shard_append files_total=$totalFiles shards=${refsEv.size} " +
      f"inline=${inlineEv.size} full_listing_bytes=$shardBytes " +
      f"commit_meta_bytes=$bytesDelta secs=$apSecs%.2f")
    require(refsEv.nonEmpty && bytesDelta * 4 < shardBytes,
      "a one-file append must write a fraction of the full listing's metadata")

    // rollback at scale: restoring the pre-append snapshot of the
    // thousands-of-files table is a PURE METADATA commit — one manifest
    // carrying the target's shard refs as lines (contents never read),
    // no data file touched. Cherry-pick then republishes the one-row
    // append by re-referencing its entries; its driver cost is one scan
    // of the SOURCE manifest's listing, never data.
    val appendV = graft.sources.ManifestTable.currentVersion(evRoot).get
    val rbBytes0 = manifestMetaBytes
    val rb0 = System.nanoTime()
    graft.sources.ManifestTable.rollbackTo(evRoot, 1L, retain = 10)
    val rbSecs = (System.nanoTime() - rb0) / 1e9
    val rbBytes = manifestMetaBytes - rbBytes0
    println(f"[scale] rollback_meta files_total=$totalFiles " +
      f"commit_meta_bytes=$rbBytes secs=$rbSecs%.2f")
    require(rbBytes * 4 < shardBytes,
      "a rollback must write a fraction of the full listing's metadata")
    val cp0 = System.nanoTime()
    graft.sources.ManifestTable.cherrypick(evRoot, appendV, retain = 10)
    val cpSecs = (System.nanoTime() - cp0) / 1e9
    val cpRows = spark.table("scale_cat.b.ev").count()
    println(f"[scale] cherrypick_meta files_total=$totalFiles " +
      f"rows_after=$cpRows secs=$cpSecs%.2f")
    require(cpRows == catRows + 1, "cherry-pick must restore the appended row")

    // shallow clone at scale: cloning the thousands-of-files table is
    // METADATA-ONLY — one manifest of ext/ references (re-sharded by the
    // commit loop) + descriptor + stats sidecar; ZERO data bytes move
    // however large the source, and every pruning tier works through the
    // external references (the one-day window below opens the same file
    // fraction the source scan does).
    val cl0 = System.nanoTime()
    graft.sources.v2.Maintenance.cloneTable(spark, "scale_cat.b.ev", "scale_cat.b.evc")
    val clSecs = (System.nanoTime() - cl0) / 1e9
    val cloneRoot = s"$wh/b/evc"
    val clonePoolBytes =
      if (!new java.io.File(s"$cloneRoot/data").exists()) 0L
      else graft.sources.MetaIO.listFilesRec(s"$cloneRoot/data").map(_.getLen).sum
    val cloneMetaBytes = graft.sources.MetaIO.listFilesRec(s"$cloneRoot/manifests")
      .map(_.getLen).sum
    val cloneScanned = spark.table("scale_cat.b.evc")
      .where(col("ts") >= lit("2024-01-11 00:00:00").cast("timestamp_ntz")
        && col("ts") < lit("2024-01-12 00:00:00").cast("timestamp_ntz"))
      .queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r.scan
      }.map(graft.sources.v2.GraftScans.innermost).collect {
        case p: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan =>
          p.fileIndex.inputFiles.length
      }.sum
    println(f"[scale] clone_meta files_total=$totalFiles data_bytes_copied=$clonePoolBytes " +
      f"meta_bytes=$cloneMetaBytes files_scanned_1day=$cloneScanned secs=$clSecs%.2f")
    require(clonePoolBytes == 0L, "shallow clone must copy zero data bytes")
    require(cloneScanned > 0 && cloneScanned * 8 < totalFiles,
      "day pruning must survive the clone's external references " +
        "(0 = the plan-collect matched no scan: unwrap drift, not pruning)")
    spark.sql("DROP TABLE scale_cat.b.evc")

    // column statistics at scale: the CTAS commit carried the NDV sketch
    // (one Observation riding the write job — no read-back pass), and
    // the CBO report is METADATA-ONLY — a fold over the pruned manifest
    // listing plus one KB-sized sidecar read — so join planning over the
    // thousands-of-files table costs milliseconds, never a data scan.
    // Metadata-only commits (rollback/cherry-pick) inherit the sketch by
    // parent-stamp walk.
    val ndvBytes = graft.sources.MetaIO.listFilesRec(s"$evRoot/_stats")
      .map(_.getLen).sum
    spark.conf.set("spark.sql.cbo.enabled", "true")
    val pl0 = System.nanoTime()
    val catPlan = spark.table("scale_cat.b.ev").queryExecution.optimizedPlan
    val planSecs = (System.nanoTime() - pl0) / 1e9
    val st0 = System.nanoTime()
    val catStats = catPlan.stats
    val stSecs = (System.nanoTime() - st0) / 1e9
    spark.conf.unset("spark.sql.cbo.enabled")
    val uidNdv = catStats.attributeStats.collectFirst {
      case (a, cs) if a.name == "user_id" => cs.distinctCount.map(_.toLong)
    }.flatten
    println(f"[scale] cbo_stats_meta files_total=$totalFiles sidecar_bytes=$ndvBytes " +
      f"row_count=${catStats.rowCount.getOrElse(BigInt(-1))} " +
      f"user_id_ndv=${uidNdv.getOrElse(-1L)} plan_secs=$planSecs%.2f " +
      f"stats_secs=$stSecs%.2f")
    require(catStats.rowCount.contains(BigInt(cpRows)) &&
      uidNdv.exists(n => n > 90000 && n < 110000),
      "CBO must see the exact row count and an NDV within HLL error at scale")

    // orphan sweep at scale: the thousands-of-files pool is listed BY
    // THE CLUSTER, the referenced set anti-joins as a Dataset (shard
    // contents expand on executors), deletes run per-partition — the
    // driver holds only the manifest index and the orphan list, never
    // the pool listing (the pre-distributed shape was a driver-serial
    // walk: minutes of stall and O(files) memory at a million files).
    val planted = (0 until 64).map { i =>
      val p = s"$evRoot/data/orphan_crashed_$i.parquet"
      graft.sources.MetaIO.write(p, "junk")
      graft.sources.MetaIO.setTimes(p, 1000L) // ancient: past any grace
      p
    }
    val os0 = System.nanoTime()
    val sweptPaths = graft.sources.ManifestTable.removeOrphanFiles(evRoot)
    val osSecs = (System.nanoTime() - os0) / 1e9
    val filesAfter = graft.sources.ManifestTable.liveEntries(evRoot).size
    println(f"[scale] orphan_sweep files_total=$totalFiles planted=${planted.size} " +
      f"swept=${sweptPaths.size} secs=$osSecs%.1f")
    require(planted.forall(p => sweptPaths.exists(_.endsWith(
      p.substring(p.lastIndexOf('/'))))) && !planted.exists(graft.sources.MetaIO.exists),
      "the distributed sweep must delete every planted orphan")
    require(sweptPaths.size == planted.size,
      s"referenced files must survive the sweep (swept ${sweptPaths.size})")
    require(spark.table("scale_cat.b.ev").count() == cpRows,
      "the table reads intact after the sweep")
    require(filesAfter > 4000, "the live listing is untouched")
    spark.sql("DROP TABLE scale_cat.b.ev")

    // per-file column-stats pruning at scale: a value-CLUSTERED layout
    // (what OPTIMIZE ZORDER/range-compaction produces) across hundreds of
    // files must skip on a plain value predicate — no partition column
    // involved. value is uniform on [0,1000): the >=900 window covers
    // ~10% of rows, so with 256 range-clustered files ~90% of the listing
    // should drop at PLAN time off the manifest stats alone.
    val sw0 = System.nanoTime()
    evCat.repartitionByRange(256, col("value")).writeTo("scale_cat.b.evs").create()
    println(f"[scale] stats_ctas rows=$catRows files=256 secs=${(System.nanoTime() - sw0) / 1e9}%.1f")
    val statsTotal = graft.sources.ManifestTable.manifest(s"$wh/b/evs", 1).size
    val vWindowed = spark.table("scale_cat.b.evs").where(col("value") >= 900.0)
    val statsScanned = vWindowed.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r.scan
    }.map(graft.sources.v2.GraftScans.innermost).collect {
      case p: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan =>
        p.fileIndex.inputFiles.length
    }.sum
    val vs0 = System.nanoTime()
    val vAgg = vWindowed.agg(count(lit(1)), sum(col("value"))).collect()(0)
    val vSecs = (System.nanoTime() - vs0) / 1e9
    println(f"[scale] stats_prune_scan files_total=$statsTotal files_scanned=$statsScanned " +
      f"rows_matched=${vAgg.getLong(0)} secs=$vSecs%.2f " +
      f"pruned_frac=${1.0 - statsScanned.toDouble / statsTotal}%.3f")
    require(statsScanned * 5 < statsTotal,
      "column-stats pruning failed to drop out-of-range files at scale")
    spark.sql("DROP TABLE scale_cat.b.evs")

    // writer-side bloom filters at scale: a point lookup on a RANDOM
    // high-cardinality key — every file spans the full key range (PLAIN
    // encoded, no dictionary), so min/max and dictionary row-group
    // filtering prune NOTHING and only the bloom can exclude a row
    // group before page decode. Structural proof via parquet-mr's own
    // row-group filtering (`getFilteredRecordCount` under the pushed
    // equality — the exact machinery the scan runs per task): the
    // bloom-stamped table filters to ~0 candidate records, the plain
    // table keeps every row group. Timing rides along informationally
    // (this VM's timings swing under load).
    val keyed = spark.range(rows).select(
      xxhash64(col("id")).as("k"), (col("id") % 1000L).as("v"))
    spark.sql("CREATE TABLE scale_cat.b.blm (k BIGINT, v BIGINT) " +
      s"TBLPROPERTIES('bloom.columns'='k', 'bloom.ndv'='${rows / 32}')")
    spark.sql("CREATE TABLE scale_cat.b.blmn (k BIGINT, v BIGINT)")
    keyed.repartition(32).writeTo("scale_cat.b.blm").append()
    keyed.repartition(32).writeTo("scale_cat.b.blmn").append()
    def filteredRecords(tbl: String): Long = {
      val hconf = spark.sparkContext.hadoopConfiguration
      val pred = org.apache.parquet.filter2.predicate.FilterApi.eq(
        org.apache.parquet.filter2.predicate.FilterApi.longColumn("k"),
        java.lang.Long.valueOf(42L)) // absent from the xxhash64 keys
      graft.sources.MetaIO.listFilesRec(s"$wh/b/$tbl/data")
        .filter(_.getPath.getName.endsWith(".parquet"))
        .map(st => graft.sources.ParquetProbe
          .filteredCount(st.getPath, hconf, pred)._1).sum
    }
    val bl0 = System.nanoTime()
    val bloomCand = filteredRecords("blm")
    val blSecs = (System.nanoTime() - bl0) / 1e9
    val pn0 = System.nanoTime()
    val plainCand = filteredRecords("blmn")
    val plSecs = (System.nanoTime() - pn0) / 1e9
    // below ~4M rows the per-file key dictionary fits parquet's 1MB
    // dictionary-page cap, stays exact, and excludes the probe key for
    // the NO-bloom table too — the bloom-only contrast needs the
    // dictionary to have fallen back to PLAIN. Gate on the actual
    // encoding rather than a row-count guess.
    val dictSurvived = {
      val hconf = spark.sparkContext.hadoopConfiguration
      import scala.jdk.CollectionConverters._
      graft.sources.MetaIO.listFilesRec(s"$wh/b/blmn/data")
        .filter(_.getPath.getName.endsWith(".parquet")).exists { st =>
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(st.getPath, hconf))
          try r.getFooter.getBlocks.asScala.flatMap(_.getColumns.asScala)
            .filter(_.getPath.toDotString == "k")
            .exists(_.getEncodings.asScala.exists(_.toString.contains("DICTIONARY")))
          finally r.close()
        }
    }
    println(f"[scale] bloom_point_lookup rows=$rows files=32 " +
      f"bloom_candidate_rows=$bloomCand plain_candidate_rows=$plainCand " +
      f"dict_survived=$dictSurvived bloom_secs=$blSecs%.2f plain_secs=$plSecs%.2f")
    if (dictSurvived)
      println("[scale] bloom_point_lookup contrast skipped: the key " +
        "dictionary survived at this scale and is itself an exact " +
        "row-group filter; run with >=8M rows for the bloom-only shape")
    else {
      require(plainCand == rows,
        "without a bloom, nothing can exclude full-range PLAIN row groups")
      require(bloomCand * 10 < plainCand, // FP tolerance: a rare rowgroup may pass
        "the bloom must exclude (nearly) every row group for an absent key")
    }
    spark.sql("DROP TABLE scale_cat.b.blm")
    spark.sql("DROP TABLE scale_cat.b.blmn")

    // merge-on-read at >=10^6 tombstones: the plan ships file NAMES only
    // (positions load task-side behind a pushed __file filter), and the
    // masked-vector columnar read should hold the tombstoned scan near the
    // clean scan's time instead of falling back to row readers.
    evCat.repartition(8).writeTo("scale_cat.b.evm").create()
    def scanEvm(): Long = {
      val t0 = System.nanoTime()
      spark.table("scale_cat.b.evm").agg(count(lit(1)), sum(col("value"))).collect()
      System.nanoTime() - t0
    }
    scanEvm() // warm
    val cleanNs = math.min(scanEvm(), scanEvm())
    spark.conf.set("spark.graft.delete.mode", "merge-on-read")
    try graft.plans.MergeInto.sql(spark,
      "DELETE FROM scale_cat.b.evm WHERE user_id % 10 = 3")
    finally spark.conf.unset("spark.graft.delete.mode")
    val morRoot = s"$wh/b/evm"
    // the DML publishes dv blobs directly (round 13) — count through the
    // slice index, not a parquet read of the delete dir
    val nTomb = graft.sources.DeleteVectors.tombstoneDf(spark, morRoot,
      graft.sources.ManifestTable.liveDeleteEntries(morRoot)).count()
    scanEvm() // warm the delete-applying paths too
    val morNs = math.min(scanEvm(), scanEvm())
    println(f"[scale] mor_scan rows=$catRows tombstones=$nTomb " +
      f"clean_secs=${cleanNs / 1e9}%.2f tombstoned_secs=${morNs / 1e9}%.2f " +
      f"ratio=${morNs.toDouble / cleanNs}%.2f")
    require(nTomb >= 1000000L, "expected a >=10^6-tombstone backlog")

    // deletion vectors at the same scale: a SECOND delete deepens the
    // backlog, rewrite_deletes folds it into ONE dv blob, and the
    // tombstoned scan holds its time — delete application is now one
    // ranged slice read per file instead of a scan over every backlog
    // parquet file, so per-split cost stays flat as the backlog grows
    spark.conf.set("spark.graft.delete.mode", "merge-on-read")
    try graft.plans.MergeInto.sql(spark,
      "DELETE FROM scale_cat.b.evm WHERE user_id % 10 = 7")
    finally spark.conf.unset("spark.graft.delete.mode")
    time("rewrite_deletes -> deletion vector") {
      graft.sources.ManifestTable.rewriteDeletes(spark, morRoot)
    }
    val dvEntries = graft.sources.ManifestTable.liveDeleteEntries(morRoot)
    require(dvEntries.size == 1 &&
      graft.sources.ManifestTable.isDvEntry(dvEntries.head.rel),
      s"backlog must fold into one deletion vector: ${dvEntries.map(_.rel)}")
    val nDvTomb = graft.sources.DeleteVectors
      .tombstoneDf(spark, morRoot, dvEntries).count()
    scanEvm() // warm the slice cache
    val dvNs = math.min(scanEvm(), scanEvm())
    println(f"[scale] dv_scan tombstones=$nDvTomb dv_secs=${dvNs / 1e9}%.2f " +
      f"ratio_vs_clean=${dvNs.toDouble / cleanNs}%.2f")
    require(nDvTomb >= 2000000L, "expected the folded >=2x10^6-tombstone vector")
    spark.sql("DROP TABLE scale_cat.b.evm")

    // DENSE merge-on-read delete: ~90% of rows tombstoned across only 4
    // data files. The direct dv write scales its blob count with POSITION
    // volume (~4M positions per blob), splitting a dense file's positions
    // at a range boundary, so the write parallelizes instead of funneling
    // through a ceil(files/64) = 1 single-task plan.
    evCat.repartition(4).writeTo("scale_cat.b.evd").create()
    spark.conf.set("spark.graft.delete.mode", "merge-on-read")
    val dd0 = System.nanoTime()
    try graft.plans.MergeInto.sql(spark,
      "DELETE FROM scale_cat.b.evd WHERE user_id % 10 < 9")
    finally spark.conf.unset("spark.graft.delete.mode")
    val ddSecs = (System.nanoTime() - dd0) / 1e9
    val denseRoot = s"$wh/b/evd"
    val denseEntries = graft.sources.ManifestTable.liveDeleteEntries(denseRoot)
    val denseTomb = graft.sources.DeleteVectors
      .tombstoneDf(spark, denseRoot, denseEntries).count()
    println(f"[scale] dense_delete rows=$catRows tombstones=$denseTomb " +
      f"blobs=${denseEntries.size} dml_secs=$ddSecs%.2f")
    require(denseEntries.size >= 2 || denseTomb <= (4L << 20),
      s"a dense delete must fan out across dv blobs: ${denseEntries.size}")
    val denseLive = spark.table("scale_cat.b.evd").count()
    require(denseLive == catRows - denseTomb,
      s"tombstoned scan must stay exact: $denseLive vs ${catRows - denseTomb}")
    spark.sql("DROP TABLE scale_cat.b.evd")

    // ONE large tombstoned file: positions apply PER SPLIT (base row
    // recovered from the footer), so a single tombstone no longer
    // collapses the file to one whole-file partition — the shape where a
    // 1 GB file used to lose its 8-way parallelism until compaction.
    evCat.coalesce(1).writeTo("scale_cat.b.evf").create()
    spark.conf.set("spark.graft.delete.mode", "merge-on-read")
    try graft.plans.MergeInto.sql(spark,
      "DELETE FROM scale_cat.b.evf WHERE user_id % 100000 = 3")
    finally spark.conf.unset("spark.graft.delete.mode")
    spark.conf.set("spark.sql.files.maxPartitionBytes", (16 * 1024 * 1024).toString)
    try {
      val tf = spark.table("scale_cat.b.evf")
      val morFileScan = tf.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
      }.head
      val nParts = morFileScan.toBatch.planInputPartitions().length
      val sf0 = System.nanoTime()
      val aggF = tf.agg(count(lit(1)), sum(col("value"))).collect()(0)
      val sfSecs = (System.nanoTime() - sf0) / 1e9
      println(f"[scale] mor_single_file rows=${aggF.getLong(0)} parts=$nParts secs=$sfSecs%.2f")
      require(nParts >= 4,
        s"a single tombstoned file must keep its split parallelism, got $nParts")
    } finally spark.conf.unset("spark.sql.files.maxPartitionBytes")
    spark.sql("DROP TABLE scale_cat.b.evf")

    // equality-delete backlog at >=10^6 keys over a many-partition table:
    // the commit ships only the key file (no data read), and at scan time
    // the key set loads ONCE per executor (path-keyed soft-ref cache) —
    // O(executors × backlog) delete reads instead of O(tasks × backlog).
    evCat.repartition(32).writeTo("scale_cat.b.eve").create()
    val eqKeys = spark.range(1000000L).select((col("id") * 7L).as("event_id"))
    val eq0 = System.nanoTime()
    graft.sources.ManifestTable.appendEqualityDeletes(eqKeys, s"$wh/b/eve")
    val eqCommitSecs = (System.nanoTime() - eq0) / 1e9
    val te = spark.table("scale_cat.b.eve")
    val nPartsE = te.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
    }.head.toBatch.planInputPartitions().length
    val loadsBefore = graft.sources.v2.MorDeletes.eqKeyLoads.get()
    val es0 = System.nanoTime()
    val aggE = te.agg(count(lit(1)), sum(col("value"))).collect()(0)
    val eqScanSecs = (System.nanoTime() - es0) / 1e9
    val eqLoads = graft.sources.v2.MorDeletes.eqKeyLoads.get() - loadsBefore
    println(f"[scale] eq_delete_backlog keys=1000000 rows_left=${aggE.getLong(0)} " +
      f"parts=$nPartsE key_loads=$eqLoads commit_secs=$eqCommitSecs%.2f scan_secs=$eqScanSecs%.2f")
    require(nPartsE > 1 && eqLoads <= 1L,
      s"a 10^6-key eq backlog must load once per executor, loaded $eqLoads across $nPartsE parts")
    spark.sql("DROP TABLE scale_cat.b.eve")

    // partition spec evolution × type widening at >=10^7 rows: THREE file
    // generations under different layouts (days → months → days again)
    // with an INT→BIGINT widening between the first two. A 10-day window
    // must prune under EVERY historical layout simultaneously — day dirs
    // for generations 1 and 3, month dirs for generation 2 — and the
    // aggregate must read int64 values through files whose physical
    // column is still INT32.
    def seGen(rem: Int, idOff: Long) = spark.range(catRows)
      .where(col("id") % 3 === rem)
      .select(
        (if (idOff == 0L) col("id").cast("int")
         else (col("id") + idOff)).as("event_id"),
        expr(s"timestamp_micros(1704067200000000 + (id % $nDays) * 86400000000" +
          " + (id % 86400) * 1000000)").cast("timestamp_ntz").as("ts"),
        (col("id") % 100000L).as("user_id"),
        (pmod(xxhash64(col("id")), lit(100000)).cast("double") / 100.0).as("value"))
    val se0 = System.nanoTime()
    seGen(0, 0L).writeTo("scale_cat.b.sev")
      .partitionedBy(org.apache.spark.sql.functions.partitioning.days(col("ts")))
      .create()
    spark.sql("CALL scale_cat.system.evolve_partition(`table` => 'b.sev', spec => 'months(ts)')")
    spark.sql("ALTER TABLE scale_cat.b.sev ALTER COLUMN event_id TYPE BIGINT")
    seGen(1, 3000000000L).writeTo("scale_cat.b.sev").append()
    spark.sql("CALL scale_cat.system.evolve_partition(`table` => 'b.sev', spec => 'days(ts)')")
    seGen(2, 4000000000L).writeTo("scale_cat.b.sev").append()
    println(f"[scale] spec_evo_ctas rows=$catRows gens=3 secs=${(System.nanoTime() - se0) / 1e9}%.1f")
    val seRoot = s"$wh/b/sev"
    val seTotal = graft.sources.ManifestTable.liveEntries(seRoot).size
    val seWindowed = spark.table("scale_cat.b.sev")
      .where(col("ts") >= lit("2024-01-11 00:00:00").cast("timestamp_ntz")
        && col("ts") < lit("2024-01-21 00:00:00").cast("timestamp_ntz"))
    val seScanned = seWindowed.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r.scan
    }.map(graft.sources.v2.GraftScans.innermost).collect {
      case p: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan =>
        p.fileIndex.inputFiles.length
    }.sum
    val ses0 = System.nanoTime()
    val seAgg = seWindowed
      .agg(count(lit(1)), max(col("event_id")), sum(col("value"))).collect()(0)
    val seSecs = (System.nanoTime() - ses0) / 1e9
    println(f"[scale] spec_evo_scan files_total=$seTotal files_scanned=$seScanned " +
      f"rows_in_window=${seAgg.getLong(0)} max_id=${seAgg.getLong(1)} secs=$seSecs%.2f " +
      f"pruned_frac=${1.0 - seScanned.toDouble / seTotal}%.3f")
    // window covers 10/128 day dirs (gens 1+3) and ~1/4 of month dirs
    // (gen 2): anything under a 4x drop means one layout stopped pruning
    require(seScanned * 4 < seTotal,
      "mixed-layout pruning failed: a historical spec stopped pruning at scale")
    require(seAgg.getLong(1) > 4000000000L,
      "widened column failed to surface int64 values across generations")
    val seExpect = (0L until catRows).count(i => (i % nDays) >= 10 && (i % nDays) < 20)
    require(seAgg.getLong(0) == seExpect,
      s"mixed-layout window miscounted: got ${seAgg.getLong(0)}, want $seExpect")
    spark.sql("DROP TABLE scale_cat.b.sev")

    // Clustered writes at scale: a 64-task append into a 128-day layout
    // must land ~one file group per day (the hash write distribution),
    // not tasks x days. 64 x 128 would be 8192 files; the REBALANCE
    // bound below allows AQE skew splits but catches any fan-out.
    val cwRows = catRows / 4
    spark.conf.set("spark.graft.write.distribution", "hash")
    val cw1 = System.nanoTime()
    spark.sql("CREATE TABLE scale_cat.b.cwr (event_id BIGINT, ts TIMESTAMP_NTZ, value DOUBLE) PARTITIONED BY (days(ts))")
    spark.range(cwRows).repartition(64)
      .select(col("id").as("event_id"),
        expr(s"timestamp_micros(1704067200000000 + (id % $nDays) * 86400000000)")
          .cast("timestamp_ntz").as("ts"),
        (col("id") % 1000).cast("double").as("value"))
      .writeTo("scale_cat.b.cwr").append()
    val cwSecs = (System.nanoTime() - cw1) / 1e9
    val cwRoot = s"$wh/b/cwr"
    val cwFiles = graft.sources.ManifestTable.liveEntries(cwRoot).size
    println(f"[scale] clustered_write rows=$cwRows days=$nDays files=$cwFiles secs=$cwSecs%.1f")
    require(cwFiles < nDays * 4,
      s"hash write distribution failed: $cwFiles files for $nDays days (64-task input)")
    require(spark.table("scale_cat.b.cwr").count() == cwRows, "clustered write lost rows")
    spark.sql("DROP TABLE scale_cat.b.cwr")

    // Storage-partitioned join at scale: two co-bucketed tables joined on
    // the raw key — with SPJ the executed plan runs ZERO shuffles; the
    // same join without it shuffles both sides. The timing contrast is
    // the 100 TB story: co-partitioned fact joins move no data.
    val spjRows = catRows / 2
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    Seq("spa", "spb").foreach { t =>
      spark.sql(s"CREATE TABLE scale_cat.b.$t (k BIGINT, v DOUBLE) PARTITIONED BY (bucket(32, k))")
      spark.range(spjRows).repartition(64)
        .select(col("id").as("k"), (col("id") % 997).cast("double").as("v"))
        .writeTo(s"scale_cat.b.$t").append()
    }
    // group on k itself: the key-grouped report satisfies the aggregate's
    // distribution too, so the whole join+agg pipeline runs shuffle-free
    def spjJoinDf = spark.table("scale_cat.b.spa")
      .join(spark.table("scale_cat.b.spb").select(col("k").as("k2"), col("v").as("v2")),
        col("k") === col("k2"))
      .groupBy(col("k"))
      .agg(graft.Dsl.dsum(col("v") + col("v2")).as("sv"))
    def countShuffles(p: org.apache.spark.sql.execution.SparkPlan): Int = {
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      p match {
        case a: AdaptiveSparkPlanExec => countShuffles(a.executedPlan)
        case q: QueryStageExec =>
          (if (q.plan.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike]) 1
           else 0) + countShuffles(q.plan)
        case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike =>
          1 + s.children.map(countShuffles).sum
        case other => other.children.map(countShuffles).sum
      }
    }
    val spjDf = spjJoinDf
    val sj0 = System.nanoTime()
    val spjGroups = spjDf.count()
    val spjSecs = (System.nanoTime() - sj0) / 1e9
    val spjShuffles = countShuffles(spjDf.queryExecution.executedPlan)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
    val offDf = spjJoinDf
    val oj0 = System.nanoTime()
    val offGroups = offDf.count()
    val offSecs = (System.nanoTime() - oj0) / 1e9
    val offShuffles = countShuffles(offDf.queryExecution.executedPlan)
    println(f"[scale] spj_join rows=$spjRows spj_secs=$spjSecs%.1f spj_shuffles=$spjShuffles " +
      f"shuffled_secs=$offSecs%.1f shuffled_shuffles=$offShuffles speedup=${offSecs / spjSecs}%.2f")
    require(spjShuffles == 0, s"SPJ must elide every exchange (got $spjShuffles)")
    require(offShuffles > 0 && spjGroups == offGroups,
      "SPJ and shuffled join must agree (and the baseline must actually shuffle)")
    spark.sql("DROP TABLE scale_cat.b.spa")
    spark.sql("DROP TABLE scale_cat.b.spb")

    // Sorted storage-partitioned MERGE JOIN at scale: both sides
    // identity-partitioned on the join prefix and DECLARED sorted on the
    // second key (sort.order — one stamped sorted file per partition),
    // so the executed merge join runs with ZERO exchanges AND ZERO
    // sorts; the same join with v2 bucketing off pays two shuffles and
    // two sorts. At 100 TB that is the delta between streaming two
    // co-located sorted tables through a merge and materializing both
    // sides of a sort twice behind an exchange.
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    Seq("sma", "smb").foreach { t =>
      spark.sql(s"CREATE TABLE scale_cat.b.$t (region BIGINT, ts BIGINT, v DOUBLE) " +
        "PARTITIONED BY (region) TBLPROPERTIES ('sort.order'='ts')")
      spark.sql(s"INSERT INTO scale_cat.b.$t SELECT id % 32, " +
        s"(id * ${if (t == "sma") 37 else 61}) % 1000000, id * 0.5 " +
        s"FROM range($spjRows)")
    }
    def smjDf = spark.table("scale_cat.b.sma")
      .join(spark.table("scale_cat.b.smb").withColumnRenamed("v", "v2"),
        Seq("region", "ts"))
      .groupBy(col("region")).agg(count(lit(1)).as("n"))
    def planNodes(df: org.apache.spark.sql.DataFrame) =
      graft.sources.v2.GraftScans.executedNodes(df.queryExecution.executedPlan)
    val smDf = smjDf
    val sm0 = System.nanoTime()
    val smGroups = smDf.count()
    val smSecs = (System.nanoTime() - sm0) / 1e9
    val smNodes = planNodes(smDf)
    val smSorts = smNodes.count(_.isInstanceOf[org.apache.spark.sql.execution.SortExec])
    val smShuffles = smNodes.count(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike])
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
    val smOffDf = smjDf
    val smo0 = System.nanoTime()
    val smOffGroups = smOffDf.count()
    val smOffSecs = (System.nanoTime() - smo0) / 1e9
    val smOffNodes = planNodes(smOffDf)
    val smOffSorts = smOffNodes.count(
      _.isInstanceOf[org.apache.spark.sql.execution.SortExec])
    println(f"[scale] sorted_merge_join rows=$spjRows sorted_secs=$smSecs%.1f " +
      f"sorts=$smSorts shuffles=$smShuffles " +
      f"shuffled_secs=$smOffSecs%.1f shuffled_sorts=$smOffSorts " +
      f"speedup=${smOffSecs / smSecs}%.2f")
    require(smNodes.exists(_.nodeName.contains("SortMergeJoin")) &&
      smSorts == 0 && smShuffles == 0,
      s"sorted SPJ merge join must elide every sort and exchange " +
        s"(sorts=$smSorts shuffles=$smShuffles)")
    require(smOffSorts > 0 && smGroups == smOffGroups,
      "sorted and shuffled joins must agree (and the baseline must sort)")
    spark.conf.unset("spark.sql.requireAllClusterKeysForCoPartition")
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.sql("DROP TABLE scale_cat.b.sma")
    spark.sql("DROP TABLE scale_cat.b.smb")

    // Change data feed at scale: the streaming initial snapshot reads the
    // whole table (vectorized — no delete slices), then a small MOR
    // delete's window costs ∝ the CHANGE, not the table — the property
    // that makes incremental gold viable at 100 TB
    spark.range(catRows).select(col("id").as("k"),
      (col("id") % 1000L).as("g"),
      (pmod(xxhash64(col("id")), lit(100000)).cast("double") / 100.0).as("v"))
      .repartition(32).writeTo("scale_cat.b.cdf").create()
    val cdfCk = java.nio.file.Files.createTempDirectory("scale_cdf_ck").toString
    def drainChanges(): Double = {
      val t0 = System.nanoTime()
      val q = spark.readStream.table("scale_cat.b.cdf.changes")
        .writeStream.format("noop")
        .option("checkpointLocation", cdfCk)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      (System.nanoTime() - t0) / 1e9
    }
    val snapSecs = drainChanges()
    spark.conf.set("spark.graft.delete.mode", "merge-on-read")
    try graft.plans.MergeInto.sql(spark,
      "DELETE FROM scale_cat.b.cdf WHERE k % 100000 = 7")
    finally spark.conf.unset("spark.graft.delete.mode")
    val windowSecs = drainChanges()
    println(f"[scale] cdf_stream rows=$catRows snapshot_secs=$snapSecs%.1f " +
      f"delete_window_secs=$windowSecs%.1f ratio=${windowSecs / snapSecs}%.2f")
    require(windowSecs < snapSecs,
      "a small delete window must cost less than the initial snapshot")
    spark.sql("DROP TABLE scale_cat.b.cdf")

    // Deep equality-delete backlog: k eq-delete commits inside ONE change
    // window plan a MERGED pass — delete-eq slices ∝ target file splits,
    // never k × splits, so a CDC writer's eq backlog doesn't multiply the
    // window's scan cost
    val eqbRows = math.max(catRows / 5, 2000000L)
    spark.range(eqbRows).select(col("id").as("k"), (col("id") % 97L).as("g"))
      .repartition(8).writeTo("scale_cat.b.eqb").create()                 // v1
    val eqbRoot = graft.sources.v2.VersionedCatalog.warehouseOf("scale_cat").get + "/b/eqb"
    val kCommits = 8
    (1 to kCommits).foreach(i => graft.sources.ManifestTable.appendEqualityDeletes(
      spark.range(i * 1000L, i * 1000L + 50L).select(col("id").as("k")), eqbRoot))
    val eqbScan = spark.table("scale_cat.b.eqb.changes")
      .queryExecution.executedPlan.collect {
        case bs: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => bs.scan
      }.collectFirst { case s: graft.sources.v2.ChangeFeedScan => s }.get
    val eqbSlices = eqbScan.toBatch.planInputPartitions().collect {
      case cp: graft.sources.v2.ChangePartition if cp.kind == "delete-eq" => cp
    }
    val distinctSplits = eqbSlices.map(p =>
      (p.relEnc.get, p.inner.asInstanceOf[
        org.apache.spark.sql.execution.datasources.FilePartition]
        .files.map(f => (f.filePath.toString, f.start)).toSeq)).distinct.size
    require(eqbSlices.length == distinctSplits,
      s"merged pass: one slice per (file, split), got ${eqbSlices.length} vs $distinctSplits")
    require(eqbSlices.forall(_.eqStages.count(_.emit) == kCommits),
      "every window spec must ride the one pass as a stage")
    val eb0 = System.nanoTime()
    val eqbDeletes = spark.table("scale_cat.b.eqb.changes")
      .where(col("_change_type") === "delete").count()
    val eqbSecs = (System.nanoTime() - eb0) / 1e9
    println(f"[scale] cdf_eq_backlog rows=$eqbRows eq_commits=$kCommits " +
      f"slices=${eqbSlices.length} delete_events=$eqbDeletes secs=$eqbSecs%.1f")
    require(eqbDeletes == kCommits * 50L, s"exact death count, got $eqbDeletes")
    spark.sql("DROP TABLE scale_cat.b.eqb")

    spark.stop()
  }
}
