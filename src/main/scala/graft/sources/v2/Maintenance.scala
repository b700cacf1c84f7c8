package graft.sources.v2

import org.apache.spark.sql.SparkSession

import graft.sources.ManifestTable

/** Catalog-addressed table maintenance — Iceberg's
  * `rewrite_data_files` / `expire_snapshots` ergonomics
  * (`CALL catalog.system.rewrite_data_files('tbl')`) for versioned
  * catalog tables: the caller speaks `cat.ns.tbl`, the resolution of
  * warehouse root, storage format, hidden-day partition source and
  * logical→physical column mapping all come from the catalog descriptor.
  * The underlying ops ([[ManifestTable.compact]] /
  * [[ManifestTable.expireOldVersions]]) stay available for bare roots.
  */
object Maintenance {

  /** Resolve `cat.ns.tbl` against a configured [[VersionedCatalog]] (same
    * conf-first resolution the DML layer uses — works before the plugin's
    * first instantiation). */
  private def resolve(spark: SparkSession, ident: String): (String, VersionedCatalog.Meta) = {
    val parts = ident.split('.')
    require(parts.length == 3, s"expected cat.ns.tbl, got $ident")
    require(spark.conf.getOption(s"spark.sql.catalog.${parts(0)}")
      .contains(classOf[VersionedCatalog].getName),
      s"${parts(0)} is not a VersionedCatalog")
    val wh = spark.conf.get(s"spark.sql.catalog.${parts(0)}.warehouse")
    val root = s"$wh/${parts(1)}/${parts(2)}"
    val meta = VersionedCatalog.readMeta(root).getOrElse(
      throw new IllegalArgumentException(s"no such table $ident (no descriptor at $root)"))
    (root, meta)
  }

  private def retainOf(spark: SparkSession): Int =
    spark.conf.get("spark.graft.versioned.retain", "2").toInt

  /** OPTIMIZE: rewrite the live snapshot into ~`targetFileBytes` files
    * (per day for partitioned tables), keeping the table's declared
    * format, physical column names and commit properties. Old files age
    * out with their manifests. Returns the new version id. */
  def optimize(spark: SparkSession, ident: String,
               targetFileBytes: Long = 128L << 20): Long = {
    val (root, meta) = resolve(spark, ident)
    ManifestTable.compact(spark, root,
      partitionDayOf = meta.dayOf.map(meta.physicalName),
      targetFileBytes = targetFileBytes,
      retain = retainOf(spark),
      format = Some(meta.format))
  }

  /** Expire retained snapshots beyond `retain` and GC unreferenced pool
    * files (orphan claims included). Metadata + file deletes only. */
  def expireSnapshots(spark: SparkSession, ident: String, retain: Int = 1): Unit = {
    val (root, _) = resolve(spark, ident)
    ManifestTable.expireOldVersions(root, retain)
  }

  /** Retention DELETE by identifier: drop all data strictly older than
    * `olderThanTs` (`yyyy-MM-dd HH:mm:ss`, interpreted in the column's
    * timeline). Routes through the engine's DELETE lowering, so whole
    * days covered by the bound drop at the MANIFEST (no data read) and
    * only a partially-covered boundary day rewrites. */
  def deleteOlderThan(spark: SparkSession, ident: String, olderThanTs: String): Unit = {
    val (_, meta) = resolve(spark, ident)
    val ts = meta.dayOf.getOrElse(throw new IllegalArgumentException(
      s"$ident has no hidden-day partition source; use DELETE FROM with an explicit predicate"))
    val tsType = meta.schema.fields
      .find(_.name.equalsIgnoreCase(ts))
      .map(_.dataType.typeName).getOrElse("timestamp")
    val litType = if (tsType == "timestamp_ntz") "TIMESTAMP_NTZ" else "TIMESTAMP"
    graft.plans.MergeInto.sql(spark,
      s"DELETE FROM $ident WHERE $ts < $litType '$olderThanTs'")
    ()
  }
}
