package org.apache.spark.sql.execution.datasources.v2

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.PartitioningAwareFileIndex
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Bridge for [[graft.sources.v2.VersionedScanBuilder]]'s delegation into
  * Spark's native parquet scan: `ParquetScanBuilder`'s filter state is
  * protected and `sessionState` is private[sql], so an external builder
  * that has already done its own file pruning and filter translation
  * assembles the `ParquetScan` here — same construction the builder's own
  * `build()` performs, minus the pushdown bookkeeping the caller did
  * upstream. */
object GraftScanBridge {
  /** V2 runtime-filter predicates → V1 filters (the translation Spark's
    * own file sources use); `PredicateUtils` is private[sql], hence the
    * forwarder. Untranslatable predicates drop out — safe, since runtime
    * filters are pure pruning hints and the join re-applies them exactly. */
  def predicatesToV1(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Array[Filter] =
    org.apache.spark.sql.internal.connector.PredicateUtils.toV1(predicates)

  /** A vectorized parquet scan over an explicit (pre-pruned) file index.
    * `pushedFilters` may include anything V1-translatable; the parquet
    * reader keeps only the convertible subset for row-group pruning and
    * Spark re-applies every predicate post-scan regardless. */
  def parquetScan(spark: SparkSession, index: PartitioningAwareFileIndex,
                  dataSchema: StructType, readDataSchema: StructType,
                  readPartitionSchema: StructType, pushedFilters: Array[Filter],
                  options: CaseInsensitiveStringMap): ParquetScan = {
    val hadoopConf = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.newHadoopConfWithOptions(options.asCaseSensitiveMap().asScala.toMap)
    ParquetScan(spark, hadoopConf, index, dataSchema, readDataSchema,
      readPartitionSchema, pushedFilters, options)
  }

  /** The orc leg of the same delegation — per-table format routing in
    * [[graft.sources.v2.VersionedScanBuilder]]: Spark's native OrcScan
    * (vectorized reader, search-argument row pruning) over the pre-pruned
    * manifest file index. */
  def orcScan(spark: SparkSession, index: PartitioningAwareFileIndex,
              dataSchema: StructType, readDataSchema: StructType,
              readPartitionSchema: StructType, pushedFilters: Array[Filter],
              options: CaseInsensitiveStringMap)
      : org.apache.spark.sql.execution.datasources.v2.orc.OrcScan = {
    val hadoopConf = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.newHadoopConfWithOptions(options.asCaseSensitiveMap().asScala.toMap)
    org.apache.spark.sql.execution.datasources.v2.orc.OrcScan(
      spark, hadoopConf, index, dataSchema, readDataSchema,
      readPartitionSchema, options, None, pushedFilters)
  }
}
