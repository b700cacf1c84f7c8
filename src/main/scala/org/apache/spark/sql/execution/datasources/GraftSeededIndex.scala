package org.apache.spark.sql.execution.datasources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/** File-index construction WITHOUT file-system listing — Iceberg's
  * plan-from-manifest property. Spark's [[InMemoryFileIndex]] lists its
  * root paths on construction; over a table addressed as thousands of
  * explicit file paths that is a distributed job of one-stat tasks
  * (measured ~6.5 s at 4096 files, a driver stall per query; at the
  * million-file scale a 100 TB table reaches, strictly worse). The graft
  * manifest already records every file's byte length and move-in mtime
  * (`__bytes`, [[graft.sources.FileStats]]), so the index can be seeded
  * through a pre-populated [[FileStatusCache]]: `listLeafFiles` consults
  * the cache per root path and only cache MISSES — entries committed
  * before the length rode the manifest — fall back to real listing.
  *
  * Lives in this package for access to the `private[sql]` cache seam;
  * contains no Spark-internal copies. */
object GraftSeededIndex {

  /** An [[InMemoryFileIndex]] over `files`, resolving the sized ones
    * from `sizes` (path → (byte length, mtime millis)) with zero FS
    * access. Splits and size estimates use the recorded exact length. */
  def apply(spark: SparkSession, files: Seq[Path],
            sizes: Map[Path, (Long, Long)],
            parameters: Map[String, String],
            userSpecifiedSchema: Option[StructType]): InMemoryFileIndex = {
    // the index compares QUALIFIED paths (scheme + authority) throughout
    // — cache keys and the statuses' own paths must be qualified too, or
    // every lookup misses and allFiles() comes back empty. Qualification
    // is string work against one resolved FileSystem, not a file probe.
    val hadoopConf = spark.sessionState.newHadoopConfWithOptions(parameters)
    val fs = files.headOption.map(_.getFileSystem(hadoopConf))
    def qualify(p: Path): Path = fs.map(f => f.makeQualified(p)).getOrElse(p)
    val qualified = sizes.map { case (p, v) => qualify(p) -> v }
    val cache = new FileStatusCache {
      override def getLeafFiles(path: Path): Option[Array[FileStatus]] =
        qualified.get(qualify(path)).map { case (len, mtime) =>
          Array(new FileStatus(len, false, 1, 128L << 20, mtime, qualify(path)))
        }
      override def putLeafFiles(path: Path, leafFiles: Array[FileStatus]): Unit = ()
      override def invalidateAll(): Unit = ()
    }
    new InMemoryFileIndex(spark, files, parameters, userSpecifiedSchema, cache)
  }

  /** A DataFrame over `files` through a V1 [[FileFormat]], planned from
    * the seeded index — the listing-free construction for the engine's
    * INTERNAL reads (DML read-modify-write bases, maintenance rewrites),
    * which `spark.read.format(...).load(paths)` would re-list per call.
    * `userSchema` pins the FILE schema (schema-evolution reads); absent,
    * the format infers it from one footer (a single small read — the
    * listing, not the footer, was the cost). `_metadata` columns resolve
    * as on any V1 file relation (MOR row identity needs them). */
  def read(spark: SparkSession, format: String, files: Seq[Path],
           sizes: Map[Path, (Long, Long)], options: Map[String, String],
           userSchema: Option[StructType]): org.apache.spark.sql.DataFrame = {
    val index = apply(spark, files, sizes, options, userSchema)
    val fmt: FileFormat = format match {
      case "parquet" =>
        new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
      case "orc" => new org.apache.spark.sql.execution.datasources.orc.OrcFileFormat
      case "avro" => new graft.sources.avro.AvroFileFormat
      case other => throw new IllegalArgumentException(s"unknown format $other")
    }
    // the DataSource discipline: the FILE schema excludes partition-dir
    // columns (the index types those from `userSchema` during inference;
    // pool files never carry them in-body)
    val partNames = index.partitionSchema.fieldNames.toSet
    val dataSchema = userSchema
      .map(s => StructType(s.fields.filterNot(f => partNames.contains(f.name))))
      .orElse(fmt.inferSchema(spark, options, index.allFiles())).getOrElse(
        throw new IllegalStateException(
          s"could not infer a $format schema for ${files.headOption.getOrElse("")}"))
    val rel = HadoopFsRelation(index, index.partitionSchema, dataSchema,
      bucketSpec = None, fmt, options)(spark)
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      LogicalRelation(rel, isStreaming = false))
  }
}
