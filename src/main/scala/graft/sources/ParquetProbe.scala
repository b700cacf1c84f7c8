package graft.sources

/** Driver-side parquet ROW-GROUP filtering probe — the exact machinery
  * each scan task runs (stats + dictionary + bloom filters under a
  * pushed predicate), exposed for structural verification: bench points
  * and specs assert "this file filters to N candidate records" instead
  * of timing page decodes (unsound on a loaded VM) or reading task
  * metrics (Spark 4's vectorized reader record-filters its output rows,
  * and local-FS statistics miss page reads — neither observes row-group
  * exclusion). One footer (+ KB-scale filter structures) read per call,
  * no pages. */
private[graft] object ParquetProbe {

  /** (candidate records under `pred`, total records) of one parquet
    * file. The total comes from the raw footer — the reader's own
    * `getRecordCount` is filter-aware and reads 0 once every row group
    * is excluded. */
  def filteredCount(path: org.apache.hadoop.fs.Path,
                    conf: org.apache.hadoop.conf.Configuration,
                    pred: org.apache.parquet.filter2.predicate.FilterPredicate)
      : (Long, Long) = {
    val opts = org.apache.parquet.ParquetReadOptions.builder(
        new org.apache.parquet.conf.HadoopParquetConfiguration(conf))
      .withRecordFilter(org.apache.parquet.filter2.compat.FilterCompat.get(pred))
      .useBloomFilter(true).useStatsFilter(true).useDictionaryFilter(true)
      .build()
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(path, conf), opts)
    try {
      import scala.jdk.CollectionConverters._
      (r.getFilteredRecordCount,
        r.getFooter.getBlocks.asScala.map(_.getRowCount).sum)
    } finally r.close()
  }
}
