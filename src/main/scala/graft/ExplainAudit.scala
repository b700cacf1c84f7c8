package graft

import org.apache.spark.sql.SparkSession

/** Plan audit main: prints the scan-relevant lines (PushedFilters,
  * ReadSchema, DataFilters) plus codegen spans of each named query's
  * physical plan. Usage: runMain graft.ExplainAudit [sfDir] [query ...]
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.GraftLocalFs.install(spark)
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      val plan = SparkEntry.queries(n)(spark, dir).queryExecution.executedPlan.toString
      val interesting = plan.linesIterator.filter { l =>
        l.contains("PushedFilters") || l.contains("ReadSchema") ||
          l.contains("Scan parquet") || l.contains("BatchScan") ||
          l.contains("WholeStageCodegen") ||
          l.contains("Exchange") || l.contains("BroadcastHashJoin") ||
          l.contains("SortMergeJoin")
      }.map(_.trim.take(220)).toSeq
      println(s"=== $n ===")
      interesting.foreach(l => println("  " + l))
    }
    spark.stop()
  }
}
