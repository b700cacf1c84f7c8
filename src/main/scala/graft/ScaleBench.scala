package graft

import org.apache.spark.sql.SparkSession

import graft.bronze.Generate

/** Scale diagnostic: generate N reference-shaped transactions entirely in
  * the engine (shuffle-free, executor-parallel) and run the reference gold
  * monthly_balance over them — measures engine throughput well past the
  * test fixtures' size. Usage: runMain graft.ScaleBench [rows]
  */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 50000000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

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
    spark.stop()
  }
}
