package graft

import org.apache.spark.sql.SparkSession

/** Perf diagnostic main: time any named queries twice (cold, warm) at a
  * given SF dir. Usage: runMain graft.ProbePerf <sfDir> <query> [query ...]
  */
object ProbePerf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq
    names.foreach { n =>
      for (round <- Seq("cold", "warm")) {
        val t0 = System.nanoTime()
        val rows = SparkEntry.queries(n)(spark, dir).count()
        println(f"[perf] $n $round: ${(System.nanoTime() - t0) / 1e9}%.2f s ($rows rows)")
      }
    }
    spark.stop()
  }
}
