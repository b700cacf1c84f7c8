package graft

import org.apache.spark.sql.SparkSession

/** Writes each named query's `.explain("formatted")` output to
  * `<outDir>/<query>_<tag>.txt` — the plan evidence files the
  * optimization rounds commit under plans/rNN/.
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <tag> <query> [query ...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(dir, outDir, tag, rest @ _*) = args.toSeq.toArray[String]: @unchecked
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.GraftLocalFs.install(spark)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    rest.foreach { n =>
      val df = SparkEntry.queries(n)(spark, dir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${n}_$tag.txt"), txt)
      println(s"[plandump] $n -> $outDir/${n}_$tag.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
