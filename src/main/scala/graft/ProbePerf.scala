package graft

import org.apache.spark.sql.SparkSession

/** Perf diagnostic main: time any named queries at a given SF dir.
  * Usage: runMain graft.ProbePerf <sfDir> <query> [query ...]
  *
  *  - SPARK_GRAFT_PROBE_ROUNDS: timed rounds per query after one untimed
  *    warm round (default 2) — min and all samples print, so a noisy
  *    neighbor event is visible instead of silently poisoning the number.
  *  - SPARK_GRAFT_CONF: comma-separated `key=value` session-conf
  *    overrides applied before any query runs — the A/B lever for
  *    bisecting a regression to a feature toggle
  *    (e.g. `spark.graft.stats.histogram=false`).
  */
object ProbePerf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.GraftLocalFs.install(spark)
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(',').filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k.trim, v.trim)
        println(s"[perf] conf $k=$v")
      })
    val rounds = sys.env.getOrElse("SPARK_GRAFT_PROBE_ROUNDS", "2").toInt
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq
    names.foreach { n =>
      // one untimed warm round (JIT/classload), then the timed rounds
      SparkEntry.queries(n)(spark, dir).count()
      val ts = (1 to rounds).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[perf] $n min=${ts.min}%.2f s samples=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
