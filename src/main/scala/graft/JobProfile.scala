package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-job wall-clock profiler for one named query (guide §1: find where
  * the time goes before touching anything). Installs a SparkListener,
  * runs the query through the same noop sink Bench uses, and prints every
  * Spark job's duration with its SQL-execution description and callsite —
  * the breakdown that tells a 12-job maintenance query from a one-scan
  * aggregate. Usage: runMain graft.JobProfile <sfDir> <query> [query ...]
  * (SPARK_GRAFT_CONF honored like ProbePerf).
  */
object JobProfile {
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
        println(s"[prof] conf $k=$v")
      })
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("call_optimize_scan")

    case class Job(id: Int, desc: String, site: String, start: Long, var end: Long = 0L)
    val jobs = scala.collection.mutable.ArrayBuffer.empty[Job]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val d = Option(e.properties.getProperty("spark.job.description")).getOrElse("")
        val c = Option(e.properties.getProperty("callSite.short")).getOrElse("")
        jobs += Job(e.jobId, d.take(90), c.take(60), e.time)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.find(_.id == e.jobId).foreach(_.end = e.time)
      }
    }
    names.foreach { n =>
      // warm round: JIT/classload/codegen off the measured pass
      SparkEntry.queries(n)(spark, dir).write.format("noop").mode("overwrite").save()
      jobs.synchronized(jobs.clear())
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir).write.format("noop").mode("overwrite").save()
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the listener bus drain the last JobEnd
      spark.sparkContext.removeSparkListener(listener)
      println(f"=== $n total=$total%.2f s, ${jobs.size} jobs, job-time sum=${jobs.map(j => (j.end - j.start) / 1e3).sum}%.2f s ===")
      var prevEnd = 0L
      jobs.synchronized(jobs.toSeq).sortBy(_.start).foreach { j =>
        val gap = if (prevEnd == 0) 0.0 else (j.start - prevEnd) / 1e3
        prevEnd = math.max(prevEnd, j.end)
        println(f"  job ${j.id}%3d ${(j.end - j.start) / 1e3}%6.2f s  gap=$gap%5.2f s  ${j.site}  ${j.desc}")
      }
    }
    spark.stop()
  }
}
