package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.sources.Formats

/** The reference's raison d'être as a measurement: write the same data
  * through each file format and time write / full-scan read / filtered
  * aggregate per format, plus resulting size on disk. Prints one JSON line
  * per format. Usage: runMain graft.FormatBench [sfDir]
  */
object FormatBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.GraftLocalFs.install(spark)
    import org.apache.spark.sql.functions._

    val base = Files.createTempDirectory("format_bench").toString
    val df = Tables.lineitem(spark, sfDir).cache()
    val rows = df.count()   // materialize once so write timings are pure

    def secs[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    def dirBytes(p: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles.map(walk).sum else f.length
      walk(new java.io.File(p))
    }

    Formats.fanoutFormats.foreach { fmt =>
      val path = s"$base/lineitem_$fmt"
      val (_, wSecs) = secs {
        var w = df.write.mode("overwrite").format(fmt)
        if (fmt == "parquet") w = w.option("compression", "snappy")
        w.save(path)
      }
      val (readRows, rSecs) = secs(spark.read.format(fmt).load(path).count())
      val (_, aggSecs) = secs {
        spark.read.format(fmt).load(path)
          .where(col("l_shipdate") >= "1997-01-01")
          .groupBy(col("l_returnflag"))
          .agg(sum(col("l_extendedprice").cast("decimal(18,6)"))).count()
      }
      require(readRows == rows, s"$fmt round-trip lost rows")
      println(f"""{"format":"$fmt","rows":$rows,"write_sec":$wSecs%.2f,"read_sec":$rSecs%.2f,"filtered_agg_sec":$aggSecs%.2f,"bytes":${dirBytes(path)}}""")
    }
    spark.stop()
  }
}
