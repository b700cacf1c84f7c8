package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ManifestTable

/** Write distribution (Iceberg's `write.distribution-mode=hash` shape):
  * commits cluster rows by partition values before the file write, so a
  * many-task append to a partitioned table lands ~one file group per
  * partition value instead of tasks × values tiny files. At 1000
  * executors × 365 days that's the difference between 365 files and
  * 365 000 per commit.
  */
class ClusteredWriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def dataFiles(root: String): Seq[String] =
    ManifestTable.liveEntries(root).map(_.rel)
      .filterNot(r => r.contains("__delete") || r.contains("__eqdelete"))

  test("hash distribution collapses a many-task identity-partitioned append") {
    import spark.implicits._
    val base = Files.createTempDirectory("clustered").toString
    val rows = (0 until 4000).map(i => (i.toLong, s"r${i % 3}", i * 1.0))
      .toDF("k", "region", "v").repartition(16)

    val unclustered = s"$base/none"
    spark.conf.set("spark.graft.write.distribution", "none")
    try ManifestTable.commit(rows, unclustered, partitionCols = Seq("region"))
    finally spark.conf.unset("spark.graft.write.distribution")
    val loose = dataFiles(unclustered).size

    val clustered = s"$base/hash" // default mode
    ManifestTable.commit(rows, clustered, partitionCols = Seq("region"))
    val packed = dataFiles(clustered).size

    assert(loose >= 3 * 8, s"unclustered write should fan out (got $loose files)")
    assert(packed <= 6, s"hash-distributed write must land ~one file per " +
      s"partition value (got $packed files for 3 regions)")
    // identical content either way
    assert(ManifestTable.read(spark, clustered).count() === 4000)
    assert(ManifestTable.read(spark, clustered).agg(sum($"v")).head.getDouble(0)
      === ManifestTable.read(spark, unclustered).agg(sum($"v")).head.getDouble(0))
  }

  test("hash distribution applies to hidden-day partitioning too") {
    import spark.implicits._
    val root = Files.createTempDirectory("clustered_day").toString + "/t"
    val rows = (0 until 3000).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(s"2024-01-0${1 + i % 3} 10:00:00"), i * 1.0)
    }.toDF("k", "ts", "v").repartition(16)
    ManifestTable.commit(rows, root, partitionDayOf = Some("ts"))
    val n = dataFiles(root).size
    assert(n <= 6, s"3 days from 16 tasks must cluster (got $n files)")
    assert(ManifestTable.read(spark, root).count() === 3000)
  }
}
