package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The engine-native Avro file format (graft.sources.avro.AvroFileFormat):
  * the reference's third fan-out leg, implemented on the FileFormat SPI
  * over the classpath's core Avro library. */
class AvroSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("round-trip: every supported type survives write -> read bit-exactly") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("n", IntegerType),
      StructField("d", DoubleType),
      StructField("f", FloatType),
      StructField("b", BooleanType),
      StructField("s", StringType),
      StructField("bin", BinaryType),
      StructField("ts", TimestampType),
      StructField("tsn", TimestampNTZType),
      StructField("dt", DateType),
      StructField("tags", ArrayType(StringType))))
    val rows = Seq(
      Row(1L, 7, 3.25, 1.5f, true, "héllo", Array[Byte](1, 2, 3),
        java.sql.Timestamp.valueOf("2024-01-15 12:34:56.123456"),
        java.time.LocalDateTime.of(2024, 1, 15, 12, 34, 56, 123456000),
        java.sql.Date.valueOf("2024-01-15"), Seq("a", "b")),
      Row(2L, null, null, null, null, null, null, null, null, null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val path = Files.createTempDirectory("avro_rt").toString + "/t"
    df.write.format("avro").save(path)

    val back = spark.read.format("avro").load(path)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq
      === schema.fields.map(f => (f.name, f.dataType)).toSeq)
    val a = df.orderBy("id").collect().map(_.toSeq.map {
      case b: Array[Byte] => b.toSeq; case x => x
    })
    val b = back.orderBy("id").collect().map(_.toSeq.map {
      case b: Array[Byte] => b.toSeq; case x => x
    })
    assert(a.toSeq === b.toSeq)
  }

  test("dynamic partitionBy write + partition discovery + pruned read") {
    val df = Tables.orders(spark, TestSpark.sf)
      .withColumn("yr", year(col("o_orderdate")))
      .select("o_orderkey", "o_totalprice", "yr")
    val path = Files.createTempDirectory("avro_part").toString + "/orders"
    df.write.format("avro").partitionBy("yr").save(path)

    assert(new java.io.File(path).listFiles.exists(_.getName.startsWith("yr=")))
    val back = spark.read.format("avro").load(path)
    assert(back.count() === df.count())
    val q = back.where(col("yr") === 1997)
    assert(q.count() === df.where(col("yr") === 1997).count())
    // the yr predicate prunes at the partition level
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("yr"),
      "partition filter missing:\n" + plan.take(500))
  }

  test("column projection reads only required fields; aggregates match parquet") {
    val src = Tables.lineitem(spark, TestSpark.sf)
      .select("l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag")
    val path = Files.createTempDirectory("avro_proj").toString + "/li"
    src.write.format("avro").save(path)
    val avroAgg = spark.read.format("avro").load(path)
      .groupBy("l_returnflag").agg(Dsl.dsum(col("l_extendedprice")).as("s"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val pqAgg = src
      .groupBy("l_returnflag").agg(Dsl.dsum(col("l_extendedprice")).as("s"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(avroAgg === pqAgg)
  }

  test("nested round-trip: decimal, struct, map and struct-in-array survive bit-exactly") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("amount", DecimalType(18, 4)),
      StructField("big", DecimalType(38, 10)),
      StructField("who", StructType(Seq(
        StructField("name", StringType),
        StructField("age", IntegerType)))),
      StructField("tags", MapType(StringType, DoubleType)),
      StructField("lines", ArrayType(StructType(Seq(
        StructField("sku", StringType),
        StructField("qty", LongType)))))))
    val rows = Seq(
      Row(1L, BigDecimal("12345.6789"), BigDecimal("-98765432109876.5432101234"),
        Row("ada", 36), Map("a" -> 1.5, "b" -> -0.25),
        Seq(Row("x1", 2L), Row("x2", 3L))),
      Row(2L, BigDecimal("-0.0001"), null, Row(null, 7),
        Map("only" -> 0.0), Seq()),
      Row(3L, null, null, null, null, null))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val path = Files.createTempDirectory("avro_nested").toString + "/t"
    df.write.format("avro").save(path)

    val back = spark.read.format("avro").load(path)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq
      === schema.fields.map(f => (f.name, f.dataType)).toSeq)
    def norm(r: org.apache.spark.sql.Row) = r.toSeq.map {
      case m: Map[_, _] => m.toSeq.sortBy(_._1.toString)
      case x => x
    }
    assert(back.orderBy("id").collect().map(norm).toSeq
      === df.orderBy("id").collect().map(norm).toSeq)
    // exact-decimal aggregation through the avro leg agrees with the source
    assert(back.agg(sum("amount")).collect()(0).getDecimal(0)
      === df.agg(sum("amount")).collect()(0).getDecimal(0))
  }

  test("splittable reads: one large file as many splits equals the whole-file read") {
    import spark.implicits._
    val path = Files.createTempDirectory("avro_split").toString + "/t"
    // one file, many blocks: coalesce(1) forces a single container file
    val n = 200000L
    spark.range(n).select(col("id").as("k"),
      concat(lit("row-"), col("id")).as("s"), (col("id") % 97).as("m"))
      .coalesce(1).write.format("avro").save(path)
    val whole = spark.read.format("avro").load(path)
    val bytes = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".avro")).map(_.length()).sum
    assert(bytes > 512 * 1024, "file must span many split targets")

    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", (64 * 1024).toString)
    try {
      val split = spark.read.format("avro").load(path)
      assert(split.rdd.getNumPartitions > 4,
        s"expected many splits, got ${split.rdd.getNumPartitions}")
      // every record exactly once: counts, sums and distinct keys all agree
      val a = split.agg(count(lit(1)), sum("k"), countDistinct("k"), sum("m")).collect()(0)
      val b = whole.agg(count(lit(1)), sum("k"), countDistinct("k"), sum("m")).collect()(0)
      assert(a === b)
      assert(a.getLong(0) === n && a.getLong(2) === n)
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }

  test("schema-on-read projection: a column absent from old files reads NULL") {
    import spark.implicits._
    val path = Files.createTempDirectory("avro_evo").toString + "/t"
    Seq((1L, "a")).toDF("k", "v").write.format("avro").save(path)
    val widened = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType),
      StructField("extra", StringType)))
    val back = spark.read.format("avro").schema(widened).load(path)
    val r = back.collect().head
    assert(r.getLong(0) === 1L && r.getString(1) === "a" && r.isNullAt(2))
  }
}
