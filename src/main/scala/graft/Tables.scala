package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Central loaders for the driver-provided testdata tables
  * (`/root/testdata/sf*`, schemas in FIXTURES.md §A).
  *
  * All queries go through here so that scale-dependent reading concerns
  * (schema pinning, timestamp precision) are handled once. The parquet
  * files carry nanosecond timestamps for `events.ts`; Spark's TIMESTAMP
  * is microsecond-precision, so results that surface `ts` must be
  * truncated to a precision the DuckDB oracle can reproduce (the oracle
  * reads the original ns values) — see `Sql.tsMs`.
  */
object Tables {
  private def p(dir: String, name: String): String = s"$dir/$name.parquet"

  def region(spark: SparkSession, dir: String): DataFrame    = spark.read.parquet(p(dir, "region"))
  def nation(spark: SparkSession, dir: String): DataFrame    = spark.read.parquet(p(dir, "nation"))
  def customer(spark: SparkSession, dir: String): DataFrame  = spark.read.parquet(p(dir, "customer"))
  def supplier(spark: SparkSession, dir: String): DataFrame  = spark.read.parquet(p(dir, "supplier"))
  def part(spark: SparkSession, dir: String): DataFrame      = spark.read.parquet(p(dir, "part"))
  def orders(spark: SparkSession, dir: String): DataFrame    = spark.read.parquet(p(dir, "orders"))
  def lineitem(spark: SparkSession, dir: String): DataFrame  = spark.read.parquet(p(dir, "lineitem"))
  /** `events.ts` has shipped as both parquet TIMESTAMP(NANOS) and
    * TIMESTAMP(MICROS) across fixture generations, so the read path is
    * schema-adaptive rather than pinned to either layout:
    *
    *  - NANOS: Spark's reader rejects it outright ([PARQUET_TYPE_ILLEGAL]),
    *    so we always set the nanosAsLong conf before reading; the column
    *    then arrives as a raw ns `LongType` and we floor-divide to
    *    microseconds — exactly what DuckDB's µs TIMESTAMP does on the same
    *    file, so oracle comparisons on `ts` agree bit-for-bit.
    *  - MICROS: nanosAsLong is a no-op and the column arrives as a
    *    timestamp type already; only a TIMESTAMP_NTZ cast is needed (and
    *    the ns→µs floor would be the identity anyway).
    *
    * TIMESTAMP_NTZ keeps wall-clock semantics identical to the (naive)
    * source values regardless of session TZ. [[tsNormExpr]] is the single
    * place that encodes the branch; the streaming reader shares it.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(p(dir, "events"))
    raw.withColumn("ts", expr(tsNormExpr(raw.schema("ts").dataType)))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  /** SQL expression normalizing the loaded `ts` column to TIMESTAMP_NTZ
    * microseconds, branching on how the parquet reader surfaced it:
    * raw ns long (legacy nanos fixture + nanosAsLong conf) vs a native
    * timestamp type (µs fixture). */
  private[graft] def tsNormExpr(tsType: org.apache.spark.sql.types.DataType): String =
    tsType match {
      case org.apache.spark.sql.types.LongType => "cast(timestamp_micros(ts div 1000) as timestamp_ntz)"
      case _                                   => "cast(ts as timestamp_ntz)"
    }
  def documents(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(p(dir, "documents"))
  def embeddings(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(p(dir, "embeddings"))
}

/** One-off diagnostic main (not part of the driver contract): run the
  * named queries at sf0.001 and print row counts or concise errors. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq
    names.foreach { n =>
      val t0 = System.nanoTime()
      try {
        val rows = SparkEntry.queries(n)(spark, dir).count()
        println(f"OK $n rows=$rows (${(System.nanoTime() - t0) / 1e9}%.2fs)")
      } catch { case e: Throwable =>
        println(s"FAIL $n: ${e.getClass.getSimpleName}: ${e.getMessage.linesIterator.take(4).mkString(" | ")}")
      }
    }
    spark.stop()
  }
}
