package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Multimodal-column plumbing for training-data pipelines: opaque `binary`
  * payloads + typed metadata, with a batched decode/feature-extract stage.
  *
  * No image/audio codecs exist in this container, so the actual decode is
  * STUBBED with a deterministic fake (features derived from payload
  * length). Everything around the stub — the schema (binary + metadata
  * struct), the per-partition batched iterator shape a real decoder needs
  * (amortize model/codec init per partition, not per row), and the
  * repartitioning for decode parallelism — is real and tested.
  */
object Multimodal {

  /** A decoded feature row; what a real image decoder would emit. */
  case class MediaFeatures(doc_id: Long, n_bytes: Int, width: Int,
                           height: Int, n_frames: Int, brightness: Double)

  /** Pluggable decoder interface: a real codec/model implements this and
    * drops into [[decodeBatched]] without touching the plan. `open()` runs
    * once per PARTITION (amortize codec/model initialization over the
    * partition's rows — the whole point of the mapPartitions shape);
    * `decode` runs per row. Must be serializable: the instance ships to
    * executors inside the task closure. */
  trait MediaDecoder extends Serializable {
    /** Per-partition initialization hook (load codec, mmap model, …). */
    def open(): Unit = ()
    def decode(docId: Long, payload: Array[Byte]): MediaFeatures
  }

  /** STUB decoder: deterministic fake features from the payload bytes.
    * A real implementation would parse the codec header / run the model
    * here; everything downstream is agnostic to the swap. */
  object StubDecoder extends MediaDecoder {
    override def decode(docId: Long, payload: Array[Byte]): MediaFeatures =
      decodeStub(docId, payload)
  }

  def decodeStub(docId: Long, payload: Array[Byte]): MediaFeatures = {
    val n = payload.length
    MediaFeatures(docId, n, n % 640, (n * 7) % 480, n % 30, (n % 256) / 255.0)
  }

  /** Synthesize a multimodal table from `documents`: text bytes play the
    * opaque payload, with a typed metadata struct alongside. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      col("text").cast(BinaryType).as("payload"),
      struct(
        lit("text/plain").as("mime"),
        col("source").as("origin"),
        length(col("text")).as("n_chars")).as("meta"))

  /** Expression-only feature path (codegen'd, used by the driver-checked
    * query): mirrors `decodeStub` exactly so the two paths are
    * cross-checked in the unit spec. */
  def featurize(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir).select(
      col("doc_id"),
      length(col("payload")).as("n_bytes"))
      .select(
        col("doc_id"),
        col("n_bytes"),
        (col("n_bytes") % 640).as("width"),
        ((col("n_bytes") * 7) % 480).as("height"),
        (col("n_bytes") % 30).as("n_frames"),
        ((col("n_bytes") % 256).cast(DoubleType) / 255.0).as("brightness"))

  /** Batched decode path: the real plumbing a heavyweight decoder needs —
    * per-partition init ([[MediaDecoder.open]]), iterator-in/iterator-out,
    * explicit repartition to spread decode cost. A production codec swaps
    * in via the `decoder` parameter; the plan is identical. */
  def decodeBatched(media: DataFrame, parallelism: Int,
                    decoder: MediaDecoder = StubDecoder): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .repartition(parallelism)
      .mapPartitions { rows: Iterator[Row] =>
        decoder.open() // once per partition, before the first row
        rows.map(r => decoder.decode(r.getLong(0), r.getAs[Array[Byte]](1)))
      }
      .toDF()
  }

  /** Frame sampling: every k-th frame of each media item becomes its own
    * row (the 1→n fan-out a video pipeline runs before per-frame feature
    * extraction). The frame axis is generated per row (sequence+explode —
    * output bounded by n_frames/k, never materializing all frames), and
    * the per-frame feature is the deterministic stub standing in for the
    * real decoder call. Map-only: the fan-out happens inside the scan
    * stage, no shuffle. */
  def sampleFrames(spark: SparkSession, dir: String, every: Int = 5): DataFrame =
    featurize(spark, dir)
      .where(col("n_frames") > 0)
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(every))).as("frame_idx"))
      .withColumn("frame_feature",
        ((col("doc_id") * 31 + col("frame_idx")) % 997).cast(DoubleType) / 997.0)

  object oracle {
    /** documents.text is ASCII, so DuckDB's char length == byte length. */
    val featurize: String =
      s"""SELECT doc_id,
         |  CAST(length(text) AS INT) AS n_bytes,
         |  CAST(length(text) % 640 AS INT) AS width,
         |  CAST((length(text) * 7) % 480 AS INT) AS height,
         |  CAST(length(text) % 30 AS INT) AS n_frames,
         |  CAST(length(text) % 256 AS DOUBLE) / 255.0 AS brightness
         |FROM documents""".stripMargin

    val sampleFrames: String =
      s"""WITH f AS (
         |  SELECT doc_id, CAST(length(text) % 30 AS INT) AS n_frames
         |  FROM documents),
         |fr AS (
         |  SELECT doc_id, n_frames,
         |    CAST(unnest(range(0, n_frames, 5)) AS INT) AS frame_idx
         |  FROM f WHERE n_frames > 0)
         |SELECT doc_id, n_frames, frame_idx,
         |  CAST((doc_id * 31 + frame_idx) % 997 AS DOUBLE) / 997.0 AS frame_feature
         |FROM fr""".stripMargin
  }
}
