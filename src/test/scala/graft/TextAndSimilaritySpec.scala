package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Text
import graft.operators.Similarity
import graft.multimodal.Multimodal

class TextAndSimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Real-language corpus (documents.parquet shape) for lang-ID accuracy —
    * the driver testdata's lang labels are random so accuracy is asserted
    * here instead. */
  private lazy val langDir: String = {
    val docs = Seq(
      (1L, "the cat and the dog sat in the garden and it is a sunny day", "en"),
      (2L, "el perro y el gato de la casa que corre en los campos", "es"),
      (3L, "der hund und die katze sind von den bergen mit dem auto", "de"),
      (4L, "qwfp zxcv bnml ghjk tyui qazx", "und"))
    val dir = Files.createTempDirectory("lang_spec").toString
    docs.toDF("doc_id", "text", "lang")
      .withColumn("source", lit("spec"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("langId classifies clean en/es/de text and flags gibberish as und") {
    val got = Text.langId(spark, langDir)
      .select("doc_id", "lang_guess").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "en", 2L -> "es", 3L -> "de", 4L -> "und"))
  }

  test("textStats: counts and ratios on a known document") {
    val row = Text.textStats(spark, langDir)
      .where(col("doc_id") === 1L).collect().head
    val nTokens = row.getAs[Int]("n_tokens")
    assert(nTokens === 15)
    assert(row.getAs[Int]("n_stopwords") === 9)      // 3×the + 2×and + in + it + is + a
    assert(math.abs(row.getAs[Double]("stopword_ratio") - 9.0 / 15) < 1e-12)
    val q = row.getAs[Double]("quality_score")
    assert(q > 0.0 && q <= 1.0)
  }

  test("fingerprint is whitespace/case-insensitive") {
    val df = Seq("Hello  World", "hello world", "different").toDF("text")
      .select(Text.fingerprint(col("text")).as("fp"))
    val fps = df.collect().map(_.getString(0))
    assert(fps(0) === fps(1))
    assert(fps(0) !== fps(2))
  }

  test("bruteForceTopK: ranked per query, no self-pairs, cosine in [-1,1]") {
    val df = Similarity.bruteForceTopK(spark, TestSpark.sf, nQueries = 5, k = 7).cache()
    assert(df.count() === 35)
    assert(df.where(col("qid") === col("cid")).count() === 0)
    assert(df.where(abs(col("similarity")) > 1.0 + 1e-9).count() === 0)
    // per qid: ranks exactly 1..7 and similarity non-increasing with rank
    val grouped = df.groupBy("qid").agg(
      countDistinct(col("rk")).as("n"),
      max(col("rk")).as("mx")).collect()
    grouped.foreach { r => assert(r.getLong(1) === 7L && r.getInt(2) === 7) }
    val viol = df.as("a").join(df.as("b"),
      col("a.qid") === col("b.qid") && (col("a.rk") + 1) === col("b.rk"))
      .where(col("a.similarity") < col("b.similarity")).count()
    assert(viol === 0)
  }

  test("bruteForceTopK: heap prune is lossless vs single-window exact form; corpus never windows") {
    import org.apache.spark.sql.expressions.Window
    // ground truth: exact-decimal cosine over ALL pairs, one ranking
    // window (fine at spec scale; the operator exists to avoid this plan)
    val e = graft.Tables.embeddings(spark, TestSpark.sf)
    val q = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val truth = e.select(col("vec_id").as("cid"), col("embedding").as("cv"))
      .crossJoin(broadcast(q))
      .where(col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"),
        (Similarity.exactZipSum(col("qv"), col("cv"))
          / sqrt(Similarity.exactSelfSum(col("qv")) * Similarity.exactSelfSum(col("cv")))).as("similarity"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("similarity").desc, col("cid"))))
      .where(col("rk") <= 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).sortBy(t => (t._1, t._3))
    val got = Similarity.bruteForceTopK(spark, TestSpark.sf, nQueries = 5, k = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).sortBy(t => (t._1, t._3))
    assert(got.toSeq === truth.toSeq)
    // plan shape: the corpus-side pruning runs in the mapPartitions heap
    // stage; every ranking window in the plan is downstream of it
    val plan = Similarity.bruteForceTopK(spark, TestSpark.sf, nQueries = 5, k = 7)
      .queryExecution.optimizedPlan.toString
    val lines = plan.split("\n")
    val lastWindow = lines.lastIndexWhere(_.contains("windowspecdefinition"))
    val mapPart = lines.indexWhere(_.contains("MapPartitions"))
    assert(mapPart >= 0, "heap prune stage missing:\n" + plan.take(1500))
    assert(lastWindow >= 0 && lastWindow < mapPart,
      "a ranking window must never sit below the heap prune (corpus-sized partitions):\n" +
        lines.slice(math.min(lastWindow, mapPart), lines.length).mkString("\n").take(1500))
  }

  test("cosine of identical vectors is 1") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f)))
      .toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b")).as("c"))
    assert(math.abs(df.first().getDouble(0) - 1.0) < 1e-9)
  }

  test("piiScrub redacts planted emails, phones and long digit runs") {
    import java.nio.file.Files
    val docs = Seq(
      (1L, "contact me at alice.smith+work@example.co.uk for details"),
      (2L, "call +4915123456789 or use account 123456789012 to pay"),
      (3L, "no sensitive content in this one at all")
    ).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("spec"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val d = Files.createTempDirectory("pii").toString
    docs.write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = graft.functions.Text.piiScrub(spark, d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Int]("n_emails") === 1)
    assert(out(1L).getAs[String]("text_scrubbed") ===
      "contact me at <EMAIL> for details")
    assert(out(2L).getAs[Int]("n_phones") === 1)
    assert(out(2L).getAs[Int]("n_long_nums") >= 1)
    val scrub2 = out(2L).getAs[String]("text_scrubbed")
    assert(scrub2.contains("<PHONE>") && scrub2.contains("<NUM>"))
    assert(!scrub2.exists(_.isDigit), s"all digit runs redacted: $scrub2")
    assert(out(3L).getAs[Boolean]("has_pii") === false)
    assert(out(3L).getAs[String]("text_scrubbed") === "no sensitive content in this one at all")
  }

  test("multimodal: batched stub decode agrees with the expression path") {
    val viaExpr = Multimodal.featurize(spark, TestSpark.sf)
      .orderBy("doc_id").collect().map(_.toSeq)
    val viaBatch = Multimodal.decodeBatched(
      Multimodal.mediaTable(spark, TestSpark.sf), parallelism = 4)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(viaExpr.length === viaBatch.length)
    viaExpr.zip(viaBatch).foreach { case (a, b) => assert(a === b) }
  }

  test("multimodal: a swapped-in decoder implementation drives the same plan") {
    // a fake "real" codec: constant dimensions + per-partition open() count
    object FakeCodec extends Multimodal.MediaDecoder {
      override def decode(docId: Long, payload: Array[Byte]): Multimodal.MediaFeatures =
        Multimodal.MediaFeatures(docId, payload.length, 1920, 1080, 24, 0.5)
    }
    val out = Multimodal.decodeBatched(
      Multimodal.mediaTable(spark, TestSpark.sf), parallelism = 4, decoder = FakeCodec)
      .collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getAs[Int]("width") == 1920
      && r.getAs[Int]("height") == 1080 && r.getAs[Int]("n_frames") == 24))
    // doc ids and byte counts still flow from the table, not the decoder
    val docs = graft.Tables.documents(spark, TestSpark.sf).count()
    assert(out.length.toLong === docs)
  }
}
