package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Native
import graft.operators.Similarity

class NativeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("rolling_hash: deterministic, collision-free on distinct inputs, SQL-registered") {
    GraftExtensions.register(spark)
    val texts = Seq("alpha", "beta", "alpha", "", "alpha ")
    val viaCol = texts.toDF("t")
      .select(Native.rolling_hash(col("t"))).collect().map(_.getLong(0))
    assert(viaCol(0) === viaCol(2))          // same input, same hash
    assert(viaCol(0) !== viaCol(1))
    assert(viaCol(0) !== viaCol(4))          // trailing space matters
    val viaSql = texts.toDF("t").createOrReplaceTempView("rh_in")
    val sqlHashes = spark.sql("SELECT rolling_hash(t) FROM rh_in")
      .collect().map(_.getLong(0))
    assert(sqlHashes.toSeq === viaCol.toSeq) // SQL path == Column path
    // matches the reference polynomial computed in plain Scala
    val expected = "alpha".getBytes("UTF-8")
      .foldLeft(0L)((h, b) => h * 1099511628211L + b)
    assert(viaCol(0) === expected)
  }

  test("float_cosine: matches the exact-decimal cosine within float tolerance") {
    val e = Tables.embeddings(spark, TestSpark.sf).limit(50)
    val a = e.select(col("vec_id").as("ida"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("idb"), col("embedding").as("vb"))
    val both = a.join(b, col("ida") < col("idb"))
      .select(
        Native.float_cosine(col("va"), col("vb")).as("fast"),
        Similarity.cosine(col("va"), col("vb")).as("exact"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-6,
        s"fast=${r.getDouble(0)} exact=${r.getDouble(1)}")
    }
  }

  test("float_cosine: identical vectors → 1, zero vector → 0") {
    val df = Seq(
      (Array(1.0f, 2.0f), Array(1.0f, 2.0f)),
      (Array(0.0f, 0.0f), Array(1.0f, 2.0f))
    ).toDF("a", "b").select(Native.float_cosine(col("a"), col("b")).as("c"))
    val got = df.collect().map(_.getDouble(0))
    assert(math.abs(got(0) - 1.0) < 1e-12)
    assert(got(1) === 0.0)
  }

  test("shingle_rows: byte-identical to the posexplode+window-lead form, no shuffle") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, TestSpark.sf).select(col("doc_id"), col("text"))
    // reference: the previous window formulation (shuffles to line up leads)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val viaWindow = docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .withColumnRenamed("col", "tok")
      .withColumn("t2", lead(col("tok"), 1).over(w))
      .withColumn("t3", lead(col("tok"), 2).over(w))
      .where(col("t3").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("tok"), col("t2"), col("t3")).as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val gen = docs.select(col("doc_id"), Native.shingle_rows(col("text"), 3).as("s"))
    val viaGen = gen.collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(viaGen === viaWindow, "generator must reproduce the window form exactly")
    assert(!gen.queryExecution.executedPlan.toString.contains("Exchange"),
      "shingling must be map-only — no exchange of token rows")
    // edge cases: short doc (no shingles), consecutive spaces (empty tokens kept)
    import spark.implicits._
    val edge = Seq((1L, "a b"), (2L, "x  y z")).toDF("doc_id", "text")
      .select(col("doc_id"), Native.shingle_rows(col("text"), 3).as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(edge === Seq((2L, "x  y"), (2L, " y z")))
  }

  test("shingle_rows registers as a SQL table function usable in LATERAL VIEW") {
    import spark.implicits._
    GraftExtensions.register(spark)
    Seq((1L, "a b c d"), (2L, "x y")).toDF("doc_id", "text")
      .createOrReplaceTempView("sr_docs")
    val viaSql = spark.sql(
      "SELECT doc_id, s FROM sr_docs LATERAL VIEW shingle_rows(text, 3) t AS s")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(viaSql === Seq((1L, "a b c"), (1L, "b c d")))
    // non-literal width must be rejected, not silently mis-shingled
    intercept[Exception](
      spark.sql("SELECT shingle_rows(text, doc_id) FROM sr_docs").collect())
  }

  test("ivfTopK: high recall vs brute-force ground truth") {
    val bf = Similarity.bruteForceTopK(spark, TestSpark.sf, nQueries = 10, k = 10)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(spark, TestSpark.sf, nQueries = 10, k = 10,
      nlist = 16, nprobe = 8)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf.size === 100)
    val recall = (bf intersect ivf).size.toDouble / bf.size
    assert(recall >= 0.5, s"IVF recall $recall too low")   // random vectors: probes cover 1/2 the lists
  }
}
